"""Alias module: `from ipcl_python.ipcl_python import PaillierKeypair`."""

from pailliercryptolib_python_tpu.api import (  # noqa: F401
    PaillierKeypair,
    PaillierPublicKey,
    PaillierPrivateKey,
    PaillierEncryptedNumber,
    BNUtils,
)

"""Alias module mirroring the pybind11 module `ipcl_bindings`."""

from pailliercryptolib_python_tpu.bindings.containers import (  # noqa: F401
    ipclKeypair,
    ipclPublicKey,
    ipclPrivateKey,
    ipclPlainText,
    ipclCipherText,
    ipclBigNumber,
)
from pailliercryptolib_python_tpu.utils.context import (  # noqa: F401
    context,
    hybridControl,
    hybridMode,
)

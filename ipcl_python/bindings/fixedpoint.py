"""Alias module: `from ipcl_python.bindings.fixedpoint import ...`."""

from pailliercryptolib_python_tpu.fixedpoint import (  # noqa: F401
    FixedPointNumber,
    FixedPointEndec,
)

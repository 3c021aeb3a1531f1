"""Test config: run the suite on a deterministic 8-device CPU mesh.

Must set env vars before jax is first imported anywhere, mirroring the
standard JAX approach for testing N-device sharding without a cluster
(SURVEY.md §4).  TPU performance is exercised by bench.py, not the tests.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the (single,
# tunneled) TPU, which makes unit tests nondeterministically slow.  Set
# PAILLIER_TPU_TESTS=1 to run the suite on the real device instead.
if not os.environ.get("PAILLIER_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

"""Test config: run the suite on a deterministic 8-device CPU mesh.

The ambient environment preloads jax (axon sitecustomize) and pins
JAX_PLATFORMS to the tunneled TPU, so env vars set here are too late —
jax.config.update is the reliable switch and must run before the first
backend use.  This mirrors the standard JAX approach for testing
N-device sharding without a cluster (SURVEY.md §4).  TPU performance is
exercised by bench.py, not the tests; set PAILLIER_TPU_TESTS=1 to run
the suite on the real device instead.
"""

import os

# CPU tests get their OWN persistent cache: sharing .jax_cache with a
# concurrently-running TPU process produced a segfault inside jax's
# cache writer (round 4), and CPU AOT entries written by another machine
# trip the machine-feature mismatch loader warning (risk of SIGILL).
_CACHE = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                      ".jax_cache_cpu")

if not os.environ.get("PAILLIER_TPU_TESTS"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

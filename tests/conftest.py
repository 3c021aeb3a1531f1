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

if not os.environ.get("PAILLIER_TPU_TESTS"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    # NO persistent compilation cache on the CPU suite (CPU AOT entries
    # are machine-feature-pinned; cache writes added a crash surface).
    # ALSO: do not run this suite while a TPU process is live on the
    # same host — the XLA:CPU compile of the RNS-decrypt program
    # segfaulted twice in round 4 only when a TPU/relay process ran
    # concurrently, and passed cleanly (same shapes) standalone.
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()


def pytest_collection_modifyitems(items):
    """Run the heaviest-compile files FIRST: the XLA:CPU compiler has
    segfaulted compiling the big RNS programs late in long sessions
    (hundreds of compiled programs in-process), while the same compiles
    succeed in a fresh process.  Front-loading them keeps the suite off
    that cliff; the bucketed decrypt/mul widths (models/paillier.py)
    reduce how many such compiles exist at all."""
    heavy = ("test_parity_2048.py", "test_kat.py", "test_parallel.py",
             "test_pallas_rns.py", "test_rns.py")
    items.sort(key=lambda it: 0 if it.fspath.basename in heavy else 1)

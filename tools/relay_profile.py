#!/usr/bin/env python3
"""Profile host<->device relay costs and the e2e encrypt host path."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def t(label, fn, iters=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    if hasattr(out, "block_until_ready"):
        out.block_until_ready()
        np.asarray(out.ravel()[:4])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.1f} ms", file=sys.stderr)
    return dt


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    from pailliercryptolib_python_tpu.models import paillier as sch
    from pailliercryptolib_python_tpu.utils.fixtures import fixed_key_ints

    kd = fixed_key_ints(2048, enable_DJN=True)
    pub = sch.PublicContext(kd["n"], kd["bits"], True, kd["hs"],
                            kd["randbits"])
    _ = pub.comb_table  # build once

    rng = np.random.default_rng(3)
    B = 1024
    vals = [int(v) for v in rng.integers(0, 2**60, size=B)]

    # raw H2D transfer of a (128, 1024) uint32 array
    arr = np.zeros((128, 1024), dtype=np.uint32)
    t("H2D 512KB jnp.asarray", lambda: jnp.asarray(arr))

    # trivial dispatch round trip
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.uint32)
    f(x).block_until_ready()
    t("trivial jit dispatch", lambda: f(x))

    # host encode path pieces
    t("encodings_to_device (incl H2D)", lambda: pub.encodings_to_device(vals))
    t("sample_obfuscator_digits (incl H2D)",
      lambda: pub.sample_obfuscator_digits(B))

    from pailliercryptolib_python_tpu.ops.limb import ints_to_limbs
    t("ints_to_limbs host only", lambda: ints_to_limbs(vals, pub.Ln))

    # full e2e encrypt
    t("pub.encrypt e2e", lambda: pub.encrypt(vals), iters=3)

    # device-only encrypt (pre-staged inputs)
    m = pub.encodings_to_device(vals)
    d = pub.sample_obfuscator_digits(B)
    comb = pub.comb_table

    def dev_only():
        return sch._encrypt_djn(m, d, comb, pub.n_limbs, pub.ctx, pub.L)

    t("device-only encrypt", dev_only, iters=5)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""TPU microbench: squaring kernel vs general modmul (pallas_mont2).

Shapes follow the production paths:
  L=130  — 2048-bit CRT decrypt half (p^2 modulus)
  L=257  — 2048-bit encrypt-chain modulus (n^2)

Also times the shared-exponent modexp (the decrypt stage-2 kernel)
before/after squaring specialization at the decrypt shape.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from pailliercryptolib_python_tpu.ops import pallas_mont2 as pm2  # noqa: E402
from pailliercryptolib_python_tpu.ops import matmul_mont as mm  # noqa: E402
from pailliercryptolib_python_tpu.ops.limb import (  # noqa: E402
    int_to_limbs, ints_to_limbs, limbs_to_ints)


def timeit(fn, iters=5):
    out = fn()
    np.asarray(out[:1, :8])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out[:1, :8])
    return (time.perf_counter() - t0) / iters


def bench_L(L, B, rng):
    bits = 16 * L - 3
    m = int.from_bytes(rng.bytes(bits // 8), "little") | (1 << (bits - 1)) | 1
    R = 1 << (16 * L)
    assert 4 * m < R
    mctx = mm.MatmulMontCtx(m, L)
    xs = [int.from_bytes(rng.bytes(2 * L), "little") % m for _ in range(B)]
    a = jnp.asarray(ints_to_limbs(xs, L))
    tiles = -(-B // 128)

    t_mul = timeit(lambda: pm2.mm2_mul_p(a, a, mctx.W_mu, mctx.W_m))
    t_sqr = timeit(lambda: pm2.mm2_sqr_p(a, mctx.W_mu, mctx.W_m))
    # correctness on device
    got = limbs_to_ints(np.asarray(pm2.mm2_sqr_p(a, mctx.W_mu, mctx.W_m)))
    Rinv = pow(R, -1, m)
    for g, x in zip(got[:8], xs[:8]):
        assert g < 2 * m and g % m == x * x * Rinv % m, "sqr mismatch"
    print(f"L={L} B={B}: mul {t_mul*1e6/tiles:8.1f} us/tile   "
          f"sqr {t_sqr*1e6/tiles:8.1f} us/tile   "
          f"ratio {t_sqr/t_mul:.2f}", flush=True)

    # shared-exponent modexp at the decrypt shape
    if L <= 140:
        e = (1 << 1023) | int.from_bytes(rng.bytes(127), "little") | 1
        from pailliercryptolib_python_tpu.ops import montgomery as mg
        w = 5
        n_win = -(-e.bit_length() // w)
        digits = mg.exponent_digits([e], n_win, w)[:, 0]
        one = jnp.asarray(int_to_limbs(R % m, L)[:, None])
        base = jnp.asarray(ints_to_limbs([x * R % m for x in xs], L))
        t_exp = timeit(lambda: pm2.mm2_exp_shared_p(
            base, digits, mctx.W_mu, mctx.W_m, one, window=w), iters=3)
        got = limbs_to_ints(np.asarray(pm2.mm2_exp_shared_p(
            base, digits, mctx.W_mu, mctx.W_m, one, window=w)))
        for g, x in zip(got[:4], xs[:4]):
            assert g % m == pow(x, e, m) * R % m, "exp mismatch"
        n_mm = n_win * (w + 1)
        print(f"L={L} B={B}: exp_shared(1024-bit e, w={w}) "
              f"{t_exp*1e3:.1f} ms  -> {t_exp*1e6/tiles/n_mm:.2f} "
              f"us/tile-modmul  ({B/t_exp:.0f} exp/s)", flush=True)


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    rng = np.random.default_rng(3)
    for L, B in ((130, 2048), (257, 1024)):
        bench_L(L, B, rng)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""TPU microbench: matmul-Montgomery (v2) kernels vs CIOS (v1).

Shapes:
  mul:  L=257, B=1024    (2048-bit encrypt-chain modmul)
  exp:  L=129, B=2048    (2048-bit CRT decrypt half)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from pailliercryptolib_python_tpu.ops import pallas_mont as pm  # noqa: E402
from pailliercryptolib_python_tpu.ops import pallas_mont2 as pm2  # noqa: E402
from pailliercryptolib_python_tpu.ops import matmul_mont as mm  # noqa: E402
from pailliercryptolib_python_tpu.ops import montgomery as mg  # noqa: E402
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


def main():
    which = sys.argv[1:] or ["mul", "exp"]
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    rng = np.random.default_rng(1)

    if "mul" in which:
        L, B = 257, 1024
        nsq = int.from_bytes(rng.bytes(512), "little") | (1 << 4095) | 1
        R = 1 << (16 * L)
        assert 4 * nsq < R
        Rinv = pow(R, -1, nsq)
        mctx = mm.MatmulMontCtx(nsq, L)
        ctx = mg.MontCtx.for_modulus(nsq)
        assert ctx.num_limbs == L
        xs = [int.from_bytes(rng.bytes(500), "little") % nsq
              for _ in range(B)]
        ys = [int.from_bytes(rng.bytes(500), "little") % nsq
              for _ in range(B)]
        a = jnp.asarray(ints_to_limbs(xs, L))
        b = jnp.asarray(ints_to_limbs(ys, L))

        K = 16  # chained modmuls per jitted dispatch (amortize launch)
        import functools
        from jax import lax

        @jax.jit
        def chain_v1(a, b):
            return lax.fori_loop(
                0, K, lambda i, acc: pm.mont_mul_p(acc, b, ctx.n_limbs,
                                                   ctx.n0inv), a)

        @jax.jit
        def chain_v2(a, b):
            return lax.fori_loop(
                0, K, lambda i, acc: pm2.mm2_mul_p(acc, b, mctx.W_mu,
                                                   mctx.W_m), a)

        def oracle_chain(x, y):
            acc = x
            for _ in range(K):
                acc = acc * y * Rinv % nsq
            return acc

        variants = {
            "mul_v1_cios": lambda: chain_v1(a, b),
            "mul_v2_mm": lambda: chain_v2(a, b),
        }
        for name, fn in variants.items():
            try:
                got = limbs_to_ints(np.asarray(fn()))[:4]
                ok = all(g % nsq == oracle_chain(x, y)
                         for g, x, y in zip(got, xs, ys))
                dt = timeit(fn)
                per = dt / K / (B // 128)
                print(f"{name}: ok={ok}  {dt * 1e3:.2f} ms for {K} chained "
                      f"({per * 1e6:.1f} us/tile-modmul)", flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:400]}",
                      flush=True)

    if "exp" in which:
        L, B, n_win = 129, 2048, 256
        mod = int.from_bytes(rng.bytes(256), "little") | (1 << 2047) | 1
        R = 1 << (16 * L)
        assert 4 * mod < R
        mctx = mm.MatmulMontCtx(mod, L)
        ctx = mg.MontCtx.for_modulus(mod)
        assert ctx.num_limbs == L
        baseints = [int.from_bytes(rng.bytes(250), "little") % mod
                    for _ in range(B)]
        # kernels take Montgomery-form bases (x*R mod m)
        base = jnp.asarray(ints_to_limbs([x * R % mod for x in baseints],
                                         L))
        digs = rng.integers(0, 16, size=(n_win, B)).astype(np.uint32)
        digs_j = jnp.asarray(digs)
        one = jnp.asarray(int_to_limbs(R % mod, L)[:, None])

        def oracle(j):
            e = 0
            for w in range(n_win):
                e = (e << 4) | int(digs[w, j])
            return pow(baseints[j], e, mod) * (R % mod) % mod

        n0a = ctx.n0inv
        # shared-exponent stream (the decrypt shape): one 1024-bit e
        e_shared = int.from_bytes(rng.bytes(128), "little") | (1 << 1023)
        nw5 = -(-1024 // 5)
        dig5 = jnp.asarray(mg.exponent_digits([e_shared], nw5, 5)[:, 0])

        variants = {
            "exp_v1_cios": lambda: pm.mont_exp_p(
                base, digs_j, ctx.n_limbs, n0a, ctx.one),
            "exp_v2_mm": lambda: pm2.mm2_exp_p(
                base, digs_j, mctx.W_mu, mctx.W_m, ctx.one),
            "exp_v2_shared_w5": lambda: pm2.mm2_exp_shared_p(
                base, dig5, mctx.W_mu, mctx.W_m, ctx.one, window=5),
        }
        nmm = n_win * 5 * (B // 128)
        for name, fn in variants.items():
            try:
                got = limbs_to_ints(np.asarray(fn()))[:2]
                if "shared" in name:
                    ok = all(g % mod == pow(baseints[j], e_shared, mod)
                             * (R % mod) % mod for j, g in enumerate(got))
                else:
                    ok = all(g % mod == oracle(j) % mod
                             for j, g in enumerate(got))
                dt = timeit(fn, iters=3)
                print(f"{name}: ok={ok}  {dt * 1e3:.1f} ms "
                      f"({dt / nmm * 1e6:.2f} us/tile-modmul, "
                      f"{B / dt:.0f} exp/s)", flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:400]}",
                      flush=True)


if __name__ == "__main__":
    main()

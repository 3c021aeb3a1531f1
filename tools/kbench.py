#!/usr/bin/env python3
"""Parameterized TPU kernel microbench — the single measurement harness.

Usage:
    python tools/kbench.py mul       [--L 257] [--B 1024] [--variants ...]
    python tools/kbench.py sqr       [--L 130] [--B 1024]
    python tools/kbench.py exp       [--L 257] [--B 2048] [--nwin 256]
    python tools/kbench.py expshared [--L 130] [--B 16384] [--ebits 1024]
                                     [--window 5]
    python tools/kbench.py crt       [--bits 2048] [--B 16384]

Consolidates the round-1/2 kbench generations (kbench, kbench_mm2,
kbench_dot, kbench_sqr).  Their measured conclusions, preserved:
  * v1 CIOS (rotate-operand, concat-padded adds): ~55 us/(257,128)-tile
    modmul — VMEM-pass bound (~5-6 (L,TB) passes per iteration); unroll,
    ref-read and wider-tile variants were noise or worse.
  * v2 matmul-Montgomery: product phase (VPU schoolbook) dominates; the
    int8 nibble dots are a small fraction of tile time.
  * squaring specialization: 0.57x a general modmul at L=130, ~0.97x at
    L=257 (VMEM blowup) — hence PRESHIFT_MAX_L gating in pallas_mont2.
Variant 'v3' is the signed-byte Toeplitz path (halved matmul dims).
"""

import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def rand_modulus(rng, L):
    """Odd modulus with 4m < 2^(16L) (Walter slack)."""
    bits = 16 * L - 3
    m = int.from_bytes(rng.bytes(bits // 8 + 1), "little")
    m = (m | (1 << (bits - 1)) | 1) & ((1 << bits) - 1)
    return m


def rand_elems(rng, m, B):
    nb = (m.bit_length() + 7) // 8 + 8
    return [int.from_bytes(rng.bytes(nb), "little") % m for _ in range(B)]


def report(name, ok, dt, tiles, nmod, extra=""):
    per = dt / max(1, nmod) / max(1, tiles) * 1e6
    print(f"{name}: ok={ok}  {dt * 1e3:.2f} ms "
          f"({per:.2f} us/tile-modmul{extra})", flush=True)


def run_variants(variants, oracle_fn, tiles, nmod, iters=5):
    for name, fn in variants.items():
        try:
            got = limbs_to_ints(np.asarray(fn()))
            ok = oracle_fn(got)
            dt = timeit(fn, iters=iters)
            report(name, ok, dt, tiles, nmod)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:400]}",
                  flush=True)


def cmd_mul(args, rng):
    L, B, K = args.L, args.B, args.chain
    m = rand_modulus(rng, L)
    R = 1 << (16 * L)
    Rinv = pow(R, -1, m)
    ctx = mg.MontCtx.for_modulus(m, min_bits=16 * L - 2, mxu=False)
    xs, ys = rand_elems(rng, m, B), rand_elems(rng, m, B)
    a = jnp.asarray(ints_to_limbs(xs, L))
    b = jnp.asarray(ints_to_limbs(ys, L))

    def oracle(got):
        def ref(x, y):
            acc = x
            for _ in range(K):
                acc = acc * y * Rinv % m
            return acc
        return all(g % m == ref(x, y)
                   for g, x, y in zip(got[:4], xs, ys))

    variants = {}
    if "v1" in args.variants:
        @jax.jit
        def chain_v1(a, b):
            return lax.fori_loop(
                0, K, lambda i, acc: pm.mont_mul_p(acc, b, ctx.n_limbs,
                                                   ctx.n0inv), a)
        variants["mul_v1_cios"] = lambda: chain_v1(a, b)
    if "v2" in args.variants:
        mctx = mm.MatmulMontCtx(m, L)

        @jax.jit
        def chain_v2(a, b):
            return lax.fori_loop(
                0, K, lambda i, acc: pm2.mm2_mul_p(acc, b, mctx.W_mu,
                                                   mctx.W_m), a)
        variants["mul_v2_mm"] = lambda: chain_v2(a, b)
    if "v3" in args.variants:
        from pailliercryptolib_python_tpu.ops import pallas_mont3 as pm3
        w3 = pm3.byte_weights(m, L)

        @jax.jit
        def chain_v3(a, b):
            return lax.fori_loop(
                0, K, lambda i, acc: pm3.mm3_mul_p(acc, b, *w3,
                                                   tb=args.tb), a)
        variants[f"mul_v3_byte_tb{args.tb or pm3.tb_for(L)}"] = \
            lambda: chain_v3(a, b)
    run_variants(variants, oracle, B // 128, K)


def cmd_sqr(args, rng):
    L, B, K = args.L, args.B, args.chain
    m = rand_modulus(rng, L)
    R = 1 << (16 * L)
    Rinv = pow(R, -1, m)
    xs = rand_elems(rng, m, B)
    a = jnp.asarray(ints_to_limbs(xs, L))

    def oracle(got):
        def ref(x):
            acc = x
            for _ in range(K):
                acc = acc * acc * Rinv % m
            return acc
        return all(g % m == ref(x) for g, x in zip(got[:4], xs))

    variants = {}
    if "v2" in args.variants or "v3" in args.variants:
        mctx = mm.MatmulMontCtx(m, L)
    if "v2" in args.variants:
        @jax.jit
        def chain_mul(a):
            return lax.fori_loop(
                0, K, lambda i, acc: pm2.mm2_mul_p(acc, acc, mctx.W_mu,
                                                   mctx.W_m), a)

        @jax.jit
        def chain_sqr(a):
            return lax.fori_loop(
                0, K, lambda i, acc: pm2.mm2_sqr_p(acc, mctx.W_mu,
                                                   mctx.W_m), a)
        variants["sqr_v2_as_mul"] = lambda: chain_mul(a)
        variants["sqr_v2_sqr"] = lambda: chain_sqr(a)
    if "v3" in args.variants:
        from pailliercryptolib_python_tpu.ops import pallas_mont3 as pm3
        w3 = pm3.byte_weights(m, L)

        @jax.jit
        def chain3(a):
            return lax.fori_loop(
                0, K, lambda i, acc: pm3.mm3_sqr_p(acc, *w3, tb=args.tb), a)
        variants[f"sqr_v3_byte_tb{args.tb or pm3.tb_for(L)}"] = \
            lambda: chain3(a)
    run_variants(variants, oracle, B // 128, K)


def cmd_exp(args, rng):
    L, B, n_win = args.L, args.B, args.nwin
    m = rand_modulus(rng, L)
    R = 1 << (16 * L)
    ctx = mg.MontCtx.for_modulus(m, min_bits=16 * L - 2, mxu=False)
    baseints = rand_elems(rng, m, B)
    base = jnp.asarray(ints_to_limbs([x * R % m for x in baseints], L))
    digs = rng.integers(0, 16, size=(n_win, B)).astype(np.uint32)
    digs_j = jnp.asarray(digs)

    def oracle(got):
        def ref(j):
            e = 0
            for w in range(n_win):
                e = (e << 4) | int(digs[w, j])
            return pow(baseints[j], e, m) * (R % m) % m
        return all(g % m == ref(j) % m for j, g in enumerate(got[:2]))

    variants = {}
    if "v1" in args.variants:
        variants["exp_v1_cios"] = lambda: pm.mont_exp_p(
            base, digs_j, ctx.n_limbs, ctx.n0inv, ctx.one)
    if "v2" in args.variants:
        mctx = mm.MatmulMontCtx(m, L)
        variants["exp_v2_mm"] = lambda: pm2.mm2_exp_p(
            base, digs_j, mctx.W_mu, mctx.W_m, ctx.one)
    if "v3" in args.variants:
        from pailliercryptolib_python_tpu.ops import pallas_mont3 as pm3
        w3 = pm3.byte_weights(m, L)
        variants[f"exp_v3_byte_tb{args.tb or pm3.tb_for(L)}"] = \
            lambda: pm3.mm3_exp_p(base, digs_j, *w3, ctx.one, tb=args.tb)
    run_variants(variants, oracle, B // 128, n_win * 5, iters=3)


def cmd_expshared(args, rng):
    L, B, ebits, w = args.L, args.B, args.ebits, args.window
    m = rand_modulus(rng, L)
    R = 1 << (16 * L)
    ctx = mg.MontCtx.for_modulus(m, min_bits=16 * L - 2, mxu=False)
    baseints = rand_elems(rng, m, B)
    base = jnp.asarray(ints_to_limbs([x * R % m for x in baseints], L))
    e = int.from_bytes(rng.bytes(ebits // 8), "little") | (1 << (ebits - 1))
    nw = -(-ebits // w)
    dig = jnp.asarray(mg.exponent_digits([e], nw, w)[:, 0])

    def oracle(got):
        return all(g % m == pow(baseints[j], e, m) * (R % m) % m
                   for j, g in enumerate(got[:2]))

    variants = {}
    if "v2" in args.variants:
        mctx = mm.MatmulMontCtx(m, L)
        variants[f"expshared_v2_w{w}"] = lambda: pm2.mm2_exp_shared_p(
            base, dig, mctx.W_mu, mctx.W_m, ctx.one, window=w)
    if "v3" in args.variants:
        from pailliercryptolib_python_tpu.ops import pallas_mont3 as pm3
        w3 = pm3.byte_weights(m, L)
        variants[f"expshared_v3_w{w}_tb{args.tb or pm3.tb_for(L)}"] = \
            lambda: pm3.mm3_exp_shared_p(base, dig, *w3, ctx.one, window=w,
                                         tb=args.tb)
    if "rns" in args.variants:
        # the RNS-Montgomery engine (ops/rns.py + pallas_rns kernel):
        # enter once outside the timer, chain + SK exit + to_mont inside
        # so the oracle sees the same Montgomery-form contract
        from pailliercryptolib_python_tpu.ops import rns as rnsm
        mb = -(-m.bit_length() // 64) * 64
        rbase = rnsm.RnsBase.for_bits(mb)
        rkey = rnsm.RnsModulus.build(rbase, m, L)
        X = rnsm.rns_enter(base, rbase, rkey)
        X.block_until_ready()

        def run_rns():
            Z = rnsm.rns_exp_shared(X, dig, rbase, rkey, w)
            return mg.to_mont(rnsm.rns_exit(Z, rbase, rkey, ctx, L), ctx)

        variants[f"expshared_rns_w{w}_k{rbase.k}"] = run_rns
    if "rnssched" in args.variants:
        # sliding-window schedule chain — the production decrypt path
        from pailliercryptolib_python_tpu.ops import rns as rnsm
        from pailliercryptolib_python_tpu.ops import pallas_rns as prns
        mb = -(-m.bit_length() // 64) * 64
        rbase = rnsm.RnsBase.for_bits(mb)
        rkey = rnsm.RnsModulus.build(rbase, m, L)
        ws = prns.plan_sched(rbase.CH) or w
        sched = jnp.asarray(rnsm.sliding_schedule(e, ws, ebits))
        X = rnsm.rns_enter(base, rbase, rkey)
        X.block_until_ready()

        def run_sched():
            Z = rnsm.rns_exp_sched(X, sched, rbase, rkey, ws)
            return mg.to_mont(rnsm.rns_exit(Z, rbase, rkey, ctx, L), ctx)

        variants[f"expsched_rns_w{ws}_k{rbase.k}"] = run_sched
    nmod = nw * (w + 1)
    run_variants(variants, oracle, B // 128, nmod, iters=3)


def cmd_crt(args, rng):
    """Stage-by-stage decrypt profile at a fixed key."""
    from pailliercryptolib_python_tpu.models import paillier as sch
    from pailliercryptolib_python_tpu.utils.fixtures import fixed_key_ints

    kd = fixed_key_ints(args.bits, enable_DJN=True)
    pub = sch.PublicContext(kd["n"], kd["bits"], True, kd["hs"],
                            kd["randbits"])
    priv = sch.PrivateContext(pub, kd["p"], kd["q"])
    B = args.B
    vals = [int(v) for v in rng.integers(0, 2**60, size=B)]
    ct = pub.encrypt(vals, apply_obfuscator=False)
    ct.block_until_ready()
    print(f"key {args.bits}b  L(n^2)={pub.L}  Lh={priv.Lh}  Lq={priv.Lq}  "
          f"B={B}", flush=True)

    t0 = time.perf_counter()
    out = priv.decrypt_to_ints(ct, B)
    print(f"decrypt_to_ints cold: {time.perf_counter() - t0:.2f} s",
          flush=True)
    assert out[:B] == [v % kd['n'] for v in vals], "decrypt mismatch"
    t0 = time.perf_counter()
    priv.decrypt_to_ints(ct, B)
    total = time.perf_counter() - t0
    print(f"decrypt_to_ints warm: {total * 1e3:.0f} ms "
          f"({B / total:.0f} dec/s)", flush=True)

    # stage split
    for name, fn in priv.profile_stages(ct, B).items():
        t0 = time.perf_counter()
        r = fn()
        if hasattr(r, "block_until_ready"):
            r.block_until_ready()
        print(f"  {name}: {(time.perf_counter() - t0) * 1e3:.0f} ms",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["mul", "sqr", "exp", "expshared", "crt"])
    ap.add_argument("--L", type=int, default=257)
    ap.add_argument("--B", type=int, default=1024)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--nwin", type=int, default=256)
    ap.add_argument("--ebits", type=int, default=1024)
    ap.add_argument("--window", type=int, default=5)
    ap.add_argument("--bits", type=int, default=2048)
    ap.add_argument("--variants", type=lambda s: s.split(","),
                    default=["v1", "v2", "v3"])
    ap.add_argument("--tb", type=int, default=None)
    args = ap.parse_args()
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    rng = np.random.default_rng(1)
    {"mul": cmd_mul, "sqr": cmd_sqr, "exp": cmd_exp,
     "expshared": cmd_expshared, "crt": cmd_crt}[args.cmd](args, rng)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Micro-benchmark of CIOS Montgomery-multiply kernel variants on TPU.

Chains K dependent modmuls inside ONE kernel so per-launch and relay
overhead amortize away; reports ns per (L, 128)-tile modmul for each
variant.  Correctness is checked against Python ints.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from pailliercryptolib_python_tpu.ops.limb import int_to_limbs, limbs_to_ints  # noqa: E402
from pailliercryptolib_python_tpu.ops import montgomery as mg  # noqa: E402

MASK = 0xFFFF
L = 257
TB = 128
K = 32   # chained modmuls per kernel call


def _shift_down(x, d):
    return jnp.concatenate(
        [jnp.zeros((d,) + x.shape[1:], dtype=x.dtype), x[:-d]], axis=0)


def _norm_val(t):
    Kr = t.shape[0]
    v = (t & MASK) + _shift_down(t >> 16, 1)
    r = v & MASK
    G = (v >> 16).astype(jnp.uint32)
    P = (r == MASK).astype(jnp.uint32)
    d = 1
    while d < Kr:
        G = G | (P & _shift_down(G, d))
        P = P & _shift_down(P, d)
        d <<= 1
    return (r + _shift_down(G, 1)) & MASK


# ---------------------------------------------------------------- v0: current
def mm_v0(a, b, n, n0):
    tb = a.shape[-1]
    z1 = jnp.zeros((1, tb), jnp.uint32)
    z2 = jnp.zeros((2, tb), jnp.uint32)

    def body(_, carry):
        t, ar = carry
        ai = ar[0:1]
        p = ai * b
        t = (t
             + jnp.concatenate([p & MASK, z2], axis=0)
             + jnp.concatenate([z1, p >> 16, z1], axis=0))
        m = ((t[0:1] & MASK) * n0) & MASK
        q = m * n
        t = (t
             + jnp.concatenate([q & MASK, z2], axis=0)
             + jnp.concatenate([z1, q >> 16, z1], axis=0))
        c0 = t[0:1] >> 16
        t = jnp.concatenate([t[1:2] + c0, t[2:], z1], axis=0)
        ar = jnp.concatenate([ar[1:], ar[0:1]], axis=0)
        return t, ar

    t, _ = lax.fori_loop(0, L, body,
                         (jnp.zeros((L + 2, tb), jnp.uint32), a),
                         unroll=False)
    return _norm_val(t)[:L]


# ------------------------------------------------- v1: combined p+q, 1 shift
def mm_v1(a, b, n, n0):
    """Combine p and q lo/hi adds (they fit in 17 bits) to halve concats."""
    tb = a.shape[-1]
    z1 = jnp.zeros((1, tb), jnp.uint32)

    def body(_, carry):
        t, ar = carry                       # t: (L+2, tb)
        ai = ar[0:1]
        p = ai * b                          # (L, tb)
        m = (((t[0:1] + p[0:1]) & MASK) * n0) & MASK
        q = m * n                           # (L, tb)
        lo = (p & MASK) + (q & MASK)        # <= 2^17
        hi = (p >> 16) + (q >> 16)
        contrib = (jnp.concatenate([lo, z1], axis=0)
                   + jnp.concatenate([z1, hi], axis=0))   # (L+1, tb)
        t = t + jnp.concatenate([contrib, z1], axis=0)
        c0 = t[0:1] >> 16
        t = jnp.concatenate([t[1:2] + c0, t[2:], z1], axis=0)
        ar = jnp.concatenate([ar[1:], ar[0:1]], axis=0)
        return t, ar

    t, _ = lax.fori_loop(0, L, body,
                         (jnp.zeros((L + 2, tb), jnp.uint32), a),
                         unroll=False)
    return _norm_val(t)[:L]


# ----------------------------------------------- v2: v1 with pltpu.roll shift
def mm_v2(a, b, n, n0):
    tb = a.shape[-1]
    z1 = jnp.zeros((1, tb), jnp.uint32)
    row_l1 = (jax.lax.broadcasted_iota(jnp.int32, (L + 2, tb), 0) < L + 1)

    def body(_, carry):
        t, ar = carry
        ai = ar[0:1]
        p = ai * b
        m = (((t[0:1] + p[0:1]) & MASK) * n0) & MASK
        q = m * n
        lo = (p & MASK) + (q & MASK)
        hi = (p >> 16) + (q >> 16)
        contrib = (jnp.concatenate([lo, z1], axis=0)
                   + jnp.concatenate([z1, hi], axis=0))
        t = t + jnp.concatenate([contrib, z1], axis=0)
        c0 = t[0:1] >> 16
        t = pltpu.roll(t, -1, 0)            # row k+1 -> row k
        t = jnp.where(row_l1, t, 0)
        t = t + jnp.concatenate([c0, jnp.zeros((L + 1, tb), jnp.uint32)],
                                axis=0)
        ar = pltpu.roll(ar, -1, 0)
        return t, ar

    t, _ = lax.fori_loop(0, L, body,
                         (jnp.zeros((L + 2, tb), jnp.uint32), a),
                         unroll=False)
    return _norm_val(t)[:L]


# -------------------------------------- v3: sliding-window scratch (SOS-CIOS)
def mm_v3_kernel_chain(a_ref, b_ref, n_ref, n0_ref, o_ref, t_ref):
    """K chained squarish muls: o = a * b^(chain) with sliding scratch."""
    n = n_ref[...]
    n0 = n0_ref[0:1, :]
    tb = n.shape[-1]
    z1 = jnp.zeros((1, tb), jnp.uint32)

    def one_mul(a, b):
        # a, b values (L, tb).  t scratch rows [0, 2L+2).
        t_ref[...] = jnp.zeros((2 * L + 2, tb), jnp.uint32)

        def body(i, _):
            ai = lax.dynamic_slice_in_dim(a, 0, 1, axis=0)  # placeholder
            return _

        # Mosaic cannot dynamic-slice a value: write a into scratch? use
        # rotate trick for `a` but sliding window for t.
        def body2(i, ar):
            ai = ar[0:1]
            ti = t_ref[pl.ds(i, 1), :]
            p = ai * b
            m = (((ti + p[0:1]) & MASK) * n0) & MASK
            q = m * n
            lo = (p & MASK) + (q & MASK)
            hi = (p >> 16) + (q >> 16)
            contrib = (jnp.concatenate([lo, z1], axis=0)
                       + jnp.concatenate([z1, hi], axis=0))  # (L+1, tb)
            win = t_ref[pl.ds(i, L + 1), :]
            win = win + contrib
            c0 = win[0:1] >> 16
            t_ref[pl.ds(i, L + 1), :] = win
            t_ref[pl.ds(i + 1, 1), :] = t_ref[pl.ds(i + 1, 1), :] + c0
            return jnp.concatenate([ar[1:], ar[0:1]], axis=0)

        lax.fori_loop(0, L, body2, a, unroll=False)
        return _norm_val(t_ref[pl.ds(L, L + 2), :])[:L]

    def chain(_, acc):
        return one_mul(acc, b_ref[...])

    o_ref[...] = lax.fori_loop(0, K, chain, a_ref[...], unroll=False)


def chain_call_v3(a, b, n, n0):
    return pl.pallas_call(
        mm_v3_kernel_chain,
        out_shape=jax.ShapeDtypeStruct((L, TB), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * L + 2, TB), jnp.uint32)],
    )(a, b, n, n0)


def make_chain(mm):
    def kernel(a_ref, b_ref, n_ref, n0_ref, o_ref):
        b = b_ref[...]
        n = n_ref[...]
        n0 = n0_ref[0:1, :]

        def body(_, acc):
            return mm(acc, b, n, n0)

        o_ref[...] = lax.fori_loop(0, K, body, a_ref[...], unroll=False)

    def call(a, b, n, n0):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, TB), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b, n, n0)

    return call


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(42)

    # 4096-bit odd modulus (n^2-sized), Walter slack already in L=257.
    nsq = (int.from_bytes(rng.bytes(512), "little") | 1)
    nsq |= (1 << 4095)
    nsq = nsq % (1 << 4096)
    R = 1 << (16 * L)
    assert 4 * nsq < R
    n0 = (-pow(nsq, -1, 1 << 16)) % (1 << 16)

    avals = [int.from_bytes(rng.bytes(500), "little") % nsq for _ in range(TB)]
    bvals = [int.from_bytes(rng.bytes(500), "little") % nsq for _ in range(TB)]

    a = jnp.asarray(np.stack([int_to_limbs(v, L) for v in avals], axis=1))
    b = jnp.asarray(np.stack([int_to_limbs(v, L) for v in bvals], axis=1))
    n = jnp.asarray(np.stack([int_to_limbs(nsq, L)] * TB, axis=1))
    n0a = jnp.asarray(np.full((1, TB), n0, dtype=np.uint32))

    # oracle: K chained montgomery products
    Rinv = pow(R, -1, nsq)
    expect = []
    for j in range(TB):
        acc = avals[j]
        for _ in range(K):
            acc = acc * bvals[j] * Rinv % nsq
        expect.append(acc)

    variants = {
        "v0_current": make_chain(mm_v0),
        "v1_combined": make_chain(mm_v1),
        "v2_roll": make_chain(mm_v2),
        "v3_sliding": chain_call_v3,
    }
    sel = sys.argv[1:] or list(variants)
    for name in sel:
        call = variants[name]
        try:
            fn = jax.jit(call)
            out = np.asarray(fn(a, b, n, n0a))
            got = limbs_to_ints(out % (1 << 16))
            ok = all((g == e or g == e + nsq) for g, e in zip(got, expect))
            # warmup done; time
            t0 = time.perf_counter()
            ITER = 4
            for _ in range(ITER):
                r = fn(a, b, n, n0a)
            np.asarray(r[:1, :8])
            dt = (time.perf_counter() - t0) / ITER
            per_mm = dt / K
            print(f"{name}: ok={ok}  {per_mm * 1e6:.1f} us/modmul "
                  f"({dt * 1e3:.1f} ms per {K}-chain)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()

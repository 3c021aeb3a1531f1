#!/usr/bin/env python3
"""Kernel experiments: minimal deltas from the production (v0) CIOS
formulation, which Mosaic compiles well (55 us/tile-modmul at L=257).

Round-1 findings (from the two earlier generations of this file, now
consolidated here):
  * v0 CIOS (rotate-operand, concat-padded adds) compiles to
    ~55 us per (257, 128)-tile modmul — the kernel is VMEM-pass-bound
    (~5-6 full (L, TB) array passes per CIOS iteration).
  * fori_loop unroll=2 and reading accumulator rows from refs via pl.ds
    (instead of the rotate copy) were within noise of v0.
  * Wider batch tiles (L, 256)+ roughly double wall time per element —
    VMEM pressure in the deep loop outweighs per-step amortization.

chain_C    : v0 body, but accumulator rows read from o_ref via pl.ds
             (drops the per-iteration (L,TB) rotate copy).
chain_U2   : v0 verbatim with fori_loop(unroll=2).
exp_C      : exp kernel where each modmul writes the multiplicand into a
             VMEM scratch once and reads rows via pl.ds (drops rotate).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from pailliercryptolib_python_tpu.ops import pallas_mont as pm  # noqa: E402
from pailliercryptolib_python_tpu.ops.limb import (  # noqa: E402
    int_to_limbs, limbs_to_ints)

MASK = 0xFFFF


def mm_rows_from_ref(a_ref, row0, b, n, n0, L):
    """v0 CIOS body, `a` rows read from a_ref[row0 + i] (no rotate)."""
    tb = b.shape[-1]
    z1 = jnp.zeros((1, tb), jnp.uint32)
    z2 = jnp.zeros((2, tb), jnp.uint32)

    def body(i, t):
        ai = a_ref[pl.ds(row0 + i, 1), :]
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
        return t

    t = lax.fori_loop(0, L, body, jnp.zeros((L + 2, tb), jnp.uint32),
                      unroll=False)
    return pm._norm_val(t)[:L]


def mm_v0_unroll(a, b, n, n0, L, unroll):
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
                         unroll=unroll)
    return pm._norm_val(t)[:L]


# ------------------------------------------------------------ chain kernels
def chain_kernel_C(f_ref, a0_ref, n_ref, n0_ref, o_ref):
    L = a0_ref.shape[0]
    w = pl.program_id(1)

    @pl.when(w == 0)
    def _():
        o_ref[...] = a0_ref[...]

    o_ref[...] = mm_rows_from_ref(o_ref, 0, f_ref[0], n_ref[...],
                                  n0_ref[0:1, :], L)


def make_chain_U(unroll):
    def kernel(f_ref, a0_ref, n_ref, n0_ref, o_ref):
        L = a0_ref.shape[0]
        w = pl.program_id(1)

        @pl.when(w == 0)
        def _():
            o_ref[...] = a0_ref[...]

        o_ref[...] = mm_v0_unroll(o_ref[...], f_ref[0], n_ref[...],
                                  n0_ref[0:1, :], L, unroll)

    return kernel


def make_chain_call(kernel):
    def call(factors, acc0, n, n0):
        n_win, L, B = factors.shape
        TB = 128
        n0r = jnp.broadcast_to(jnp.asarray(n0).reshape(1, -1),
                               (1, B)).astype(jnp.uint32)
        bs = lambda: pl.BlockSpec((L, TB), lambda j, w: (0, j),
                                  memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
            grid=(B // TB, n_win),
            in_specs=[
                pl.BlockSpec((1, L, TB), lambda j, w: (w, 0, j),
                             memory_space=pltpu.VMEM),
                bs(), bs(),
                pl.BlockSpec((1, TB), lambda j, w: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=bs(),
        )(factors, acc0, jnp.broadcast_to(n, (L, B)), n0r)

    return call


# -------------------------------------------------------------- exp kernels
def exp_kernel_C(ws_ref, dig_ref, base_ref, n_ref, n0_ref, one_ref, o_ref,
                 a_scr):
    L = base_ref.shape[0]
    n = n_ref[...]
    n0 = n0_ref[0:1, :]
    base = base_ref[...]
    one = one_ref[...]
    n_win = dig_ref.shape[0]

    def mm(a_val, b_val):
        a_scr[...] = a_val
        return mm_rows_from_ref(a_scr, 0, b_val, n, n0, L)

    entries = [one, base]
    for _ in range(14):
        entries.append(mm(entries[-1], base))
    table = jnp.stack(entries, axis=0)

    def wbody(j, acc):
        for _ in range(4):
            acc = mm(acc, acc)
        dig = dig_ref[pl.ds(j, 1), :]
        sel = jnp.zeros_like(acc)
        for d in range(16):
            sel = sel + jnp.where(dig == d, table[d], 0)
        return mm(acc, sel)

    o_ref[...] = lax.fori_loop(ws_ref[0], n_win, wbody, one)


def make_exp_call(kernel, scratch=True):
    def call(base, digits, n, n0, one):
        L, B = base.shape
        n_win = digits.shape[0]
        TB = 128
        n0r = jnp.broadcast_to(jnp.asarray(n0).reshape(1, -1),
                               (1, B)).astype(jnp.uint32)
        ws = jnp.asarray([0], dtype=jnp.int32)
        bs = lambda: pl.BlockSpec((L, TB), lambda j, ws: (0, j),
                                  memory_space=pltpu.VMEM)
        scr = [pltpu.VMEM((L, TB), jnp.uint32)] if scratch else []
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec((n_win, TB), lambda j, ws: (0, j),
                             memory_space=pltpu.VMEM),
                bs(), bs(),
                pl.BlockSpec((1, TB), lambda j, ws: (0, j),
                             memory_space=pltpu.VMEM),
                bs(),
            ],
            out_specs=bs(),
            scratch_shapes=scr,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
            grid_spec=grid_spec,
        )(ws, digits, base, jnp.broadcast_to(n, (L, B)), n0r, one)

    return call


def timeit(fn, iters=3):
    out = fn()
    np.asarray(out[:1, :8])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out[:1, :8])
    return (time.perf_counter() - t0) / iters


def main():
    which = sys.argv[1:] or ["chain", "exp"]
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(1)

    if "chain" in which or "chainU" in which:
        L, B, n_win = 257, 1024, 86
        nsq = int.from_bytes(rng.bytes(511), "little") | (1 << 4087) | 1
        R = 1 << (16 * L)
        assert 4 * nsq < R
        n0 = (-pow(nsq, -1, 1 << 16)) % (1 << 16)
        n = jnp.asarray(int_to_limbs(nsq, L)[:, None])
        facs = np.empty((n_win, L, B), dtype=np.uint32)
        fints = [[int.from_bytes(rng.bytes(500), "little") % nsq
                  for _ in range(B)] for _ in range(n_win)]
        for w in range(n_win):
            for j in range(B):
                facs[w, :, j] = int_to_limbs(fints[w][j], L)
        facs = jnp.asarray(facs)
        a0ints = [int.from_bytes(rng.bytes(500), "little") % nsq
                  for _ in range(B)]
        a0 = jnp.asarray(np.stack([int_to_limbs(v, L) for v in a0ints], 1))
        n0a = np.uint32(n0) * np.ones((B,), np.uint32)

        Rinv = pow(R, -1, nsq)

        def oracle(j):
            acc = a0ints[j]
            for w in range(n_win):
                acc = acc * fints[w][j] * Rinv % nsq
            return acc

        variants = {}
        if "chain" in which:
            variants["chain_prod"] = lambda: pm.mont_chain_p(
                facs, a0, n, jnp.asarray(n0a))
            variants["chain_C"] = lambda: jax.jit(
                make_chain_call(chain_kernel_C))(facs, a0, n, n0a)
        if "chainU" in which:
            variants["chain_U2"] = lambda: jax.jit(
                make_chain_call(make_chain_U(2)))(facs, a0, n, n0a)
        for name, fn in variants.items():
            try:
                out = np.asarray(fn())
                got = limbs_to_ints(out)[:2]
                ok = all(g % nsq == oracle(j) for j, g in enumerate(got))
                dt = timeit(fn)
                per = dt / (n_win * (B // 128))
                print(f"{name}: ok={ok}  {dt * 1e3:.1f} ms "
                      f"({per * 1e6:.1f} us/tile-modmul, "
                      f"{B / dt:.0f} enc-chains/s)", flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                      flush=True)

    if "exp" in which:
        L, B, n_win = 129, 2048, 256
        mod = int.from_bytes(rng.bytes(255), "little") | (1 << 2039) | 1
        R = 1 << (16 * L)
        assert 4 * mod < R
        n0 = (-pow(mod, -1, 1 << 16)) % (1 << 16)
        n = jnp.asarray(int_to_limbs(mod, L)[:, None])
        one = jnp.asarray(int_to_limbs(R % mod, L)[:, None])
        baseints = [int.from_bytes(rng.bytes(250), "little") % mod
                    for _ in range(B)]
        base = jnp.asarray(np.stack([int_to_limbs(v, L) for v in baseints], 1))
        digs = rng.integers(0, 16, size=(n_win, B)).astype(np.uint32)
        digs_j = jnp.asarray(digs)
        n0a = np.uint32(n0) * np.ones((B,), np.uint32)
        onef = jnp.broadcast_to(one, (L, B))

        def oracle(j):
            e = 0
            for w in range(n_win):
                e = (e << 4) | int(digs[w, j])
            return pow(baseints[j], e, mod) * (R % mod) % mod

        variants = {
            "exp_prod": lambda: pm.mont_exp_p(base, digs_j, n,
                                              jnp.asarray(n0a), one),
            "exp_C": lambda: jax.jit(make_exp_call(exp_kernel_C))(
                base, digs_j, n, n0a, onef),
        }
        for name, fn in variants.items():
            try:
                out = np.asarray(fn())
                got = limbs_to_ints(out)[:2]
                ok = all(g % mod == oracle(j) % mod for j, g in enumerate(got))
                dt = timeit(fn)
                nmm = n_win * 5 * (B // 128)
                print(f"{name}: ok={ok}  {dt * 1e3:.1f} ms "
                      f"({dt / nmm * 1e6:.1f} us/tile-modmul, "
                      f"{B / dt:.0f} exp/s)", flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                      flush=True)


if __name__ == "__main__":
    main()

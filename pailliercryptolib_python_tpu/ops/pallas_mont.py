"""Pallas TPU kernels for batched Montgomery arithmetic — the hot path.

The pure-jnp CIOS loop in montgomery.py dispatches ~L XLA ops per modmul;
at 2048-bit (L=257) the per-iteration launch overhead dominates wall
clock.  These kernels run the ENTIRE modular exponentiation as one
Mosaic kernel: operands live in VMEM, the CIOS recurrence runs in
registers, and carry resolution is the deterministic Kogge-Stone pass
(see limb.normalize) — no data-dependent loops anywhere.

This is the TPU replacement for the reference backend's hottest code,
IPP-Crypto's `mbx_exp_mb8` 8-buffer AVX512IFMA modexp
(/root/reference/README.md:32): 8 Xeon IFMA lanes become 128 TPU vector
lanes per tile, tiled over the batch by the Pallas grid.

Kernels:
  * mont_mul_p       — one Montgomery product        (HE add, misc)
  * mont_exp_p       — full fixed-window (w=4) modexp with in-kernel
                       table build and one-hot table selection
                       (CRT decrypt, ct*pt)
  * mont_chain_p     — fold modmuls over a factor axis (fixed-base comb
                       encrypt: factors pre-gathered by XLA)

All kernels take canonical 16-bit limbs in uint32[L, B] (limbs-major),
values < 2n with R > 4n (Walter) and return the same form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = 0xFFFF  # plain literal: jnp scalars would be captured consts in kernels

# Batch tile sizes (lanes).  Measured on v5e: one lane width (128) beats
# wider tiles — (L, 256)+ blocks roughly double wall time per element
# (register/VMEM pressure in the deep CIOS loop outweighs any per-step
# amortization).
TB_MUL = 128
TB_EXP = 128

# Flip to True to run kernels in the Pallas interpreter (CPU correctness
# tests exercise the exact kernel code without TPU hardware).
INTERPRET = False


def _shift_down(x, d):
    return jnp.concatenate(
        [jnp.zeros((d,) + x.shape[1:], dtype=x.dtype), x[:-d]], axis=0)


def _norm_val(t):
    """Kogge-Stone carry normalization on a redundant (K, TB) value."""
    K = t.shape[0]
    v = (t & MASK) + _shift_down(t >> 16, 1)
    r = v & MASK
    G = (v >> 16).astype(jnp.uint32)
    P = (r == MASK).astype(jnp.uint32)
    d = 1
    while d < K:
        G = G | (P & _shift_down(G, d))
        P = P & _shift_down(P, d)
        d <<= 1
    return (r + _shift_down(G, 1)) & MASK


def _mm_val(a, b, n, n0, L):
    """CIOS Montgomery product on (L, TB) values. Result < 2n, canonical.

    Mosaic cannot lower dynamic_slice on values, so instead of indexing
    a[i] the loop rotates `a` one limb per iteration and always reads row
    0 — a static slice.  All other updates are static-slice at-ops.
    """
    tb = a.shape[-1]
    z1 = jnp.zeros((1, tb), jnp.uint32)
    z2 = jnp.zeros((2, tb), jnp.uint32)

    # All updates are expressed as full-width adds of concat-padded arrays
    # (Mosaic lowers neither dynamic_slice nor scatter-add on values).
    def body(_, carry):
        t, ar = carry                                      # t: (L+2, tb)
        ai = ar[0:1]                                       # (1, tb)
        p = ai * b                                         # (L, tb)
        t = (t
             + jnp.concatenate([p & MASK, z2], axis=0)
             + jnp.concatenate([z1, p >> 16, z1], axis=0))
        m = ((t[0:1] & MASK) * n0) & MASK                  # (1, tb)
        q = m * n
        t = (t
             + jnp.concatenate([q & MASK, z2], axis=0)
             + jnp.concatenate([z1, q >> 16, z1], axis=0))
        c0 = t[0:1] >> 16
        t = jnp.concatenate([t[1:2] + c0, t[2:], z1], axis=0)
        ar = jnp.concatenate([ar[1:], ar[0:1]], axis=0)    # rotate up
        return t, ar

    t, _ = lax.fori_loop(0, L, body,
                         (jnp.zeros((L + 2, tb), jnp.uint32), a),
                         unroll=False)
    return _norm_val(t)[:L]


# ---------------------------------------------------------------------------
# Kernel 1: single Montgomery product.
# ---------------------------------------------------------------------------

def _mont_mul_kernel(a_ref, b_ref, n_ref, n0_ref, o_ref):
    L = a_ref.shape[0]
    o_ref[...] = _mm_val(a_ref[...], b_ref[...], n_ref[...],
                         n0_ref[0:1, :], L)


def _pad_to(x, BP):
    if x.shape[-1] == BP:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, BP - x.shape[-1])]
    return jnp.pad(x, pad)


@jax.jit
def mont_mul_p(a, b, n, n0):
    """a, b: (L, Ba)/(L, Bb) uint32 (broadcast internally); n: (L, ·);
    n0: (B,) or (1,)."""
    L = a.shape[0]
    B = max(a.shape[1], b.shape[1], n.shape[1] if n.ndim == 2 else 1)
    TB = min(TB_MUL, -(-B // 128) * 128)
    BP = -(-B // TB) * TB
    a = _pad_to(jnp.broadcast_to(a, (L, B)), BP)
    b = _pad_to(jnp.broadcast_to(b, (L, B)), BP)
    n = _pad_to(jnp.broadcast_to(n, (L, B)), BP)
    n0r = _pad_to(jnp.broadcast_to(n0.reshape(1, -1), (1, B)), BP).astype(jnp.uint32)
    bs = lambda: pl.BlockSpec((L, TB), lambda j: (0, j),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((L, BP), jnp.uint32),
        grid=(BP // TB,),
        in_specs=[bs(), bs(), bs(),
                  pl.BlockSpec((1, TB), lambda j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=bs(),
        interpret=INTERPRET,
    )(a, b, n, n0r)
    return out[:, :B]


# ---------------------------------------------------------------------------
# Kernel 2: full fixed-window (w=4) modular exponentiation.
# ---------------------------------------------------------------------------

def _mont_exp_kernel(win_start_ref, dig_ref, base_ref, n_ref, n0_ref,
                     one_ref, o_ref):
    L = base_ref.shape[0]
    n = n_ref[...]
    n0 = n0_ref[0:1, :]
    base = base_ref[...]
    one = one_ref[...]
    n_win = dig_ref.shape[0]

    # table T[d] = base^d, d in [0, 16)
    entries = [one, base]
    for _ in range(14):
        entries.append(_mm_val(entries[-1], base, n, n0, L))
    table = jnp.stack(entries, axis=0)                     # (16, L, tb)

    def wbody(j, acc):
        for _ in range(4):
            acc = _mm_val(acc, acc, n, n0, L)
        dig = dig_ref[pl.ds(j, 1), :]                      # (1, tb)
        # one-hot select across the 16 entries (per-lane gather-free)
        sel = jnp.zeros_like(acc)
        for d in range(16):
            sel = sel + jnp.where(dig == d, table[d], 0)
        return _mm_val(acc, sel, n, n0, L)

    acc = lax.fori_loop(win_start_ref[0], n_win, wbody, one)
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("win_start",))
def mont_exp_p(base, digits, n, n0, one, win_start=0):
    """base^e for per-element 4-bit-window exponents, one kernel call.

    base, n, one: (L, B); digits: (n_win, B) MSB-first; n0: (B,) or (1,).
    """
    L = base.shape[0]
    B = max(base.shape[1], digits.shape[1],
            n.shape[1] if n.ndim == 2 else 1)
    n_win = digits.shape[0]
    TB = min(TB_EXP, -(-B // 128) * 128)
    BP = -(-B // TB) * TB
    base = _pad_to(jnp.broadcast_to(base, (L, B)), BP)
    n = _pad_to(jnp.broadcast_to(n, (L, B)), BP)
    one = _pad_to(jnp.broadcast_to(one, (L, B)), BP)
    n0r = _pad_to(jnp.broadcast_to(jnp.asarray(n0).reshape(1, -1), (1, B)),
                  BP).astype(jnp.uint32)
    digits = _pad_to(jnp.broadcast_to(digits, (n_win, B)), BP).astype(jnp.uint32)
    ws = jnp.asarray([win_start], dtype=jnp.int32)

    # index maps receive the scalar-prefetch ref as a trailing arg
    bs = lambda: pl.BlockSpec((L, TB), lambda j, ws: (0, j),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BP // TB,),
        in_specs=[
            pl.BlockSpec((n_win, TB), lambda j, ws: (0, j),
                         memory_space=pltpu.VMEM),
            bs(), bs(),
            pl.BlockSpec((1, TB), lambda j, ws: (0, j),
                         memory_space=pltpu.VMEM),
            bs(),
        ],
        out_specs=bs(),
    )
    out = pl.pallas_call(
        _mont_exp_kernel,
        out_shape=jax.ShapeDtypeStruct((L, BP), jnp.uint32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(ws, digits, base, n, n0r, one)
    return out[:, :B]


# ---------------------------------------------------------------------------
# Kernel 3: product chain over pre-gathered factors (fixed-base encrypt).
# ---------------------------------------------------------------------------

def _mont_chain_kernel(f_ref, a0_ref, n_ref, n0_ref, o_ref):
    L = a0_ref.shape[0]
    w = pl.program_id(1)

    @pl.when(w == 0)
    def _():
        o_ref[...] = a0_ref[...]

    o_ref[...] = _mm_val(o_ref[...], f_ref[0], n_ref[...], n0_ref[0:1, :], L)


@jax.jit
def mont_chain_p(factors, acc0, n, n0):
    """acc0 * prod_j factors[j] — factors: (n_win, L, B); acc0: (L, B)."""
    n_win, L, B = factors.shape
    TB = min(TB_MUL, -(-B // 128) * 128)
    BP = -(-B // TB) * TB
    factors = _pad_to(factors, BP)
    acc0 = _pad_to(acc0, BP)
    n = _pad_to(jnp.broadcast_to(n, (L, B)), BP)
    n0r = _pad_to(jnp.broadcast_to(jnp.asarray(n0).reshape(1, -1), (1, B)),
                  BP).astype(jnp.uint32)
    bs = lambda: pl.BlockSpec((L, TB), lambda j, w: (0, j),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mont_chain_kernel,
        out_shape=jax.ShapeDtypeStruct((L, BP), jnp.uint32),
        grid=(BP // TB, n_win),
        in_specs=[
            pl.BlockSpec((1, L, TB), lambda j, w: (w, 0, j),
                         memory_space=pltpu.VMEM),
            bs(), bs(),
            pl.BlockSpec((1, TB), lambda j, w: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=bs(),
        interpret=INTERPRET,
    )(factors, acc0, n, n0r)
    return out[:, :B]

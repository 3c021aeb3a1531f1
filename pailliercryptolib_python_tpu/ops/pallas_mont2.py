"""Fused matmul-Montgomery Pallas kernel (v2) — MXU-assisted modmul.

Implements ops.matmul_mont's algorithm as ONE Mosaic kernel per modmul:

  1. product   T = a*b        — VPU schoolbook into a VMEM scratch with
                                dynamic-offset accumulation (~3 array
                                passes per limb vs CIOS's ~5.5)
  2. reduce    q = T*mu mod R — int8 nibble matmul on the MXU
     (shared Toeplitz weights resident in VMEM across the grid)
  3. multiply  q*m            — second int8 matmul on the MXU
  4. combine   (T + q*m)/R    — VPU recombine + Kogge-Stone carry pass

Requires a SHARED modulus per kernel tile (encrypt: n^2; decrypt: p^2
and q^2 halves run as separate calls) — the per-element-moduli CIOS
kernels in pallas_mont.py remain the fallback.

Bounds: inputs < 2m canonical, R = 2^(16L) > 4m (Walter) => output < 2m;
every intermediate fits uint32/int32 exactly (see matmul_mont.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mont import _norm_val

MASK = 0xFFFF
TB = 128
INTERPRET = False


def _nibble_blocks_val(x, blocks):
    """(K, tb) u32 -> (blocks*K, tb) int8 block-nibble layout."""
    return jnp.concatenate(
        [((x >> (4 * u)) & 15).astype(jnp.int8) for u in range(blocks)],
        axis=0)


def _recombine_val(y, out_limbs):
    """(4*T, tb) int32 block layout -> (T, tb) u32 redundant limbs."""
    acc = y[:out_limbs].astype(jnp.uint32)
    for v in range(1, 4):
        acc = acc + (y[v * out_limbs:(v + 1) * out_limbs]
                     .astype(jnp.uint32) << (4 * v))
    return acc


PROD_UNROLL = 8
# The pre-shifted fused product wins below this limb count (measured:
# 1.9x at L=129) but regresses badly at L=257 — Mosaic's elementwise
# fusion appears to fall apart once operands exceed ~256 sublanes.
# Larger moduli use the shifted-concat block accumulation instead.
# The exact cutoff between the measured points (129 good, 257 bad) is
# unprobed; it also gates the squaring specialization, and L=194 (the
# 3072-bit CRT half) sits just above the default — env-tunable for A/B.
import os as _os
PRESHIFT_MAX_L = int(_os.environ.get("PAILLIER_PRESHIFT_MAX_L", "192"))


def _mm2_product_preshift(a_val, b_val, t_scr, L):
    """Schoolbook T = a*b into t_scr (u32 scratch, zeroed here).

    The U multiplies of each block accumulate into ALIGNED partial sums:
    `b` is pre-shifted by u rows ONCE per product (U padded copies b_u),
    so p_u = a[i+u] * b_u lands at its final sublane offset and the
    S_lo/S_hi accumulation chains are same-shape elementwise ops Mosaic
    fuses — no per-term shifted concats.  The hi parts share ONE uniform
    +1-row shift at the window update.  ~(1 + 2/U) array passes per
    multiply.

    Bound: every scratch limb gains < 2^17 per contributing multiply and
    <= L multiplies cross it => < 2^25, exact in uint32."""
    U = PROD_UNROLL
    tb = b_val.shape[-1]
    nblk = -(-L // U)
    LU = nblk * U
    if LU != L:
        a_val = jnp.concatenate(
            [a_val, jnp.zeros((LU - L, tb), jnp.uint32)], axis=0)
    t_scr[...] = jnp.zeros_like(t_scr)
    z1 = jnp.zeros((1, tb), jnp.uint32)

    # pre-shifted operands: b_u = b << (16*u limbs), all (L+U, tb)
    b_sh = []
    for u in range(U):
        parts = []
        if u:
            parts.append(jnp.zeros((u, tb), jnp.uint32))
        parts.append(b_val)
        if U - u:
            parts.append(jnp.zeros((U - u, tb), jnp.uint32))
        b_sh.append(jnp.concatenate(parts, axis=0))

    def body(i, ar):
        p0 = ar[0:1] * b_sh[0]
        s_lo = p0 & MASK
        s_hi = p0 >> 16
        for u in range(1, U):
            p = ar[u:u + 1] * b_sh[u]                  # (L+U, tb), aligned
            s_lo = s_lo + (p & MASK)
            s_hi = s_hi + (p >> 16)
        off = i * U
        win = t_scr[pl.ds(off, L + U + 1), :]
        t_scr[pl.ds(off, L + U + 1), :] = (
            win
            + jnp.concatenate([s_lo, z1], axis=0)
            + jnp.concatenate([z1, s_hi], axis=0))
        return jnp.concatenate([ar[U:], ar[:U]], axis=0)

    lax.fori_loop(0, nblk, body, a_val, unroll=False)
    return _norm_val(t_scr[...])[:2 * L]               # canonical


def _mm2_product_blocked(a_val, b_val, t_scr, L):
    """Schoolbook T = a*b via shifted-concat block accumulation (the
    large-L formulation; see PRESHIFT_MAX_L)."""
    U = PROD_UNROLL
    tb = b_val.shape[-1]
    nblk = -(-L // U)
    LU = nblk * U
    if LU != L:
        a_val = jnp.concatenate(
            [a_val, jnp.zeros((LU - L, tb), jnp.uint32)], axis=0)
    t_scr[...] = jnp.zeros_like(t_scr)

    def shifted(p, off, total):
        parts = []
        if off:
            parts.append(jnp.zeros((off, tb), jnp.uint32))
        parts.append(p)
        tail = total - off - p.shape[0]
        if tail:
            parts.append(jnp.zeros((tail, tb), jnp.uint32))
        return parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=0)

    def body(i, ar):
        partial = jnp.zeros((L + U + 1, tb), jnp.uint32)
        for u in range(U):
            p = ar[u:u + 1] * b_val                    # (L, tb)
            partial = (partial
                       + shifted(p & MASK, u, L + U + 1)
                       + shifted(p >> 16, u + 1, L + U + 1))
        off = i * U
        win = t_scr[pl.ds(off, L + U + 1), :]
        t_scr[pl.ds(off, L + U + 1), :] = win + partial
        return jnp.concatenate([ar[U:], ar[:U]], axis=0)

    lax.fori_loop(0, nblk, body, a_val, unroll=False)
    return _norm_val(t_scr[...])[:2 * L]               # canonical


def _mm2_product_preshift_seg(a_val, b_val, t_scr, L, seg=128):
    """Pre-shifted product with the accumulation chains chunked into
    <=seg-sublane segments (large-L variant: monolithic >256-sublane
    elementwise chains de-fuse in Mosaic — see PRESHIFT_MAX_L)."""
    U = PROD_UNROLL
    tb = b_val.shape[-1]
    nblk = -(-L // U)
    LU = nblk * U
    if LU != L:
        a_val = jnp.concatenate(
            [a_val, jnp.zeros((LU - L, tb), jnp.uint32)], axis=0)
    t_scr[...] = jnp.zeros_like(t_scr)
    z1 = jnp.zeros((1, tb), jnp.uint32)

    b_sh = []
    for u in range(U):
        parts = []
        if u:
            parts.append(jnp.zeros((u, tb), jnp.uint32))
        parts.append(b_val)
        if U - u:
            parts.append(jnp.zeros((U - u, tb), jnp.uint32))
        b_sh.append(jnp.concatenate(parts, axis=0))

    tot = L + U
    bounds = [(s0, min(tot, s0 + seg)) for s0 in range(0, tot, seg)]

    def body(i, ar):
        lo_segs, hi_segs = [], []
        for s0, s1 in bounds:
            p0 = ar[0:1] * b_sh[0][s0:s1]
            lo = p0 & MASK
            hi = p0 >> 16
            for u in range(1, U):
                p = ar[u:u + 1] * b_sh[u][s0:s1]
                lo = lo + (p & MASK)
                hi = hi + (p >> 16)
            lo_segs.append(lo)
            hi_segs.append(hi)
        s_lo = jnp.concatenate(lo_segs, axis=0)
        s_hi = jnp.concatenate(hi_segs, axis=0)
        off = i * U
        win = t_scr[pl.ds(off, tot + 1), :]
        t_scr[pl.ds(off, tot + 1), :] = (
            win
            + jnp.concatenate([s_lo, z1], axis=0)
            + jnp.concatenate([z1, s_hi], axis=0))
        return jnp.concatenate([ar[U:], ar[:U]], axis=0)

    lax.fori_loop(0, nblk, body, a_val, unroll=False)
    return _norm_val(t_scr[...])[:2 * L]               # canonical


def _mm2_product(a_val, b_val, t_scr, L):
    if L <= PRESHIFT_MAX_L:
        return _mm2_product_preshift(a_val, b_val, t_scr, L)
    return _mm2_product_preshift_seg(a_val, b_val, t_scr, L)


def sqr_scratch_limbs(L):
    """Scratch sublanes needed by _mm2_square (>= the product's)."""
    U = PROD_UNROLL
    nblk = -(-L // U)
    return 2 * nblk * U + 2 * U + 2


def exp_scratch_limbs(L):
    """Scratch sublanes for the modexp kernels: _mm2_square's when the
    squaring specialization is active (L <= PRESHIFT_MAX_L), else the
    general product's (the squaring path's extra live intermediates blow
    the 16M scoped-vmem stack limit at L=257 and win nothing there)."""
    if L > PRESHIFT_MAX_L:
        return 2 * L + PROD_UNROLL + 2
    return sqr_scratch_limbs(L)


def _mm2_square(a_val, t_scr, L, seg=128):
    """Schoolbook T = a*a exploiting symmetry: ~55-65% of the general
    product's multiplies.

    T = 2*P_outer + P_diag, where P_outer covers row-block i against
    columns j >= (i+1)*U (strictly outside the diagonal block) and
    P_diag is the full U x U product of each diagonal block (which
    already counts each within-block symmetric pair twice plus the true
    diagonal once).  The block loop is Python-unrolled: the per-block
    column slice a[(i+1)*U:] must have a static start, and shrinking
    slices are what saves the work (a mask would cost the same as
    computing).  Doubling is ONE whole-scratch pass between the outer
    and diagonal accumulations.

    Bound: each outer scratch limb accumulates <= L products of 16-bit
    limbs split lo/hi (< 2^17 each), so sums < L*2^17 + 2^17; doubling
    and the diagonal adds contribute < 2^22 more — exact in uint32 for
    any practical L (safe to L ~ 2^13)."""
    U = PROD_UNROLL
    tb = a_val.shape[-1]
    nblk = -(-L // U)
    LU = nblk * U
    if LU != L:
        a_val = jnp.concatenate(
            [a_val, jnp.zeros((LU - L, tb), jnp.uint32)], axis=0)
    t_scr[...] = jnp.zeros_like(t_scr)
    z1 = jnp.zeros((1, tb), jnp.uint32)

    def shifted(p, off, total):
        parts = []
        if off:
            parts.append(jnp.zeros((off, tb), jnp.uint32))
        parts.append(p)
        tail = total - off - p.shape[0]
        if tail:
            parts.append(jnp.zeros((tail, tb), jnp.uint32))
        return parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=0)

    # ---- outer triangle: block i rows x columns >= (i+1)*U ------------
    for i in range(nblk - 1):
        bo = i * U
        b_tail = a_val[bo + U:]                        # (Lr, tb), Lr static
        Lr = LU - bo - U
        tot = Lr + U
        # segment the accumulation chains as in _mm2_product_preshift_seg
        bounds = [(s0, min(tot, s0 + seg)) for s0 in range(0, tot, seg)]
        lo_segs, hi_segs = [], []
        for s0, s1 in bounds:
            # zero-init per segment: a segment with no contributing
            # u-terms (possible only if seg were not a multiple of U)
            # must not inherit the previous segment's partials
            lo = jnp.zeros((s1 - s0, tb), jnp.uint32)
            hi = jnp.zeros((s1 - s0, tb), jnp.uint32)
            for u in range(U):
                # rows of shifted(b_tail, u) covering [s0, s1)
                r0, r1 = max(s0 - u, 0), min(s1 - u, Lr)
                if r0 >= r1:
                    continue
                p = a_val[bo + u:bo + u + 1] * b_tail[r0:r1]
                lo = lo + shifted(p & MASK, (r0 + u) - s0, s1 - s0)
                hi = hi + shifted(p >> 16, (r0 + u) - s0, s1 - s0)
            lo_segs.append(lo)
            hi_segs.append(hi)
        s_lo = jnp.concatenate(lo_segs, axis=0) if len(lo_segs) > 1 \
            else lo_segs[0]
        s_hi = jnp.concatenate(hi_segs, axis=0) if len(hi_segs) > 1 \
            else hi_segs[0]
        off = 2 * bo + U
        win = t_scr[pl.ds(off, tot + 1), :]
        t_scr[pl.ds(off, tot + 1), :] = (
            win
            + jnp.concatenate([s_lo, z1], axis=0)
            + jnp.concatenate([z1, s_hi], axis=0))

    # ---- double the off-diagonal part ----------------------------------
    t_scr[...] = t_scr[...] << 1

    # ---- diagonal blocks: full U x U per block (not doubled) -----------
    for i in range(nblk):
        bo = i * U
        ablk = a_val[bo:bo + U]                        # (U, tb)
        d_lo = jnp.zeros((2 * U, tb), jnp.uint32)
        d_hi = jnp.zeros((2 * U, tb), jnp.uint32)
        for u in range(U):
            p = a_val[bo + u:bo + u + 1] * ablk        # (U, tb)
            d_lo = d_lo + shifted(p & MASK, u, 2 * U)
            d_hi = d_hi + shifted(p >> 16, u, 2 * U)
        win = t_scr[pl.ds(2 * bo, 2 * U + 1), :]
        t_scr[pl.ds(2 * bo, 2 * U + 1), :] = (
            win
            + jnp.concatenate([d_lo, z1], axis=0)
            + jnp.concatenate([z1, d_hi], axis=0))

    return _norm_val(t_scr[...])[:2 * L]               # canonical


def _mm2_reduce(T, wmu, wm, L):
    """Montgomery reduction of a canonical 2L-limb product T < mR:
    two int8 nibble matmuls (MXU) + recombine => (T + q*m)/R < 2m."""
    a1 = _nibble_blocks_val(T[:L], 4)                  # (4L, tb) int8
    q_slots = jax.lax.dot_general(
        wmu, a1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # (4L, tb)
    q = _norm_val(_recombine_val(q_slots, L))[:L]      # canonical q < R
    a2 = _nibble_blocks_val(q, 4)
    p_slots = jax.lax.dot_general(
        wm, a2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # (8L, tb)
    s = _recombine_val(p_slots, 2 * L) + T
    s = _norm_val(s)                                   # low L limbs == 0
    return s[L:]


def _mm2_val(a_val, b_val, wmu, wm, t_scr, L):
    """One matmul-Montgomery modmul on (L, tb) canonical values < 2m."""
    return _mm2_reduce(_mm2_product(a_val, b_val, t_scr, L), wmu, wm, L)


def _mm2_sqr_val(a_val, wmu, wm, t_scr, L):
    """One matmul-Montgomery modular squaring on (L, tb) values < 2m."""
    return _mm2_reduce(_mm2_square(a_val, t_scr, L), wmu, wm, L)


# ---------------------------------------------------------------------------
# Kernel 1: single Montgomery product (drop-in for mont_mul_p when the
# modulus is shared).
# ---------------------------------------------------------------------------

def _mm2_mul_kernel(a_ref, b_ref, wmu_ref, wm_ref, o_ref, t_scr):
    L = a_ref.shape[0]
    o_ref[...] = _mm2_val(a_ref[...], b_ref[...], wmu_ref[...], wm_ref[...],
                          t_scr, L)


def _pad_to(x, BP):
    if x.shape[-1] == BP:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, BP - x.shape[-1])]
    return jnp.pad(x, pad)


@jax.jit
def mm2_mul_p(a, b, wmu, wm):
    """Matmul-Montgomery product: a, b (L, Ba)/(L, Bb) canonical < 2m;
    wmu (4L, 4L) int8; wm (8L, 4L) int8.  Returns (L, B) < 2m."""
    L = a.shape[0]
    B = max(a.shape[1], b.shape[1])
    BP = -(-B // TB) * TB
    a = _pad_to(jnp.broadcast_to(a, (L, B)), BP)
    b = _pad_to(jnp.broadcast_to(b, (L, B)), BP)
    bs = lambda: pl.BlockSpec((L, TB), lambda j: (0, j),
                              memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda j: (0, 0),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mm2_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((L, BP), jnp.uint32),
        grid=(BP // TB,),
        in_specs=[bs(), bs(), wspec(wmu.shape), wspec(wm.shape)],
        out_specs=bs(),
        scratch_shapes=[pltpu.VMEM((2 * L + PROD_UNROLL + 2, TB),
                                   jnp.uint32)],
        interpret=INTERPRET,
    )(a, b, wmu, wm)
    return out[:, :B]


def _mm2_sqr_kernel(a_ref, wmu_ref, wm_ref, o_ref, t_scr):
    L = a_ref.shape[0]
    o_ref[...] = _mm2_sqr_val(a_ref[...], wmu_ref[...], wm_ref[...],
                              t_scr, L)


@jax.jit
def mm2_sqr_p(a, wmu, wm):
    """Matmul-Montgomery squaring: a (L, B) canonical < 2m -> (L, B) < 2m."""
    L, B = a.shape
    BP = -(-B // TB) * TB
    a = _pad_to(a, BP)
    bs = lambda: pl.BlockSpec((L, TB), lambda j: (0, j),
                              memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda j: (0, 0),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mm2_sqr_kernel,
        out_shape=jax.ShapeDtypeStruct((L, BP), jnp.uint32),
        grid=(BP // TB,),
        in_specs=[bs(), wspec(wmu.shape), wspec(wm.shape)],
        out_specs=bs(),
        scratch_shapes=[pltpu.VMEM((sqr_scratch_limbs(L), TB), jnp.uint32)],
        interpret=INTERPRET,
    )(a, wmu, wm)
    return out[:, :B]


# ---------------------------------------------------------------------------
# Kernel 2: fixed-window (w=4) modexp over a SHARED modulus.
# ---------------------------------------------------------------------------

def _mm2_exp_kernel(win_start_ref, dig_ref, base_ref, wmu_ref, wm_ref,
                    one_ref, o_ref, t_scr):
    L = base_ref.shape[0]
    wmu = wmu_ref[...]
    wm = wm_ref[...]
    base = base_ref[...]
    one = one_ref[...]
    n_win = dig_ref.shape[0]

    def mm(x, y):
        return _mm2_val(x, y, wmu, wm, t_scr, L)

    # Squaring specialization only below PRESHIFT_MAX_L: measured 0.57x
    # a general modmul at L=130 but 0.97x at L=257, where its extra live
    # intermediates also blow the 16M scoped-vmem stack limit.
    if L <= PRESHIFT_MAX_L:
        def sq(x):
            return _mm2_sqr_val(x, wmu, wm, t_scr, L)
    else:
        def sq(x):
            return mm(x, x)

    entries = [one, base]
    for _ in range(14):
        entries.append(mm(entries[-1], base))
    table = jnp.stack(entries, axis=0)                 # (16, L, tb)

    def wbody(j, acc):
        for _ in range(4):
            acc = sq(acc)
        dig = dig_ref[pl.ds(j, 1), :]                  # (1, tb)
        sel = jnp.zeros_like(acc)
        for d in range(16):
            sel = sel + jnp.where(dig == d, table[d], 0)
        return mm(acc, sel)

    o_ref[...] = lax.fori_loop(win_start_ref[0], n_win, wbody, one)


@functools.partial(jax.jit, static_argnames=("win_start",))
def mm2_exp_p(base, digits, wmu, wm, one, win_start=0):
    """base^e mod m (shared m) for per-element 4-bit-window exponents.

    base: (L, B) Montgomery canonical < 2m; digits: (n_win, B) MSB-first;
    one: (L, 1) Montgomery 1."""
    L = base.shape[0]
    B = max(base.shape[1], digits.shape[1])
    n_win = digits.shape[0]
    BP = -(-B // TB) * TB
    base = _pad_to(jnp.broadcast_to(base, (L, B)), BP)
    one = _pad_to(jnp.broadcast_to(one, (L, B)), BP)
    digits = _pad_to(jnp.broadcast_to(digits, (n_win, B)),
                     BP).astype(jnp.uint32)
    ws = jnp.asarray([win_start], dtype=jnp.int32)
    bs = lambda: pl.BlockSpec((L, TB), lambda j, ws: (0, j),
                              memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda j, ws: (0, 0),
                                   memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BP // TB,),
        in_specs=[
            pl.BlockSpec((n_win, TB), lambda j, ws: (0, j),
                         memory_space=pltpu.VMEM),
            bs(), wspec(wmu.shape), wspec(wm.shape), bs(),
        ],
        out_specs=bs(),
        scratch_shapes=[pltpu.VMEM((exp_scratch_limbs(L), TB),
                                   jnp.uint32)],
    )
    out = pl.pallas_call(
        _mm2_exp_kernel,
        out_shape=jax.ShapeDtypeStruct((L, BP), jnp.uint32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(ws, digits, base, wmu, wm, one)
    return out[:, :B]


# ---------------------------------------------------------------------------
# Kernel 3: SHARED-exponent modexp (CRT decrypt: exponent = p-1 or q-1).
# The digit sequence arrives via scalar prefetch (SMEM) and the window
# table lives in a scratch ref, so table selection is ONE dynamic-offset
# VMEM read instead of a 2^w-way one-hot sum per window.
# ---------------------------------------------------------------------------

def _mm2_exp_shared_kernel(dig_ref, base_ref, wmu_ref, wm_ref, one_ref,
                           o_ref, t_scr, tab_scr, *, window):
    L = base_ref.shape[0]
    wmu = wmu_ref[...]
    wm = wm_ref[...]
    base = base_ref[...]
    one = one_ref[...]
    n_win = dig_ref.shape[0]
    tsize = 1 << window

    def mm(x, y):
        return _mm2_val(x, y, wmu, wm, t_scr, L)

    if L <= PRESHIFT_MAX_L:                 # see _mm2_exp_kernel note
        def sq(x):
            return _mm2_sqr_val(x, wmu, wm, t_scr, L)
    else:
        def sq(x):
            return mm(x, x)

    tab_scr[0:L, :] = one
    tab_scr[L:2 * L, :] = base
    cur = base
    for d in range(2, tsize):
        cur = mm(cur, base)
        tab_scr[d * L:(d + 1) * L, :] = cur

    def wbody(j, acc):
        for _ in range(window):
            acc = sq(acc)
        d = dig_ref[j]
        sel = tab_scr[pl.ds(d * L, L), :]
        return mm(acc, sel)

    o_ref[...] = lax.fori_loop(0, n_win, wbody, one)


@functools.partial(jax.jit, static_argnames=("window",))
def mm2_exp_shared_p(base, digits, wmu, wm, one, window=5):
    """base^e mod m for ONE exponent shared across the batch.

    base: (L, B) Montgomery canonical < 2m; digits: (n_win,) int32
    MSB-first base-2^window digits; one: (L, 1)."""
    L = base.shape[0]
    B = base.shape[1]
    BP = -(-B // TB) * TB
    base = _pad_to(base, BP)
    one = _pad_to(jnp.broadcast_to(one, (L, B)), BP)
    digits = jnp.asarray(digits, dtype=jnp.int32).reshape(-1)
    bs = lambda: pl.BlockSpec((L, TB), lambda j, dig: (0, j),
                              memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda j, dig: (0, 0),
                                   memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BP // TB,),
        in_specs=[bs(), wspec(wmu.shape), wspec(wm.shape), bs()],
        out_specs=bs(),
        scratch_shapes=[
            pltpu.VMEM((exp_scratch_limbs(L), TB), jnp.uint32),
            pltpu.VMEM(((1 << window) * L, TB), jnp.uint32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_mm2_exp_shared_kernel, window=window),
        out_shape=jax.ShapeDtypeStruct((L, BP), jnp.uint32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(digits, base, wmu, wm, one)
    return out[:, :B]

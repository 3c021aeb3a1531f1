"""Signed-byte matmul-Montgomery Pallas kernels (v3).

Same algorithm as pallas_mont2 (product on the VPU, Montgomery reduction
as two constant-Toeplitz matmuls on the MXU) but the matmul operands are
SIGNED BYTES instead of unsigned nibbles:

  * data bytes d in [0,256) are centered to d-128 in [-128,127] — in bits
    that is just ``byte ^ 0x80`` reinterpreted as int8 (one extra VPU op);
    the constant offset 128*sum(256^k)*c it introduces is folded into a
    per-modulus additive constant applied at recombine time.
  * the constant's bytes are signed-digit recoded on the host (exact),
    so weight entries live in [-128,127] as well.

Products are <= 128*128 = 2^14 and int32 accumulation over <= 2*2L terms
is exact for any practical L.  Compared with the 4-bit nibble layout this
HALVES both matmul dimensions — 4x fewer MXU MACs and 4x smaller weight
matrices, which is what lets 3072/4096-bit moduli (L = 385/513) keep
their Toeplitz weights resident in VMEM (the v2 nibble weights overflow
VMEM above L = 260, the round-2 MXU cliff).

Recombine uses a per-limb +2^26 bias so the signed int32 slots become
non-negative before the (unsigned) Kogge-Stone carry pass; the bias is
compensated in the same folded constant.  Layouts, bounds and the Walter
<2m closure are otherwise identical to pallas_mont2.

Replaces the role of IPP-Crypto `mbx_exp_mb8`
(/root/reference/README.md:32) as the hot modexp kernel.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limb import LIMB_BITS, int_to_limbs
from .pallas_mont import _norm_val
from .pallas_mont2 import (
    _mm2_product, _mm2_square, exp_scratch_limbs, sqr_scratch_limbs,
    PROD_UNROLL, PRESHIFT_MAX_L,
)

MASK = 0xFFFF
INTERPRET = False


# Scoped-VMEM budget model.  A modmul's live rows (product scratch,
# pre-shifted b copies, matmul outputs, carry-chain temporaries) measure
# ~40*L u32 rows per lane (empirical: mm3_exp_shared at L=129/tb=512
# scoped 21.0 MB => ~10.3k rows with the 4.4k-row table).  Budget below
# the 16 MB scoped limit with margin.
_VMEM_BUDGET = 13_500_000
_ROWS_PER_L = 40


def tb_for(L: int) -> int:
    """Batch-tile width for the mul/sqr kernels.  Measured (kbench, L=257,
    B=2048): tb=128 22.5 us/tile-modmul vs tb=256 24.9 — wider tiles LOSE
    on the general modmul (VMEM pressure in the product loop), matching
    the round-1 CIOS finding.  The shared-exp kernel is the exception
    (its per-window overhead amortizes with width — see _shared_tb)."""
    return 128


def shared_exp_plan(L: int) -> tuple:
    """(window, tb) for mm3_exp_shared_p: the 2^w-entry table lives in
    VMEM scratch, so window and tile width trade off under the budget."""
    for w in (5, 4, 3):
        for tb in (512, 256, 128):
            rows = (1 << w) * _tab_stride(L) + _ROWS_PER_L * L
            if 4 * tb * rows <= _VMEM_BUDGET:
                return w, tb
    return 2, 128


def _shared_tb(L: int, window: int) -> int:
    """Largest tile width fitting the scoped-VMEM budget for a given
    shared-exp window (table rows + modmul working rows)."""
    rows = (1 << window) * _tab_stride(L) + _ROWS_PER_L * L
    for tb in (512, 256, 128):
        if 4 * tb * rows <= _VMEM_BUDGET:
            return tb
    return 128


# Per-element exp kernel: the 16-entry one-hot table lives as values, so
# its rows (16L) add to the working set.  Above this L even tb=128
# exceeds the budget — callers fall back to the CIOS exp kernel.
EXP_MAX_LIMBS = 460


def _exp_tb(L: int) -> int:
    rows = 16 * L + _ROWS_PER_L * L
    for tb in (512, 256, 128):
        if 4 * tb * rows <= _VMEM_BUDGET:
            return tb
    return 128
BIAS = 1 << 26          # per-limb slot bias: |signed slot| < 2^26 for L<2048


# ---------------------------------------------------------------------------
# Host-side weight/constant construction.
# ---------------------------------------------------------------------------

def signed_bytes_of(c: int, nbytes: int) -> np.ndarray:
    """Signed-byte digits s_j in [-128,127] with c ≡ sum 256^j s_j
    (mod 256^nbytes); exact recode of the unsigned byte expansion."""
    out = np.zeros(nbytes, dtype=np.int8)
    c = c % (1 << (8 * nbytes))
    carry = 0
    for j in range(nbytes):
        v = ((c >> (8 * j)) & 0xFF) + carry
        if v >= 128:
            out[j] = v - 256
            carry = 1
        else:
            out[j] = v
            carry = 0
    return out


def byte_toeplitz(c: int, in_limbs: int, out_limbs: int) -> np.ndarray:
    """int8[(2*out_limbs, 2*in_limbs)] block-layout Toeplitz weights for
    y = x*c truncated to out_limbs 16-bit limbs.

    W[v*T + t, u*K + k] = sb_{2(t-k) + v - u}(c) with sb the signed-byte
    digits; blocks u,v in {0,1} are the lo/hi byte of each limb."""
    sb = signed_bytes_of(c, 2 * out_limbs)
    t = np.arange(out_limbs)
    k = np.arange(in_limbs)
    W = np.zeros((2 * out_limbs, 2 * in_limbs), dtype=np.int8)
    for v in range(2):
        for u in range(2):
            j = 2 * (t[:, None] - k[None, :]) + (v - u)
            valid = (j >= 0) & (j < sb.shape[0])
            W[v * out_limbs + t[:, None], u * in_limbs + k[None, :]] = \
                np.where(valid, sb[np.clip(j, 0, sb.shape[0] - 1)], 0)
    return W


def byte_weights(m: int, L: int):
    """All v3 per-modulus constants: (wmu, wm, off1, off2).

    wmu: int8 (2L, 2L) — q = T_lo * mu mod R.
    wm:  int8 (4L, 2L) — full product q * m (2L limbs).
    off1/off2: uint32 (L,1)/(2L,1) canonical limbs folding together the
      byte-centering offset 128*S*c and the recombine bias compensation
      -BIAS*sum(2^16t), each mod 2^(16*out_limbs)."""
    R = 1 << (LIMB_BITS * L)
    if 4 * m >= R:
        raise ValueError("byte_weights: modulus too large for L")
    mu = (-pow(m, -1, R)) % R
    S_bytes = ((1 << (8 * 2 * L)) - 1) // 255          # sum 256^k, k<2L
    S16_L = (R - 1) // 0xFFFF                          # sum 2^16t, t<L
    S16_2L = ((1 << (32 * L)) - 1) // 0xFFFF
    off1 = (128 * S_bytes * mu - BIAS * S16_L) % R
    off2 = (128 * S_bytes * m - BIAS * S16_2L) % (1 << (32 * L))
    return (
        jnp.asarray(byte_toeplitz(mu, L, L)),
        jnp.asarray(byte_toeplitz(m, L, 2 * L)),
        jnp.asarray(int_to_limbs(off1, L)[:, None]),
        jnp.asarray(int_to_limbs(off2, 2 * L)[:, None]),
    )


# ---------------------------------------------------------------------------
# Kernel-side value helpers.
# ---------------------------------------------------------------------------

def _bytes_c_val(x, L):
    """(L, tb) canonical u32 -> (2L, tb) int8 centered bytes (block
    layout: lo-byte block then hi-byte block).  byte ^ 0x80 reinterpreted
    as int8 IS byte - 128."""
    b0 = ((x & 0xFF) ^ 0x80).astype(jnp.int8)
    b1 = (((x >> 8) & 0xFF) ^ 0x80).astype(jnp.int8)
    return jnp.concatenate([b0, b1], axis=0)


def _recombine3_val(y, out_limbs, off, extra=None):
    """int32 (2*T, tb) block slots -> u32 redundant (T, tb) limbs.

    limb t = y0[t] + (y1[t] mod 256)<<8 + (y1[t-1] >> 8, arithmetic)
             + BIAS + off[t] (+ extra[t]); the BIAS makes every slot
    non-negative (|signed part| < 2^26), off compensates it."""
    tb = y.shape[-1]
    y0 = y[:out_limbs]
    y1 = y[out_limbs:2 * out_limbs]
    l1 = (y1 & 0xFF) << 8
    h1 = y1 >> 8                                    # arithmetic shift
    h1s = jnp.concatenate(
        [jnp.zeros((1, tb), jnp.int32), h1[:-1]], axis=0)
    acc = (y0 + l1 + h1s + BIAS).astype(jnp.uint32)
    acc = acc + off
    if extra is not None:
        acc = acc + extra
    return acc


def _mm3_reduce(T, wmu, wm, off1, off2, L):
    """Montgomery reduction of a canonical 2L-limb product T < mR:
    two signed-byte matmuls (MXU) + recombine => (T + q*m)/R < 2m."""
    d1 = _bytes_c_val(T[:L], L)                        # (2L, tb) int8
    y1 = jax.lax.dot_general(
        wmu, d1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # (2L, tb)
    q = _norm_val(_recombine3_val(y1, L, off1))[:L]    # canonical q < R
    d2 = _bytes_c_val(q, L)
    y2 = jax.lax.dot_general(
        wm, d2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # (4L, tb)
    s = _norm_val(_recombine3_val(y2, 2 * L, off2, extra=T))
    return s[L:]                                       # (T + q*m)/R < 2m


def _mm3_val(a_val, b_val, w, t_scr, L):
    return _mm3_reduce(_mm2_product(a_val, b_val, t_scr, L), *w, L)


def _mm3_sqr_val(a_val, w, t_scr, L):
    return _mm3_reduce(_mm2_square(a_val, t_scr, L), *w, L)


def _pad_to(x, BP):
    if x.shape[-1] == BP:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, BP - x.shape[-1])]
    return jnp.pad(x, pad)


# ---------------------------------------------------------------------------
# Kernel 1: single Montgomery product / squaring.
# ---------------------------------------------------------------------------

def _mm3_mul_kernel(a_ref, b_ref, wmu_ref, wm_ref, o1_ref, o2_ref,
                    o_ref, t_scr):
    L = a_ref.shape[0]
    w = (wmu_ref[...], wm_ref[...], o1_ref[...], o2_ref[...])
    o_ref[...] = _mm3_val(a_ref[...], b_ref[...], w, t_scr, L)


@functools.partial(jax.jit, static_argnames=("tb",))
def mm3_mul_p(a, b, wmu, wm, off1, off2, tb=None):
    """Signed-byte matmul-Montgomery product: canonical < 2m in/out."""
    L = a.shape[0]
    TB = tb or tb_for(L)
    B = max(a.shape[1], b.shape[1])
    BP = -(-B // TB) * TB
    a = _pad_to(jnp.broadcast_to(a, (L, B)), BP)
    b = _pad_to(jnp.broadcast_to(b, (L, B)), BP)
    bs = lambda: pl.BlockSpec((L, TB), lambda j: (0, j),
                              memory_space=pltpu.VMEM)
    ws = lambda s: pl.BlockSpec(s, lambda j: tuple(0 for _ in s),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mm3_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((L, BP), jnp.uint32),
        grid=(BP // TB,),
        in_specs=[bs(), bs(), ws(wmu.shape), ws(wm.shape),
                  ws(off1.shape), ws(off2.shape)],
        out_specs=bs(),
        scratch_shapes=[pltpu.VMEM((2 * L + PROD_UNROLL + 2, TB),
                                   jnp.uint32)],
        interpret=INTERPRET,
    )(a, b, wmu, wm, off1, off2)
    return out[:, :B]


def _mm3_sqr_kernel(a_ref, wmu_ref, wm_ref, o1_ref, o2_ref, o_ref, t_scr):
    L = a_ref.shape[0]
    w = (wmu_ref[...], wm_ref[...], o1_ref[...], o2_ref[...])
    o_ref[...] = _mm3_sqr_val(a_ref[...], w, t_scr, L)


@functools.partial(jax.jit, static_argnames=("tb",))
def mm3_sqr_p(a, wmu, wm, off1, off2, tb=None):
    L, B = a.shape
    TB = tb or tb_for(L)
    BP = -(-B // TB) * TB
    a = _pad_to(a, BP)
    bs = lambda: pl.BlockSpec((L, TB), lambda j: (0, j),
                              memory_space=pltpu.VMEM)
    ws = lambda s: pl.BlockSpec(s, lambda j: tuple(0 for _ in s),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mm3_sqr_kernel,
        out_shape=jax.ShapeDtypeStruct((L, BP), jnp.uint32),
        grid=(BP // TB,),
        in_specs=[bs(), ws(wmu.shape), ws(wm.shape),
                  ws(off1.shape), ws(off2.shape)],
        out_specs=bs(),
        scratch_shapes=[pltpu.VMEM((sqr_scratch_limbs(L), TB), jnp.uint32)],
        interpret=INTERPRET,
    )(a, wmu, wm, off1, off2)
    return out[:, :B]


# ---------------------------------------------------------------------------
# Kernel 2: fixed-window (w=4) modexp, per-element exponents.
# ---------------------------------------------------------------------------

def _mm3_exp_kernel(win_start_ref, dig_ref, base_ref, wmu_ref, wm_ref,
                    o1_ref, o2_ref, one_ref, o_ref, t_scr):
    L = base_ref.shape[0]
    w = (wmu_ref[...], wm_ref[...], o1_ref[...], o2_ref[...])
    base = base_ref[...]
    one = one_ref[...]
    n_win = dig_ref.shape[0]

    def mm(x, y):
        return _mm3_val(x, y, w, t_scr, L)

    if L <= PRESHIFT_MAX_L:            # see pallas_mont2._mm2_exp_kernel
        def sq(x):
            return _mm3_sqr_val(x, w, t_scr, L)
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


@functools.partial(jax.jit, static_argnames=("win_start", "tb"))
def mm3_exp_p(base, digits, wmu, wm, off1, off2, one, win_start=0, tb=None):
    """base^e mod m (shared m) for per-element 4-bit-window exponents."""
    L = base.shape[0]
    TB = tb or _exp_tb(L)
    B = max(base.shape[1], digits.shape[1])
    n_win = digits.shape[0]
    BP = -(-B // TB) * TB
    base = _pad_to(jnp.broadcast_to(base, (L, B)), BP)
    one = _pad_to(jnp.broadcast_to(one, (L, B)), BP)
    digits = _pad_to(jnp.broadcast_to(digits, (n_win, B)),
                     BP).astype(jnp.uint32)
    ws_arr = jnp.asarray([win_start], dtype=jnp.int32)
    bs = lambda: pl.BlockSpec((L, TB), lambda j, ws: (0, j),
                              memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda j, ws: tuple(0 for _ in s),
                                   memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BP // TB,),
        in_specs=[
            pl.BlockSpec((n_win, TB), lambda j, ws: (0, j),
                         memory_space=pltpu.VMEM),
            bs(), wspec(wmu.shape), wspec(wm.shape),
            wspec(off1.shape), wspec(off2.shape), bs(),
        ],
        out_specs=bs(),
        scratch_shapes=[pltpu.VMEM((exp_scratch_limbs(L), TB),
                                   jnp.uint32)],
    )
    out = pl.pallas_call(
        _mm3_exp_kernel,
        out_shape=jax.ShapeDtypeStruct((L, BP), jnp.uint32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(ws_arr, digits, base, wmu, wm, off1, off2, one)
    return out[:, :B]


# ---------------------------------------------------------------------------
# Kernel 3: shared-exponent modexp (CRT decrypt fast path).
# ---------------------------------------------------------------------------

def _tab_stride(L):
    """Table entry stride: 8-aligned so the dynamic scratch read's
    sublane offset (d * stride) is provably a multiple of 8 (Mosaic
    requires aligned dynamic dim-0 indices on wide tiles)."""
    return -(-L // 8) * 8


def _mm3_exp_shared_kernel(dig_ref, base_ref, wmu_ref, wm_ref, o1_ref,
                           o2_ref, one_ref, o_ref, t_scr, tab_scr, *,
                           window):
    L = base_ref.shape[0]
    Lp = _tab_stride(L)
    w = (wmu_ref[...], wm_ref[...], o1_ref[...], o2_ref[...])
    base = base_ref[...]
    one = one_ref[...]
    n_win = dig_ref.shape[0]
    tsize = 1 << window

    def mm(x, y):
        return _mm3_val(x, y, w, t_scr, L)

    if L <= PRESHIFT_MAX_L:
        def sq(x):
            return _mm3_sqr_val(x, w, t_scr, L)
    else:
        def sq(x):
            return mm(x, x)

    tab_scr[0:L, :] = one
    tab_scr[Lp:Lp + L, :] = base
    cur = base
    for d in range(2, tsize):
        cur = mm(cur, base)
        tab_scr[d * Lp:d * Lp + L, :] = cur

    def wbody(j, acc):
        for _ in range(window):
            acc = sq(acc)
        d = dig_ref[j]
        sel = tab_scr[pl.ds(d * Lp, L), :]
        return mm(acc, sel)

    o_ref[...] = lax.fori_loop(0, n_win, wbody, one)


@functools.partial(jax.jit, static_argnames=("window", "tb"))
def mm3_exp_shared_p(base, digits, wmu, wm, off1, off2, one, window=5,
                     tb=None):
    """base^e mod m for ONE exponent shared across the batch."""
    L = base.shape[0]
    TB = tb or _shared_tb(L, window)
    B = base.shape[1]
    BP = -(-B // TB) * TB
    base = _pad_to(base, BP)
    one = _pad_to(jnp.broadcast_to(one, (L, B)), BP)
    digits = jnp.asarray(digits, dtype=jnp.int32).reshape(-1)
    bs = lambda: pl.BlockSpec((L, TB), lambda j, dig: (0, j),
                              memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda j, dig: tuple(0 for _ in s),
                                   memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BP // TB,),
        in_specs=[bs(), wspec(wmu.shape), wspec(wm.shape),
                  wspec(off1.shape), wspec(off2.shape), bs()],
        out_specs=bs(),
        scratch_shapes=[
            pltpu.VMEM((exp_scratch_limbs(L), TB), jnp.uint32),
            pltpu.VMEM(((1 << window) * _tab_stride(L), TB), jnp.uint32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_mm3_exp_shared_kernel, window=window),
        out_shape=jax.ShapeDtypeStruct((L, BP), jnp.uint32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(digits, base, wmu, wm, off1, off2, one)
    return out[:, :B]

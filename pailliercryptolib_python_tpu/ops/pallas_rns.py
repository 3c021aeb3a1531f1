"""Pallas TPU kernel for the RNS-Montgomery shared-exponent chain.

The XLA version of ops/rns.py round-trips the (CH, B) state through HBM
on every elementwise fusion break — ~2,500 modmuls per decrypt make that
memory-bound.  This kernel keeps the state, the 2^w-entry window table
and the extension weights resident in VMEM for the WHOLE chain (one
batch tile per grid step), exactly like the positional-limb shared-exp
kernel (pallas_mont3._mm3_exp_shared_kernel) — but the modmul inside is
the RNS one: elementwise channel REDC passes on the VPU plus two
constant-matrix base extensions on the MXU.

Extension matmuls run as CENTERED bf16 x bf16 -> f32 dots: operands are
integers in [-128, 127] (exact in bf16), products <= 2^14 and partial
sums < 2^23 (exact in f32), so the float matmul is bit-exact integer
arithmetic on the MXU regardless of int8-matmul support in the
toolchain.

Scale/bound conventions are identical to ops/rns.py (the jnp reference
path); tests/test_pallas_rns.py asserts bit-identical outputs.
"""

from __future__ import annotations

import functools
from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rns import (
    RnsBase, RnsModulus, _cmul, _cmul2, _cmul_shoup, _combine_dual,
    combine_levels, _submod)

INTERPRET = False

# Scoped-VMEM model, calibrated against Mosaic's own accounting: the
# hardware limit is 16.00 MB and a compiled chain kernel uses
# table (2^w * CHP rows) + ~22.2 CHP-rows of live temporaries (measured
# from the 4096-key elem kernel's 16.21 MB refusal at CHP=1048/w=3).
_VMEM_BUDGET = 15_800_000
_WORK_ROWS = 23


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def plan(CH: int) -> tuple:
    """(window, tb) fitting the scoped-VMEM budget: the 2^w-entry state
    table plus the working copies of the (CHP, tb) state."""
    for w in (5, 4, 3, 2):
        tb = tb_for(CH, w)
        if tb:
            return w, tb
    return 2, 128


def tb_for(CH: int, window: int,
           tbs: tuple = (128,)) -> int | None:
    """First batch-tile width in `tbs` whose window table + working set
    fits scoped VMEM (None if none does, or past the exactness bound)."""
    k = (CH - 1) // 2
    if k >= 16500:   # int32 plane-accumulator bound (rns.RnsBase)
        return None
    CHP = _pad8(CH)
    rows = (1 << window) * CHP + _WORK_ROWS * CHP
    # (the int8 4-quarter E stacks cost the same bytes as the round-4
    # bf16 2-stacks the _WORK_ROWS calibration absorbed: 8(k+1)k either
    # way, so no extra charge)
    for tb in tbs:
        if 4 * tb * rows <= _VMEM_BUDGET:
            return tb
    return None


def _pick_tb(CH: int, window: int, B: int) -> int | None:
    """Prefer 256-wide batch tiles for production batches: same VPU work
    but half the grid steps — measured ~13% faster on the 2048-bit
    decrypt chain (round 5).  Small batches stay at 128 to bound
    padding waste."""
    tbs = (256, 128) if B >= 256 else (128,)
    return tb_for(CH, window, tbs)


def sched_tb(CH: int, window: int, B: int) -> int | None:
    """Batch-tile for the sliding-window schedule kernel: odd-power
    table of 2^(window-1) entries plus one c^2 slot."""
    k = (CH - 1) // 2
    if k >= 16500:   # int32 plane-accumulator bound (rns.RnsBase)
        return None
    CHP = _pad8(CH)
    rows = ((1 << (window - 1)) + 1 + _WORK_ROWS) * CHP
    for tb in ((256, 128) if B >= 256 else (128,)):
        if 4 * tb * rows <= _VMEM_BUDGET:
            return tb
    return None


def plan_sched(CH: int) -> int | None:
    """Largest sliding window whose odd table fits — preferring
    256-wide batch tiles (measured ~13% faster than 128)."""
    for w in (7, 6, 5, 4, 3):
        if sched_tb(CH, w, 256) == 256:
            return w
    for w in (7, 6, 5, 4, 3):
        if sched_tb(CH, w, 128):
            return w
    return None


# Working set of the single-product kernel (no window table): the two
# inputs, the output and _mul_val's live temporaries.
_MUL_WORK_ROWS = 26


def _pick_tb_mul(CH: int, B: int) -> int:
    """VMEM-checked batch-tile width for the single-product kernel.
    (Round-5 bench caught tb=256 silently overflowing VMEM at the
    3072/4096 channel counts — ~2x slower compiled code — so the pick
    must respect the same budget model as the chain kernels.)"""
    CHP = _pad8(CH)
    for tb in ((256, 128) if B >= 256 else (128,)):
        if 4 * tb * _MUL_WORK_ROWS * CHP <= _VMEM_BUDGET:
            return tb
    return 128


# ---------------------------------------------------------------------------
# Host-side weight packing (cached per (base, key) identity).
# ---------------------------------------------------------------------------

# Contraction depths up to this fit EXACTLY in f32 with RAW [0, 255]
# operands: every partial sum <= k*255^2 < 2^24.  Below it the kernel
# skips centering entirely (no corrections, no digit column sums);
# above it (3072/4096-bit n^2 bases) the centered scheme keeps partial
# sums < 2^23.  258*255^2 = 16,776,450 < 2^24 = 16,777,216.
def _center_stack(c_lo, c_hi, d_lo, d_hi):
    """Byte planes -> centered int8 stacks for STACKED-OUTPUT dots.

    E = [[C_lo; C_hi] | [D_lo; D_hi]] as one (4o, k) matrix whose top
    half contracts against x0 and bottom half against x1, each yielding
    a stacked (2o, TB) [S_A; S_B] output — 2 MXU dispatches per
    extension instead of 4 (fewer ragged 128-blocks at o=k+1~130).
    int8 x int8 -> int32 rides the MXU at twice the bf16 rate and its
    int32 accumulator is exact for any k < 2^17 (round-5: replaces the
    bf16 scheme and retires its k <= 900 f32-exactness bound).
    CS pre-folds ALL static correction terms:
    128*(rowsum(C') + rowsum(D')) + 2*128^2*k.

    (Round-5 measured NEGATIVE: folding the digit column-sums into the
    matmul via an appended ones row was ~8% slower end-to-end; raw
    [0,255] bf16 operands without corrections were ~0.4% — the
    correction VPU work overlaps the serialized MXU dots.)"""
    k_in = c_lo.shape[1]
    EX = np.concatenate([c_lo, c_hi], axis=0).astype(np.int32) - 128
    EY = np.concatenate([d_lo, d_hi], axis=0).astype(np.int32) - 128
    E = np.concatenate([EX, EY], axis=0)
    CS = (128 * (EX.sum(axis=1, keepdims=True)
                 + EY.sum(axis=1, keepdims=True))
          + 2 * 128 * 128 * k_in).astype(np.int32)
    return E.astype(np.int8), CS


def _dots_c(xi, E, CS, out_rows):
    """Stacked-output centered-int8 dots of 16-bit digits xi (k_in, TB)
    against E = [[C_lo; C_hi]'; [D_lo; D_hi]'] ((4*out_rows, k_in)
    int8, D = 2^8 C mod m pre-folded).  Two MXU dispatches produce the
    stacked [S_A; S_B]; CS carries every static correction.  Returns
    exact int32 S_A, S_B (out_rows, TB), true dot = S_A + 2^8 S_B."""
    k_in = E.shape[1]

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.int32)

    o2 = 2 * out_rows
    x0 = xi & 0xFF
    x1 = xi >> 8
    x0c = (x0.astype(jnp.int32) - 128).astype(jnp.int8)
    x1c = (x1.astype(jnp.int32) - 128).astype(jnp.int8)
    s0 = jnp.sum(x0.astype(jnp.int32), axis=0, keepdims=True) \
        - 128 * k_in
    s1 = jnp.sum(x1.astype(jnp.int32), axis=0, keepdims=True) \
        - 128 * k_in
    S = dot(E[:o2], x0c) + dot(E[o2:], x1c) + 128 * (s0 + s1) + CS
    return S[:out_rows], S[out_rows:o2]


# Bounded LRU keyed by (mbits, m): m is key-derived (p^2/q^2/n^2), so an
# unbounded cache would both grow without limit in long-lived multi-key
# services and retain key material past the key's lifetime.  16 entries
# covers 5 concurrently hot keys (n^2 + both CRT halves each).
_PACK_CACHE: "OrderedDict[tuple, dict]" = OrderedDict()
_PACK_CACHE_MAX = 16


def pack_evict(m: int) -> None:
    """Drop cached constant bundles for modulus m (key retirement)."""
    for ck in [ck for ck in _PACK_CACHE if ck[1] == m]:
        del _PACK_CACHE[ck]


@functools.lru_cache(maxsize=8)
def _pack_static(mbits: int):
    """Base-level (key-independent) kernel operands, as numpy: channel
    vector table with the key columns zeroed, SK constants, centered
    extension matrices and their row sums."""
    base = RnsBase.for_bits(mbits)
    k, CH = base.k, base.CH
    CHP = _pad8(CH)
    vec = np.zeros((CHP, 16), dtype=np.uint32)
    vec[:, 0] = 1                                     # pad-row modulus
    vec[:CH, 0] = np.asarray(base.mods)[:, 0]
    vec[:CH, 1] = np.asarray(base.n0)[:, 0]
    vec[:CH, 2] = np.asarray(base.n032)[:, 0]
    vec[k:2 * k, 3] = np.asarray(base.K2s)[:, 0]      # xi' Shoup (B' rows)
    vec[k:2 * k, 8] = np.asarray(base.K2sh)[:, 0]
    skc = np.zeros((8, 1), dtype=np.uint32)
    skc[0, 0] = np.asarray(base.exit_c)[0, 0]         # |2^48 M'^-1|_mr
    skc[1, 0] = np.asarray(base.exit_c)[1, 0]         # |M'^-1|_mr
    E1, CS1 = _center_stack(np.asarray(base.C1_lo), np.asarray(base.C1_hi),
                            np.asarray(base.D1_lo), np.asarray(base.D1_hi))
    E2, CS2 = _center_stack(np.asarray(base.C2_lo), np.asarray(base.C2_hi),
                            np.asarray(base.D2_lo), np.asarray(base.D2_hi))
    # CS rides vec columns 10/11 (values in [0, 2^26] — exact through a
    # u32 round-trip): a separate (2(k+1), 1) VMEM block lane-pads to
    # 128 and wastes ~0.5 MB of scoped VMEM per extension at 4096-bit
    # channel counts (the `one` vector rides column 9 for the same
    # reason; the packing recovered the 4096 elem kernel's tb=128 fit)
    vec[:CS1.shape[0], 10] = CS1[:, 0].astype(np.uint32)
    vec[:CS2.shape[0], 11] = CS2[:, 0].astype(np.uint32)
    return dict(vec=vec, skc=skc, E1=E1, E2=E2, CHP=CHP)


def pack(mbits: int, m: int):
    """Concrete kernel operand bundle for modulus m (numpy; cached)."""
    ck = (mbits, m)
    hit = _PACK_CACHE.get(ck)
    if hit is not None:
        _PACK_CACHE.move_to_end(ck)
        return hit
    from .rns import modulus_vectors
    base = RnsBase.for_bits(mbits)
    kv = modulus_vectors(mbits, m)
    k, CH = base.k, base.CH
    s = _pack_static(mbits)
    CHP = s["CHP"]
    vec = s["vec"].copy()
    vec[:k, 3] = kv["K1s"][:, 0]                      # xi Shoup (B rows)
    vec[:k, 8] = kv["K1sh"][:, 0]
    vec[k:2 * k + 1, 4] = kv["u5"][:, 0]              # B' ++ m_r
    vec[k:2 * k + 1, 5] = kv["v5"][:, 0]
    vec[:k, 6] = kv["w9n"][:, 0]
    vec[:k, 7] = kv["w9b"][:, 0]
    all_mods = (list(base.mods_B_int) + list(base.mods_Bp_int)
                + [base.m_r])
    Mm = base.M % m
    vec[:CH, 9] = [(Mm % mc) * (1 << 16) % mc for mc in all_mods]
    out = dict(s, vec=vec)
    _PACK_CACHE[ck] = out
    while len(_PACK_CACHE) > _PACK_CACHE_MAX:
        _PACK_CACHE.popitem(last=False)
    return out


def kernel_operands(base: RnsBase, key: RnsModulus):
    """Kernel operand bundle, trace-safe.

    Concrete pytrees use the cached numpy path.  Under an outer jit the
    key-level columns are assembled from the RnsModulus CHILDREN (traced
    arguments), so the outer program's HLO carries only base-level
    constants and its hash is key-independent — a new key of the same
    size hits the persistent compilation cache instead of recompiling
    the multi-second encrypt/decrypt programs."""
    import jax.core
    if not isinstance(key.K1s, jax.core.Tracer):
        return pack(base.mbits, key.m)
    s = _pack_static(base.mbits)
    k, CH, CHP = base.k, base.CH, s["CHP"]

    def pad_to(x, lo):
        return jnp.pad(x, (lo, CHP - lo - x.shape[0]))

    vb = s["vec"]
    c012 = [jnp.asarray(vb[:, i]) for i in range(3)]
    c3 = pad_to(jnp.concatenate([key.K1s[:, 0], base.K2s[:, 0]]), 0)
    c4 = pad_to(key.u5[:, 0], k)
    c5 = pad_to(key.v5[:, 0], k)
    c6 = pad_to(key.w9n[:, 0], 0)
    c7 = pad_to(key.w9b[:, 0], 0)
    c8 = pad_to(jnp.concatenate([key.K1sh[:, 0], base.K2sh[:, 0]]), 0)
    c9 = pad_to(key.one_ch[:, 0], 0)
    c10 = jnp.asarray(vb[:, 10])
    c11 = jnp.asarray(vb[:, 11])
    zero = jnp.zeros_like(c3)
    vec = jnp.stack(c012 + [c3, c4, c5, c6, c7, c8, c9, c10, c11]
                    + [zero] * 4, axis=1)
    return dict(s, vec=vec)


# ---------------------------------------------------------------------------
# Kernel.
# ---------------------------------------------------------------------------

def _unpack_c(vec, skc, E1, E2):
    """vec columns + weight stacks -> the _mul_val constant tuple.
    CS vectors decode from vec cols 10/11 (non-negative, < 2^26)."""
    o2 = E1.shape[0] // 2
    CS1 = vec[:o2, 10:11].astype(jnp.int32)
    CS2 = vec[:o2, 11:12].astype(jnp.int32)
    return (vec[:, 0:1], vec[:, 1:2], vec[:, 2:3], vec[:, 3:4],
            vec[:, 4:5], vec[:, 5:6], vec[:, 6:7], vec[:, 7:8],
            vec[:, 8:9], skc, E1, CS1, E2, CS2)


def _mul_val(X, Y, c, *, k, CH, CHP, nlev):
    """One RNS-Montgomery product on kernel values ((CHP, TB) uint32).
    `c` is the unpacked constant bundle.  Mirrors rns.rns_mont_mul."""
    (mods, n0, n032, ximul, u5, v5, w9n, w9b, ximulh, skc, E1, CS1, E2,
     CS2) = c
    TB = X.shape[1]
    mB, n0B = mods[:k], n0[:k]
    mT, n0T = mods[k:CH], n0[k:CH]                      # B' ++ m_r
    mR, n0R = mods[2 * k:CH], n0[2 * k:CH]

    S = _cmul(X, Y, mods, n0)
    xi = _cmul_shoup(S[:k], ximul[:k], ximulh[:k], mB)
    S_A, S_B = _dots_c(xi, E1, CS1, k + 1)
    Q = _combine_dual(S_A, S_B, mT, n0T, nlev)
    Rp = _cmul2(S[k:CH], u5[k:CH], Q, v5[k:CH], mT, n0T)
    xip = _cmul_shoup(Rp[:k], ximul[k:2 * k], ximulh[k:2 * k],
                      mods[k:2 * k])
    T_A, T_B = _dots_c(xip, E2, CS2, k + 1)
    tgt_m = jnp.concatenate([mB, mR], axis=0)
    tgt_n0 = jnp.concatenate([n0B, n0R], axis=0)
    Zh = _combine_dual(T_A, T_B, tgt_m, tgt_n0, nlev)
    a = _cmul(Zh[k:], skc[0:1], mR, n0R)
    b = _cmul(Rp[k:], skc[1:2], mR, n0R)
    delta = _submod(a, b, mR)
    deltab = jnp.broadcast_to(delta, (k, TB))
    Z = _cmul2(Zh[:k], w9b[:k], deltab, w9n[:k], mB, n0B)
    pad = jnp.zeros((CHP - CH, TB), dtype=jnp.uint32)
    return jnp.concatenate([Z, Rp, pad], axis=0)


def _rns_exp_kernel(dig_ref, x_ref, vec_ref, skc_ref, e1_ref,
                    e2_ref, o_ref, tab_scr, *,
                    window, k, CH, nlev):
    CHP, TB = x_ref.shape
    vec = vec_ref[...]
    c = _unpack_c(vec, skc_ref[...], e1_ref[...], e2_ref[...])

    def mul(x, y):
        return _mul_val(x, y, c, k=k, CH=CH, CHP=CHP, nlev=nlev)

    one = jnp.broadcast_to(vec[:, 9:10], (CHP, TB))
    base = x_ref[...]
    tsize = 1 << window
    tab_scr[0:CHP, :] = one
    tab_scr[CHP:2 * CHP, :] = base
    cur = base
    for d in range(2, tsize):
        cur = mul(cur, base)
        tab_scr[d * CHP:(d + 1) * CHP, :] = cur

    n_win = dig_ref.shape[0]

    def wbody(j, acc):
        for _ in range(window):
            acc = mul(acc, acc)
        d = dig_ref[j]
        sel = tab_scr[pl.ds(d * CHP, CHP), :]
        return mul(acc, sel)

    o_ref[...] = lax.fori_loop(0, n_win, wbody, one)


@functools.partial(jax.jit,
                   static_argnames=("window", "tb", "k", "CH", "nlev"))
def _exp_call(x, digits, vec, skc, E1, E2, *, window,
              tb, k, CH, nlev):
    CHP = vec.shape[0]
    B = x.shape[1]
    BP = -(-B // tb) * tb
    if x.shape[0] != CHP or BP != B:
        xp = jnp.zeros((CHP, BP), dtype=jnp.uint32)
        x = lax.dynamic_update_slice(xp, x, (0, 0))
    digits = jnp.asarray(digits, dtype=jnp.int32).reshape(-1)
    bs = pl.BlockSpec((CHP, tb), lambda j, dig: (0, j),
                      memory_space=pltpu.VMEM)
    ws = lambda s: pl.BlockSpec(s, lambda j, dig: tuple(0 for _ in s),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BP // tb,),
        in_specs=[bs, ws(vec.shape), ws(skc.shape), ws(E1.shape),
                  ws(E2.shape)],
        out_specs=bs,
        scratch_shapes=[
            pltpu.VMEM(((1 << window) * CHP, tb), jnp.uint32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_rns_exp_kernel, window=window, k=k, CH=CH,
                          nlev=nlev),
        out_shape=jax.ShapeDtypeStruct((CHP, BP), jnp.uint32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(digits, x, vec, skc, E1, E2)
    return out


def _rns_exp_sched_kernel(dig_ref, x_ref, vec_ref, skc_ref, e1_ref,
                          e2_ref, o_ref,
                          tab_scr, *, window, k, CH, nlev):
    """Sliding-window schedule chain: one modmul per schedule entry —
    0 squares the accumulator, t > 0 multiplies by the odd power
    c^(2t-1) from the VMEM-resident table (built in 2^(window-1)
    entries: base, then repeated mul by c^2 stored in the last slot)."""
    CHP, TB = x_ref.shape
    vec = vec_ref[...]
    c = _unpack_c(vec, skc_ref[...], e1_ref[...], e2_ref[...])

    def mul(x, y):
        return _mul_val(x, y, c, k=k, CH=CH, CHP=CHP, nlev=nlev)

    one = jnp.broadcast_to(vec[:, 9:10], (CHP, TB))
    base = x_ref[...]
    tsize = 1 << (window - 1)
    c2 = mul(base, base)
    tab_scr[0:CHP, :] = base
    cur = base
    for t in range(1, tsize):
        cur = mul(cur, c2)
        tab_scr[t * CHP:(t + 1) * CHP, :] = cur

    n_ops = dig_ref.shape[0]

    def body(j, acc):
        d = dig_ref[j]
        sel = tab_scr[pl.ds(jnp.maximum(d - 1, 0) * CHP, CHP), :]
        operand = jnp.where(d == 0, acc, sel)
        return mul(acc, operand)

    o_ref[...] = lax.fori_loop(0, n_ops, body, one)


@functools.partial(jax.jit,
                   static_argnames=("window", "tb", "k", "CH", "nlev"))
def _exp_sched_call(x, sched, vec, skc, E1, E2, *,
                    window, tb, k, CH, nlev):
    CHP = vec.shape[0]
    B = x.shape[1]
    BP = -(-B // tb) * tb
    if x.shape[0] != CHP or BP != B:
        xp = jnp.zeros((CHP, BP), dtype=jnp.uint32)
        x = lax.dynamic_update_slice(xp, x, (0, 0))
    sched = jnp.asarray(sched, dtype=jnp.int32).reshape(-1)
    bs = pl.BlockSpec((CHP, tb), lambda j, dig: (0, j),
                      memory_space=pltpu.VMEM)
    ws = lambda s: pl.BlockSpec(s, lambda j, dig: tuple(0 for _ in s),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BP // tb,),
        in_specs=[bs, ws(vec.shape), ws(skc.shape), ws(E1.shape),
                  ws(E2.shape)],
        out_specs=bs,
        scratch_shapes=[
            pltpu.VMEM(((1 << (window - 1)) * CHP, tb), jnp.uint32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_rns_exp_sched_kernel, window=window, k=k,
                          CH=CH, nlev=nlev),
        out_shape=jax.ShapeDtypeStruct((CHP, BP), jnp.uint32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(sched, x, vec, skc, E1, E2)
    return out


def rns_exp_sched_p(X, sched, base: RnsBase, key: RnsModulus,
                    window: int, tb: int | None = None):
    """Drop-in for rns.rns_exp_sched on TPU."""
    p = kernel_operands(base, key)
    tb = tb or sched_tb(base.CH, window, X.shape[1])
    if tb is None:
        raise ValueError(
            f"rns_exp_sched_p: window {window} exceeds VMEM at CH={base.CH}")
    B = X.shape[1]
    out = _exp_sched_call(X, sched, p["vec"], p["skc"], p["E1"],
                          p["E2"], window=window, tb=tb, k=base.k,
                          CH=base.CH, nlev=combine_levels(base.mbits))
    return out[:base.CH, :B]


def _rns_exp_elem_kernel(x_ref, dig_ref, vec_ref, skc_ref, e1_ref,
                         e2_ref, o_ref,
                         tab_scr, *, window, k, CH, nlev):
    """Per-element-exponent chain: digits arrive as a (n_win, TB) VMEM
    block; window-table selection is a tsize-pass one-hot mask-select
    (same approach as the positional per-element kernel,
    pallas_mont3._mm3_exp_kernel)."""
    CHP, TB = x_ref.shape
    vec = vec_ref[...]
    c = _unpack_c(vec, skc_ref[...], e1_ref[...], e2_ref[...])

    def mul(x, y):
        return _mul_val(x, y, c, k=k, CH=CH, CHP=CHP, nlev=nlev)

    one = jnp.broadcast_to(vec[:, 9:10], (CHP, TB))
    base = x_ref[...]
    tsize = 1 << window
    tab_scr[0:CHP, :] = one
    tab_scr[CHP:2 * CHP, :] = base
    cur = base
    for d in range(2, tsize):
        cur = mul(cur, base)
        tab_scr[d * CHP:(d + 1) * CHP, :] = cur

    n_win = dig_ref.shape[0]

    def wbody(j, acc):
        for _ in range(window):
            acc = mul(acc, acc)
        d = dig_ref[pl.ds(j, 1), :]                     # (1, TB)
        sel = one
        for t in range(1, tsize):
            ent = tab_scr[t * CHP:(t + 1) * CHP, :]
            sel = jnp.where(d == t, ent, sel)
        return mul(acc, sel)

    o_ref[...] = lax.fori_loop(0, n_win, wbody, one)


@functools.partial(jax.jit,
                   static_argnames=("window", "tb", "k", "CH", "nlev"))
def _exp_elem_call(x, digits, vec, skc, E1, E2, *,
                   window, tb, k, CH, nlev):
    CHP = vec.shape[0]
    B = x.shape[1]
    BP = -(-B // tb) * tb
    if x.shape[0] != CHP or BP != B:
        xp = jnp.zeros((CHP, BP), dtype=jnp.uint32)
        x = lax.dynamic_update_slice(xp, x, (0, 0))
    n_win = digits.shape[0]
    if digits.shape[1] != BP:
        dp = jnp.zeros((n_win, BP), dtype=jnp.int32)
        digits = lax.dynamic_update_slice(
            dp, digits.astype(jnp.int32), (0, 0))
    else:
        digits = digits.astype(jnp.int32)
    bs = pl.BlockSpec((CHP, tb), lambda j: (0, j), memory_space=pltpu.VMEM)
    ds_ = pl.BlockSpec((n_win, tb), lambda j: (0, j),
                       memory_space=pltpu.VMEM)
    ws = lambda s: pl.BlockSpec(s, lambda j: tuple(0 for _ in s),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rns_exp_elem_kernel, window=window, k=k,
                          CH=CH, nlev=nlev),
        out_shape=jax.ShapeDtypeStruct((CHP, BP), jnp.uint32),
        grid=(BP // tb,),
        in_specs=[bs, ds_, ws(vec.shape), ws(skc.shape), ws(E1.shape),
                  ws(E2.shape)],
        out_specs=bs,
        scratch_shapes=[
            pltpu.VMEM(((1 << window) * CHP, tb), jnp.uint32),
        ],
        interpret=INTERPRET,
    )(x, digits, vec, skc, E1, E2)
    return out


def _rns_mul_kernel(a_ref, b_ref, vec_ref, skc_ref, e1_ref,
                    e2_ref, o_ref, *, k, CH, nlev):
    """Single RNS-Montgomery product (the streamed encrypt-comb step)."""
    vec = vec_ref[...]
    c = _unpack_c(vec, skc_ref[...], e1_ref[...], e2_ref[...])
    o_ref[...] = _mul_val(a_ref[...], b_ref[...], c, k=k, CH=CH,
                          CHP=a_ref.shape[0], nlev=nlev)


@functools.partial(jax.jit, static_argnames=("tb", "k", "CH", "nlev"))
def _mul_call(a, b, vec, skc, E1, E2, *, tb, k, CH, nlev):
    CHP = vec.shape[0]
    B = a.shape[1]
    BP = -(-B // tb) * tb
    if a.shape[0] != CHP or BP != B:
        pad_a = jnp.zeros((CHP, BP), dtype=jnp.uint32)
        a = lax.dynamic_update_slice(pad_a, a, (0, 0))
        pad_b = jnp.zeros((CHP, BP), dtype=jnp.uint32)
        b = lax.dynamic_update_slice(pad_b, b, (0, 0))
    bs = pl.BlockSpec((CHP, tb), lambda j: (0, j), memory_space=pltpu.VMEM)
    ws = lambda s: pl.BlockSpec(s, lambda j: tuple(0 for _ in s),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rns_mul_kernel, k=k, CH=CH, nlev=nlev),
        out_shape=jax.ShapeDtypeStruct((CHP, BP), jnp.uint32),
        grid=(BP // tb,),
        in_specs=[bs, bs, ws(vec.shape), ws(skc.shape), ws(E1.shape),
                  ws(E2.shape)],
        out_specs=bs,
        interpret=INTERPRET,
    )(a, b, vec, skc, E1, E2)
    return out


def rns_mul_p(A, B_state, base: RnsBase, key: RnsModulus,
              tb: int | None = None):
    """Drop-in for rns.rns_mont_mul on TPU (one product, no chain)."""
    p = kernel_operands(base, key)
    B = A.shape[1]
    tb = tb or _pick_tb_mul(base.CH, B)
    out = _mul_call(A, B_state, p["vec"], p["skc"], p["E1"],
                    p["E2"], tb=tb, k=base.k, CH=base.CH,
                    nlev=combine_levels(base.mbits))
    return out[:base.CH, :B]


def rns_exp_elem_p(X, digits, base: RnsBase, key: RnsModulus,
                   window: int, tb: int | None = None):
    """Drop-in for rns.rns_exp_elem on TPU: per-element exponents."""
    p = kernel_operands(base, key)
    tb = tb or _pick_tb(base.CH, window, X.shape[1])
    if tb is None:
        raise ValueError(
            f"rns_exp_elem_p: window {window} exceeds VMEM at CH={base.CH}")
    B = X.shape[1]
    out = _exp_elem_call(X, digits, p["vec"], p["skc"], p["E1"],
                         p["E2"], window=window, tb=tb, k=base.k,
                         CH=base.CH, nlev=combine_levels(base.mbits))
    return out[:base.CH, :B]


def rns_exp_shared_p(X, digits, base: RnsBase, key: RnsModulus,
                     window: int | None = None, tb: int | None = None):
    """Drop-in for rns.rns_exp_shared on TPU: X (CH, B) entered state,
    digits (n_win,) MSB-first shared-exponent digits (window must match
    the digit base).  Returns the (CH, B) state of c^e * M."""
    p = kernel_operands(base, key)
    if window is None:
        window, tb = plan(base.CH)
        tb = None
    tb = tb or _pick_tb(base.CH, window, X.shape[1])
    if tb is None:
        raise ValueError(
            f"rns_exp_shared_p: window {window} exceeds VMEM at CH={base.CH}")
    B = X.shape[1]
    out = _exp_call(X, digits, p["vec"], p["skc"], p["E1"],
                    p["E2"], window=window, tb=tb,
                    k=base.k, CH=base.CH,
                    nlev=combine_levels(base.mbits))
    return out[:base.CH, :B]

"""RNS-Montgomery modular arithmetic — the MXU-native modexp engine.

Implements docs/RNS_DESIGN.md: big-integer values live as residues over
two bases of 16-bit prime channels (B, B') plus one redundant channel
(Shenoy-Kumaresan), so a modular multiplication is

  * a handful of ELEMENTWISE channel passes (VPU) — no carries, no
    O(L)-deep schoolbook convolution, and
  * two constant-matrix base extensions (MXU matmuls with shared
    weights) — the quadratic term of positional-limb arithmetic moved
    onto the systolic array.

This replaces the VPU schoolbook product that bounds the positional-limb
kernels (ops/pallas_mont*.py) for the CRT-decrypt exponentiation — the
role the reference delegates to IPP-Crypto's ``mbx_exp_mb8`` inside
``ipcl::PrivateKey::decrypt`` (/root/reference/README.md:32).

Number-system conventions
-------------------------
* Channels: distinct odd 16-bit primes.  Base B = k channels, base
  B' = k channels, one redundant channel m_r.  State arrays are
  uint32[CH, batch] with CH = 2k+1, rows ordered [B | B' | m_r].
* Channel arithmetic is channel-Montgomery: a stored value X represents
  x with X = x * 2^16 mod m_ch; products use 16-bit REDC (no mulhi, no
  pseudo-Mersenne constraint on the primes).
* One RNS-Montgomery multiplication maps (x, y) -> x*y*M^-1 (mod m),
  where M = prod(B) is the Montgomery radix.  Values stay < (k+2)*m
  (asserted via M >= (k+2)^2 * m at construction); the first base
  extension is Bajard-fast (offset tolerated), the second is
  Shenoy-Kumaresan exact via the redundant channel.
* Base extensions contract 16-bit digits against 16-bit constant
  matrices byte-decomposed into plane matmuls whose int32 accumulators
  provably fit (asserted); plane recombination costs two channel REDCs,
  so matmul outputs carry a 2^-32 scale folded into the next constants.

The global matrices (extension, enter, exit) depend only on the base
configuration — they are shared across keys and across the p/q CRT
halves.  Per-key state is a handful of (CH,) constant vectors.
"""

from __future__ import annotations

import dataclasses
from functools import partial, lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .limb import (
    LIMB_BITS, LIMB_DTYPE, int_to_limbs, limbs_for_bits, normalize,
    sub_mod_base,
)
from . import montgomery as mg

MASK16 = 0xFFFF


# ---------------------------------------------------------------------------
# Host-side construction.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=1)
def _primes_desc():
    """All primes below 2^16, largest first (numpy sieve)."""
    limit = 1 << 16
    s = np.ones(limit, dtype=bool)
    s[:2] = False
    for i in range(2, 256):
        if s[i]:
            s[i * i::i] = False
    return [int(p) for p in np.nonzero(s)[0][::-1]]


def _channels_for(mbits: int):
    """Pick k and the channel lists for a modulus of `mbits` bits.

    Requires M >= (k+2)^2 * 2^mbits (closure bound for the fast first
    extension with inputs < (k+2)m) and symmetrically for M'."""
    primes = _primes_desc()
    logM = 0.0
    k = 0
    # interleave so M and M' stay balanced
    while True:
        k += 1
        need = mbits + 2 * (k + 2).bit_length()
        logMk = sum(float(np.log2(primes[2 * i])) for i in range(k))
        if logMk >= need + 1:
            break
    # (Round-5 measured NEGATIVE: rounding k up to a multiple of 8 for
    # sublane-aligned row slices was within noise at tb=128 and ~2%
    # slower at tb=256 — Mosaic handles the unaligned slices fine, so
    # the minimal channel count wins.)
    mods_B = [primes[2 * i] for i in range(k)]
    mods_Bp = [primes[2 * i + 1] for i in range(k)]
    m_r = primes[2 * k]
    M = 1
    for p in mods_B:
        M *= p
    Mp = 1
    for p in mods_Bp:
        Mp *= p
    assert M >= (k + 2) ** 2 << mbits and Mp >= (k + 2) ** 2 << mbits
    assert m_r > 2 * (k + 2)
    return k, mods_B, mods_Bp, m_r, M, Mp


def _byte_planes(mat: np.ndarray):
    """(out, k) uint32 16-bit entries -> two int32 byte-plane matrices."""
    lo = (mat & 0xFF).astype(np.int32)
    hi = (mat >> 8).astype(np.int32)
    return lo, hi


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RnsBase:
    """Key-independent RNS configuration for moduli up to 2^mbits."""

    mbits: int
    k: int
    M: int                   # prod(B)  (static aux — Python int)
    Mp: int                  # prod(B')
    m_r: int
    mods_B_int: tuple        # python ints, aux
    mods_Bp_int: tuple
    # device arrays (children)
    mods: jnp.ndarray        # (CH, 1) uint32 channel moduli [B | B' | m_r]
    n0: jnp.ndarray          # (CH, 1) uint32 = -m^-1 mod 2^16
    n032: jnp.ndarray        # (CH, 1) uint32 = -m^-1 mod 2^32 (combine)
    # first extension  xi(B) -> q_hat(B' + m_r):  (k+1, k) byte planes
    C1_lo: jnp.ndarray
    C1_hi: jnp.ndarray
    # second extension xi'(B') -> r_hat(B + m_r): (k+1, k) byte planes
    C2_lo: jnp.ndarray
    C2_hi: jnp.ndarray
    # exit: limbs of M/m_i:  (L_M, k) byte planes
    W_lo: jnp.ndarray
    W_hi: jnp.ndarray
    K1g: jnp.ndarray         # (k, 1) |(M/m_i)^-1|_{m_i}   (true-form xi mult)
    K2g: jnp.ndarray         # (k, 1) |(M'/m'_j)^-1|_{m'_j}
    exit_c: jnp.ndarray      # (3, 1): [|2^48 M^-1|, |M^-1 2^16|, 1]_{m_r}
    K2s: jnp.ndarray         # (k, 1) |K2g 2^-16|_{m'_j}  (Shoup xi' value)
    K2sh: jnp.ndarray        # (k, 1) floor(K2s 2^16 / m'_j)
    K1gs: jnp.ndarray        # (k, 1) |K1g 2^-16|_{m_i}   (Shoup exit xi)
    K1gsh: jnp.ndarray       # (k, 1) floor(K1gs 2^16 / m_i)
    # pre-folded mid-plane weights D = (2^8 C) mod target: the chain's
    # extension dots then need only TWO accumulators (see _combine_dual)
    D1_lo: jnp.ndarray       # (k+1, k) byte planes of (2^8 C1) mod tgt
    D1_hi: jnp.ndarray
    D2_lo: jnp.ndarray       # (k+1, k) byte planes of (2^8 C2) mod tgt
    D2_hi: jnp.ndarray

    def tree_flatten(self):
        children = (self.mods, self.n0, self.n032, self.C1_lo, self.C1_hi,
                    self.C2_lo, self.C2_hi, self.W_lo, self.W_hi,
                    self.K1g, self.K2g, self.exit_c, self.K2s, self.K2sh,
                    self.K1gs, self.K1gsh, self.D1_lo, self.D1_hi,
                    self.D2_lo, self.D2_hi)
        aux = (self.mbits, self.k, self.M, self.Mp, self.m_r,
               self.mods_B_int, self.mods_Bp_int)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @property
    def CH(self):
        return 2 * self.k + 1

    @property
    def L_W(self):
        return limbs_for_bits(self.M.bit_length()) + 1

    @classmethod
    @lru_cache(maxsize=8)
    def for_bits(cls, mbits: int) -> "RnsBase":
        k, mods_B, mods_Bp, m_r, M, Mp = _channels_for(mbits)
        CH = 2 * k + 1
        all_mods = mods_B + mods_Bp + [m_r]
        mods = np.array(all_mods, dtype=np.uint32)[:, None]
        n0 = np.array([(-pow(m, -1, 1 << 16)) % (1 << 16)
                       for m in all_mods], dtype=np.uint32)[:, None]
        n032 = np.array([(-pow(m, -1, 1 << 32)) % (1 << 32)
                         for m in all_mods], dtype=np.uint32)[:, None]
        # C1[j, i] = (M/m_i) mod target_j, targets = B' ++ [m_r]
        tgt1 = mods_Bp + [m_r]
        C1 = np.zeros((k + 1, k), dtype=np.uint32)
        for i, mi in enumerate(mods_B):
            Mi = M // mi
            for j, mj in enumerate(tgt1):
                C1[j, i] = Mi % mj
        # C2[j, i] = (M'/m'_i) mod target_j, targets = B ++ [m_r]
        tgt2 = mods_B + [m_r]
        C2 = np.zeros((k + 1, k), dtype=np.uint32)
        for i, mi in enumerate(mods_Bp):
            Mi = Mp // mi
            for j, mj in enumerate(tgt2):
                C2[j, i] = Mi % mj
        # W[l, i] = limb l of M/m_i; one extra headroom limb so the
        # carry-save accumulation of r_hat < k*M never sheds a top carry
        L_W = limbs_for_bits(M.bit_length()) + 1
        W = np.zeros((L_W, k), dtype=np.uint32)
        for i, mi in enumerate(mods_B):
            W[:, i] = int_to_limbs(M // mi, L_W)
        K1g = np.array([pow((M // mi) % mi, -1, mi)
                        for mi in mods_B], dtype=np.uint32)[:, None]
        K2g = np.array([pow((Mp // mj) % mj, -1, mj)
                        for mj in mods_Bp], dtype=np.uint32)[:, None]
        # SK-offset constants (redundant channel): the second extension
        # reconstructs modulo M' = prod(B'), so these invert M'.
        # (exit_c[0] carries 2^32, not 2^48: the dual-accumulator combine
        # leaves Zh with scale 2^-16 instead of the old 2^-32.)
        exit_c = np.array([
            (1 << 32) % m_r * pow(Mp % m_r, -1, m_r) % m_r,
            pow(Mp % m_r, -1, m_r),
            1,
        ], dtype=np.uint32)[:, None]
        # Plane-accumulator bound: S_A/S_B < 2k*255^2 must fit int32
        # (=> k < 16500) — both the XLA int8 dot_general path and the
        # Pallas centered-int8 MXU kernel accumulate in int32 (the
        # round-4 bf16 kernel's k <= 900 f32-exactness bound is gone).
        assert 2 * k * 255 * 255 < (1 << 31)
        def shoup_col(vals, mlist):
            pairs = [_shoup_pair(int(v) * pow(1 << 16, -1, mi), mi)
                     for v, mi in zip(vals[:, 0], mlist)]
            c = np.array([p[0] for p in pairs], dtype=np.uint32)[:, None]
            ch = np.array([p[1] for p in pairs], dtype=np.uint32)[:, None]
            return c, ch

        K2s, K2sh = shoup_col(K2g, mods_Bp)
        K1gs, K1gsh = shoup_col(K1g, mods_B)
        tmods1 = np.array(tgt1, dtype=np.uint64)[:, None]
        tmods2 = np.array(tgt2, dtype=np.uint64)[:, None]
        D1 = ((C1.astype(np.uint64) << 8) % tmods1).astype(np.uint32)
        D2 = ((C2.astype(np.uint64) << 8) % tmods2).astype(np.uint32)
        j = lambda a: jnp.asarray(a)
        C1_lo, C1_hi = _byte_planes(C1)
        C2_lo, C2_hi = _byte_planes(C2)
        D1_lo, D1_hi = _byte_planes(D1)
        D2_lo, D2_hi = _byte_planes(D2)
        W_lo, W_hi = _byte_planes(W)
        return cls(mbits, k, M, Mp, m_r, tuple(mods_B), tuple(mods_Bp),
                   j(mods), j(n0), j(n032), j(C1_lo), j(C1_hi), j(C2_lo),
                   j(C2_hi), j(W_lo), j(W_hi), j(K1g), j(K2g), j(exit_c),
                   j(K2s), j(K2sh), j(K1gs), j(K1gsh), j(D1_lo), j(D1_hi),
                   j(D2_lo), j(D2_hi))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RnsModulus:
    """Per-(key, modulus) constant vectors for one CRT half (m = p^2).

    All channel constants are folded with the powers of 2^16 introduced
    by channel-REDC so that every step lands on the documented scale
    (module docstring); R below is the positional-limb Montgomery radix
    of the companion MontCtx (2^(16 L_h))."""

    m: int                   # aux (python int)
    K1s: jnp.ndarray         # (k, 1)  |-m^-1 (M/m_i)^-1 2^-16|_{m_i} (Shoup)
    K1sh: jnp.ndarray        # (k, 1)  floor(K1s 2^16 / m_i)
    u5: jnp.ndarray          # (k+1, 1) |M^-1 2^16|   on B' ++ m_r
    v5: jnp.ndarray          # (k+1, 1) |m M^-1 2^64| on B' ++ m_r
    w9n: jnp.ndarray         # (k, 1)  |-M' 2^32|_{m_i} (fused SK corr.)
    w9b: jnp.ndarray         # (k, 1)  |2^64|_{m_i}
    y_enter: jnp.ndarray     # (CH, 1) ch-Mont residues of M^2 R^-1 mod m
    c_enter: jnp.ndarray     # (CH, 1) |2^64|_{m_ch}  (enter scale fix)
    K3: jnp.ndarray          # (k, 1) = base.K1g (exit xi)
    k4_limbs: jnp.ndarray    # (L, 1) |R^3 M^-1|_m  (exit Montgomery fold)
    one_ch: jnp.ndarray      # (CH, 1) ch-Mont state of M mod m (RNS "1")
    k5_limbs: jnp.ndarray    # (L, 1) |R^4 M^-1|_m  (canonical-enter fold)

    # Every m-derived constant a traced program needs is a pytree CHILD
    # (a runtime argument), never a host-side numpy value: numpy built
    # from the aux `m` under trace would bake into the HLO as a literal,
    # making every program hash key-specific — each new key would then
    # recompile the multi-second encrypt/decrypt/build programs instead
    # of hitting the persistent compilation cache (round-5 fix for the
    # "heavy per-key RNS setup" verdict).

    def tree_flatten(self):
        return (self.K1s, self.K1sh, self.u5, self.v5, self.w9n,
                self.w9b, self.y_enter, self.c_enter, self.K3,
                self.k4_limbs, self.one_ch, self.k5_limbs), (self.m,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], *children)

    @classmethod
    def build(cls, base: RnsBase, m: int, L: int) -> "RnsModulus":
        assert m.bit_length() <= base.mbits and m % 2 == 1
        v = modulus_vectors(base.mbits, m)
        R = 1 << (LIMB_BITS * L)
        M = base.M
        y = M * M % m * pow(R, -1, m) % m
        all_mods = (list(base.mods_B_int) + list(base.mods_Bp_int)
                    + [base.m_r])
        y_enter = np.array([(y % mc) * (1 << 16) % mc for mc in all_mods],
                           dtype=np.uint32)[:, None]
        c_enter = np.array([pow(2, 64, mc) for mc in all_mods],
                           dtype=np.uint32)[:, None]
        ej = exit_redc_iters(base, L)
        k4 = pow(R, 2, m) * pow(2, 16 * ej, m) % m * pow(M % m, -1, m) % m
        k5 = pow(R, 3, m) * pow(2, 16 * ej, m) % m * pow(M % m, -1, m) % m
        Mm = M % m
        one_ch = np.array([(Mm % mc) * (1 << 16) % mc for mc in all_mods],
                          dtype=np.uint32)[:, None]
        j = lambda a: jnp.asarray(a)
        return cls(m, j(v["K1s"]), j(v["K1sh"]), j(v["u5"]), j(v["v5"]),
                   j(v["w9n"]), j(v["w9b"]), j(y_enter), j(c_enter),
                   base.K1g, j(int_to_limbs(k4, L)[:, None]), j(one_ch),
                   j(int_to_limbs(k5, L)[:, None]))


@lru_cache(maxsize=32)
def modulus_vectors(mbits: int, m: int) -> dict:
    """Per-(base, m) channel constant vectors as NUMPY arrays (host).

    Shared by RnsModulus.build and the Pallas kernel packer — the latter
    runs at trace time where the pytree leaves are tracers, so constants
    must be rebuilt from the static ints (mbits, m)."""
    base = RnsBase.for_bits(mbits)
    k, M, Mp, m_r = base.k, base.M, base.Mp, base.m_r
    mods_B, mods_Bp = base.mods_B_int, base.mods_Bp_int
    minv_M = [(-pow(m, -1, mi)) % mi for mi in mods_B]
    K1 = np.array([minv_M[i] * pow((M // mi) % mi, -1, mi) % mi
                   for i, mi in enumerate(mods_B)],
                  dtype=np.uint32)[:, None]
    k1p = [_shoup_pair(int(K1[i, 0]) * pow(1 << 16, -1, mi), mi)
           for i, mi in enumerate(mods_B)]
    K1s = np.array([p[0] for p in k1p], dtype=np.uint32)[:, None]
    K1sh = np.array([p[1] for p in k1p], dtype=np.uint32)[:, None]
    tgt = list(mods_Bp) + [m_r]
    u5 = np.array([pow(M % mj, -1, mj) * (1 << 16) % mj for mj in tgt],
                  dtype=np.uint32)[:, None]
    # v5 / w9b multiply combine outputs, whose scale is 2^-16 under the
    # dual-accumulator scheme (was 2^-32) — hence 2^48, not 2^64
    v5 = np.array([(m % mj) * pow(M % mj, -1, mj) % mj
                   * pow(2, 48, mj) % mj for mj in tgt],
                  dtype=np.uint32)[:, None]
    w9a = np.array([(Mp % mi) * pow(1 << 16, -1, mi) % mi
                    for mi in mods_B], dtype=np.uint32)[:, None]
    w9b = np.array([pow(2, 48, mi) for mi in mods_B],
                   dtype=np.uint32)[:, None]
    # fused SK-exit constant: w9n = -w9a*2^64*2^-16 mod m_i, so the tail
    # Z = (Zh - delta*w9a*2^-16)*2^64*2^-16 collapses to one paired
    # product Z = (Zh*w9b + delta*w9n)*2^-16 (see _cmul2; w9n keeps the
    # pre-rescale 2^64 factor — the 2^16 shift lives in Zh, not delta)
    w9n = np.array([
        (-int(w9a[i, 0]) * pow(2, 64, mi)
         * pow(1 << 16, -1, mi)) % mi
        for i, mi in enumerate(mods_B)], dtype=np.uint32)[:, None]
    return {"K1": K1, "K1s": K1s, "K1sh": K1sh, "u5": u5, "v5": v5,
            "w9a": w9a, "w9b": w9b, "w9n": w9n}


# ---------------------------------------------------------------------------
# Channel primitives (elementwise, uint32).
# ---------------------------------------------------------------------------

def _csub(r, mods):
    """One conditional subtract (r < 2m -> < m).

    (Round-5 note: the unsigned wrap-minimum formulation — one VPU op
    instead of compare+select — fails to legalize in this Mosaic
    toolchain: 'arith.minui' on vector<8x128xi32> is unsupported, so
    the explicit compare stands.)"""
    return jnp.where(r >= mods, r - mods, r)


def _carry16(tl):
    """The 2^16-carry of tl + (u*m mod 2^16) in a 16-bit REDC.

    u*m === -tl (mod 2^16) by construction of u, so the two sub-2^16
    halves sum to exactly 0 or 2^16: the carry is just (tl != 0) — one
    compare+cast instead of and/add/shift (round-5 lever)."""
    return (tl != 0).astype(jnp.uint32)


def _cmul(a, b, mods, n0):
    """Channel product with 16-bit REDC: a*b*2^-16 mod m, output < m.

    a, b < 2^16 (so the uint32 product is exact); mods/n0 broadcast."""
    t = a * b
    tl = t & MASK16
    u = (tl * n0) & MASK16
    um = u * mods
    # (t + um) / 2^16 without the 33-bit intermediate
    r = (t >> 16) + (um >> 16) + _carry16(tl)
    return _csub(r, mods)


def _redc(t, mods, n0):
    """t * 2^-16 mod m for any uint32 t; output < m (two cond-subs)."""
    tl = t & MASK16
    u = (tl * n0) & MASK16
    um = u * mods
    r = (t >> 16) + (um >> 16) + _carry16(tl)
    return _csub(_csub(r, mods), mods)


def _cmul_shoup(a, c, ch, mods):
    """Constant channel product a*c mod m via Shoup precomputation.

    a < 2^16 reduced, c < m a CONSTANT with companion
    ch = floor(c * 2^16 / m).  q = (a*ch) >> 16 is within 1 of
    floor(a*c/m), so r = a*c - q*m (wrapping uint32, exact since
    0 <= r < 2m < 2^32) needs one conditional subtract.  ~8 VPU ops
    against _cmul's ~14 — used for the xi / xi' passes of every
    RNS-Montgomery product (round-5 lever).  NOTE: no 2^-16 REDC scale —
    fold it into the constant."""
    q = (a * ch) >> 16
    r = a * c - q * mods
    return _csub(r, mods)


def _shoup_pair(c_int, m_int):
    """Host helper: (c mod m, floor(c * 2^16 / m)) for _cmul_shoup."""
    c = c_int % m_int
    return c, (c << 16) // m_int


def _cmul2(a, b, c, d, mods, n0):
    """Paired channel product (a*b + c*d) * 2^-16 mod m, output < m.

    One REDC serves BOTH products: 4 uint32 multiplies instead of the 6
    (plus an addmod) that two _cmuls cost — the u32 vector multiply is
    the expensive VPU primitive, so the hot chain uses this wherever it
    sums two products (measured round 5).  Inputs < m; exact: P+Q is
    carried as split (lo, hi) halves, every intermediate < 2^32."""
    P = a * b
    Q = c * d
    lo = (P & MASK16) + (Q & MASK16)                  # < 2^17
    hi = (P >> 16) + (Q >> 16)                        # < 2^17
    ll = lo & MASK16
    u = (ll * n0) & MASK16
    um = u * mods
    r = hi + (lo >> 16) + (um >> 16) + _carry16(ll)
    return _csub(_csub(r, mods), mods)                # r < 3m


def _submod(a, b, mods):
    """(a - b) mod m for a, b < m."""
    return jnp.where(a >= b, a - b, a + mods - b)


def _addmod(a, b, mods):
    return _csub(a + b, mods)


def _plane_dots(x, W_lo, W_hi):
    """Byte-plane matmuls: x (k_in, B) uint32 16-bit values against the
    (out, k_in) byte planes.  Returns S00, mid, S11 int32 (out, B).

    Runs as CENTERED int8 matmuls so the contraction rides the MXU
    (int8 x int8 -> int32): with x' = x - 128 and w' = w - 128,
    sum(x*w) = dot(x', w') + 128*sum(x') + 128*sum(w') + 128^2*k — the
    corrections are a per-column scalar (one VPU reduction), a
    per-row constant (folds at trace time), and a literal.  Exact: every
    int8 product sums over k_in < 2^9 terms, |dot| < 2^23 < int32."""
    k_in = x.shape[0]
    x0 = (x & 0xFF).astype(jnp.int32)
    x1 = (x >> 8).astype(jnp.int32)
    x0c = (x0 - 128).astype(jnp.int8)
    x1c = (x1 - 128).astype(jnp.int8)
    Wl = (W_lo - 128).astype(jnp.int8)
    Wh = (W_hi - 128).astype(jnp.int8)
    cl = jnp.sum(W_lo - 128, axis=1, keepdims=True)      # (out, 1) int32
    chi = jnp.sum(W_hi - 128, axis=1, keepdims=True)
    s0 = jnp.sum(x0, axis=0, keepdims=True) - 128 * k_in  # (1, B) = sum x0'
    s1 = jnp.sum(x1, axis=0, keepdims=True) - 128 * k_in
    dot = partial(lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.int32)
    off = 128 * 128 * k_in
    S00 = dot(Wl, x0c) + 128 * s0 + 128 * cl + off
    S11 = dot(Wh, x1c) + 128 * s1 + 128 * chi + off
    mid = (dot(Wl, x1c) + dot(Wh, x0c)
           + 128 * (s0 + s1) + 128 * (cl + chi) + 2 * off)
    return S00, mid, S11


def _plane_dots_dual(x, C_lo, C_hi, D_lo, D_hi):
    """16-bit digits x (k, B) against C and D = (2^8 C mod m) planes.

    S_A = C_lo.x0 + D_lo.x1 and S_B = C_hi.x0 + D_hi.x1 (exact int32),
    so the true dot is S_A + 2^8*S_B: the mid byte-plane's 2^8 factor is
    PRE-REDUCED into the D weights, leaving two accumulators instead of
    three — same centered-int8 MXU MAC count, but the per-row reduction
    collapses to _combine_dual's single 16-bit REDC (round-5 lever)."""
    k_in = x.shape[0]
    x0 = (x & 0xFF).astype(jnp.int32)
    x1 = (x >> 8).astype(jnp.int32)
    x0c = (x0 - 128).astype(jnp.int8)
    x1c = (x1 - 128).astype(jnp.int8)
    s0 = jnp.sum(x0, axis=0, keepdims=True) - 128 * k_in
    s1 = jnp.sum(x1, axis=0, keepdims=True) - 128 * k_in
    dot = partial(lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.int32)
    off = 128 * 128 * k_in

    def cdot(W, xc, s):
        c = jnp.sum(W - 128, axis=1, keepdims=True)
        return dot((W - 128).astype(jnp.int8), xc) + 128 * s + 128 * c + off

    S_A = cdot(C_lo, x0c, s0) + cdot(D_lo, x1c, s1)
    S_B = cdot(C_hi, x0c, s0) + cdot(D_hi, x1c, s1)
    return S_A, S_B


def _combine_dual(S_A, S_B, mods, n0, nlev: int):
    """Dual plane accumulators -> (S_A + 2^8 S_B) * 2^-16 mod m, < m.

    V = t + 2^16*B1 with t = S_A + (S_B_lo8 << 8) < ~2^24 and
    B1 = S_B >> 8; ONE 16-bit REDC pass reduces t, B1 adds in directly,
    and a short binary conditional-subtract chain (nlev levels, host-
    computed via combine_levels from the exact accumulator bounds)
    canonicalizes.  ~24 VPU ops against the 3-accumulator radix-2^32
    pass's ~37."""
    t = S_A.astype(jnp.uint32) + ((S_B.astype(jnp.uint32) & 0xFF) << 8)
    B1 = (S_B >> 8).astype(jnp.uint32)
    tl = t & MASK16
    u = (tl * n0) & MASK16
    um = u * mods
    r = (t >> 16) + (um >> 16) + _carry16(tl) + B1
    for lev in range(nlev - 1, -1, -1):
        mm = mods << lev
        r = jnp.where(r >= mm, r - mm, r)
    return r


@lru_cache(maxsize=8)
def combine_levels(mbits: int) -> int:
    """Binary subtract-chain depth for _combine_dual at this base:
    smallest nlev with r_max < 2^nlev * min(channel modulus)."""
    base = RnsBase.for_bits(mbits)
    k = base.k
    mods = list(base.mods_B_int) + list(base.mods_Bp_int) + [base.m_r]
    t_max = 2 * k * 255 * 255 + 255 * 256
    r_max = t_max // (1 << 16) + max(mods) + 1 + (2 * k * 255 * 255) // 256
    ratio = -(-r_max // min(mods))
    return max(1, (ratio - 1).bit_length())


def _combine_planes(S00, mid, S11, mods, n032):
    """Byte-plane sums -> (true value)*2^-32 mod m, < m.

    A = S00 + 2^8*mid + 2^16*S11 (the exact integer dot product), held
    as A = t + 2^16*B1 with t = S00 + (lo<<8) and B1 = (hi<<15) + S11
    (mid splits at 2^23 so both halves fit uint32).  ONE radix-2^32
    Montgomery pass reduces it: u = A * (-m^-1) mod 2^32 (wrapping u32
    multiplies), T = A + u*m === 0 mod 2^32, output T / 2^32 < 2m.
    Saves a multiply and ~9 VPU ops per row over the round-4 two-pass
    16-bit REDC (and retires the |2^15| fold constant)."""
    lo = (mid & ((1 << 23) - 1)).astype(jnp.uint32)
    hi = (mid >> 23).astype(jnp.uint32)
    t = S00.astype(jnp.uint32) + (lo << 8)
    B1 = (hi << 15) + S11.astype(jnp.uint32)
    u = t * n032 + ((B1 * n032) << 16)       # A * -m^-1 mod 2^32
    A2 = (u & MASK16) * mods                 # u_lo * m
    Bm = (u >> 16) * mods                    # u_hi * m
    # T = (t + A2) + 2^16*(B1 + Bm), divisible by 2^32; the low 16 bits
    # of t + A2 are exactly 0, so their carry is just (t_lo != 0)
    C1 = (t >> 16) + (A2 >> 16) + _carry16(t & MASK16)
    r = ((C1 >> 16) + (B1 >> 16) + (Bm >> 16)
         + (((C1 & MASK16) + (B1 & MASK16) + (Bm & MASK16)) >> 16))
    return _csub(r, mods)


# ---------------------------------------------------------------------------
# The RNS-Montgomery multiplication.
# ---------------------------------------------------------------------------

def rns_mont_mul(X, Y, base: RnsBase, key: RnsModulus):
    """One RNS-Montgomery product: states (CH, B) -> state of x*y*M^-1.

    Inputs/outputs are channel-Montgomery residues of values < (k+2)m.
    Steps (docs/RNS_DESIGN.md sketch, with SK exact second extension):
    channel square/mul; xi on B; MXU-extend to B'+m_r; r' on B'+m_r;
    xi' on B'; MXU-extend back; SK offset from the redundant channel."""
    k = base.k
    nlev = combine_levels(base.mbits)
    mods, n0 = base.mods, base.n0
    mB, n0B = mods[:k], n0[:k]
    mT, n0T = mods[k:], n0[k:]                          # B' ++ m_r
    mR, n0R = mods[2 * k:], n0[2 * k:]

    S = _cmul(X, Y, mods, n0)                           # ch-Mont(s), CH rows
    xi = _cmul_shoup(S[:k], key.K1s, key.K1sh, mB)      # true xi, B rows
    S_A, S_B = _plane_dots_dual(xi, base.C1_lo, base.C1_hi,
                                base.D1_lo, base.D1_hi)
    Q = _combine_dual(S_A, S_B, mT, n0T, nlev)          # q_hat * 2^-16
    Rp = _cmul2(S[k:], key.u5, Q, key.v5, mT, n0T)      # ch-Mont(r'), B'+m_r
    xip = _cmul_shoup(Rp[:k], base.K2s, base.K2sh, mods[k:2 * k])
    T_A, T_B = _plane_dots_dual(xip, base.C2_lo, base.C2_hi,
                                base.D2_lo, base.D2_hi)
    tgt_m = jnp.concatenate([mB, mR], axis=0)
    tgt_n0 = jnp.concatenate([n0B, n0R], axis=0)
    Zh = _combine_dual(T_A, T_B, tgt_m, tgt_n0, nlev)
    # SK offset from the redundant channel: delta = (r_hat - r') * M'^-1;
    # the correction folds into ONE paired product via w9n = -w9a*w9b/2^16
    a = _cmul(Zh[k:], base.exit_c[0:1], mR, n0R)        # r_hat * M'^-1
    b = _cmul(Rp[k:], base.exit_c[1:2], mR, n0R)        # r'    * M'^-1
    delta = _submod(a, b, mR)                           # true, < k
    deltab = jnp.broadcast_to(delta, (k, delta.shape[1]))
    Z = _cmul2(Zh[:k], key.w9b, deltab, key.w9n, mB, n0B)  # ch-Mont, B rows
    return jnp.concatenate([Z, Rp], axis=0)


def residue_fold_limbs(T, C_lo, C_hi, Lh: int):
    """Positional residue fold on the MXU: (K, B) canonical limbs of a
    wide value X -> (Lh+2, B) canonical limbs of V === X (mod m),
    V < m * 2^(16 + log2 K).

    C byte planes hold the limbs of 2^(16l) mod m ((Lh, K) each), so
    V = sum_l T_l * C[:, l] is one byte-plane matmul group — the
    128-step positional REDC loop this replaces was the CRT decrypt's
    stage-1 cost (round 5: 48 ms -> ~4 ms at 2048/B=32768).  Bounds:
    S00/mid/S11 < 2*K*255^2 (int32-exact for K < 33000); the combined
    carry-save rows stay < 2^32."""
    B = T.shape[1]
    S00, mid, S11 = _plane_dots(T, C_lo, C_hi)
    lo = (mid & ((1 << 23) - 1)).astype(jnp.uint32)
    hi = (mid >> 23).astype(jnp.uint32)
    body = S00.astype(jnp.uint32) + (lo << 8)           # (Lh, B)
    upv = (hi << 15) + S11.astype(jnp.uint32)           # one limb higher
    zrow = jnp.zeros((2, B), dtype=LIMB_DTYPE)
    arr = jnp.concatenate([body, zrow], axis=0)         # (Lh+2, B)
    arr = arr.at[1:Lh + 1].add(upv)
    return normalize(arr)


@lru_cache(maxsize=16)
def _residue_planes_np(m: int, Lh: int, K: int):
    """Byte planes of C[j, l] = limb j of (2^(16l) mod m) — host numpy.
    Callers must pass the result as jit ARGUMENTS (m is key-derived;
    baking it would make program HLO key-specific)."""
    C = np.zeros((Lh, K), dtype=np.uint32)
    for l in range(K):
        C[:, l] = int_to_limbs(pow(2, 16 * l, m), Lh)
    return _byte_planes(C)


def rns_enter(v_limbs, base: RnsBase, key: RnsModulus):
    """(L, B) positional limbs of v = c*R (Montgomery-limb form, < 2m)
    -> RNS state of c*M (one residue matmul + one RNS product)."""
    L = v_limbs.shape[0]
    P_lo, P_hi = _enter_planes(base, L)
    S00, mid, S11 = _plane_dots(v_limbs, P_lo, P_hi)
    V = _combine_planes(S00, mid, S11, base.mods, base.n032)
    V = _cmul(V, key.c_enter, base.mods, base.n0)       # ch-Mont(v)
    return rns_mont_mul(V, jnp.broadcast_to(key.y_enter, V.shape),
                        base, key)


@lru_cache(maxsize=16)
def _enter_planes_np(base_key, L):
    base = RnsBase.for_bits(base_key)
    all_mods = (list(base.mods_B_int) + list(base.mods_Bp_int)
                + [base.m_r])
    P = np.zeros((base.CH, L), dtype=np.uint32)
    for c, mc in enumerate(all_mods):
        for l in range(L):
            P[c, l] = pow(2, 16 * l, mc)
    # cache NUMPY planes: a jnp array materialized inside a jit trace
    # is a tracer and must never be cached across traces
    return _byte_planes(P)


def _enter_planes(base: RnsBase, L: int):
    return _enter_planes_np(base.mbits, L)


def exit_redc_iters(base: RnsBase, L: int) -> int:
    """REDC steps for the SK-exit short reduction: enough that
    z~ < k*M shrinks below m/4 for the smallest modulus the base
    serves (m >= 2^(mbits-16)), and that every limb row above L has
    shifted out.  Folding 2^(16j) into k4/k5 replaces the full
    L-iteration reduction (L=257 at the 2048-bit encrypt exit) with
    ~4-5 steps — the exit was ~40% of the encrypt chain's fixed cost
    (round 5)."""
    j1 = -(-((base.k * base.M).bit_length() - (base.mbits - 16) + 2) // 16)
    j2 = base.L_W - L
    return max(j1, j2, 1)


def rns_exit(Z, base: RnsBase, key: RnsModulus, sq_ctx, L: int):
    """RNS state of z~ = c^e * M (< (k+1)m) -> canonical limbs of
    c^e mod m (Shenoy-Kumaresan CRT to limbs, a SHORT positional REDC,
    one Montgomery fold by |R^2 2^16j M^-1| and a standard exit)."""
    z_limbs = _exit_limbs(Z, base)
    t = mg.mont_reduce_wide(z_limbs, sq_ctx,
                            iters=exit_redc_iters(base, L))
    u = mg.mont_mul(t, key.k4_limbs, sq_ctx)            # c^e * R (Mont form)
    return mg.from_mont(u, sq_ctx)                      # canonical < m


def rns_exit_mont(Z, base: RnsBase, key: RnsModulus, sq_ctx, L: int):
    """Exit for chains whose ENTER took canonical (non-Montgomery-limb)
    input — the encrypt comb product: the state's value carries an R^-1,
    and the ciphertext representation wants Montgomery-limb form, so the
    fold constant is |R^4 M^-1| and there is no final from_mont.
    Output < 2m (Walter), i.e. a valid resident ciphertext."""
    z_limbs = _exit_limbs(Z, base)
    t = mg.mont_reduce_wide(z_limbs, sq_ctx)
    return mg.mont_mul(t, key.k5_limbs, sq_ctx)         # value * R


def _exit_limbs(Z, base: RnsBase):
    """SK-CRT reconstruction of the state's exact integer value z~ < kM
    into positional limbs (L_W, B)."""
    k = base.k
    mods, n0 = base.mods, base.n0
    mR, n0R = mods[2 * k:], n0[2 * k:]
    B = Z.shape[1]

    xi = _cmul_shoup(Z[:k], base.K1gs, base.K1gsh, mods[:k])  # true xi
    # limb-plane matmul: r_hat = sum xi_i * (M/m_i)
    S00, mid, S11 = _plane_dots(xi, base.W_lo, base.W_hi)
    lo = (mid & ((1 << 23) - 1)).astype(jnp.uint32)
    hi = (mid >> 23).astype(jnp.uint32)
    zrow = jnp.zeros((1, B), dtype=LIMB_DTYPE)
    up = lambda x: jnp.concatenate([zrow, x[:-1]], axis=0)
    r_hat = normalize(S00.astype(jnp.uint32) + (lo << 8)
                      + up((hi << 15) + S11.astype(jnp.uint32)))
    # r_hat mod m_r via the C1 redundant row (contraction over k)
    c1r_lo = base.C1_lo[k:k + 1]
    c1r_hi = base.C1_hi[k:k + 1]
    R00, rmid, R11 = _plane_dots(xi, c1r_lo, c1r_hi)
    rr = _combine_planes(R00, rmid, R11, mR, base.n032[2 * k:])
    rr = _cmul(rr, _c48(base), mR, n0R)                 # true r_hat mod m_r
    z_r = _cmul(Z[2 * k:], base.exit_c[2:3], mR, n0R)   # true z~ mod m_r
    diff = _submod(rr, z_r, mR)
    delta = _cmul(diff, _cMinv16(base), mR, n0R)        # true delta, < k
    dM = normalize(_M_limbs(base) * delta)              # (L_M, B)
    return sub_mod_base(r_hat, dM)                      # exact, z~ < kM


@lru_cache(maxsize=8)
def _c48_np(mbits):
    base = RnsBase.for_bits(mbits)
    return np.array([[pow(2, 48, base.m_r)]], dtype=np.uint32)


def _c48(base):
    return _c48_np(base.mbits)


@lru_cache(maxsize=8)
def _cMinv16_np(mbits):
    base = RnsBase.for_bits(mbits)
    v = pow(base.M % base.m_r, -1, base.m_r) * (1 << 16) % base.m_r
    return np.array([[v]], dtype=np.uint32)


def _cMinv16(base):
    return _cMinv16_np(base.mbits)


@lru_cache(maxsize=8)
def _M_limbs_np(mbits):
    base = RnsBase.for_bits(mbits)
    return int_to_limbs(base.M, base.L_W)[:, None]


def _M_limbs(base):
    return _M_limbs_np(base.mbits)


# ---------------------------------------------------------------------------
# Shared-exponent modexp over RNS states (the CRT-decrypt hot chain).
# ---------------------------------------------------------------------------

def rns_one_state(base: RnsBase, key: RnsModulus, B: int):
    """Ch-Mont RNS state of M mod m (the RNS-Montgomery rep of 1).

    Reads the key's one_ch CHILD (a traced argument) so the program
    stays key-independent under jit (see RnsModulus)."""
    return jnp.broadcast_to(key.one_ch, (base.CH, B))


def rns_exp_shared(X, digits, base: RnsBase, key: RnsModulus,
                   window: int):
    """X^e * M-domain chain: X is the entered state (value c*M); digits
    are the shared exponent's MSB-first base-2^window digits (traced).
    Returns the state of c^e * M.

    On TPU this dispatches to the VMEM-resident Pallas kernel
    (ops/pallas_rns.py); the jnp body below is the CPU/verification
    path (bit-identical)."""
    if mg._on_tpu():
        from . import pallas_rns
        if pallas_rns.tb_for(base.CH, window):
            return pallas_rns.rns_exp_shared_p(X, digits, base, key,
                                               window)
    B = X.shape[1]
    tsize = 1 << window
    entries = [rns_one_state(base, key, B), X]
    for _ in range(tsize - 2):
        entries.append(rns_mont_mul(entries[-1], X, base, key))
    table = jnp.stack(entries, axis=0)                  # (tsize, CH, B)
    n_win = digits.shape[0]

    def body(j, acc):
        for _ in range(window):
            acc = rns_mont_mul(acc, acc, base, key)
        d = lax.dynamic_slice_in_dim(digits, j, 1, axis=0)[0].astype(
            jnp.int32)
        t = lax.dynamic_index_in_dim(table, d, axis=0, keepdims=False)
        return rns_mont_mul(acc, t, base, key)

    acc0 = table[0]
    return lax.fori_loop(0, n_win, body, acc0)


@partial(jax.jit, static_argnames=("window", "L"))
def rns_crt_exp_half(v_limbs, digits, base: RnsBase, key: RnsModulus,
                     sq_ctx, window: int, L: int):
    """One CRT half end-to-end: Montgomery-limb ciphertexts (L, B) ->
    canonical c^e mod m limbs, entirely in RNS between enter and exit."""
    X = rns_enter(v_limbs, base, key)
    Z = rns_exp_shared(X, digits, base, key, window)
    return rns_exit(Z, base, key, sq_ctx, L)


# ---------------------------------------------------------------------------
# Sliding-window shared-exponent chain (the production decrypt path).
# ---------------------------------------------------------------------------

def sched_len(ebits: int, window: int) -> int:
    """Fixed (key-independent) sliding-window schedule length: worst
    case over all exponents of <= ebits bits."""
    return ebits + -(-ebits // window)


def sliding_schedule(e: int, window: int, ebits: int) -> np.ndarray:
    """Flat left-to-right sliding-window op schedule for e < 2^ebits.

    Entries: 0 -> square the accumulator; t > 0 -> multiply by the odd
    power c^(2t-1) (table index t-1).  FIXED length sched_len(ebits,
    window) independent of e: front-padded with squarings of the
    initial accumulator `one` (exact no-ops in the Montgomery domain),
    so program shapes and HLO stay key-independent.  ~ebits/(window+1)
    table muls instead of the fixed window's ebits/window, half the
    table (odd entries only), and no multiplies-by-one on zero digits
    (round-5 lever)."""
    assert 0 <= e < (1 << ebits)
    bits = bin(e)[2:] if e else "0"
    ops = []
    i, n = 0, len(bits)
    while i < n:
        if bits[i] == "0":
            ops.append(0)
            i += 1
        else:
            j = min(i + window, n)
            while bits[j - 1] == "0":
                j -= 1
            ops.extend([0] * (j - i))
            ops.append((int(bits[i:j], 2) + 1) // 2)
            i = j
    pad = sched_len(ebits, window) - len(ops)
    assert pad >= 0
    return np.array([0] * pad + ops, dtype=np.int32)


def rns_exp_sched(X, sched, base: RnsBase, key: RnsModulus,
                  window: int):
    """Sliding-window shared-exponent chain: X the entered state (value
    c*M), sched from sliding_schedule (traced).  Table holds only the
    2^(window-1) ODD powers c^1, c^3, ...  Returns the state of
    c^e * M.  TPU dispatches to the Pallas kernel; the jnp body is the
    CPU/verification path (bit-identical, pad squarings included)."""
    if mg._on_tpu():
        from . import pallas_rns
        if pallas_rns.sched_tb(base.CH, window, X.shape[1]):
            return pallas_rns.rns_exp_sched_p(X, sched, base, key,
                                              window)
    B = X.shape[1]
    tsize = 1 << (window - 1)
    c2 = rns_mont_mul(X, X, base, key)
    entries = [X]
    for _ in range(tsize - 1):
        entries.append(rns_mont_mul(entries[-1], c2, base, key))
    table = jnp.stack(entries, axis=0)               # (tsize, CH, B)

    def body(j, acc):
        d = lax.dynamic_slice_in_dim(sched, j, 1, axis=0)[0].astype(
            jnp.int32)
        t = lax.dynamic_index_in_dim(table, jnp.maximum(d - 1, 0),
                                     axis=0, keepdims=False)
        operand = jnp.where(d == 0, acc, t)
        return rns_mont_mul(acc, operand, base, key)

    return lax.fori_loop(0, sched.shape[0], body,
                         rns_one_state(base, key, B))


@partial(jax.jit, static_argnames=("window", "L"))
def rns_crt_exp_sched(v_limbs, sched, base: RnsBase, key: RnsModulus,
                      sq_ctx, window: int, L: int):
    """rns_crt_exp_half with the sliding-window schedule chain."""
    X = rns_enter(v_limbs, base, key)
    Z = rns_exp_sched(X, sched, base, key, window)
    return rns_exit(Z, base, key, sq_ctx, L)


def rns_exp_elem(X, digits, base: RnsBase, key: RnsModulus, window: int):
    """Per-element-exponent chain (the ct*pt path): digits (n_win, B)
    MSB-first base-2^window digits, one exponent per batch column.
    Returns the state of c^e * M.  TPU dispatches to the Pallas kernel
    (one-hot table select); the jnp body is the CPU/verification path."""
    if mg._on_tpu():
        from . import pallas_rns
        if pallas_rns.tb_for(base.CH, window):
            return pallas_rns.rns_exp_elem_p(X, digits, base, key, window)
    B = X.shape[1]
    tsize = 1 << window
    entries = [rns_one_state(base, key, B), X]
    for _ in range(tsize - 2):
        entries.append(rns_mont_mul(entries[-1], X, base, key))
    table = jnp.stack(entries, axis=0)                  # (tsize, CH, B)
    n_win = digits.shape[0]

    def body(j, acc):
        for _ in range(window):
            acc = rns_mont_mul(acc, acc, base, key)
        d = lax.dynamic_slice_in_dim(digits, j, 1, axis=0)[0]
        t = jnp.take_along_axis(
            table, d[None, None, :].astype(jnp.int32), axis=0)[0]
        return rns_mont_mul(acc, t, base, key)

    return lax.fori_loop(0, n_win, body, table[0])


@partial(jax.jit, static_argnames=("L", "mont_input"))
def rns_comb_product(ct_raw, comb_rns, digits, base: RnsBase,
                     key: RnsModulus, sq_ctx, L: int,
                     mont_input: bool = False):
    """The DJN comb chain on the RNS engine: the input times the
    gathered fixed-base comb factors, zero squarings.

    comb_rns: (n_win, CH, 2^w) — the per-key comb table's entries as
    RNS states of f*M (converted once per key via rns_enter).
    digits: (n_win, B) LSB-window-first obfuscator digits.
    mont_input=False: input is canonical (1+mn) — the ENCRYPT chain
    (the entered value carries an R^-1, folded out by |R^4 M^-1|).
    mont_input=True: input is an existing Montgomery-limb ciphertext —
    RE-RANDOMIZATION (applyObfuscator); the fold is |R^3 M^-1|.
    Returns Montgomery-limb ciphertexts (L, B), < 2m — bit-compatible
    with the positional-limb comb path after canonicalization.
    """
    n_win = digits.shape[0]
    X = rns_enter(ct_raw, base, key)

    def mul(a, b):
        if mg._on_tpu():
            from . import pallas_rns
            if pallas_rns.tb_for(base.CH, 0):
                return pallas_rns.rns_mul_p(a, b, base, key)
        return rns_mont_mul(a, b, base, key)

    def body(j, acc):
        slab = lax.dynamic_index_in_dim(comb_rns, j, axis=0,
                                        keepdims=False)  # (CH, 2^w)
        dig = lax.dynamic_slice_in_dim(digits, j, 1, axis=0)[0]
        fac = jnp.take(slab, dig.astype(jnp.int32), axis=1)
        return mul(acc, fac)

    Z = lax.fori_loop(0, n_win, body, X)
    z_limbs = _exit_limbs(Z, base)
    t = mg.mont_reduce_wide(z_limbs, sq_ctx,
                            iters=exit_redc_iters(base, L))
    fold = key.k4_limbs if mont_input else key.k5_limbs
    return mg.mont_mul(t, fold, sq_ctx)


@partial(jax.jit, static_argnames=("window", "L"))
def rns_pow_elem(v_limbs, digits, base: RnsBase, key: RnsModulus,
                 sq_ctx, window: int, L: int):
    """Full per-element modexp: Montgomery-limb bases (L, B), per-column
    exponents -> Montgomery-limb c^e (the HE ct*pt contract).  Used by
    PublicContext.mul_pt for the mod-n^2 domain."""
    X = rns_enter(v_limbs, base, key)
    Z = rns_exp_elem(X, digits, base, key, window)
    out = rns_exit(Z, base, key, sq_ctx, L)             # canonical c^e
    return mg.mont_mul(out, sq_ctx.r2, sq_ctx)          # back to Mont form

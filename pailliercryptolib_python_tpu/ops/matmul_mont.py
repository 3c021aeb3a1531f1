"""Montgomery reduction as int8 matmuls — the MXU mapping of the hot op.

Round-1's CIOS kernel interleaves multiplication and reduction on the
VPU only (~5.5 full (L, TB) array passes per iteration — VMEM-pass
bound, <<1% of chip compute).  This module separates them:

    modmul(a, b) = (T + q*m) / R,   T = a*b,   q = (T mod R) * mu mod R

where mu = -m^{-1} mod R is FULL width.  Both q and q*m are products by
a SHARED constant (mu, m) — i.e. linear maps of the per-element value —
so each is ONE matrix multiply with a constant Toeplitz matrix that the
MXU executes natively in int8 (exact: operands are 4-bit nibbles, so
products are <= 225 and int32 accumulation over <= 8L terms stays far
below 2^31).  Only the per-element product T = a*b remains VPU work.

Layouts (all limbs-major, batch in lanes):
  * canonical value: uint32[L, B], 16-bit limbs.
  * nibble blocks:   int8[U*L, B]; block u, row k holds bits [4u, 4u+4)
    of limb k — weight 2^(16k+4u).  Block (not interleaved) order keeps
    the decomposition to U shift-mask passes.
  * matmul output:   int32[4*T, B] in the same block layout over output
    limbs t < T; recombine = sum_v block_v << 4v.

The Toeplitz weights generalize: W[(u,k),(v,t)] = nib_{4(t-k)+v-u}(C)
for constant C; entries with 16k+4u >= 16L never reach valid output
slots when reducing mod R (t < L), so mod-R truncation is free.

This file is the XLA-level implementation (used directly for the
CPU/testing path and by the fused Pallas kernels in pallas_mont2.py,
which inline the same math in-kernel).  Replaces the role of IPP-Crypto
`mbx_exp_mb8` (/root/reference/README.md:32) at the algorithm level.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .limb import LIMB_BITS, int_to_limbs, normalize, big_mul


def const_mult_weights(C: int, in_limbs: int, in_blocks: int,
                       out_limbs: int) -> np.ndarray:
    """Toeplitz nibble weights for y = x * C (mod 2^(16*out_limbs) slots).

    Returns int8[(4*out_limbs, in_blocks*in_limbs)]:
      W[v*out_limbs + t, u*in_limbs + k] = nibble_{4(t-k)+v-u}(C)
    so that  dot(W, nibble_blocks(x, in_blocks)) is the block layout of
    x*C truncated to out_limbs 16-bit limbs.
    """
    c_nibs = np.asarray(int_to_limbs(C, 4 * out_limbs), dtype=np.int64)
    # int_to_limbs gives 16-bit limbs; re-split to 4-bit nibbles
    nibs = np.zeros(4 * 4 * out_limbs, dtype=np.int8)
    for u in range(4):
        nibs[u::4] = (c_nibs >> (4 * u)) & 15

    t = np.arange(out_limbs)
    k = np.arange(in_limbs)
    W = np.zeros((4 * out_limbs, in_blocks * in_limbs), dtype=np.int8)
    for v in range(4):
        for u in range(in_blocks):
            j = 4 * (t[:, None] - k[None, :]) + (v - u)   # (T, K)
            valid = (j >= 0) & (j < nibs.shape[0])
            W[v * out_limbs + t[:, None],
              u * in_limbs + k[None, :]] = np.where(
                  valid, nibs[np.clip(j, 0, nibs.shape[0] - 1)], 0)
    return W


@partial(jax.jit, static_argnames=("blocks",))
def nibble_blocks(x: jnp.ndarray, blocks: int) -> jnp.ndarray:
    """uint32[L, B] -> int8[blocks*L, B] block-nibble decomposition."""
    return jnp.concatenate(
        [((x >> (4 * u)) & 15).astype(jnp.int8) for u in range(blocks)],
        axis=0)


@partial(jax.jit, static_argnames=("out_limbs",))
def recombine_blocks(y: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """int32[4*T, B] block layout -> uint32[T, B] redundant limbs."""
    acc = y[:out_limbs].astype(jnp.uint32)
    for v in range(1, 4):
        acc = acc + (y[v * out_limbs:(v + 1) * out_limbs].astype(jnp.uint32)
                     << (4 * v))
    return acc


class MatmulMontCtx:
    """Per-modulus constants for the matmul-Montgomery path.

    m odd, R = 2^(16L) with 4m < R (Walter).  Hosts two int8 Toeplitz
    weight matrices: W_mu (reduce mod R by mu) and W_m (full product by
    m).  Built once per key on the host; a few MB each.
    """

    def __init__(self, m: int, L: int):
        if 4 * m >= (1 << (LIMB_BITS * L)):
            raise ValueError("MatmulMontCtx: modulus too large for L")
        self.m = m
        self.L = L
        R = 1 << (LIMB_BITS * L)
        self.mu = (-pow(m, -1, R)) % R
        # matmul-1: q = (T mod R) * mu mod R.  Input T is canonical
        # (4 nibble blocks) on the XLA path; out_limbs = L drops mod R.
        self.W_mu = jnp.asarray(const_mult_weights(self.mu, L, 4, L))
        # matmul-2: q * m, full 2L-limb product.
        self.W_m = jnp.asarray(const_mult_weights(m, L, 4, 2 * L))
        self.m_limbs = jnp.asarray(int_to_limbs(m, L)[:, None])


@jax.jit
def _mont_mul_mm(a, b, W_mu, W_m):
    L = a.shape[0]
    T = big_mul(a, b, out_limbs=2 * L)              # canonical, < mR
    q_slots = jnp.dot(W_mu, nibble_blocks(T[:L], 4),
                      preferred_element_type=jnp.int32)
    q = normalize(recombine_blocks(q_slots, L))     # canonical q < R
    p_slots = jnp.dot(W_m, nibble_blocks(q, 4),
                      preferred_element_type=jnp.int32)
    s = recombine_blocks(p_slots, 2 * L) + T        # redundant, exact
    s = normalize(s)                                # low L limbs == 0
    return s[L:]                                    # (T + q*m)/R < 2m


def mont_mul_mm(a: jnp.ndarray, b: jnp.ndarray,
                mctx: MatmulMontCtx) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod m via matmul reduction.

    a, b: canonical uint32[L, B] < 2m.  Returns canonical < 2m.
    XLA path (the fused Pallas kernel inlines the same steps).
    """
    return _mont_mul_mm(a, b, mctx.W_mu, mctx.W_m)

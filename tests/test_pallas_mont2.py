"""Interpreter-mode correctness for the fused matmul-Montgomery kernels
(ops/pallas_mont2.py) — the exact kernel code, no TPU required."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from pailliercryptolib_python_tpu.ops import pallas_mont2 as pm2
from pailliercryptolib_python_tpu.ops import matmul_mont as mm
from pailliercryptolib_python_tpu.ops.limb import (
    LIMB_BITS, ints_to_limbs, limbs_to_ints, limbs_for_bits)

rng = random.Random(7)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pm2, "INTERPRET", True)


def setup_mod(bits):
    m = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
    L = limbs_for_bits(bits + 2)
    mctx = mm.MatmulMontCtx(m, L)
    wm8 = np.zeros((8 * L, 4 * L), dtype=np.int8)
    return m, L, mctx


def test_mm2_mul_p_oracle():
    bits = 256
    m = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
    L = limbs_for_bits(bits + 2)
    R = 1 << (LIMB_BITS * L)
    mctx = mm.MatmulMontCtx(m, L)
    B = 8
    xs = [rng.randrange(2 * m) for _ in range(B)]
    ys = [rng.randrange(2 * m) for _ in range(B)]
    a = jnp.asarray(ints_to_limbs(xs, L))
    b = jnp.asarray(ints_to_limbs(ys, L))
    got = limbs_to_ints(np.asarray(
        pm2.mm2_mul_p(a, b, mctx.W_mu, mctx.W_m)))
    Rinv = pow(R, -1, m)
    for g, x, y in zip(got, xs, ys):
        assert g < 2 * m and g % m == x * y * Rinv % m


def test_mm2_exp_p_oracle():
    bits = 128
    m = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
    L = limbs_for_bits(bits + 2)
    R = 1 << (LIMB_BITS * L)
    mctx = mm.MatmulMontCtx(m, L)
    B = 4
    xs = [rng.randrange(m) for _ in range(B)]
    es = [rng.getrandbits(24) for _ in range(B)]
    n_win = 6
    from pailliercryptolib_python_tpu.ops import montgomery as mg
    digits = jnp.asarray(mg.exponent_digits(es, n_win, 4))  # MSB-first
    base_m = jnp.asarray(ints_to_limbs([x * R % m for x in xs], L))
    one = jnp.asarray(ints_to_limbs([R % m], L))
    got = limbs_to_ints(np.asarray(
        pm2.mm2_exp_p(base_m, digits, mctx.W_mu, mctx.W_m, one)))
    for g, x, e in zip(got, xs, es):
        assert g % m == pow(x, e, m) * R % m, (x, e)


def test_mm2_exp_shared_p_oracle():
    bits = 128
    m = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
    L = limbs_for_bits(bits + 2)
    R = 1 << (LIMB_BITS * L)
    mctx = mm.MatmulMontCtx(m, L)
    B = 4
    xs = [rng.randrange(m) for _ in range(B)]
    e = rng.getrandbits(40)
    from pailliercryptolib_python_tpu.ops import montgomery as mg
    for window in (4, 5):
        n_win = -(-41 // window)
        digits = mg.exponent_digits([e], n_win, window)[:, 0]
        base_m = jnp.asarray(ints_to_limbs([x * R % m for x in xs], L))
        one = jnp.asarray(ints_to_limbs([R % m], L))
        got = limbs_to_ints(np.asarray(pm2.mm2_exp_shared_p(
            base_m, digits, mctx.W_mu, mctx.W_m, one, window=window)))
    for g, x in zip(got, xs):
        assert g % m == pow(x, e, m) * R % m


@pytest.mark.parametrize("bits", [256, 1040, 3088])
def test_mm2_sqr_p_oracle(bits):
    """Squaring kernel vs oracle: covers partial blocks (L=17), the
    multi-block unrolled triangle, and the segmented large-L path."""
    m = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
    L = limbs_for_bits(bits + 2)
    R = 1 << (LIMB_BITS * L)
    mctx = mm.MatmulMontCtx(m, L)
    B = 3
    xs = [rng.randrange(2 * m) for _ in range(B)]
    a = jnp.asarray(ints_to_limbs(xs, L))
    got = limbs_to_ints(np.asarray(pm2.mm2_sqr_p(a, mctx.W_mu, mctx.W_m)))
    Rinv = pow(R, -1, m)
    for g, x in zip(got, xs):
        assert g < 2 * m and g % m == x * x * Rinv % m


def test_mm2_mul_p_oracle_large_L():
    """Exercises the segmented pre-shift product path (L > PRESHIFT_MAX_L)."""
    bits = 3088
    m = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
    L = limbs_for_bits(bits + 2)
    assert L > pm2.PRESHIFT_MAX_L
    R = 1 << (LIMB_BITS * L)
    mctx = mm.MatmulMontCtx(m, L)
    xs = [rng.randrange(2 * m) for _ in range(3)]
    ys = [rng.randrange(2 * m) for _ in range(3)]
    a = jnp.asarray(ints_to_limbs(xs, L))
    b = jnp.asarray(ints_to_limbs(ys, L))
    got = limbs_to_ints(np.asarray(
        pm2.mm2_mul_p(a, b, mctx.W_mu, mctx.W_m)))
    Rinv = pow(R, -1, m)
    for g, x, y in zip(got, xs, ys):
        assert g < 2 * m and g % m == x * y * Rinv % m

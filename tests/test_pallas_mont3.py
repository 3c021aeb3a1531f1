"""Interpreter-mode correctness for the signed-byte matmul-Montgomery
kernels (ops/pallas_mont3.py) — the exact kernel code, no TPU required."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from pailliercryptolib_python_tpu.ops import pallas_mont3 as pm3
from pailliercryptolib_python_tpu.ops import montgomery as mg
from pailliercryptolib_python_tpu.ops.limb import (
    LIMB_BITS, ints_to_limbs, limbs_to_ints, limbs_for_bits)

rng = random.Random(9)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pm3, "INTERPRET", True)


def setup_mod(bits):
    m = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
    L = limbs_for_bits(bits + 2)
    return m, L, pm3.byte_weights(m, L)


def test_signed_bytes_exact():
    for _ in range(20):
        nb = rng.randrange(1, 40)
        c = rng.getrandbits(8 * nb)
        sb = pm3.signed_bytes_of(c, nb)
        got = sum(int(s) << (8 * j) for j, s in enumerate(sb))
        assert got % (1 << (8 * nb)) == c % (1 << (8 * nb))


@pytest.mark.parametrize("bits", [256, 1040])
def test_mm3_mul_p_oracle(bits):
    m, L, w = setup_mod(bits)
    R = 1 << (LIMB_BITS * L)
    B = 8
    xs = [rng.randrange(2 * m) for _ in range(B)]
    ys = [rng.randrange(2 * m) for _ in range(B)]
    a = jnp.asarray(ints_to_limbs(xs, L))
    b = jnp.asarray(ints_to_limbs(ys, L))
    got = limbs_to_ints(np.asarray(pm3.mm3_mul_p(a, b, *w, tb=128)))
    Rinv = pow(R, -1, m)
    for g, x, y in zip(got, xs, ys):
        assert g < 2 * m and g % m == x * y * Rinv % m


@pytest.mark.parametrize("bits", [256, 3088])
def test_mm3_sqr_p_oracle(bits):
    """Covers partial blocks (L=17) and the segmented large-L path."""
    m, L, w = setup_mod(bits)
    R = 1 << (LIMB_BITS * L)
    xs = [rng.randrange(2 * m) for _ in range(3)]
    a = jnp.asarray(ints_to_limbs(xs, L))
    got = limbs_to_ints(np.asarray(pm3.mm3_sqr_p(a, *w, tb=128)))
    Rinv = pow(R, -1, m)
    for g, x in zip(got, xs):
        assert g < 2 * m and g % m == x * x * Rinv % m


def test_mm3_exp_p_oracle():
    bits = 128
    m, L, w = setup_mod(bits)
    R = 1 << (LIMB_BITS * L)
    B = 4
    xs = [rng.randrange(m) for _ in range(B)]
    es = [rng.getrandbits(24) for _ in range(B)]
    digits = jnp.asarray(mg.exponent_digits(es, 6, 4))  # MSB-first
    base_m = jnp.asarray(ints_to_limbs([x * R % m for x in xs], L))
    one = jnp.asarray(ints_to_limbs([R % m], L))
    got = limbs_to_ints(np.asarray(
        pm3.mm3_exp_p(base_m, digits, *w, one, tb=128)))
    for g, x, e in zip(got, xs, es):
        assert g % m == pow(x, e, m) * R % m, (x, e)


def test_mm3_exp_shared_p_oracle():
    bits = 128
    m, L, w = setup_mod(bits)
    R = 1 << (LIMB_BITS * L)
    B = 4
    xs = [rng.randrange(m) for _ in range(B)]
    e = rng.getrandbits(40)
    base_m = jnp.asarray(ints_to_limbs([x * R % m for x in xs], L))
    one = jnp.asarray(ints_to_limbs([R % m], L))
    for window in (4, 5):
        n_win = -(-41 // window)
        digits = mg.exponent_digits([e], n_win, window)[:, 0]
        got = limbs_to_ints(np.asarray(pm3.mm3_exp_shared_p(
            base_m, digits, *w, one, window=window, tb=128)))
        for g, x in zip(got, xs):
            assert g % m == pow(x, e, m) * R % m

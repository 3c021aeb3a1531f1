"""Oracle tests for the matmul-Montgomery reduction (ops/matmul_mont.py)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from pailliercryptolib_python_tpu.ops import matmul_mont as mm
from pailliercryptolib_python_tpu.ops.limb import (
    LIMB_BITS, ints_to_limbs, limbs_to_ints, limbs_for_bits)

rng = random.Random(42)


def odd_modulus(bits):
    return rng.getrandbits(bits) | (1 << (bits - 1)) | 1


@pytest.mark.parametrize("bits", [64, 192, 512, 1024])
def test_mont_mul_mm_oracle(bits):
    m = odd_modulus(bits)
    L = limbs_for_bits(bits + 2)
    R = 1 << (LIMB_BITS * L)
    assert 4 * m < R
    mctx = mm.MatmulMontCtx(m, L)
    B = 8
    xs = [rng.randrange(2 * m) for _ in range(B)]
    ys = [rng.randrange(2 * m) for _ in range(B)]
    a = jnp.asarray(ints_to_limbs(xs, L))
    b = jnp.asarray(ints_to_limbs(ys, L))
    got = limbs_to_ints(np.asarray(mm.mont_mul_mm(a, b, mctx)))
    Rinv = pow(R, -1, m)
    for g, x, y in zip(got, xs, ys):
        assert g < 2 * m
        assert g % m == (x * y * Rinv) % m


def test_mont_mul_mm_chain_stays_bounded():
    bits = 256
    m = odd_modulus(bits)
    L = limbs_for_bits(bits + 2)
    R = 1 << (LIMB_BITS * L)
    mctx = mm.MatmulMontCtx(m, L)
    B = 4
    xs = [rng.randrange(2 * m) for _ in range(B)]
    acc = jnp.asarray(ints_to_limbs(xs, L))
    oracle = list(xs)
    Rinv = pow(R, -1, m)
    for _ in range(20):
        acc = mm.mont_mul_mm(acc, acc, mctx)
        oracle = [x * x * Rinv % m for x in oracle]
    got = limbs_to_ints(np.asarray(acc))
    for g, o in zip(got, oracle):
        assert g < 2 * m and g % m == o


def test_weights_match_python_mult():
    """dot(W_C, nibbles(x)) recombines to x*C (truncated)."""
    C = rng.getrandbits(120) | 1
    L = limbs_for_bits(128)
    W = jnp.asarray(mm.const_mult_weights(C, L, 4, 2 * L))
    xs = [rng.getrandbits(126) for _ in range(5)]
    x = jnp.asarray(ints_to_limbs(xs, L))
    y = jnp.dot(W, mm.nibble_blocks(x, 4),
                preferred_element_type=jnp.int32)
    from pailliercryptolib_python_tpu.ops.limb import normalize
    got = limbs_to_ints(np.asarray(normalize(
        mm.recombine_blocks(y, 2 * L))))
    assert got == [x_ * C for x_ in xs]

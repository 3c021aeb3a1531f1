"""Pallas kernel correctness in interpreter mode (exact kernel code, CPU).

The TPU fast path and the pure-jnp fallback must agree bit-for-bit; the
oracle is Python big-int arithmetic, as everywhere else in the suite.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from pailliercryptolib_python_tpu.ops import limb, montgomery as mg
from pailliercryptolib_python_tpu.ops import pallas_mont as pk

rng = random.Random(5)


@pytest.fixture(autouse=True)
def _interpret_mode():
    pk.INTERPRET = True
    yield
    pk.INTERPRET = False


def make_ctx(bits=192):
    n = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
    return n, mg.MontCtx.for_modulus(n)


def enter(xs, ctx):
    return mg.to_mont(jnp.asarray(limb.ints_to_limbs(xs, ctx.num_limbs)), ctx)


def leave(a, ctx):
    return limb.limbs_to_ints(np.asarray(mg.from_mont(a, ctx)))


def test_mont_mul_p():
    n, ctx = make_ctx()
    B = 128
    xs = [rng.randrange(n) for _ in range(B)]
    ys = [rng.randrange(n) for _ in range(B)]
    am, bm = enter(xs, ctx), enter(ys, ctx)
    L = ctx.num_limbs
    out = pk.mont_mul_p(am, bm, jnp.broadcast_to(ctx.n_limbs, (L, B)),
                        jnp.broadcast_to(ctx.n0inv, (B,)))
    got = leave(out, ctx)
    assert got == [(x * y) % n for x, y in zip(xs, ys)]


def test_mont_mul_p_two_tiles():
    n, ctx = make_ctx(96)
    B = 256
    xs = [rng.randrange(n) for _ in range(B)]
    ys = [rng.randrange(n) for _ in range(B)]
    am, bm = enter(xs, ctx), enter(ys, ctx)
    L = ctx.num_limbs
    out = pk.mont_mul_p(am, bm, jnp.broadcast_to(ctx.n_limbs, (L, B)),
                        jnp.broadcast_to(ctx.n0inv, (B,)))
    got = leave(out, ctx)
    assert got == [(x * y) % n for x, y in zip(xs, ys)]


def test_mont_exp_p():
    n, ctx = make_ctx()
    B = 128
    L = ctx.num_limbs
    xs = [rng.randrange(n) for _ in range(B)]
    es = [rng.getrandbits(48) for _ in range(B - 2)] + [0, 1]
    n_win = 16
    digits = jnp.asarray(mg.exponent_digits(es, n_win, 4, msb_first=True))
    am = enter(xs, ctx)
    out = pk.mont_exp_p(am, digits, jnp.broadcast_to(ctx.n_limbs, (L, B)),
                        jnp.broadcast_to(ctx.n0inv, (B,)),
                        jnp.broadcast_to(ctx.one, (L, B)))
    got = leave(out, ctx)
    assert got == [pow(x, e, n) for x, e in zip(xs, es)]


def test_mont_exp_p_win_start():
    n, ctx = make_ctx(128)
    B = 128
    L = ctx.num_limbs
    xs = [rng.randrange(n) for _ in range(B)]
    es = [rng.getrandbits(12) for _ in range(B)]
    n_win = 24  # padded well beyond the 3 needed windows
    digits = jnp.asarray(mg.exponent_digits(es, n_win, 4, msb_first=True))
    am = enter(xs, ctx)
    out = pk.mont_exp_p(am, digits, jnp.broadcast_to(ctx.n_limbs, (L, B)),
                        jnp.broadcast_to(ctx.n0inv, (B,)),
                        jnp.broadcast_to(ctx.one, (L, B)),
                        win_start=n_win - 3)
    got = leave(out, ctx)
    assert got == [pow(x, e, n) for x, e in zip(xs, es)]


def test_mont_chain_p():
    n, ctx = make_ctx()
    B = 128
    L = ctx.num_limbs
    n_win = 5
    acc = [rng.randrange(n) for _ in range(B)]
    fs = [[rng.randrange(n) for _ in range(B)] for _ in range(n_win)]
    accm = enter(acc, ctx)
    fm = jnp.stack([enter(f, ctx) for f in fs], axis=0)  # (n_win, L, B)
    out = pk.mont_chain_p(fm, accm, jnp.broadcast_to(ctx.n_limbs, (L, B)),
                          jnp.broadcast_to(ctx.n0inv, (B,)))
    got = leave(out, ctx)
    expect = acc[:]
    for f in fs:
        expect = [(e * x) % n for e, x in zip(expect, f)]
    assert got == expect


def test_per_element_moduli_exp():
    # the CRT-decrypt pattern: distinct moduli across the batch
    ns = [(rng.getrandbits(160) | (1 << 159) | 1) for _ in range(128)]
    L = limb.limbs_for_bits(162)
    ctx = mg.MontCtx.for_moduli(ns, L)
    xs = [rng.randrange(n) for n in ns]
    es = [rng.getrandbits(32) for _ in range(128)]
    am = mg.to_mont(jnp.asarray(limb.ints_to_limbs(xs, L)), ctx)
    digits = jnp.asarray(mg.exponent_digits(es, 8, 4, msb_first=True))
    out = pk.mont_exp_p(am, digits, ctx.n_limbs, ctx.n0inv,
                        jnp.broadcast_to(ctx.one, (L, 128)))
    got = limb.limbs_to_ints(np.asarray(mg.from_mont(out, ctx)))
    assert got == [pow(x, e, n) for x, e, n in zip(xs, es, ns)]

"""Pallas RNS shared-exp kernel vs the jnp reference path (interpret
mode on CPU): outputs must be bit-identical, so the kernel's centered
bf16 MXU dots and packed-constant plumbing prove out without TPU
hardware."""

import random

import numpy as np
import pytest
import jax.numpy as jnp

from pailliercryptolib_python_tpu.ops import rns
from pailliercryptolib_python_tpu.ops import montgomery as mg
from pailliercryptolib_python_tpu.ops.limb import ints_to_limbs, LIMB_BITS

rng = random.Random(77)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from pailliercryptolib_python_tpu.ops import pallas_rns
    monkeypatch.setattr(pallas_rns, "INTERPRET", True)


def test_kernel_matches_jnp_path():
    from pailliercryptolib_python_tpu.ops import pallas_rns
    from pailliercryptolib_python_tpu.utils.fixtures import fixed_key_ints

    mbits = 256
    base = rns.RnsBase.for_bits(mbits)
    kd = fixed_key_ints(256)
    m = kd["p"] * kd["p"]
    L = (m.bit_length() + 2 + 15) // 16
    sq_ctx = mg.MontCtx.for_modulus(m, min_bits=LIMB_BITS * L, mxu=False)
    L = sq_ctx.num_limbs
    key = rns.RnsModulus.build(base, m, L)
    R = 1 << (LIMB_BITS * L)

    window = 5
    e = kd["p"] - 1
    n_win = -(-e.bit_length() // window)
    digits = jnp.asarray(mg.exponent_digits([e], n_win, window)[:, 0])

    cs = [rng.randrange(m) for _ in range(9)]
    v_limbs = jnp.asarray(ints_to_limbs([c * R % m for c in cs], L))
    X = rns.rns_enter(v_limbs, base, key)

    want = np.asarray(rns.rns_exp_shared(X, digits, base, key, window))
    got = np.asarray(pallas_rns.rns_exp_shared_p(X, digits, base, key,
                                                 window))
    assert got.shape == want.shape
    assert np.array_equal(got, want), "kernel != jnp reference"

    # and end-to-end through the exit: exact pow() values
    out = rns.rns_exit(jnp.asarray(got), base, key, sq_ctx, L)
    from pailliercryptolib_python_tpu.ops.limb import limbs_to_ints
    for c, g in zip(cs, limbs_to_ints(np.asarray(out))):
        assert g == pow(c, e, m)


def test_elem_kernel_matches_jnp_path():
    """Per-element-exponent kernel (ct*pt path) vs the jnp reference."""
    from pailliercryptolib_python_tpu.ops import pallas_rns
    from pailliercryptolib_python_tpu.utils.fixtures import fixed_key_ints

    mbits = 576
    base = rns.RnsBase.for_bits(mbits)
    kd = fixed_key_ints(256)
    m = kd["n"] * kd["n"]
    L = (m.bit_length() + 2 + 15) // 16
    sq_ctx = mg.MontCtx.for_modulus(m, min_bits=LIMB_BITS * L, mxu=False)
    L = sq_ctx.num_limbs
    key = rns.RnsModulus.build(base, m, L)
    R = 1 << (LIMB_BITS * L)

    window = 4
    es = [rng.getrandbits(50) | 1 for _ in range(9)]
    nw = -(-max(e.bit_length() for e in es) // window)
    digits = jnp.asarray(mg.exponent_digits(es, nw, window))
    cs = [rng.randrange(m) for _ in range(9)]
    v_limbs = jnp.asarray(ints_to_limbs([c * R % m for c in cs], L))
    X = rns.rns_enter(v_limbs, base, key)

    want = np.asarray(rns.rns_exp_elem(X, digits, base, key, window))
    got = np.asarray(pallas_rns.rns_exp_elem_p(X, digits, base, key,
                                               window))
    assert np.array_equal(got, want), "elem kernel != jnp reference"

    # end-to-end contract (rns_pow_elem returns Montgomery-limb form)
    out = rns.rns_pow_elem(v_limbs, digits, base, key, sq_ctx, window, L)
    out = mg.from_mont(jnp.asarray(out), sq_ctx)
    from pailliercryptolib_python_tpu.ops.limb import limbs_to_ints
    for cint, e, g in zip(cs, es, limbs_to_ints(np.asarray(out))):
        assert g == pow(cint, e, m)


def test_sched_kernel_matches_jnp_path():
    """Sliding-window schedule kernel (production decrypt stage 2) is
    bit-identical to the jnp schedule interpreter, padding included."""
    from pailliercryptolib_python_tpu.ops import pallas_rns
    from pailliercryptolib_python_tpu.utils.fixtures import fixed_key_ints

    mbits = 256
    base = rns.RnsBase.for_bits(mbits)
    kd = fixed_key_ints(256)
    m = kd["p"] * kd["p"]
    L = (m.bit_length() + 2 + 15) // 16
    sq_ctx = mg.MontCtx.for_modulus(m, min_bits=LIMB_BITS * L, mxu=False)
    L = sq_ctx.num_limbs
    key = rns.RnsModulus.build(base, m, L)
    R = 1 << (LIMB_BITS * L)

    window = 5
    e = kd["p"] - 1
    sched = jnp.asarray(rns.sliding_schedule(e, window, e.bit_length()))

    cs = [rng.randrange(m) for _ in range(9)]
    v_limbs = jnp.asarray(ints_to_limbs([c * R % m for c in cs], L))
    X = rns.rns_enter(v_limbs, base, key)

    want = np.asarray(rns.rns_exp_sched(X, sched, base, key, window))
    got = np.asarray(pallas_rns.rns_exp_sched_p(X, sched, base, key,
                                                window))
    assert got.shape == want.shape
    assert np.array_equal(got, want), "sched kernel != jnp reference"

    out = rns.rns_exit(jnp.asarray(got), base, key, sq_ctx, L)
    from pailliercryptolib_python_tpu.ops.limb import limbs_to_ints
    for c, g in zip(cs, limbs_to_ints(np.asarray(out))):
        assert g == pow(c, e, m)

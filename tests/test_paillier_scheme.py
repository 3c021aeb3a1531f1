"""Scheme-layer tests: keygen / encrypt / decrypt / CT-op round trips
against a Python big-int oracle.  Small key sizes keep the CPU suite fast;
2048-bit parity runs in bench.py on the real device."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from pailliercryptolib_python_tpu.models import paillier as sch
from pailliercryptolib_python_tpu.ops import limb

rng = random.Random(7)


@pytest.fixture(scope="module")
def key256():
    kd = sch.generate_key_ints(256, enable_DJN=True)
    pub = sch.PublicContext(kd["n"], kd["bits"], True, kd["hs"], kd["randbits"])
    priv = sch.PrivateContext(pub, kd["p"], kd["q"])
    return kd, pub, priv


def oracle_decrypt(c, p, q, n):
    lam = (p - 1) * (q - 1)
    mu = pow(lam, -1, n)
    u = pow(c, lam, n * n)
    return ((u - 1) // n) * mu % n


def test_keygen_properties():
    kd = sch.generate_key_ints(128, enable_DJN=True)
    n, p, q = kd["n"], kd["p"], kd["q"]
    assert p * q == n and n.bit_length() == 128
    assert sch.is_probable_prime(p) and sch.is_probable_prime(q)
    assert 0 < kd["hs"] < n * n


def test_encrypt_raw_roundtrip(key256):
    kd, pub, priv = key256
    n = kd["n"]
    msgs = [rng.randrange(n) for _ in range(5)]
    ct = pub.encrypt(msgs, apply_obfuscator=False)
    # raw encryption of m is exactly 1 + m*n mod n^2
    cts = pub.export_cts(ct, len(msgs))
    assert cts == [(1 + m * n) % (n * n) for m in msgs]
    got = priv.decrypt_to_ints(ct, len(msgs))
    assert got == msgs


def test_encrypt_obfuscated_roundtrip(key256):
    kd, pub, priv = key256
    n = kd["n"]
    msgs = [0, 1, n - 1] + [rng.randrange(n) for _ in range(5)]
    ct = pub.encrypt(msgs, apply_obfuscator=True)
    cts = pub.export_cts(ct, len(msgs))
    # obfuscated ciphertexts decrypt correctly via an independent oracle
    for c, m in zip(cts, msgs):
        assert oracle_decrypt(c, kd["p"], kd["q"], n) == m
    assert priv.decrypt_to_ints(ct, len(msgs)) == msgs


def test_obfuscation_rerandomizes(key256):
    kd, pub, priv = key256
    msgs = [5, 6]
    ct1 = pub.encrypt(msgs, apply_obfuscator=True)
    ct2 = pub.encrypt(msgs, apply_obfuscator=True)
    assert pub.export_cts(ct1, 2) != pub.export_cts(ct2, 2)
    ct3 = pub.obfuscate(ct1)
    assert pub.export_cts(ct3, 2) != pub.export_cts(ct1, 2)
    assert priv.decrypt_to_ints(ct3, 2) == msgs


def test_add_ct(key256):
    kd, pub, priv = key256
    n = kd["n"]
    xs = [rng.randrange(n // 2) for _ in range(6)]
    ys = [rng.randrange(n // 2) for _ in range(6)]
    ct = pub.add_ct(pub.encrypt(xs), pub.encrypt(ys))
    assert priv.decrypt_to_ints(ct, 6) == [(x + y) % n for x, y in zip(xs, ys)]


def test_mul_pt(key256):
    kd, pub, priv = key256
    n = kd["n"]
    xs = [rng.randrange(n) for _ in range(5)]
    es = [0, 1, 2, 12345, rng.getrandbits(64)]
    ct = pub.mul_pt(pub.encrypt(xs), es)
    assert priv.decrypt_to_ints(ct, 5) == [(x * e) % n for x, e in zip(xs, es)]


def test_mul_pt_large_exponent(key256):
    kd, pub, priv = key256
    n = kd["n"]
    xs = [rng.randrange(n) for _ in range(3)]
    es = [n - 1, n // 2, rng.randrange(n)]
    ct = pub.mul_pt(pub.encrypt(xs), es)
    assert priv.decrypt_to_ints(ct, 3) == [(x * e) % n for x, e in zip(xs, es)]


def test_import_export_cts(key256):
    kd, pub, priv = key256
    n = kd["n"]
    msgs = [rng.randrange(n) for _ in range(4)]
    ct = pub.encrypt(msgs)
    ints = pub.export_cts(ct, 4)
    ct2 = pub.import_cts(ints)
    assert priv.decrypt_to_ints(ct2, 4) == msgs


def test_plain_paillier_no_djn():
    kd = sch.generate_key_ints(256, enable_DJN=False)
    pub = sch.PublicContext(kd["n"], kd["bits"], False)
    priv = sch.PrivateContext(pub, kd["p"], kd["q"])
    msgs = [rng.randrange(kd["n"]) for _ in range(3)]
    ct = pub.encrypt(msgs, apply_obfuscator=True)
    assert priv.decrypt_to_ints(ct, 3) == msgs


def test_crt_half_split_path(key256):
    """The TPU decrypt splits CRT stage 2 into shared-modulus p/q halves
    (_crt_stage_exp_half); validate that path against the fused stage on
    the CPU backend (jnp shared-exponent modexp)."""
    import jax.numpy as jnp
    kd, pub, priv = key256
    B = 4
    msgs = [rng.randrange(kd["n"]) for _ in range(B)]
    ct = pub.encrypt(msgs, apply_obfuscator=True)
    Bp = ct.shape[1]
    base_m = priv._stage_reduce(ct)
    u_p = sch._crt_stage_exp_half(base_m[:, :Bp], priv._sq_p,
                                  priv.dig_p, priv.dec_window)
    u_q = sch._crt_stage_exp_half(base_m[:, Bp:], priv._sq_q,
                                  priv.dig_q, priv.dec_window)
    u = jnp.concatenate([u_p, u_q], axis=1)
    fused = sch._crt_stage_exp(base_m, priv._sq_ctx(Bp),
                               priv.exp_digits_pq, priv.n_win_dec)
    import numpy as np_
    assert np_.array_equal(np_.asarray(u), np_.asarray(fused))
    m = sch._crt_stage_recombine(
        u, priv._p_ctx, priv._q_ctx, priv.pinv_R, priv.qinv_R,
        priv.hpR, priv.hqR, priv.p_limbs, priv.q_limbs, priv.pinvqR,
        priv.Lh, priv.Lq, pub.Ln)
    from pailliercryptolib_python_tpu.ops.limb import limbs_to_ints
    assert limbs_to_ints(np_.asarray(m))[:B] == msgs


def test_device_mr_base2_matches_host():
    """Device-batched base-2 Miller-Rabin == the host _mr_round oracle,
    prime and composite candidates mixed, 512-bit."""
    import random
    from pailliercryptolib_python_tpu.models import paillier as sch

    rng = random.Random(9)
    cands = [sch.generate_prime(512) for _ in range(3)]
    while len(cands) < 11:
        c = rng.getrandbits(512) | 1 | (1 << 511)
        cands.append(c)
    got = sch.device_mr_base2(cands)
    for c, g in zip(cands, got):
        d, r = c - 1, 0
        while d % 2 == 0:
            d //= 2
            r += 1
        assert bool(g) == sch._mr_round(c, d, r, 2), hex(c)


def test_generate_prime_bulk_path():
    """generate_prime with the device-batched pre-test forced on."""
    from pailliercryptolib_python_tpu.models import paillier as sch
    from pailliercryptolib_python_tpu.utils import config as cfg

    prev = cfg.get_config().keygen_device
    cfg.set_config(keygen_device="1")
    try:
        p = sch.generate_prime(256)
    finally:
        cfg.set_config(keygen_device=prev)
    assert p.bit_length() == 256 and sch.is_probable_prime(p)


def test_rns_encrypt_matches_limb_encrypt():
    """The RNS streamed-comb encrypt must produce the SAME ciphertext
    integers as the positional-limb comb path given identical obfuscator
    digits (and decrypt must round-trip)."""
    import jax.numpy as jnp
    from pailliercryptolib_python_tpu.models import paillier as sch
    from pailliercryptolib_python_tpu.utils.fixtures import fixed_key_ints
    from pailliercryptolib_python_tpu.utils import config as cfg

    kd = fixed_key_ints(256)
    pub = sch.PublicContext(kd["n"], kd["bits"], True, kd["hs"],
                            kd["randbits"])
    priv = sch.PrivateContext(pub, kd["p"], kd["q"])
    import random
    r = random.Random(6)
    msgs = [r.randrange(kd["n"]) for _ in range(10)]
    m_dev = pub.encodings_to_device(msgs)
    digits = pub.sample_obfuscator_digits(m_dev.shape[1])

    ct_limb = sch._encrypt_djn(m_dev, digits, pub.comb_table,
                               pub.n_limbs, pub.ctx, pub.L)
    want = pub.export_cts(ct_limb, len(msgs))

    prev = cfg.get_config().encrypt_engine
    cfg.set_config(encrypt_engine="rns")
    try:
        from pailliercryptolib_python_tpu.ops import rns as _rns
        base, key = pub._rns_enc_plan()
        raw = sch._encrypt_raw_canonical(m_dev, pub.n_limbs, pub.L)
        ct_rns = _rns.rns_comb_product(raw, pub.comb_rns,
                                       jnp.asarray(digits), base, key,
                                       pub.ctx, pub.L)
        got = pub.export_cts(ct_rns, len(msgs))
        assert got == want, "RNS encrypt != limb encrypt"
        # full pipeline through PublicContext.encrypt + decrypt
        ct2 = pub.encrypt(msgs, apply_obfuscator=True)
        assert priv.decrypt_to_ints(ct2, len(msgs)) == msgs
    finally:
        cfg.set_config(encrypt_engine=prev)


def test_rns_obfuscate_matches_limb():
    """Re-randomization (applyObfuscator) on the RNS comb must equal the
    positional-limb path given the same digits."""
    import jax.numpy as jnp
    from pailliercryptolib_python_tpu.models import paillier as sch
    from pailliercryptolib_python_tpu.ops import rns as _rns
    from pailliercryptolib_python_tpu.utils.fixtures import fixed_key_ints
    from pailliercryptolib_python_tpu.utils import config as cfg

    kd = fixed_key_ints(256)
    pub = sch.PublicContext(kd["n"], kd["bits"], True, kd["hs"],
                            kd["randbits"])
    priv = sch.PrivateContext(pub, kd["p"], kd["q"])
    import random
    r = random.Random(8)
    msgs = [r.randrange(kd["n"]) for _ in range(9)]
    ct = pub.encrypt(msgs, apply_obfuscator=False)
    digits = pub.sample_obfuscator_digits(ct.shape[1])

    want = pub.export_cts(
        sch._obfuscate_djn(ct, digits, pub.comb_table, pub.ctx), len(msgs))
    prev = cfg.get_config().encrypt_engine
    cfg.set_config(encrypt_engine="rns")
    try:
        base, key = pub._rns_enc_plan()
        got_dev = _rns.rns_comb_product(ct, pub.comb_rns,
                                        jnp.asarray(digits), base, key,
                                        pub.ctx, pub.L, mont_input=True)
        got = pub.export_cts(got_dev, len(msgs))
        assert got == want, "RNS obfuscate != limb obfuscate"
        # and through the public API path + decrypt round-trip
        ct2 = pub.obfuscate(ct)
        assert priv.decrypt_to_ints(ct2, len(msgs)) == msgs
    finally:
        cfg.set_config(encrypt_engine=prev)


def test_encrypt_engine_decoupled_from_decrypt_engine():
    """encrypt_engine="rns" must select the RNS encrypt plan even when
    decrypt_engine="limb" (the plans were coupled through the decrypt
    knob before round 5 — ADVICE r4)."""
    from pailliercryptolib_python_tpu.models import paillier as sch
    from pailliercryptolib_python_tpu.utils.fixtures import fixed_key_ints
    from pailliercryptolib_python_tpu.utils import config as cfg

    kd = fixed_key_ints(256)
    prev_d = cfg.get_config().decrypt_engine
    prev_e = cfg.get_config().encrypt_engine
    cfg.set_config(decrypt_engine="limb", encrypt_engine="rns")
    try:
        pub = sch.PublicContext(kd["n"], kd["bits"], True, kd["hs"],
                                kd["randbits"])
        priv = sch.PrivateContext(pub, kd["p"], kd["q"])
        assert pub._rns_enc_plan() is not None
        assert not priv.use_rns
        msgs = [5, 17, 23, 2**40 + 1]
        ct = pub.encrypt(msgs, apply_obfuscator=True)
        assert priv.decrypt_to_ints(ct, len(msgs)) == msgs
        # both knobs limb: no RNS plan anywhere
        cfg.set_config(encrypt_engine="limb")
        pub2 = sch.PublicContext(kd["n"], kd["bits"], True, kd["hs"],
                                 kd["randbits"])
        assert pub2._rns_enc_plan() is None
        assert pub2._rns_mul_plan() is None
    finally:
        cfg.set_config(decrypt_engine=prev_d, encrypt_engine=prev_e)


def test_exponent_digits_masks_out_of_range():
    """Both bytes paths must agree with the pure-Python fallback's
    silent truncation for exponents wider than the digit span (the C
    path used to raise OverflowError instead — ADVICE r4)."""
    from pailliercryptolib_python_tpu.ops import montgomery as mg
    import numpy as np

    wide = (1 << 100) + 12345
    for window, n_win in ((4, 8), (8, 4), (5, 6), (3, 10)):
        digs = mg.exponent_digits([wide, 7], n_win, window)
        mask = (1 << (n_win * window)) - 1
        out = np.zeros((n_win, 2), dtype=np.uint32)
        for b, e in enumerate((wide & mask, 7)):
            for j in range(n_win):
                out[j, b] = (e >> (window * j)) & ((1 << window) - 1)
        assert np.array_equal(digs, out[::-1]), (window, n_win)


def test_keygen_crt_hs_and_parallel_pool():
    """hs computed via CRT halves must equal the direct h^n mod n^2
    (verified through a full encrypt/decrypt round trip), and the
    parallel prime-search pool must produce working keys."""
    from pailliercryptolib_python_tpu.models import paillier as sch
    from pailliercryptolib_python_tpu.utils import config as cfg

    prev = cfg.get_config().keygen_parallel
    cfg.set_config(keygen_parallel="1")   # force the pool at small size
    try:
        kd = sch.generate_key_ints(512, True)
    finally:
        cfg.set_config(keygen_parallel=prev)
    # direct recomputation of hs from the returned key material
    n, p, q = kd["n"], kd["p"], kd["q"]
    assert p * q == n and n.bit_length() == 512
    # hs must be a valid DJN base: hs = h^n for SOME quadratic
    # (non-)residue h; validity is what encrypt/decrypt exercises
    pub = sch.PublicContext(n, kd["bits"], True, kd["hs"], kd["randbits"])
    priv = sch.PrivateContext(pub, p, q)
    msgs = [3, 1 << 40, n - 5]
    ct = pub.encrypt(msgs, apply_obfuscator=True)
    assert priv.decrypt_to_ints(ct, 3) == msgs
    # CRT identity directly: recompute with the same h recovered from
    # hs?  hs is one-way; instead assert CRT(pow halves) == direct pow
    # for a fresh h on these primes
    import secrets
    h = secrets.randbelow(n - 1) + 1
    psq, qsq = p * p, q * q
    hp = pow(h % psq, n % (p * (p - 1)), psq)
    hq = pow(h % qsq, n % (q * (q - 1)), qsq)
    qinv = pow(qsq, -1, psq)
    got = (hq + qsq * ((qinv * (hp - hq)) % psq)) % (n * n)
    assert got == pow(h, n, n * n)

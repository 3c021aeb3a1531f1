"""Frozen known-answer-vector regression tests.

The expected ciphertext integers in tests/kat_vectors.json were computed
once with pure Python pow() (tools/gen_kat.py) and checked in — the
device kernels (limb packing, Montgomery machinery, comb tables, CRT
decrypt, and any future number-system rewrite such as RNS) must
reproduce them bit-exactly.  Unlike the oracle tests elsewhere, nothing
here is recomputed from the implementation under test.

Reference precedent for pinned key material:
/root/reference/bench/bench_ipcl_python.py:83-97.
"""

import json
import os

import numpy as np
import pytest

HERE = os.path.dirname(__file__)


def _load(bits):
    with open(os.path.join(HERE, "kat_vectors.json")) as f:
        data = json.load(f)
    for vec in data["vectors"]:
        if vec["bits"] == bits:
            return vec
    raise KeyError(bits)


def _contexts(vec):
    from pailliercryptolib_python_tpu.models import paillier as sch

    p, q = int(vec["p"], 16), int(vec["q"], 16)
    n = p * q
    pub = sch.PublicContext(n, n.bit_length(), True, int(vec["hs"], 16),
                            vec["randbits"])
    priv = sch.PrivateContext(pub, p, q)
    return pub, priv


def _r_digits(rs, window, randbits):
    """Frozen obfuscator exponents -> LSB-first base-2^window digits."""
    n_win = -(-randbits // window)
    mask = (1 << window) - 1
    out = np.zeros((n_win, len(rs)), dtype=np.uint32)
    for b, r in enumerate(rs):
        for j in range(n_win):
            out[j, b] = (r >> (window * j)) & mask
    return out


def _run_kat(bits):
    import jax.numpy as jnp
    from pailliercryptolib_python_tpu.models import paillier as sch

    vec = _load(bits)
    pub, priv = _contexts(vec)
    msgs = [int(m, 16) for m in vec["messages"]]
    rs = [int(r, 16) for r in vec["obfuscator_r"]]
    raw_expect = [int(c, 16) for c in vec["raw_ciphertexts"]]
    djn_expect = [int(c, 16) for c in vec["djn_ciphertexts"]]

    # sanity: the frozen vectors themselves match an in-test oracle for
    # the first two entries (guards against a corrupted vectors file)
    nsq = pub.nsquare
    for i in range(2):
        assert raw_expect[i] == (1 + msgs[i] * pub.n) % nsq
        assert djn_expect[i] == (1 + msgs[i] * pub.n) * pow(
            pub.hs, rs[i], nsq) % nsq

    # raw encrypt (no obfuscation) must be bit-exact
    ct_raw = pub.encrypt(msgs, apply_obfuscator=False)
    assert pub.export_cts(ct_raw, len(msgs)) == raw_expect, "raw encrypt"

    # DJN encrypt with the frozen obfuscator exponents
    m_dev = pub.encodings_to_device(msgs)
    digits = _r_digits(rs, pub.comb_window, pub.randbits)
    B = m_dev.shape[1]
    if digits.shape[1] < B:
        digits = np.pad(digits, ((0, 0), (0, B - digits.shape[1])))
    ct_djn = sch._encrypt_djn(m_dev, jnp.asarray(digits), pub.comb_table,
                              pub.n_limbs, pub.ctx, pub.L)
    assert pub.export_cts(ct_djn, len(msgs)) == djn_expect, "DJN encrypt"

    # decrypt of the frozen ciphertexts must return the frozen messages
    got = priv.decrypt_to_ints(pub.import_cts(djn_expect), len(msgs))
    assert got == msgs, "decrypt"


def test_kat_256():
    _run_kat(256)


@pytest.mark.skipif(os.environ.get("PAILLIER_SKIP_SLOW") == "1",
                    reason="PAILLIER_SKIP_SLOW=1")
def test_kat_2048():
    _run_kat(2048)

"""Unit tests for the native (C) host helpers and their Python fallbacks.

The C extension mirrors the role of the reference's C++ byte<->BigNumber
converters (/root/reference/src/ipcl_python/bindings/
ipcl_bindings.cpp:100-138); oracles are plain Python ints."""

import random

import numpy as np
import pytest

from pailliercryptolib_python_tpu import native

rng = random.Random(21)


def test_pack_unpack_roundtrip():
    L = 129
    xs = [rng.getrandbits(16 * L) for _ in range(50)] + [0, 1,
                                                         (1 << (16 * L)) - 1]
    arr = native.pack_limbs16(xs, L)
    assert arr.shape == (L, len(xs))
    assert arr.dtype == np.uint32
    # oracle: each column holds the little-endian 16-bit limbs
    for c, x in enumerate(xs):
        for l in range(L):
            assert arr[l, c] == (x >> (16 * l)) & 0xFFFF
    assert native.unpack_limbs16(arr) == xs


def test_pack_ints16_negative_raises():
    if not native._load() or not hasattr(native._load(), "pack_ints16"):
        pytest.skip("C extension unavailable")
    with pytest.raises((OverflowError, ValueError)):
        native._load().pack_ints16([-1], 4)


def test_extract_windows_oracle():
    count, rbytes = 17, 37
    raw = bytes(rng.getrandbits(8) for _ in range(count * rbytes))
    rows = [int.from_bytes(raw[c * rbytes:(c + 1) * rbytes], "little")
            for c in range(count)]
    for w in (4, 5, 8, 11, 12, 16):
        n_win = -(-rbytes * 8 // w)
        digs = native.extract_windows(raw, count, rbytes, w, n_win)
        if digs is None:
            pytest.skip("C extension unavailable")
        assert digs.shape == (n_win, count)
        for c in range(count):
            for j in range(n_win):
                assert digs[j, c] == (rows[c] >> (w * j)) & ((1 << w) - 1)


def test_obfuscator_digits_match_python_path(monkeypatch):
    """sample_obfuscator_digits via the C path must produce the exact
    digit array the numpy fallback decomposition produces, for byte-
    aligned and non-aligned windows, given the same entropy stream."""
    from pailliercryptolib_python_tpu.models import paillier as sch
    from pailliercryptolib_python_tpu.utils.fixtures import fixed_key_ints

    if not native._load() or not hasattr(native._load(), "extract_windows"):
        pytest.skip("C extension unavailable")

    kd = fixed_key_ints(1024, enable_DJN=True)
    pub = sch.PublicContext(kd["n"], kd["bits"], True, kd["hs"],
                            kd["randbits"])

    entropy = bytes(rng.getrandbits(8) for _ in range(1 << 16))
    monkeypatch.setattr(sch.secrets, "token_bytes",
                        lambda nb: entropy[:nb])

    for w in (8, 12, 5):
        pub.comb_window = w
        n_win = -(-pub.randbits // w)
        digs_c = pub.sample_obfuscator_digits(16, as_numpy=True)
        # force the numpy fallback path and resample the same entropy
        monkeypatch.setattr(native, "extract_windows",
                            lambda *a, **k: None)
        digs_py = pub.sample_obfuscator_digits(16, as_numpy=True)
        monkeypatch.undo()
        monkeypatch.setattr(sch.secrets, "token_bytes",
                            lambda nb: entropy[:nb])
        assert digs_c.shape == (n_win, 16) == digs_py.shape, f"w={w}"
        assert np.array_equal(digs_c, digs_py), f"C/fallback diverge w={w}"
        # reconstructed exponents stay below 2^randbits
        for c in range(16):
            e = sum(int(digs_c[j, c]) << (w * j) for j in range(n_win))
            assert e < (1 << pub.randbits)

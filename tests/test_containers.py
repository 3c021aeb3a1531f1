"""Binding-surface parity tests: BigNumber / PlainText / CipherText / keys.

Exercises the L2 container semantics the reference implements in C++
(/root/reference/src/ipcl_python/bindings/ipcl_bindings_classes.cpp):
ctor overloads, limb access, rotate, slicing (step==1 only), the
throwing __eq__, both apply_obfuscator overloads, encrypt_tolist /
decrypt_tolist, and pickle state tuples.
"""

import pickle

import numpy as np
import pytest

from pailliercryptolib_python_tpu import (
    BigNumber, ipclBigNumber, ipclKeypair, ipclPlainText, ipclCipherText,
)
from pailliercryptolib_python_tpu.utils import baseconverter


@pytest.fixture(scope="module")
def keypair():
    return ipclKeypair.generate_keypair(256, True)


def test_bignumber_basics():
    b = BigNumber(0xDEADBEEF12345)
    assert b.BitSize() == 0xDEADBEEF12345 .bit_length()
    assert b.DwordSize() == 2
    n, limbs = b.data()
    assert n == 2 and limbs == [0xEEF12345, 0xDEADB]
    assert b[0] == 0xEEF12345 and b[1] == 0xDEADB
    with pytest.raises(IndexError):
        b[2]
    assert str(b) == str(0xDEADBEEF12345)
    assert "val: " in repr(b)


def test_bignumber_ctors_and_bytes():
    v = 123456789123456789123456789
    assert BigNumber(BigNumber(v)).value() == v
    assert BigNumber(v.to_bytes(16, "little")).value() == v
    limbs = [(v >> (32 * i)) & 0xFFFFFFFF for i in range(4)]
    assert BigNumber(limbs).value() == v
    assert BigNumber(np.array(limbs, dtype=np.uint32)).value() == v
    # to_bytes pads to whole 32-bit words (BN2bytes parity)
    assert len(BigNumber(1).to_bytes()) == 4
    assert len(BigNumber(2 ** 33).to_bytes()) == 8
    assert BigNumber(BigNumber(v).to_bytes()).value() == v


def test_bignumber_arith_and_statics():
    a, b = BigNumber(1000), BigNumber(24)
    assert (a + b).value() == 1024
    assert (a - b).value() == 976
    assert (a * b).value() == 24000
    assert (a * 3).value() == 3000
    a += b
    assert a.value() == 1024
    assert BigNumber(5) > BigNumber(4) and BigNumber(4) <= BigNumber(4)
    assert ipclBigNumber.Zero.value() == 0
    assert ipclBigNumber.One.value() == 1
    assert ipclBigNumber.Two.value() == 2
    v = BigNumber(987654321987654321)
    assert pickle.loads(pickle.dumps(v)) == v


def test_plaintext_container():
    pt = ipclPlainText([BigNumber(10), BigNumber(2 ** 40), BigNumber(3)])
    assert len(pt) == 3 and pt.getSize() == 3
    assert [b.value() for b in pt.getTexts()] == [10, 2 ** 40, 3]
    assert pt[1].value() == 2 ** 40
    sub = pt[0:2]
    assert [b.value() for b in sub.getTexts()] == [10, 2 ** 40]
    with pytest.raises(RuntimeError):
        pt[::2]
    rot = pt.rotate(1)
    assert [b.value() for b in rot.getTexts()] == [2 ** 40, 3, 10]
    assert pt.getElementVec(1) == [0, 256]
    assert pt.getElementHex(0) == "A"
    pt2 = pickle.loads(pickle.dumps(pt))
    assert pt == pt2  # value equality (throws on mismatch)
    with pytest.raises(RuntimeError):
        pt == ipclPlainText([BigNumber(1), BigNumber(2), BigNumber(3)])
    # scalar / numpy ctors
    assert ipclPlainText(7).getInts() == [7]
    assert ipclPlainText(np.array([1, 2, 3], dtype=np.uint32)).getInts() == [1, 2, 3]


def test_ciphertext_ops_and_pickle(keypair):
    pub, priv = keypair
    pt = ipclPlainText([BigNumber(11), BigNumber(22), BigNumber(33)])
    ct = pub.encrypt(pt, True)
    assert len(ct) == 3
    assert ct.public_key == pub
    # CT + CT, CT + PT, CT * PT at the container level
    ct2 = ct + ct
    dec = priv.decrypt(ct2)
    assert [b.value() for b in dec.getTexts()] == [22, 44, 66]
    ct3 = ct + pt
    assert [b.value() for b in priv.decrypt(ct3).getTexts()] == [22, 44, 66]
    ct4 = ct * ipclPlainText([BigNumber(3), BigNumber(5), BigNumber(7)])
    assert [b.value() for b in priv.decrypt(ct4).getTexts()] == [33, 110, 231]
    # rotate on device
    rot = ct.rotate(1)
    assert [b.value() for b in priv.decrypt(rot).getTexts()] == [22, 33, 11]
    # slicing (device gather)
    sub = ct[1:3]
    assert [b.value() for b in priv.decrypt(sub).getTexts()] == [22, 33]
    # pickle carries the pubkey tuple
    ct5 = pickle.loads(pickle.dumps(ct))
    assert [b.value() for b in priv.decrypt(ct5).getTexts()] == [11, 22, 33]


def test_tolist_and_obfuscator_overloads(keypair):
    pub, priv = keypair
    pt = ipclPlainText([BigNumber(5), BigNumber(6)])
    l_ct = pub.encrypt_tolist(pt, True)
    assert len(l_ct) == 2 and all(isinstance(b, BigNumber) for b in l_ct)
    ct = ipclCipherText(pub, l_ct)
    l_pt = priv.decrypt_tolist(ct)
    assert [b.value() for b in l_pt] == [5, 6]
    # single-BigNumber obfuscator overload
    single = pub.apply_obfuscator(l_ct[0])
    assert isinstance(single, BigNumber) and single != l_ct[0]
    ct_single = ipclCipherText(pub, [single, l_ct[1]])
    assert [b.value() for b in priv.decrypt(ct_single).getTexts()] == [5, 6]
    # whole-CipherText overload returns a list
    l_obf = pub.apply_obfuscator(ct)
    assert len(l_obf) == 2 and l_obf[0] != l_ct[0]


def test_key_pickle_and_eq(keypair):
    pub, priv = keypair
    pub2 = pickle.loads(pickle.dumps(pub))
    assert pub2 == pub
    assert pub2.n == pub.n and pub2.length == pub.length
    priv2 = pickle.loads(pickle.dumps(priv))
    assert priv2 == priv
    pt = ipclPlainText(BigNumber(123))
    ct = pub2.encrypt(pt, True)
    assert priv2.decrypt(ct).getInts() == [123]


def test_baseconverter():
    assert baseconverter.hex2dec("ff") == "255"
    assert baseconverter.dec2hex("255") == "ff"
    assert baseconverter.BN2dec(BigNumber(12345)) == "12345"
    assert baseconverter.getdec("101", 2) == "5"
    assert baseconverter.getbase("z", 36) == 35

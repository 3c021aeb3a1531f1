"""Full-size (2048-bit) parity run of the reference test suite semantics
(/root/reference/tests/ipcl_python_test.py) — the BASELINE.md bit-exact
parity gate.

Runs in the DEFAULT suite (adds ~90 s on the CPU fallback path); set
PAILLIER_SKIP_SLOW=1 to skip during quick iteration.  bench.py runs the
same op suite asserted on the real device every round.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("PAILLIER_SKIP_SLOW") == "1",
    reason="PAILLIER_SKIP_SLOW=1 skips the full-size parity run")


@pytest.fixture(scope="module")
def keys():
    from pailliercryptolib_python_tpu import PaillierKeypair
    return PaillierKeypair.generate_keypair(2048)


def test_add_2048(keys):
    pk, sk = keys
    x_li = np.ones(100) * np.random.randint(100)
    y_li = np.ones(100) * np.random.randint(1000)
    z_li = np.ones(100) * np.random.rand()
    t_li = list(range(100))
    en_res = (pk.encrypt(x_li) + pk.encrypt(y_li)
              + pk.encrypt(z_li) + pk.encrypt(t_li))
    res = x_li + y_li + z_li + t_li
    de = sk.decrypt(en_res)
    for i in range(100):
        assert de[i] == pytest.approx(res[i], abs=1e-7)


def test_mul_2048(keys):
    pk, sk = keys
    x_li = np.ones(100) * np.random.randint(100)
    y_li = np.ones(100) * np.random.randint(1000) * -1
    z_li = np.ones(100) * np.random.rand()
    t_li = list(range(100))
    en_res = (pk.encrypt(x_li) * y_li + z_li) * t_li
    de = sk.decrypt(en_res)
    res = (x_li * y_li + z_li) * t_li
    for i in range(100):
        assert de[i] == pytest.approx(res[i], rel=1e-9, abs=1e-7)


def test_matmul_2048(keys):
    pk, sk = keys
    m, n, k = 4, 5, 3
    x_li = np.random.rand(m, n)
    y_li = np.random.rand(n, k)
    en_x = pk.encrypt(x_li.flatten())
    de = np.array(sk.decrypt(en_x @ y_li)).reshape([m, k])
    np.testing.assert_allclose(de, x_li @ y_li, atol=1e-7)

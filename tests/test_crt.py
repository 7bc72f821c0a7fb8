"""CRT integer tests vs clear modular arithmetic.

(ref: tfhe/src/integer/server_key/crt/tests.rs and crt_parallel/tests.rs —
random inputs, result compared against clear arithmetic mod prod(basis).)
"""

import numpy as np
import pytest

from tfhe_tpu.integer import gen_keys_crt, i_crt
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST as P

BASIS = [2, 3]  # prod 6; each b_i fits the 2_2 block space with room for mul


pytestmark = pytest.mark.slow  # matrix suite: run via `pytest -m slow`

@pytest.fixture(scope="module")
def keys():
    return gen_keys_crt(P, BASIS, seed=999)


def test_i_crt():
    assert i_crt([2, 3, 5], [0, 2, 3]) == 8
    assert i_crt([2, 3, 5], [1, 1, 1]) == 1
    for x in range(30):
        assert i_crt([2, 3, 5], [x % 2, x % 3, x % 5]) == x


def test_crt_encrypt_decrypt(keys):
    cks, _ = keys
    for x in range(6):
        assert cks.decrypt(cks.encrypt(x)) == x


def test_crt_add(keys):
    cks, sks = keys
    for a, b in [(0, 0), (1, 5), (4, 3), (5, 5)]:
        ct = sks.crt_add_parallelized(cks.encrypt(a), cks.encrypt(b))
        assert cks.decrypt(ct) == (a + b) % 6, (a, b)


def test_crt_add_chain_triggers_extract(keys):
    cks, sks = keys
    ct = cks.encrypt(3)
    total = 3
    for v in [4, 5, 2, 1, 5]:
        ct = sks.crt_add_parallelized(ct, cks.encrypt(v))
        total += v
    assert cks.decrypt(ct) == total % 6


def test_crt_neg_sub(keys):
    cks, sks = keys
    for a in range(6):
        assert cks.decrypt(sks.crt_neg_parallelized(cks.encrypt(a))) == \
            (-a) % 6
    for a, b in [(5, 2), (0, 4), (3, 3), (1, 5)]:
        ct = sks.crt_sub_parallelized(cks.encrypt(a), cks.encrypt(b))
        assert cks.decrypt(ct) == (a - b) % 6, (a, b)


def test_crt_mul(keys):
    cks, sks = keys
    for a, b in [(0, 5), (2, 3), (5, 5), (4, 2), (3, 5)]:
        ct = sks.crt_mul_parallelized(cks.encrypt(a), cks.encrypt(b))
        assert cks.decrypt(ct) == (a * b) % 6, (a, b)


def test_crt_scalar_ops(keys):
    cks, sks = keys
    for a, s in [(3, 4), (5, 7), (2, 0)]:
        assert cks.decrypt(
            sks.crt_scalar_add_parallelized(cks.encrypt(a), s)) == (a + s) % 6
        assert cks.decrypt(
            sks.crt_scalar_sub_parallelized(cks.encrypt(a), s)) == (a - s) % 6
        assert cks.decrypt(
            sks.crt_scalar_mul_parallelized(cks.encrypt(a), s)) == (a * s) % 6


def test_crt_pbs_function(keys):
    cks, sks = keys
    for a in range(6):
        ct = sks.pbs_crt_compliant_function_parallelized(
            cks.encrypt(a), lambda x: x * x * x)
        assert cks.decrypt(ct) == (a ** 3) % 6, a


def test_crt_serialization(keys):
    from tfhe_tpu.utils import safe_serialize, safe_deserialize

    cks, _ = keys
    ct = cks.encrypt(5)
    back = safe_deserialize(safe_serialize(ct))
    assert back.moduli == BASIS
    assert cks.decrypt(back) == 5

"""WoPBS tests: bit extraction, circuit bootstrap, vertical packing, and
the shortint WopbsKey wrapper.

(ref: tfhe/src/core_crypto/fft_impl/fft64/crypto/wop_pbs/tests.rs and
shortint wopbs doc tests.)
"""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.params import WOPBS_PARAM_MESSAGE_2_CARRY_2_TEST as P


pytestmark = pytest.mark.slow  # matrix suite: run via `pytest -m slow`

@pytest.fixture(scope="module")
def keys():
    return shortint.gen_keys_wopbs(P, seed=515)


def test_wopbs_identity(keys):
    cks, sks, wk = keys
    lut = wk.generate_lut(lambda x: x)
    for v in (1, 2):
        ct = cks.encrypt(v)
        out = wk.wopbs(ct, lut)
        assert cks.decrypt(out) == v, v


def test_wopbs_function(keys):
    cks, sks, wk = keys
    lut = wk.generate_lut(lambda x: (x * 3 + 1) % 4)
    msgs = np.array([0, 1, 2, 3], dtype=np.uint64)
    batch = cks.encrypt_batch(msgs)
    out = wk.wopbs_batch(batch, lut)
    np.testing.assert_array_equal(cks.decrypt_batch(out), (msgs * 3 + 1) % 4)


def test_wopbs_full_domain(keys):
    """LUT over the packed (message, carry) value — the capability a
    classic PBS with padding cannot offer at full width."""
    cks, sks, wk = keys
    lut = wk.generate_lut_full_domain(lambda x: (x * x) % 16)
    msgs = np.array([0, 3, 7, 15], dtype=np.uint64)
    batch = cks.encrypt_batch(msgs)
    out = wk.wopbs_batch(batch, lut)
    np.testing.assert_array_equal(
        cks.decrypt_batch_message_and_carry(out), (msgs * msgs) % 16)


def test_wopbs_after_arithmetic(keys):
    """WoPBS digests a carry-laden ciphertext (degree < total) fine."""
    cks, sks, wk = keys
    a = cks.encrypt_batch([3])
    b = cks.encrypt_batch([3])
    s = sks.unchecked_add_batch(a, b)  # value 6 with carry
    lut = wk.generate_lut_full_domain(lambda x: x % 4)
    out = wk.wopbs_batch(s, lut)
    assert cks.decrypt_batch(out)[0] == 6 % 4


# -- integer-level wopbs (ref: tfhe/src/integer/wopbs/mod.rs tests) ---------


def test_integer_wopbs(keys):
    from tfhe_tpu.integer import IntegerWopbsKey, RadixClientKey

    cks, sks, wk = keys
    rck = RadixClientKey.__new__(RadixClientKey)
    rck.key = cks  # reuse the wopbs client key so the same server keys apply
    rck.num_blocks = 2
    rck.params = P
    iwk = IntegerWopbsKey(wk)
    modulus = 16

    ct = rck.encrypt(11)
    lut = iwk.generate_lut(ct, lambda x: (x * 3 + 5) % modulus)
    out = iwk.wopbs(ct, lut)
    assert rck.decrypt(out) == (11 * 3 + 5) % modulus

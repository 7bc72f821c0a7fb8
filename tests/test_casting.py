"""Casting tests: shortint KeySwitchingKey between parameter sets, and
high-level cast_into between FheUint/FheInt widths.

(ref: tfhe/src/shortint/key_switching_key/test.rs and high_level_api
CastFrom tests.)
"""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.params import (
    PARAM_MESSAGE_1_CARRY_1_TEST,
    PARAM_MESSAGE_2_CARRY_2_TEST,
)


@pytest.fixture(scope="module")
def pairs():
    k1 = shortint.gen_keys(PARAM_MESSAGE_1_CARRY_1_TEST, seed=101)
    k2 = shortint.gen_keys(PARAM_MESSAGE_2_CARRY_2_TEST, seed=102)
    return k1, k2


def test_cast_up(pairs):
    """1_1 (4 values) -> 2_2 (16 values): keyswitch + right-shift LUT."""
    (cks1, sks1), (cks2, sks2) = pairs
    ksk = shortint.KeySwitchingKey(
        (cks1, sks1), (cks2, sks2),
        shortint.PARAM_KEYSWITCH_1_1_KS_PBS_TO_2_2_KS_PBS)
    assert ksk.cast_rshift == 2
    msgs = np.array([0, 1, 0, 1], dtype=np.uint64)
    batch = cks1.encrypt_batch(msgs)
    out = ksk.cast_batch(batch)
    np.testing.assert_array_equal(cks2.decrypt_batch(out), msgs)
    # the cast ciphertext computes under the destination server key
    lut = sks2.generate_lookup_table(lambda x: (x + 2) % 4)
    res = sks2.apply_lookup_table_batch(out, lut)
    np.testing.assert_array_equal(cks2.decrypt_batch(res), (msgs + 2) % 4)


def test_cast_down(pairs):
    """2_2 -> 1_1: scale-up LUT under the source key, then keyswitch."""
    (cks1, sks1), (cks2, sks2) = pairs
    ksk = shortint.KeySwitchingKey(
        (cks2, sks2), (cks1, sks1),
        shortint.PARAM_KEYSWITCH_1_1_KS_PBS_TO_2_2_KS_PBS)
    assert ksk.cast_rshift == -2
    msgs = np.array([0, 1, 1, 0], dtype=np.uint64)
    batch = cks2.encrypt_batch(msgs)
    out = ksk.cast_batch(batch)
    np.testing.assert_array_equal(cks1.decrypt_batch(out), msgs)


def test_cast_single(pairs):
    (cks1, sks1), (cks2, sks2) = pairs
    ksk = shortint.KeySwitchingKey(
        (cks1, sks1), (cks2, sks2),
        shortint.PARAM_KEYSWITCH_1_1_KS_PBS_TO_2_2_KS_PBS)
    ct = cks1.encrypt(1)
    out = ksk.cast(ct)
    assert cks2.decrypt(out) == 1


# -- high-level width casts -------------------------------------------------


@pytest.fixture(scope="module")
def hl_keys():
    from tfhe_tpu import api

    config = api.ConfigBuilder.default().use_custom_parameters(
        PARAM_MESSAGE_2_CARRY_2_TEST).build()
    cks, sks = api.generate_keys(config, seed=77)
    api.set_server_key(sks)
    return cks, sks


def test_hl_cast_narrow(hl_keys):
    from tfhe_tpu import api

    cks, _ = hl_keys
    a = api.FheUint16.encrypt(0xABCD, cks)
    b = a.cast_into(api.FheUint8)
    assert type(b) is api.FheUint8
    assert b.decrypt(cks) == 0xCD


def test_hl_cast_widen_unsigned(hl_keys):
    from tfhe_tpu import api

    cks, _ = hl_keys
    a = api.FheUint8.encrypt(200, cks)
    b = a.cast_into(api.FheUint16)
    assert b.decrypt(cks) == 200
    assert (b + 100).decrypt(cks) == 300  # no 8-bit wrap after widening


def test_hl_cast_widen_signed(hl_keys):
    from tfhe_tpu import api

    cks, _ = hl_keys
    a = api.FheInt8.encrypt(-5, cks)
    b = a.cast_into(api.FheInt16)
    assert type(b) is api.FheInt16
    assert b.decrypt(cks) == -5
    c = api.FheInt8.encrypt(100, cks).cast_into(api.FheInt16)
    assert c.decrypt(cks) == 100


def test_hl_cast_signed_unsigned(hl_keys):
    from tfhe_tpu import api

    cks, _ = hl_keys
    a = api.FheInt8.encrypt(-1, cks)
    b = a.cast_into(api.FheUint8)
    assert b.decrypt(cks) == 255
    u = api.FheUint8.encrypt(255, cks)
    s = u.cast_into(api.FheInt8)
    assert s.decrypt(cks) == -1


def test_hl_cast_after_arithmetic(hl_keys):
    """Cast must propagate carries first (dirty blocks would corrupt the
    trim)."""
    from tfhe_tpu import api

    cks, _ = hl_keys
    a = api.FheUint16.encrypt(300, cks)
    b = api.FheUint16.encrypt(100, cks)
    c = (a + b).cast_into(api.FheUint8)
    assert c.decrypt(cks) == 400 % 256

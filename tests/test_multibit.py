"""Multi-bit PBS tests: core round trip, shortint ops, integer radix e2e.

(ref: tfhe/src/core_crypto/algorithms/test/lwe_multi_bit_programmable_
bootstrapping.rs and shortint multi-bit parameter tests.)
"""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.params import PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_2_TEST as PMB


pytestmark = pytest.mark.slow  # matrix suite: run via `pytest -m slow`

@pytest.fixture(scope="module")
def keys():
    return shortint.gen_keys(PMB, seed=777)


def test_multibit_bsk_structure(keys):
    _, sks = keys
    assert sks.is_multi_bit
    n_groups = PMB.lwe_dimension // PMB.grouping_factor
    assert sks.raw_bsk.shape[0] == n_groups
    assert sks.raw_bsk.shape[1] == 1 << PMB.grouping_factor


def test_multibit_bsk_plaintexts(keys):
    """Exactly one GGSW per group encrypts 1 (the matching bit pattern)."""
    cks, sks = keys
    gf = PMB.grouping_factor
    bits = cks.lwe_sk.bits_array
    from tfhe_tpu.core.multibit import combine_key_bits

    for g in range(PMB.lwe_dimension // gf):
        group = bits[g * gf:(g + 1) * gf]
        plaintexts = [combine_key_bits(j, group) for j in range(1 << gf)]
        assert sum(plaintexts) == 1
        match = int("".join(str(int(b)) for b in group), 2)
        assert plaintexts[match] == 1


def test_multibit_lut(keys):
    cks, sks = keys
    msgs = np.array([0, 1, 2, 3], dtype=np.uint64)
    ct = cks.encrypt_batch(msgs)
    lut = sks.generate_lookup_table(lambda x: (x * 2 + 1) % 4)
    out = sks.apply_lookup_table_batch(ct, lut)
    np.testing.assert_array_equal(cks.decrypt_batch(out),
                                  (msgs * 2 + 1) % 4)


def test_multibit_bivariate(keys):
    cks, sks = keys
    a = cks.encrypt_batch([0, 1, 2, 3])
    b = cks.encrypt_batch([3, 2, 1, 0])
    blut = sks.generate_lookup_table_bivariate(lambda x, y: (x * y) % 4)
    out = sks.unchecked_bivariate_batch(a, b, blut)
    np.testing.assert_array_equal(cks.decrypt_batch(out), [0, 2, 2, 0])


def test_multibit_deterministic(keys):
    """Reduction order is fixed on TPU: the same input always yields the
    same ciphertext words (ref: deterministic_execution mode,
    shortint/server_key/mod.rs:104-276 — always on here)."""
    cks, sks = keys
    ct = cks.encrypt_batch([2])
    lut = sks.generate_lookup_table(lambda x: (x + 3) % 4)
    o1 = sks.apply_lookup_table_batch(ct, lut)
    o2 = sks.apply_lookup_table_batch(ct, lut)
    np.testing.assert_array_equal(np.asarray(o1.data), np.asarray(o2.data))


def test_multibit_radix_integer():
    from tfhe_tpu.integer import gen_keys_radix

    rck, rsks = gen_keys_radix(PMB, num_blocks=4, seed=778)
    a = rck.encrypt(137)
    b = rck.encrypt(85)
    assert rck.decrypt(rsks.add_parallelized(a, b)) == (137 + 85) % 256
    assert rck.decrypt(rsks.mul_parallelized(a, b)) == (137 * 85) % 256


def test_multibit_serialization(keys):
    from tfhe_tpu.utils import safe_deserialize, safe_serialize

    cks, sks = keys
    back = safe_deserialize(safe_serialize(sks))
    assert back.is_multi_bit
    ct = cks.encrypt_batch([1, 3])
    lut = back.generate_lookup_table(lambda x: (3 - x) % 4)
    out = back.apply_lookup_table_batch(ct, lut)
    np.testing.assert_array_equal(cks.decrypt_batch(out), [2, 0])

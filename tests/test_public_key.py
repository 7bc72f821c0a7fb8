"""Public-key encryption tests: standard and compact, core through HL API.

(ref: shortint public key tests in tfhe/src/shortint/public_key/*.rs doc
tests and core_crypto lwe_encryption.rs public-key doc examples.)
"""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.core import public_key as core_pk
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST as P
from tfhe_tpu.utils import safe_serialize, safe_deserialize


@pytest.fixture(scope="module")
def keys():
    return shortint.gen_keys(P, seed=2024)


def test_negacyclic_mul_matches_naive():
    rng = np.random.default_rng(0)
    n = 16
    a = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    got = core_pk.negacyclic_mul(a, b)
    # naive schoolbook in Python ints
    want = [0] * n
    for i in range(n):
        for j in range(n):
            k = (i + j) % n
            sign = -1 if i + j >= n else 1
            want[k] = (want[k] + sign * int(a[i]) * int(b[j])) % (1 << 64)
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))


def test_monic_monomial_mul():
    p = np.array([1, 2, 3, 4], dtype=np.uint64)
    # p * X: [-4, 1, 2, 3]
    np.testing.assert_array_equal(
        core_pk.monic_monomial_mul(p, 1),
        np.array([(1 << 64) - 4, 1, 2, 3], dtype=np.uint64))
    # p * X^4 = -p
    with np.errstate(over="ignore"):
        neg_p = np.uint64(0) - p
    np.testing.assert_array_equal(core_pk.monic_monomial_mul(p, 4), neg_p)
    # p * X^8 = p
    np.testing.assert_array_equal(core_pk.monic_monomial_mul(p, 8), p)


def test_standard_public_key(keys):
    cks, sks = keys
    pk = shortint.PublicKey(cks)
    msgs = np.array([0, 1, 2, 3], dtype=np.uint64)
    batch = pk.encrypt_batch(msgs, seed=5)
    np.testing.assert_array_equal(cks.decrypt_batch(batch), msgs)
    # public-key ciphertexts are ordinary ciphertexts: PBS works on them
    lut = sks.generate_lookup_table(lambda x: (x + 1) % 4)
    out = sks.apply_lookup_table_batch(batch, lut)
    np.testing.assert_array_equal(cks.decrypt_batch(out), (msgs + 1) % 4)


def test_compact_public_key(keys):
    cks, sks = keys
    cpk = shortint.CompactPublicKey(cks)
    msgs = np.array([3, 2, 1, 0, 1, 2], dtype=np.uint64)
    compact = cpk.encrypt_compact_batch(msgs, seed=6)
    n = cpk.key.lwe_dimension
    assert compact.compact.masks.shape == (-(-len(msgs) // n), n)
    batch = compact.expand()
    np.testing.assert_array_equal(cks.decrypt_batch(batch), msgs)
    lut = sks.generate_lookup_table(lambda x: (2 * x) % 4)
    out = sks.apply_lookup_table_batch(batch, lut)
    np.testing.assert_array_equal(cks.decrypt_batch(out), (2 * msgs) % 4)


def test_compact_more_than_one_bin(keys):
    cks, _ = keys
    cpk = shortint.CompactPublicKey(cks)
    n = cpk.key.lwe_dimension
    count = n + 3  # forces 2 bins
    msgs = np.arange(count, dtype=np.uint64) % 4
    batch = cpk.encrypt_compact_batch(msgs, seed=7).expand()
    np.testing.assert_array_equal(cks.decrypt_batch(batch), msgs)


def test_public_key_serialization(keys):
    cks, _ = keys
    pk = shortint.PublicKey(cks)
    back = safe_deserialize(safe_serialize(pk))
    msgs = np.array([2, 3], dtype=np.uint64)
    np.testing.assert_array_equal(
        cks.decrypt_batch(back.encrypt_batch(msgs, seed=8)), msgs)

    cpk = shortint.CompactPublicKey(cks)
    back = safe_deserialize(safe_serialize(cpk))
    np.testing.assert_array_equal(
        cks.decrypt_batch(back.encrypt_batch(msgs, seed=9)), msgs)


# -- high-level API ---------------------------------------------------------


@pytest.fixture(scope="module")
def hl_keys():
    from tfhe_tpu import api

    config = api.ConfigBuilder.default().use_custom_parameters(P).build()
    cks, sks = api.generate_keys(config, seed=31337)
    api.set_server_key(sks)
    return cks, sks


def test_hl_public_key(hl_keys):
    from tfhe_tpu import api

    cks, _ = hl_keys
    pk = api.PublicKey(cks)
    a = api.FheUint8.encrypt_with_public_key(77, pk)
    assert a.decrypt(cks) == 77
    b = api.FheUint8.encrypt(3, cks)
    assert (a + b).decrypt(cks) == 80


def test_hl_compact_fheuint(hl_keys):
    from tfhe_tpu import api

    cks, _ = hl_keys
    cpk = api.CompactPublicKey(cks)
    compact = api.CompactFheUint8.encrypt(123, cpk)
    wire = safe_serialize(compact)
    back = safe_deserialize(wire)
    val = back.expand()
    assert type(val) is api.FheUint8
    assert val.decrypt(cks) == 123
    # compact wire smaller than the expanded ciphertext wire
    assert len(wire) < len(safe_serialize(val))


def test_hl_compact_fheint(hl_keys):
    from tfhe_tpu import api

    cks, _ = hl_keys
    cpk = api.CompactPublicKey(cks)
    compact = api.CompactFheInt8.encrypt(-77, cpk)
    val = safe_deserialize(safe_serialize(compact)).expand()
    assert type(val) is api.FheInt8
    assert val.decrypt(cks) == -77
    assert (val + 7).decrypt(cks) == -70


def test_compressed_public_key(keys):
    cks, _ = keys
    comp = shortint.CompressedPublicKey(cks)
    back = safe_deserialize(safe_serialize(comp))
    pk = back.decompress()
    msgs = np.array([1, 3], dtype=np.uint64)
    np.testing.assert_array_equal(
        cks.decrypt_batch(pk.encrypt_batch(msgs, seed=12)), msgs)
    # seeded form is ~(n+1)x smaller than the full key
    full = safe_serialize(pk)
    assert len(safe_serialize(comp)) < len(full) // 4


def test_compressed_compact_public_key(keys):
    cks, _ = keys
    comp = shortint.CompressedCompactPublicKey(cks)
    back = safe_deserialize(safe_serialize(comp))
    cpk = back.decompress()
    msgs = np.array([2, 0, 3], dtype=np.uint64)
    np.testing.assert_array_equal(
        cks.decrypt_batch(cpk.encrypt_batch(msgs, seed=13)), msgs)

"""Serialization, seeded compression, and conformance tests.

Mirrors the reference's safe_(de)serialization tests
(ref: tfhe/src/safe_deserialization.rs tests) and the seeded-entity
decompression round-trips (ref: algorithms/seeded_*_decompression.rs usage in
core_crypto tests).
"""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.core import seeded as seeded_mod
from tfhe_tpu.params import (
    PARAM_MESSAGE_2_CARRY_2_KS_PBS,
    PARAM_MESSAGE_2_CARRY_2_TEST,
)
from tfhe_tpu.utils import (
    ConformanceError,
    DeserializationError,
    safe_deserialize,
    safe_serialize,
)

P = PARAM_MESSAGE_2_CARRY_2_TEST


@pytest.fixture(scope="module")
def keys():
    return shortint.gen_keys(P, seed=1234)


def test_params_round_trip():
    data = safe_serialize(P)
    back = safe_deserialize(data)
    assert back == P


def test_batch_round_trip(keys):
    cks, _ = keys
    msgs = np.array([0, 1, 2, 3], dtype=np.uint64)
    batch = cks.encrypt_batch(msgs)
    back = safe_deserialize(safe_serialize(batch))
    np.testing.assert_array_equal(np.asarray(back.data),
                                  np.asarray(batch.data))
    np.testing.assert_array_equal(back.degrees, batch.degrees)
    np.testing.assert_array_equal(cks.decrypt_batch(back), msgs)


def test_client_key_round_trip(keys):
    cks, _ = keys
    back = safe_deserialize(safe_serialize(cks))
    np.testing.assert_array_equal(back.lwe_sk.bits_array,
                                  cks.lwe_sk.bits_array)
    np.testing.assert_array_equal(back.glwe_sk.bits_array,
                                  cks.glwe_sk.bits_array)
    # the restored key decrypts ciphertexts made by the original
    ct = cks.encrypt_batch([3])
    assert back.decrypt_batch(ct)[0] == 3


def test_server_key_round_trip(keys):
    cks, sks = keys
    back = safe_deserialize(safe_serialize(sks))
    np.testing.assert_array_equal(back.raw_bsk, sks.raw_bsk)
    np.testing.assert_array_equal(back.raw_ksk, sks.raw_ksk)
    lut = back.generate_lookup_table(lambda x: (x + 1) % 4)
    ct = cks.encrypt_batch([0, 1, 2, 3])
    out = back.apply_lookup_table_batch(ct, lut)
    np.testing.assert_array_equal(cks.decrypt_batch(out), [1, 2, 3, 0])


def test_radix_round_trip(keys):
    from tfhe_tpu.integer import RadixClientKey

    rck = RadixClientKey(P, num_blocks=4, seed=77)
    ct = rck.encrypt(123)
    back = safe_deserialize(safe_serialize(ct))
    assert type(back).__name__ == "RadixCiphertext"
    assert rck.decrypt(back) == 123


def test_signed_radix_round_trip():
    from tfhe_tpu.integer import RadixClientKey

    rck = RadixClientKey(P, num_blocks=4, seed=78)
    ct = rck.encrypt_signed(-55)
    back = safe_deserialize(safe_serialize(ct))
    assert type(back).__name__ == "SignedRadixCiphertext"
    assert rck.decrypt_signed(back) == -55


def test_compressed_ciphertext_list(keys):
    cks, _ = keys
    msgs = np.array([3, 1, 0, 2], dtype=np.uint64)
    comp = shortint.encrypt_compressed_batch(cks, msgs)
    # compressed payload stores only bodies: ~(n+1)x smaller ct data
    assert comp.seeded.bodies.shape == (4,)
    wire = safe_serialize(comp)
    back = safe_deserialize(wire)
    batch = back.decompress()
    np.testing.assert_array_equal(cks.decrypt_batch(batch), msgs)


def test_seeded_lwe_bitexact(keys):
    """Decompression regenerates the exact mask used at encryption time."""
    cks, _ = keys
    sk, std = cks.encryption_key_and_noise
    seed = 0xDEADBEEF
    enc = np.array([5, 6], dtype=np.uint64) * np.uint64(P.delta)
    seeded = seeded_mod.encrypt_seeded_lwe(sk, enc, std, seed, cks.enc_gen)
    full = seeded_mod.decompress_seeded_lwe(seeded)
    # body equation holds: body - <mask, s> = encoded + noise (small)
    from tfhe_tpu import core
    phase = core.decrypt_lwe(sk, full)
    delta = np.uint64(P.delta)
    decoded = ((phase + (delta >> np.uint64(1))) // delta) % np.uint64(8)
    np.testing.assert_array_equal(decoded, [5, 6])


def test_compressed_server_key(keys):
    cks, _ = keys
    comp = shortint.CompressedServerKey(cks)
    # wire round trip
    back = safe_deserialize(safe_serialize(comp))
    sks2 = back.decompress()
    lut = sks2.generate_lookup_table(lambda x: (3 * x) % 4)
    ct = cks.encrypt_batch([0, 1, 2, 3])
    out = sks2.apply_lookup_table_batch(ct, lut)
    np.testing.assert_array_equal(cks.decrypt_batch(out), [0, 3, 2, 1])


def test_compressed_server_key_bitexact_masks(keys):
    """compress(decompress(x)) round-trips the seeded representation."""
    cks, _ = keys
    comp = shortint.CompressedServerKey(cks)
    bsk = seeded_mod.decompress_bootstrap_key(comp.seeded_bsk)
    re = seeded_mod.compress_bootstrap_key(
        bsk, comp.seeded_bsk.mask_seed, comp.seeded_bsk.base_log)
    np.testing.assert_array_equal(re.bodies, comp.seeded_bsk.bodies)
    back = seeded_mod.decompress_bootstrap_key(re)
    np.testing.assert_array_equal(back, bsk)


def test_conformance_error(keys):
    cks, _ = keys
    ct = cks.encrypt_batch([1])
    data = safe_serialize(cks)
    with pytest.raises(ConformanceError):
        safe_deserialize(data, expected_params=PARAM_MESSAGE_2_CARRY_2_KS_PBS)
    # matching params pass
    safe_deserialize(data, expected_params=P)
    del ct


def test_size_limit(keys):
    cks, _ = keys
    data = safe_serialize(cks)
    with pytest.raises(DeserializationError):
        safe_deserialize(data, limit=64)
    with pytest.raises(DeserializationError):
        safe_serialize(cks, limit=64)


def test_bad_magic():
    with pytest.raises(DeserializationError):
        safe_deserialize(b"NOTMAGIC" + b"\x00" * 32)


# -- high-level API (ref: high_level_api compressed types + serde) ----------


@pytest.fixture(scope="module")
def hl_keys():
    from tfhe_tpu import api

    config = api.ConfigBuilder.default().use_custom_parameters(P).build()
    cks, sks = api.generate_keys(config, seed=4242)
    api.set_server_key(sks)
    return cks, sks


def test_hl_fheuint_round_trip(hl_keys):
    from tfhe_tpu import api

    cks, _ = hl_keys
    a = api.FheUint8.encrypt(200, cks)
    back = safe_deserialize(safe_serialize(a))
    assert type(back) is api.FheUint8
    assert back.decrypt(cks) == 200


def test_hl_fheint_and_bool_round_trip(hl_keys):
    from tfhe_tpu import api

    cks, _ = hl_keys
    a = api.FheInt8.encrypt(-42, cks)
    back = safe_deserialize(safe_serialize(a))
    assert type(back) is api.FheInt8
    assert back.decrypt(cks) == -42
    b = api.FheBool.encrypt(True, cks)
    bb = safe_deserialize(safe_serialize(b))
    assert bb.decrypt(cks) is True


def test_hl_compressed_fheuint(hl_keys):
    from tfhe_tpu import api

    cks, _ = hl_keys
    comp = api.CompressedFheUint8.encrypt(123, cks)
    wire = safe_serialize(comp)
    back = safe_deserialize(wire)
    val = back.decompress()
    assert type(val) is api.FheUint8
    assert val.decrypt(cks) == 123
    # compressed wire is materially smaller than the full ciphertext
    full_wire = safe_serialize(val)
    assert len(wire) < len(full_wire) // 2


def test_hl_compressed_fheint(hl_keys):
    from tfhe_tpu import api

    cks, _ = hl_keys
    comp = api.CompressedFheInt8.encrypt(-100, cks)
    back = safe_deserialize(safe_serialize(comp))
    assert back.decompress().decrypt(cks) == -100


def test_hl_compressed_server_key(hl_keys):
    from tfhe_tpu import api

    cks, _ = hl_keys
    comp = api.CompressedServerKey(cks)
    back = safe_deserialize(safe_serialize(comp))
    sks2 = back.decompress()
    api.set_server_key(sks2)
    try:
        a = api.FheUint8.encrypt(17, cks)
        b = api.FheUint8.encrypt(5, cks)
        assert (a + b).decrypt(cks) == 22
    finally:
        api.set_server_key(hl_keys[1])


def test_hl_keys_round_trip(hl_keys):
    from tfhe_tpu import api

    cks, sks = hl_keys
    cks2 = safe_deserialize(safe_serialize(cks))
    sks2 = safe_deserialize(safe_serialize(sks))
    api.set_server_key(sks2)
    try:
        a = api.FheUint8.encrypt(9, cks2)
        assert (a * 3).decrypt(cks2) == 27
        assert (a * 3).decrypt(cks) == 27
    finally:
        api.set_server_key(sks)


def test_fhestring_round_trip():
    from tfhe_tpu import strings
    from tfhe_tpu.strings.ciphertext import Padding

    cks, sks = strings.gen_keys_test(seed=888)
    s = cks.encrypt_str_random_padding("Wire!", 2)
    back = safe_deserialize(safe_serialize(s))
    assert back.padding == s.padding
    assert cks.decrypt_string(back) == "Wire!"
    # server ops work on the deserialized string
    up = sks.to_uppercase(back)
    assert cks.decrypt_string(up) == "WIRE!"
    # clear-length strings too
    s2 = cks.encrypt_str("ab")
    b2 = safe_deserialize(safe_serialize(s2))
    assert b2.padding == Padding.NONE and b2.length == 2
    assert cks.decrypt_string(b2) == "ab"


def test_boolean_public_key():
    from tfhe_tpu import boolean
    from tfhe_tpu.params import BOOLEAN_SHA_TEST_PARAMETERS

    cks, sks = boolean.gen_keys(BOOLEAN_SHA_TEST_PARAMETERS, seed=10)
    pk = boolean.PublicKey(cks)
    bits = np.array([True, False, True, True])
    ct = pk.encrypt_batch(bits, seed=3)
    np.testing.assert_array_equal(cks.decrypt_batch(ct), bits)
    # gates work on public-key ciphertexts
    out = sks.and_batch(ct, ct)
    np.testing.assert_array_equal(cks.decrypt_batch(out), bits)

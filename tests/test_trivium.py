"""Trivium/Kreyvium tests: known-answer vectors (clear), FHE vs clear,
transciphering round trip.

(ref: apps/trivium/src/{trivium,kreyvium}/test.rs — vectors from
avr-crypto-lib testvectors/trivium-80.80.test-vectors.)
"""

import numpy as np
import pytest

from tfhe_tpu import boolean
from tfhe_tpu.apps import trivium as tv
from tfhe_tpu.params import BOOLEAN_SHA_TEST_PARAMETERS


pytestmark = pytest.mark.slow  # ~2.5 min of KATs: run via `pytest -m slow`

def to_hex(bits):
    bits = [int(b) for b in bits]
    return "".join(
        f"{sum(b << j for j, b in enumerate(bits[i:i + 8])):02X}"
        for i in range(0, len(bits), 8))


def test_trivium_known_answers():
    s = tv.trivium_clear([0] * 80, [0] * 80)
    bits = np.concatenate([s.next_64() for _ in range(8)])
    assert to_hex(bits) == (
        "FBE0BF265859051B517A2E4E239FC97F563203161907CF2DE7A8790FA1B2E9CD"
        "F75292030268B7382B4C1A759AA2599A285549986E74805903801A4CB5A5D4F2")
    key = [0] * 80
    key[7] = 1
    s = tv.trivium_clear(key, [0] * 80)
    assert to_hex(s.next_64()).startswith("38EB86FF730D7A9C")
    iv = [0] * 80
    iv[7] = 1
    s = tv.trivium_clear([0] * 80, iv)
    assert to_hex(s.next_64()).startswith("F8901736640549E3")


def test_kreyvium_known_answers():
    k = tv.kreyvium_clear([0] * 128, [0] * 128)
    assert to_hex(k.next_64()) == "26DCF1F4BC0F1922"
    key = [0] * 128
    key[0] = 1
    k = tv.kreyvium_clear(key, [0] * 128)
    assert to_hex(k.next_64()) == "4FD421D4DA3D2C8A"


@pytest.fixture(scope="module")
def bool_keys():
    return boolean.gen_keys(BOOLEAN_SHA_TEST_PARAMETERS, seed=606)


def test_trivium_fhe_matches_clear(bool_keys):
    cks, sks = bool_keys
    rng = np.random.default_rng(5)
    key = rng.integers(0, 2, 80).tolist()
    iv = rng.integers(0, 2, 80).tolist()
    clear = tv.trivium_clear(key, iv)
    fhe = tv.trivium_fhe(cks, sks, key, iv)
    for _ in range(2):
        want = clear.next_64()
        got = cks.decrypt_batch(fhe.next_64())
        np.testing.assert_array_equal(got, want)


def test_kreyvium_fhe_matches_clear(bool_keys):
    cks, sks = bool_keys
    rng = np.random.default_rng(6)
    key = rng.integers(0, 2, 128).tolist()
    iv = rng.integers(0, 2, 128).tolist()
    clear = tv.kreyvium_clear(key, iv)
    fhe = tv.kreyvium_fhe(cks, sks, key, iv)
    want = clear.next_64()
    got = cks.decrypt_batch(fhe.next_64())
    np.testing.assert_array_equal(got, want)


def test_transciphering(bool_keys):
    """Client masks data with the clear keystream; server recovers
    encrypted plaintext bits by XORing the FHE keystream."""
    cks, sks = bool_keys
    rng = np.random.default_rng(7)
    key = rng.integers(0, 2, 80).tolist()
    iv = rng.integers(0, 2, 80).tolist()

    data = int(rng.integers(0, 1 << 63))
    data_bits = [(data >> i) & 1 for i in range(64)]

    client_stream = tv.trivium_clear(key, iv)
    ks = client_stream.next_64()
    masked = [int(b) ^ int(k) for b, k in zip(data_bits, ks)]

    server_stream = tv.trivium_fhe(cks, sks, key, iv)
    enc_plain = tv.trans_decrypt_64(sks, server_stream, masked)
    got_bits = cks.decrypt_batch(enc_plain)
    got = sum(int(b) << i for i, b in enumerate(got_bits))
    assert got == data

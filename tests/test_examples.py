"""Example application tests (ref: tfhe/examples/ test strategy — FHE
result vs the clear computation)."""

import hashlib
import os

import numpy as np
import pytest

from tfhe_tpu import boolean
from tfhe_tpu.examples import sha256_bool as sb
from tfhe_tpu.params import BOOLEAN_SHA_TEST_PARAMETERS


pytestmark = pytest.mark.slow  # matrix suite: run via `pytest -m slow`

@pytest.fixture(scope="module")
def bool_keys():
    return boolean.gen_keys(BOOLEAN_SHA_TEST_PARAMETERS, seed=808)


def _clear_compress(state, words, rounds):
    """Clear reduced-round SHA-256 compression for circuit validation."""
    mask = 0xFFFFFFFF

    def rotr(x, n):
        return ((x >> n) | (x << (32 - n))) & mask

    w = list(words)
    for t in range(16, rounds):
        s0 = rotr(w[t - 15], 7) ^ rotr(w[t - 15], 18) ^ (w[t - 15] >> 3)
        s1 = rotr(w[t - 2], 17) ^ rotr(w[t - 2], 19) ^ (w[t - 2] >> 10)
        w.append((w[t - 16] + s0 + w[t - 7] + s1) & mask)
    a, b, c, d, e, f, g, h = state
    for t in range(rounds):
        S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = (h + S1 + ch + sb.K[t] + w[t]) & mask
        S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (S0 + maj) & mask
        h, g, f = g, f, e
        e = (d + t1) & mask
        d, c, b = c, b, a
        a = (t1 + t2) & mask
    return [(x + y) & mask for x, y in zip(state, [a, b, c, d, e, f, g, h])]


def test_adders(bool_keys):
    cks, sks = bool_keys
    eng = sb.Sha256Fhe(sks)
    a = cks.encrypt_batch(sb._word_bits_lsb(0xDEADBEEF))
    b = cks.encrypt_batch(sb._word_bits_lsb(0xFFFFFFFF))
    assert sb.decrypt_word(cks, eng.add(a, b)) == \
        (0xDEADBEEF + 0xFFFFFFFF) % 2 ** 32
    m = eng.add_many([a, b, eng.trivial_word(0x42), a])
    assert sb.decrypt_word(cks, m) == \
        (2 * 0xDEADBEEF + 0xFFFFFFFF + 0x42) % 2 ** 32


def test_rot_shift_free_ops(bool_keys):
    cks, sks = bool_keys
    eng = sb.Sha256Fhe(sks)
    x = 0x9ABCDEF0
    cx = cks.encrypt_batch(sb._word_bits_lsb(x))
    assert sb.decrypt_word(cks, eng.rotr(cx, 7)) == \
        ((x >> 7) | (x << 25)) & 0xFFFFFFFF
    assert sb.decrypt_word(cks, eng.shr(cx, 3)) == x >> 3


def test_sha256_reduced_rounds(bool_keys):
    """8-round compression over encrypted words vs the clear circuit —
    exercises sigma/ch/maj/carry-save/Kogge-Stone end to end."""
    cks, sks = bool_keys
    eng = sb.Sha256Fhe(sks)
    rounds = 4
    words = [((0x01234567 * (i + 1)) ^ 0x89ABCDEF) & 0xFFFFFFFF
             for i in range(16)]
    enc = sb.encrypt_words(cks, words)
    state = [eng.trivial_word(h) for h in sb.H_INIT]
    out = eng.compress(state, enc, rounds=rounds)
    got = [sb.decrypt_word(cks, wd) for wd in out]
    want = _clear_compress(sb.H_INIT, words, rounds)
    assert got == want


def test_schedule_expansion(bool_keys):
    """The sigma message-schedule extension w[16] = sigma1(w[14]) + w[9] +
    sigma0(w[1]) + w[0] over encrypted words."""
    cks, sks = bool_keys
    eng = sb.Sha256Fhe(sks)
    words = [((0xDEAD0000 + 37 * i) ^ (i << 13)) & 0xFFFFFFFF
             for i in range(16)]
    enc = sb.encrypt_words(cks, words)
    w16 = eng.add_many([
        eng._small_sigma1(enc[14]), enc[9],
        eng._small_sigma0(enc[1]), enc[0],
    ])
    mask = 0xFFFFFFFF

    def rotr(x, n):
        return ((x >> n) | (x << (32 - n))) & mask

    s0 = rotr(words[1], 7) ^ rotr(words[1], 18) ^ (words[1] >> 3)
    s1 = rotr(words[14], 17) ^ rotr(words[14], 19) ^ (words[14] >> 10)
    assert sb.decrypt_word(cks, w16) == (words[0] + s0 + words[9] + s1) & mask


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="full 64-round digest takes minutes; set RUN_SLOW=1")
def test_sha256_full_digest(bool_keys):
    cks, sks = bool_keys
    digest = sb.sha256_fhe(cks, sks, b"abc")
    assert digest == hashlib.sha256(b"abc").digest()


def test_pad_message():
    words = sb.pad_message(b"abc")
    assert len(words) == 16
    assert words[0] == 0x61626380
    assert words[15] == 24


# -- dark market (ref: tfhe/examples/dark_market/) --------------------------


def test_dark_market_plain():
    from tfhe_tpu.examples import dark_market as dm

    fs, fb = dm.volume_match_plain([5, 3, 2], [4, 4])
    assert fs == [5, 3, 0] and fb == [4, 4]
    fs, fb = dm.volume_match_plain([1, 1], [10])
    assert fs == [1, 1] and fb == [2]


def test_dark_market_fhe():
    from tfhe_tpu.examples import dark_market as dm
    from tfhe_tpu.integer import gen_keys_radix
    from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST

    cks, sks = gen_keys_radix(PARAM_MESSAGE_2_CARRY_2_TEST, num_blocks=4,
                              seed=303)
    for sells, buys in [([5, 3, 2], [4, 4]), ([1, 1], [10]), ([0, 7], [3, 0])]:
        got = dm.run_example(cks, sks, sells, buys)
        want = dm.volume_match_plain(sells, buys)
        assert got == want, (sells, buys, got, want)


# -- regex engine (ref: tfhe/examples/regex_engine/) ------------------------


@pytest.fixture(scope="module")
def string_keys():
    from tfhe_tpu import strings

    return strings.gen_keys_test(seed=404)


@pytest.mark.parametrize("text,pattern,want", [
    ("hello", "/ell/", True),
    ("hello", "/^ell/", False),
    ("hello", "/lo$/", True),
    ("hello", "/^h[a-e]llo$/", True),
    ("hello", "/^h[^a-e]llo$/", False),
    ("heo", "/hel*o/", True),
    ("heo", "/hel+o/", False),
    ("hello", "/(cat|hel)lo/", True),
    ("HELLO", "/hello/i", True),
    ("aab", "/^a{1,2}b$/", True),
])
def test_regex(string_keys, text, pattern, want):
    from tfhe_tpu.examples import regex_engine as re_fhe

    cks, sks = string_keys
    s = cks.encrypt_str(text)
    got = cks.integer_key.decrypt_bool(re_fhe.has_match(sks, s, pattern))
    assert got is want


def test_regex_rejects_padded(string_keys):
    from tfhe_tpu.examples import regex_engine as re_fhe

    cks, sks = string_keys
    s = cks.encrypt_str_padding("hi", 2)
    with pytest.raises(ValueError):
        re_fhe.has_match(sks, s, "/hi/")

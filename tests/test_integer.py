"""Radix integer ops vs clear arithmetic (ref strategy: SURVEY.md §4.5 —
shared test-case templates with random inputs compared to clear u64 math)."""

import numpy as np
import pytest

from tfhe_tpu import integer
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_COMPACT_TEST as P

NB = 4  # 8-bit integers
MOD = 4 ** NB


@pytest.fixture(scope="module")
def keys():
    return integer.gen_keys_radix(P, NB, seed=11)


CASES = [(0, 0), (1, 1), (255, 255), (200, 100), (37, 219), (128, 128), (3, 250)]


@pytest.mark.parametrize("a,b", CASES)
def test_add_sub(keys, a, b):
    cks, sks = keys
    ca, cb = cks.encrypt(a), cks.encrypt(b)
    assert cks.decrypt(sks.add_parallelized(ca, cb)) == (a + b) % MOD
    assert cks.decrypt(sks.sub_parallelized(ca, cb)) == (a - b) % MOD


@pytest.mark.parametrize("a,b", [(0, 0), (255, 255), (37, 219), (13, 17)])
def test_mul(keys, a, b):
    cks, sks = keys
    assert cks.decrypt(
        sks.mul_parallelized(cks.encrypt(a), cks.encrypt(b))
    ) == (a * b) % MOD


def test_neg_and_scalar_ops(keys):
    cks, sks = keys
    a = 37
    ca = cks.encrypt(a)
    assert cks.decrypt(sks.neg_parallelized(ca)) == (-a) % MOD
    assert cks.decrypt(sks.scalar_add_parallelized(ca, 100)) == (a + 100) % MOD
    assert cks.decrypt(sks.scalar_sub_parallelized(ca, 50)) == (a - 50) % MOD
    for s in (0, 1, 7, 255):
        assert cks.decrypt(sks.scalar_mul_parallelized(ca, s)) == (a * s) % MOD


def test_comparisons(keys):
    cks, sks = keys
    a, b = 37, 219
    ca, cb = cks.encrypt(a), cks.encrypt(b)
    assert cks.decrypt_bool(sks.eq_parallelized(ca, cb)) is False
    assert cks.decrypt_bool(sks.eq_parallelized(ca, cks.encrypt(a))) is True
    assert cks.decrypt_bool(sks.ne_parallelized(ca, cb)) is True
    assert cks.decrypt_bool(sks.lt_parallelized(ca, cb)) is True
    assert cks.decrypt_bool(sks.le_parallelized(ca, ca)) is True
    assert cks.decrypt_bool(sks.gt_parallelized(cb, ca)) is True
    assert cks.decrypt_bool(sks.ge_parallelized(ca, cb)) is False
    assert cks.decrypt_bool(sks.scalar_eq_parallelized(ca, a)) is True
    assert cks.decrypt_bool(sks.scalar_cmp_parallelized(ca, 100, "lt")) is True


def test_bitwise(keys):
    cks, sks = keys
    a, b = 0b10110101, 0b11001010
    ca, cb = cks.encrypt(a), cks.encrypt(b)
    assert cks.decrypt(sks.bitand_parallelized(ca, cb)) == a & b
    assert cks.decrypt(sks.bitor_parallelized(ca, cb)) == a | b
    assert cks.decrypt(sks.bitxor_parallelized(ca, cb)) == a ^ b
    assert cks.decrypt(sks.bitnot(ca)) == (~a) % MOD


def test_cmux_max_min(keys):
    cks, sks = keys
    a, b = 37, 219
    ca, cb = cks.encrypt(a), cks.encrypt(b)
    assert cks.decrypt(
        sks.if_then_else_parallelized(cks.encrypt_bool(True), ca, cb)) == a
    assert cks.decrypt(
        sks.if_then_else_parallelized(cks.encrypt_bool(False), ca, cb)) == b
    assert cks.decrypt(sks.max_parallelized(ca, cb)) == max(a, b)
    assert cks.decrypt(sks.min_parallelized(ca, cb)) == min(a, b)


def test_shifts_rotates(keys):
    """Wrapping shift semantics: shift amount taken mod bit width (matches the
    encrypted-shift bit extraction in the reference barrel shifter)."""
    cks, sks = keys
    a = 0b10110101
    ca = cks.encrypt(a)
    for sh in (0, 1, 3, 7):
        assert cks.decrypt(
            sks.scalar_left_shift_parallelized(ca, sh)) == (a << sh) % MOD
        assert cks.decrypt(
            sks.scalar_right_shift_parallelized(ca, sh)) == a >> sh
    for rot in (0, 1, 5):
        exp = ((a << rot) | (a >> (8 - rot))) % MOD if rot else a
        assert cks.decrypt(sks.scalar_rotate_left_parallelized(ca, rot)) == exp
        exp_r = ((a >> rot) | (a << (8 - rot))) % MOD if rot else a
        assert cks.decrypt(sks.scalar_rotate_right_parallelized(ca, rot)) == exp_r


def test_trivial_radix(keys):
    cks, sks = keys
    t = sks.create_trivial_radix(123, NB)
    assert cks.decrypt(t) == 123
    assert cks.decrypt(sks.add_parallelized(t, cks.encrypt(10))) == 133


@pytest.mark.slow
def test_div_rem(keys):
    """Shift-subtract division incl. the reference's div-by-zero convention
    (ref: radix_parallel/div_mod.rs)."""
    cks, sks = keys
    for x, y in ((200, 7), (45, 45), (3, 200)):
        q, r = sks.div_rem_parallelized(cks.encrypt(x), cks.encrypt(y))
        assert cks.decrypt(q) == x // y
        assert cks.decrypt(r) == x % y
    q, r = sks.div_rem_parallelized(cks.encrypt(77), cks.encrypt(0))
    assert cks.decrypt(q) == MOD - 1
    assert cks.decrypt(r) == 77


def test_encrypted_amount_shifts(keys):
    cks, sks = keys
    a = 0b10110101
    ca = cks.encrypt(a)
    for s in (0, 2, 5):
        amt = cks.encrypt(s)
        assert cks.decrypt(sks.left_shift_parallelized(ca, amt)) == (a << s) % MOD
        assert cks.decrypt(sks.right_shift_parallelized(ca, amt)) == a >> s
        exp = ((a << s) | (a >> (8 - s))) % MOD if s else a
        assert cks.decrypt(sks.rotate_left_parallelized(ca, amt)) == exp


@pytest.mark.slow
def test_scalar_div_rem(keys):
    cks, sks = keys
    for d in (3, 7, 12, 255):
        assert cks.decrypt(sks.scalar_div_parallelized(cks.encrypt(201), d)) == 201 // d
        assert cks.decrypt(sks.scalar_rem_parallelized(cks.encrypt(201), d)) == 201 % d


def test_overflowing_ops(keys):
    cks, sks = keys
    s, o = sks.overflowing_add_parallelized(cks.encrypt(200), cks.encrypt(100))
    assert cks.decrypt(s) == 300 % MOD and cks.decrypt_bool(o) is True
    s, o = sks.overflowing_add_parallelized(cks.encrypt(2), cks.encrypt(3))
    assert cks.decrypt(s) == 5 and cks.decrypt_bool(o) is False
    s, o = sks.overflowing_sub_parallelized(cks.encrypt(5), cks.encrypt(9))
    assert cks.decrypt(s) == (5 - 9) % MOD and cks.decrypt_bool(o) is True


def test_sum_ciphertexts(keys):
    cks, sks = keys
    vals = [10, 20, 30, 40, 55, 17, 3]
    tot = sks.sum_ciphertexts_parallelized([cks.encrypt(v) for v in vals])
    assert cks.decrypt(tot) == sum(vals) % MOD

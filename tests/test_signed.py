"""Signed radix ops vs clear two's-complement arithmetic
(ref strategy: radix_parallel/tests_signed.rs — random inputs vs i64 math)."""

import pytest

from tfhe_tpu import integer
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_COMPACT_TEST as P

NB = 4  # 8-bit signed integers
BITS = 8
MOD = 1 << BITS


pytestmark = pytest.mark.slow  # matrix suite: run via `pytest -m slow`

def wrap(v):
    v %= MOD
    return v - MOD if v >= MOD // 2 else v


@pytest.fixture(scope="module")
def keys():
    return integer.gen_keys_radix(P, NB, seed=13)


CASES = [(0, 0), (-1, 1), (-128, 127), (57, -33), (-100, -28), (127, 127)]


@pytest.mark.parametrize("a,b", CASES)
def test_signed_add_sub_mul(keys, a, b):
    cks, sks = keys
    ca, cb = cks.encrypt_signed(a), cks.encrypt_signed(b)
    assert cks.decrypt_signed(sks.add_parallelized(ca, cb)) == wrap(a + b)
    assert cks.decrypt_signed(sks.sub_parallelized(ca, cb)) == wrap(a - b)
    assert cks.decrypt_signed(sks.mul_parallelized(ca, cb)) == wrap(a * b)


@pytest.mark.parametrize("a,b", CASES)
def test_signed_comparisons(keys, a, b):
    cks, sks = keys
    ca, cb = cks.encrypt_signed(a), cks.encrypt_signed(b)
    for op, f in [("lt", a < b), ("le", a <= b), ("gt", a > b),
                  ("ge", a >= b), ("eq", a == b), ("ne", a != b)]:
        assert cks.decrypt_bool(
            sks.signed_cmp_parallelized(ca, cb, op)) is f, op
    assert cks.decrypt_bool(
        sks.signed_scalar_cmp_parallelized(ca, b, "lt")) is (a < b)


@pytest.mark.parametrize("a", [-128, -37, -1, 0, 1, 90, 127])
def test_abs_and_sign(keys, a):
    cks, sks = keys
    ca = cks.encrypt_signed(a)
    assert cks.decrypt_signed(sks.abs_parallelized(ca)) == wrap(abs(a))
    assert cks.decrypt_bool(sks.sign_bit_parallelized(ca)) is (a < 0)


@pytest.mark.parametrize("a,shift", [(-100, 2), (-1, 5), (57, 3), (-128, 7)])
def test_arithmetic_right_shift(keys, a, shift):
    cks, sks = keys
    ca = cks.encrypt_signed(a)
    assert cks.decrypt_signed(
        sks.signed_scalar_right_shift_parallelized(ca, shift)) == (a >> shift)
    cs = cks.encrypt(shift)
    assert cks.decrypt_signed(
        sks.signed_right_shift_parallelized(ca, cs)) == (a >> shift)


@pytest.mark.parametrize("a,b", [(7, 3), (-7, 3), (7, -3), (-7, -3),
                                 (-128, 3), (100, -7)])
def test_signed_div_rem(keys, a, b):
    cks, sks = keys
    ca, cb = cks.encrypt_signed(a), cks.encrypt_signed(b)
    q, r = sks.signed_div_rem_parallelized(ca, cb)
    # Rust signed division truncates toward zero
    want_q = int(a / b) if b else None
    want_r = a - want_q * b
    assert cks.decrypt_signed(q) == want_q
    assert cks.decrypt_signed(r) == want_r
    q2, r2 = sks.signed_scalar_div_rem_parallelized(ca, b)
    assert cks.decrypt_signed(q2) == want_q
    assert cks.decrypt_signed(r2) == want_r


@pytest.mark.parametrize("a,b,ovf_add,ovf_sub", [
    (100, 100, True, False),
    (-100, -100, True, False),
    (-100, 100, False, True),
    (100, -28, False, True),  # 100 - (-28) = 128 overflows i8
    (-128, -1, True, False),
])
def test_signed_overflowing(keys, a, b, ovf_add, ovf_sub):
    cks, sks = keys
    ca, cb = cks.encrypt_signed(a), cks.encrypt_signed(b)
    s, ov = sks.signed_overflowing_add_parallelized(ca, cb)
    assert cks.decrypt_signed(s) == wrap(a + b)
    assert cks.decrypt_bool(ov) is ovf_add
    d, ov2 = sks.signed_overflowing_sub_parallelized(ca, cb)
    assert cks.decrypt_signed(d) == wrap(a - b)
    assert cks.decrypt_bool(ov2) is ovf_sub


def test_signed_min_max(keys):
    cks, sks = keys
    ca, cb = cks.encrypt_signed(-5), cks.encrypt_signed(3)
    assert cks.decrypt_signed(sks.signed_max_parallelized(ca, cb)) == 3
    assert cks.decrypt_signed(sks.signed_min_parallelized(ca, cb)) == -5

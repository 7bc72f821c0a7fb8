"""Randomized integer op sweep vs clear arithmetic.

Mirrors the reference's shared test-case templates
(ref: tfhe/src/integer/server_key/radix_parallel/tests_cases_unsigned.rs
and tests_signed.rs — random inputs, results compared against u64 clear
arithmetic), instantiated here over the toy parameter fixture.
"""

import random

import pytest

from tfhe_tpu.integer import gen_keys_radix
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST as P

NB = 4  # 8-bit integers
MOD = 1 << 8


pytestmark = pytest.mark.slow  # matrix suite: run via `pytest -m slow`

@pytest.fixture(scope="module")
def keys():
    return gen_keys_radix(P, num_blocks=NB, seed=7777)


def _rand_pairs(n, seed):
    rng = random.Random(seed)
    return [(rng.randrange(MOD), rng.randrange(MOD)) for _ in range(n)]


UNSIGNED_CASES = [
    ("add", lambda s, a, b: s.add_parallelized(a, b),
     lambda x, y: (x + y) % MOD),
    ("sub", lambda s, a, b: s.sub_parallelized(a, b),
     lambda x, y: (x - y) % MOD),
    ("mul", lambda s, a, b: s.mul_parallelized(a, b),
     lambda x, y: (x * y) % MOD),
    ("bitand", lambda s, a, b: s.bitand_parallelized(a, b),
     lambda x, y: x & y),
    ("bitor", lambda s, a, b: s.bitor_parallelized(a, b),
     lambda x, y: x | y),
    ("bitxor", lambda s, a, b: s.bitxor_parallelized(a, b),
     lambda x, y: x ^ y),
    ("max", lambda s, a, b: s.max_parallelized(a, b), max),
    ("min", lambda s, a, b: s.min_parallelized(a, b), min),
]


@pytest.mark.parametrize("name,fhe_op,clear_op", UNSIGNED_CASES,
                         ids=[c[0] for c in UNSIGNED_CASES])
def test_unsigned_sweep(keys, name, fhe_op, clear_op):
    rck, sks = keys
    for x, y in _rand_pairs(3, seed=hash(name) & 0xFFFF):
        got = rck.decrypt(fhe_op(sks, rck.encrypt(x), rck.encrypt(y)))
        assert got == clear_op(x, y), (name, x, y, got)


def test_aliasing_same_operand(keys):
    """x op x must work on the same ciphertext object
    (a classic failure mode the reference's templates also probe)."""
    rck, sks = keys
    a = rck.encrypt(173)
    assert rck.decrypt(sks.add_parallelized(a, a)) == (2 * 173) % MOD
    assert rck.decrypt(sks.mul_parallelized(a, a)) == (173 * 173) % MOD
    assert rck.decrypt(sks.sub_parallelized(a, a)) == 0
    assert rck.decrypt(sks.bitxor_parallelized(a, a)) == 0


def test_scalar_vs_encrypted_agree(keys):
    rck, sks = keys
    for x, y in _rand_pairs(3, seed=99):
        enc = rck.decrypt(sks.add_parallelized(rck.encrypt(x),
                                               rck.encrypt(y)))
        scal = rck.decrypt(sks.scalar_add_parallelized(rck.encrypt(x), y))
        assert enc == scal == (x + y) % MOD
        enc = rck.decrypt(sks.mul_parallelized(rck.encrypt(x),
                                               rck.encrypt(y)))
        scal = rck.decrypt(sks.scalar_mul_parallelized(rck.encrypt(x), y))
        assert enc == scal == (x * y) % MOD


def test_div_rem_sweep(keys):
    rck, sks = keys
    rng = random.Random(31)
    for _ in range(2):
        x = rng.randrange(MOD)
        y = rng.randrange(1, MOD)
        q, r = sks.div_rem_parallelized(rck.encrypt(x), rck.encrypt(y))
        assert rck.decrypt(q) == x // y
        assert rck.decrypt(r) == x % y


def test_comparison_sweep(keys):
    rck, sks = keys
    rb = rck.decrypt_bool
    for x, y in _rand_pairs(3, seed=55) + [(7, 7)]:
        a, b = rck.encrypt(x), rck.encrypt(y)
        assert rb(sks.lt_parallelized(a, b)) == (x < y)
        assert rb(sks.ge_parallelized(a, b)) == (x >= y)
        assert rb(sks.eq_parallelized(a, b)) == (x == y)


def test_signed_sweep(keys):
    rck, sks = keys
    rng = random.Random(77)
    half = MOD // 2
    for _ in range(3):
        x = rng.randrange(-half, half)
        y = rng.randrange(-half, half)
        sa, sb = rck.encrypt_signed(x), rck.encrypt_signed(y)
        got = rck.decrypt_signed(sks.add_parallelized(sa, sb))
        want = ((x + y + half) % MOD) - half
        assert got == want, ("sadd", x, y, got)
        got = rck.decrypt_signed(sks.abs_parallelized(sa))
        want = ((abs(x) + half) % MOD) - half
        assert got == want, ("abs", x, got)

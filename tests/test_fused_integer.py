"""Fused (single-program) radix ops vs the host-driven path.

TFHE_TPU_FUSED_INTEGER=1 forces the compiled formulations from
parallel/fused.py through IntegerServerKey._fused even on CPU; every op
must decrypt to the same clear result as the host path (the ciphertexts
may differ bit-wise — e.g. the fused neg uses the static worst-case
correction terms — but the decoded values must agree; ref:
integer/server_key/radix_parallel/*)."""

import os

import numpy as np
import pytest

from tfhe_tpu import integer
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST as P

NB = 4
MOD = 4 ** NB


@pytest.fixture(scope="module")
def keys():
    return integer.gen_keys_radix(P, NB, seed=11)


@pytest.fixture(autouse=True)
def force_fused(monkeypatch):
    monkeypatch.setenv("TFHE_TPU_FUSED_INTEGER", "1")


def test_fused_add_sub_neg_mul(keys):
    cks, sks = keys
    rng = np.random.default_rng(0)
    for _ in range(3):
        x, y = int(rng.integers(0, MOD)), int(rng.integers(0, MOD))
        a, b = cks.encrypt(x), cks.encrypt(y)
        assert cks.decrypt(sks.add_parallelized(a, b)) == (x + y) % MOD
        assert cks.decrypt(sks.sub_parallelized(a, b)) == (x - y) % MOD
        assert cks.decrypt(sks.neg_parallelized(a)) == (-x) % MOD
        assert cks.decrypt(sks.mul_parallelized(a, b)) == (x * y) % MOD


def test_fused_cmp_bitwise_select(keys):
    cks, sks = keys
    rng = np.random.default_rng(1)
    for _ in range(2):
        x, y = int(rng.integers(0, MOD)), int(rng.integers(0, MOD))
        a, b = cks.encrypt(x), cks.encrypt(y)
        assert cks.decrypt_bool(sks.eq_parallelized(a, b)) == (x == y)
        assert cks.decrypt_bool(sks.ne_parallelized(a, b)) == (x != y)
        assert cks.decrypt_bool(sks.lt_parallelized(a, b)) == (x < y)
        assert cks.decrypt_bool(sks.le_parallelized(a, b)) == (x <= y)
        assert cks.decrypt_bool(sks.gt_parallelized(a, b)) == (x > y)
        assert cks.decrypt_bool(sks.ge_parallelized(a, b)) == (x >= y)
        assert cks.decrypt(sks.bitand_parallelized(a, b)) == (x & y)
        assert cks.decrypt(sks.bitor_parallelized(a, b)) == (x | y)
        assert cks.decrypt(sks.bitxor_parallelized(a, b)) == (x ^ y)
        assert cks.decrypt(sks.bitnot(a)) == (MOD - 1) ^ x
        assert cks.decrypt(sks.max_parallelized(a, b)) == max(x, y)
        assert cks.decrypt(sks.min_parallelized(a, b)) == min(x, y)
        cond = cks.encrypt_bool(x % 2 == 0)
        got = cks.decrypt(sks.if_then_else_parallelized(cond, a, b))
        assert got == (x if x % 2 == 0 else y)


def test_fused_same_value_aliasing(keys):
    cks, sks = keys
    a = cks.encrypt(7)
    assert cks.decrypt(sks.add_parallelized(a, a)) == 14 % MOD
    assert cks.decrypt(sks.sub_parallelized(a, a)) == 0
    assert cks.decrypt_bool(sks.eq_parallelized(a, a)) is True


def test_fused_dirty_inputs_fall_back(keys):
    """Non-clean blocks must take the host path and still be correct."""
    cks, sks = keys
    a, b = cks.encrypt(5), cks.encrypt(9)
    s = sks.key.unchecked_add_batch(a.blocks, b.blocks)  # dirty degrees
    from tfhe_tpu.integer.ciphertext import RadixCiphertext

    dirty = RadixCiphertext(s)
    clean = RadixCiphertext(sks.full_propagate(dirty.blocks))
    assert cks.decrypt(sks.add_parallelized(clean, cks.encrypt(1))) == 15

"""BatchedStringOps (wave path) vs clear string semantics."""

import numpy as np
import pytest

from tfhe_tpu import strings
from tfhe_tpu.strings.batched import BatchedStringOps, encrypt_batch_strings

TEXTS = ["abcab", "xxabz", "zzzzz", "ab"]
MAXLEN = 6


@pytest.fixture(scope="module")
def env():
    scks, ssks = strings.gen_keys_test(seed=11)
    ops = BatchedStringOps(ssks.sks)
    blocks = encrypt_batch_strings(scks, TEXTS, MAXLEN)
    return scks, ops, blocks


def test_batched_contains(env):
    scks, ops, blocks = env
    out = ops.contains(blocks, "ab")
    got = scks.integer_key.key.decrypt_batch(out).tolist()
    assert got == [int("ab" in t) for t in TEXTS]


def test_batched_find(env):
    scks, ops, blocks = env
    found, firsts = ops.find(blocks, "ab")
    dec = scks.integer_key.key.decrypt_batch
    assert dec(found).tolist() == [int("ab" in t) for t in TEXTS]
    B, n_off, sz = firsts.shape
    bits = dec(firsts.reshape(-1, sz)).reshape(B, n_off)
    for t, row in zip(TEXTS, bits):
        pos = t.find("ab")
        want = np.zeros(n_off, dtype=np.uint64)
        if pos >= 0:
            want[pos] = 1
        assert np.array_equal(row, want), (t, row)

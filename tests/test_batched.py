"""BatchedRadixOps (host-scheduled wave path) vs clear semantics."""

import numpy as np
import pytest

from tfhe_tpu import integer
from tfhe_tpu.integer.batched import (BatchedRadixOps, decrypt_batch_radix,
                                      encrypt_batch_radix)
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST

NB = 4  # FheUint8 at 2_2 — small enough for the CPU interpret kernels


@pytest.fixture(scope="module")
def keys():
    icks, isks = integer.gen_keys_radix(PARAM_MESSAGE_2_CARRY_2_TEST, NB,
                                        seed=7)
    return icks, BatchedRadixOps(isks.key)


def _enc(icks, vals):
    return encrypt_batch_radix(icks, vals, NB)


def test_batched_add_sub_neg(keys):
    icks, ops = keys
    mod = 4 ** NB
    rng = np.random.default_rng(0)
    av = rng.integers(0, mod, 5).tolist()
    bv = rng.integers(0, mod, 5).tolist()
    a, b = _enc(icks, av), _enc(icks, bv)
    assert decrypt_batch_radix(icks, ops.add(a, b)) == [
        (x + y) % mod for x, y in zip(av, bv)]
    assert decrypt_batch_radix(icks, ops.sub(a, b)) == [
        (x - y) % mod for x, y in zip(av, bv)]
    assert decrypt_batch_radix(icks, ops.neg(a)) == [(-x) % mod for x in av]


def test_batched_add_ripple(keys):
    icks, ops = keys
    mod = 4 ** NB
    rng = np.random.default_rng(3)
    av = rng.integers(0, mod, 5).tolist()
    bv = rng.integers(0, mod, 5).tolist()
    # include max-carry chains (all-blocks-propagate) explicitly
    av += [mod - 1, mod - 1]
    bv += [1, mod - 1]
    a, b = _enc(icks, av), _enc(icks, bv)
    import jax.numpy as jnp

    out = ops._propagate_ripple(jnp.asarray(a) + jnp.asarray(b))
    assert decrypt_batch_radix(icks, out) == [
        (x + y) % mod for x, y in zip(av, bv)]


def test_batched_mul(keys):
    icks, ops = keys
    mod = 4 ** NB
    av, bv = [7, 250, 13, 0], [31, 9, 255, 77]
    out = ops.mul(_enc(icks, av), _enc(icks, bv))
    assert decrypt_batch_radix(icks, out) == [
        (x * y) % mod for x, y in zip(av, bv)]


def test_batched_cmp(keys):
    icks, ops = keys
    av, bv = [5, 200, 77, 77], [5, 100, 200, 77]
    a, b = _enc(icks, av), _enc(icks, bv)
    dec = icks.key.decrypt_batch
    for name, f in [("eq", lambda x, y: x == y), ("ne", lambda x, y: x != y),
                    ("lt", lambda x, y: x < y), ("le", lambda x, y: x <= y),
                    ("gt", lambda x, y: x > y), ("ge", lambda x, y: x >= y)]:
        got = dec(getattr(ops, name)(a, b)).tolist()
        assert got == [int(f(x, y)) for x, y in zip(av, bv)], name

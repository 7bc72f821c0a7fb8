"""Shortint exhaustive full-domain matrices (ref strategy:
tfhe/src/shortint/server_key/tests/shortint.rs — per-parameter exhaustive
sweeps over the complete message x carry domain, not just clean inputs).

The fast tier (test_shortint.py) checks ops on clean 4x4 inputs; this
matrix drives LUT evaluation, extracts, and the smart/checked paths over
every ciphertext state in [0, total_modulus) and over multiple parameter
sets, via batched waves so the whole domain is a few device calls.
"""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.params import (
    PARAM_MESSAGE_1_CARRY_1_TEST,
    PARAM_MESSAGE_2_CARRY_2_COMPACT_TEST,
    PARAM_MESSAGE_2_CARRY_2_TEST,
)

pytestmark = pytest.mark.slow  # matrix suite: run via `pytest -m slow`

PARAMS = [
    PARAM_MESSAGE_1_CARRY_1_TEST,
    PARAM_MESSAGE_2_CARRY_2_TEST,
    PARAM_MESSAGE_2_CARRY_2_COMPACT_TEST,
]


@pytest.fixture(scope="module", params=[p.name for p in PARAMS])
def keys(request):
    p = next(p for p in PARAMS if p.name == request.param)
    return shortint.gen_keys(p, seed=23)


def _total(sks):
    return sks.message_modulus * sks.carry_modulus


def test_lut_full_domain(keys):
    """Univariate LUT over EVERY ciphertext state (message + carry)."""
    cks, sks = keys
    tot = _total(sks)
    msg = sks.message_modulus
    vals = np.arange(tot, dtype=np.uint64)
    batch = cks.encrypt_batch(vals)  # encrypt full message+carry states
    for name, f in [("x3p1", lambda x: (3 * x + 1) % msg),
                    ("sq", lambda x: (x * x) % msg),
                    ("gt1", lambda x: int(x > 1))]:
        lut = sks.generate_lookup_table(f)
        got = cks.decrypt_batch(sks.apply_lookup_table_batch(batch, lut))
        want = np.array([f(int(v)) % msg for v in vals], dtype=np.uint64)
        assert np.array_equal(got, want), name


def test_extracts_full_domain(keys):
    cks, sks = keys
    tot = _total(sks)
    msg = sks.message_modulus
    vals = np.arange(tot, dtype=np.uint64)
    batch = cks.encrypt_batch(vals)
    assert np.array_equal(
        cks.decrypt_batch(sks.message_extract_batch(batch)), vals % msg)
    assert np.array_equal(
        cks.decrypt_batch(sks.carry_extract_batch(batch)), vals // msg)


def test_bivariate_full_clean_domain(keys):
    """Bivariate LUT over every CLEAN pair — all msg^2 packings at once."""
    cks, sks = keys
    msg = sks.message_modulus
    xs, ys = np.meshgrid(np.arange(msg), np.arange(msg))
    xs, ys = xs.ravel().astype(np.uint64), ys.ravel().astype(np.uint64)
    a, b = cks.encrypt_batch(xs), cks.encrypt_batch(ys)
    for name, f in [("mul", lambda x, y: (x * y) % msg),
                    ("cmp3", lambda x, y: 0 if x == y else (1 if x < y
                                                            else 2)),
                    ("nand", lambda x, y: int(not (x and y)))]:
        blut = sks.generate_lookup_table_bivariate(f)
        got = cks.decrypt_batch(sks.unchecked_bivariate_batch(a, b, blut))
        want = np.array([f(int(x), int(y)) % msg for x, y in zip(xs, ys)],
                        dtype=np.uint64)
        assert np.array_equal(got, want), name


def test_smart_ops_saturate_carry(keys):
    """Chained adds walk the carry space to its edge and the smart path
    must clean exactly when the tracked budget requires it
    (ref: shortint smart_add carry-budget tests)."""
    cks, sks = keys
    msg = sks.message_modulus
    acc = cks.encrypt(msg - 1)
    total = msg - 1
    for _ in range(2 * sks.carry_modulus):
        acc = sks.add(acc, cks.encrypt(msg - 1))
        total += msg - 1
        assert cks.decrypt(acc) == total % msg
        assert acc.degree < msg * sks.carry_modulus


def test_scalar_ops_full_domain(keys):
    cks, sks = keys
    msg = sks.message_modulus
    for x in range(msg):
        for s in range(msg):
            ct = cks.encrypt(x)
            assert cks.decrypt(
                sks.unchecked_scalar_add(ct, s)) == (x + s) % msg
            if s:
                got = cks.decrypt_batch_message_and_carry(
                    sks.unchecked_scalar_mul(ct, s).data[None])[0]
                assert got == x * s


def test_neg_full_domain(keys):
    cks, sks = keys
    msg = sks.message_modulus
    for x in range(msg):
        assert cks.decrypt(sks.neg(cks.encrypt(x))) == (-x) % msg


def test_div_mod_full_domain(keys):
    cks, sks = keys
    msg = sks.message_modulus
    for x in range(msg):
        for y in range(msg):
            q = cks.decrypt(sks.div(cks.encrypt(x), cks.encrypt(y)))
            want = (x // y) % msg if y else msg - 1  # ref: div_mod.rs
            assert q == want, (x, y)
            if y:
                r = cks.decrypt(sks.mod_(cks.encrypt(x), cks.encrypt(y)))
                assert r == x % y, (x, y)

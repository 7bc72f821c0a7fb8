"""Boolean gate truth tables (ref strategy: SURVEY.md §4.5 — all gate /
trivial combinations; here batched + scalar trivial dispatch)."""

import numpy as np
import pytest

from tfhe_tpu import boolean
from tfhe_tpu.params import BOOLEAN_TEST_PARAMETERS


@pytest.fixture(scope="module")
def keys():
    return boolean.gen_keys(BOOLEAN_TEST_PARAMETERS, seed=42)


A_BITS = np.array([False, False, True, True])
B_BITS = np.array([False, True, False, True])


@pytest.mark.parametrize(
    "gate,expected",
    [
        ("and_batch", A_BITS & B_BITS),
        ("or_batch", A_BITS | B_BITS),
        ("xor_batch", A_BITS ^ B_BITS),
        ("nand_batch", ~(A_BITS & B_BITS)),
        ("nor_batch", ~(A_BITS | B_BITS)),
        ("xnor_batch", ~(A_BITS ^ B_BITS)),
    ],
)
def test_binary_gate_truth_table(keys, gate, expected):
    cks, sks = keys
    out = cks.decrypt_batch(getattr(sks, gate)(
        cks.encrypt_batch(A_BITS), cks.encrypt_batch(B_BITS)))
    assert np.array_equal(out, expected)


def test_not_and_mux(keys):
    cks, sks = keys
    A = cks.encrypt_batch(A_BITS)
    B = cks.encrypt_batch(B_BITS)
    assert np.array_equal(cks.decrypt_batch(sks.not_batch(A)), ~A_BITS)
    cond = np.array([True, False, True, False])
    C = cks.encrypt_batch(cond)
    out = cks.decrypt_batch(sks.mux_batch(C, A, B))
    assert np.array_equal(out, np.where(cond, A_BITS, B_BITS))


def test_scalar_api_trivial_dispatch(keys):
    cks, sks = keys
    t = sks.trivial_encrypt(True)
    f = sks.trivial_encrypt(False)
    e_true = cks.encrypt(True)
    e_false = cks.encrypt(False)
    assert cks.decrypt(sks.and_(t, e_false)) is False
    assert cks.decrypt(sks.and_(t, f)) is False
    assert cks.decrypt(sks.or_(f, e_true)) is True
    assert cks.decrypt(sks.xor(e_true, t)) is False
    assert cks.decrypt(sks.nand(e_true, e_true)) is False
    assert cks.decrypt(sks.mux(e_true, e_false, t)) is False
    assert cks.decrypt(sks.mux(f, e_false, e_true)) is True
    assert cks.decrypt(sks.not_(e_false)) is True


def test_gate_chain(keys):
    """Noise survives a chain of dependent gates (full adder)."""
    cks, sks = keys
    for a in (False, True):
        for b in (False, True):
            for c in (False, True):
                ea, eb, ec = cks.encrypt(a), cks.encrypt(b), cks.encrypt(c)
                s1 = sks.xor(ea, eb)
                total = sks.xor(s1, ec)
                carry = sks.or_(sks.and_(ea, eb), sks.and_(s1, ec))
                assert cks.decrypt(total) == (a ^ b ^ c)
                assert cks.decrypt(carry) == ((a and b) or ((a ^ b) and c))

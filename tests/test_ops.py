"""Decomposition / limb / negacyclic-algebra unit tests
(ref strategy: SURVEY.md §4.4 decomposition recompose tests)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.ops import decomposition, limbs, polymul


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("base_log,levels", [(23, 1), (3, 5), (15, 2)])
def test_decompose_recompose(rng, base_log, levels):
    x = jnp.asarray(rng.integers(0, 1 << 64, 500, dtype=np.uint64))
    digs = decomposition.signed_decompose(x, base_log, levels)
    rec = decomposition.recompose(digs, base_log, levels)
    cr = decomposition.closest_representable(x, base_log, levels)
    assert np.array_equal(np.asarray(rec), np.asarray(cr))
    assert int(jnp.max(jnp.abs(digs))) <= (1 << base_log) // 2


def test_closest_representable_reference_value():
    # doc vector from the reference (u32, base 4, level 3):
    # closest_representable(1_340_987_234) == 1_341_128_704
    out = decomposition.closest_representable(
        jnp.asarray([1_340_987_234], jnp.uint32), 4, 3, bits=32
    )
    assert int(out[0]) == 1_341_128_704


def test_torus_limbs_exact(rng):
    x = rng.integers(0, 1 << 64, 200, dtype=np.uint64)
    lb = np.asarray(limbs.torus_to_limbs(jnp.asarray(x)))
    rec = np.zeros_like(x)
    with np.errstate(over="ignore"):
        for j in range(8):
            rec += lb[..., j].astype(np.int64).astype(np.uint64) << np.uint64(8 * j)
    assert np.array_equal(rec, x)
    assert lb.dtype == np.int8


def test_digit_limbs_exact(rng):
    d = rng.integers(-(1 << 22), (1 << 22) + 1, 200).astype(np.int64)
    lb = np.asarray(limbs.digits_to_limbs(jnp.asarray(d, jnp.int32), 23))
    rec = sum(lb[..., j].astype(np.int64) << (8 * j) for j in range(lb.shape[-1]))
    assert np.array_equal(rec, d)


def test_negacyclic_contract_exact(rng):
    N = 32
    b = rng.integers(0, 1 << 64, N, dtype=np.uint64)
    d = rng.integers(-(1 << 22), (1 << 22) + 1, N).astype(np.int64)
    exp = [0] * N
    for n in range(N):
        for m in range(N):
            v = int(d[n]) * int(b[m])
            k = n + m
            if k >= N:
                exp[k - N] = (exp[k - N] - v) % (1 << 64)
            else:
                exp[k] = (exp[k] + v) % (1 << 64)
    exp = np.array(exp, dtype=np.uint64)

    dl = limbs.digits_to_limbs(jnp.asarray(d, jnp.int32), 23)  # [N, I]
    dl = jnp.transpose(dl, (1, 0))[None, :, None, None, :]
    bl = limbs.torus_to_limbs(polymul.extend_u64_poly(jnp.asarray(b)))
    mat = polymul.ext_poly_to_limb_matrix(jnp.transpose(bl, (1, 0)), N)
    out = polymul.negacyclic_contract(dl, mat[None, None, None])
    assert np.array_equal(np.asarray(out)[0, 0], exp)


def test_monomial_mul_div_roundtrip(rng):
    N = 64
    p = jnp.asarray(rng.integers(0, 1 << 64, (3, N), dtype=np.uint64))
    for a in [0, 1, 17, N - 1, N, N + 5, 2 * N - 1, 2 * N]:
        deg = jnp.full((3,), a, jnp.int32)
        q = polymul.monomial_div(polymul.monomial_mul(p, deg, N), deg, N)
        assert np.array_equal(np.asarray(q), np.asarray(p))


def test_monomial_mul_negacyclic_wrap():
    N = 8
    p = jnp.asarray(np.arange(1, N + 1, dtype=np.uint64))
    out = np.asarray(polymul.monomial_mul(p[None], jnp.asarray([N], jnp.int32), N))[0]
    # X^N == -1: full rotation negates
    with np.errstate(over="ignore"):
        assert np.array_equal(out, (np.uint64(0) - np.asarray(p)))

"""Fused multi-bit blind rotation vs the jnp CRT-NTT path.

The Pallas multi-bit kernel (ops/fused_multibit.py) must be bit-identical
to core/multibit.py's jnp formulation — same standard-domain key, same
ciphertexts, same accumulator out (both are exact-arithmetic re-expressions
of lwe_multi_bit_programmable_bootstrapping.rs:295-460).  On CPU the kernel
runs in interpret mode, so this exercises the identical traced math.
"""

import numpy as np
import pytest

from tfhe_tpu.core.multibit import (
    multi_bit_blind_rotate,
    prepare_multi_bit_bsk_ntt,
)
from tfhe_tpu.ops.fused_multibit import (
    _composites,
    _mb_factor,
    multi_bit_blind_rotate_fused,
    prepare_multi_bit_bsk_fused,
)


@pytest.mark.parametrize("gf,N,L,bl", [(2, 256, 2, 8), (3, 256, 1, 15)])
def test_fused_multibit_matches_jnp(gf, N, L, bl):
    rng = np.random.default_rng(7)
    G, ng, B = 2, 4, 4
    per = 1 << gf
    n = ng * gf
    mbsk = rng.integers(0, 1 << 64, (ng, per, L, G, G, N), dtype=np.uint64)
    lwe = rng.integers(0, 1 << 64, (B, n + 1), dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, (B, G, N), dtype=np.uint64)

    ref = np.asarray(
        multi_bit_blind_rotate(
            prepare_multi_bit_bsk_ntt(mbsk, bl, gf), lut, lwe))
    got = np.asarray(
        multi_bit_blind_rotate_fused(
            prepare_multi_bit_bsk_fused(mbsk, bl, gf), lut, lwe))
    np.testing.assert_array_equal(ref, got)


def test_composite_factorization_consistency():
    """Every composite subset factors into an earlier subset plus a
    singleton, so the kernel's monomial assembly order is well-defined."""
    for gf in (2, 3, 4):
        per = 1 << gf
        seen = {1 << i for i in range(gf)}
        for j in _composites(per):
            ja, jb = _mb_factor(j)
            assert jb in seen and bin(jb).count("1") == 1
            assert ja in seen or bin(ja).count("1") == 1
            seen.add(j)
        assert seen == set(range(1, per))

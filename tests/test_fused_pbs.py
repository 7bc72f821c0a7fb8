"""Fused Pallas blind rotation == jnp CRT-NTT blind rotation, bit-exactly.

The fused kernel (ops/fused_pbs.py) must reproduce the jnp path
(ops/polymul_ntt.py) exactly: both compute the identical integer
convolutions (exact CRT-NTT), so every accumulator word matches.
"""

import numpy as np
import pytest

from tfhe_tpu.core import keygen, pbs
from tfhe_tpu.ops import fused_pbs


def _rand_inputs(rng, n, L, G, N, B, bits=64):
    dt = np.uint64 if bits == 64 else np.uint32
    info = np.iinfo(dt)
    bsk = rng.integers(0, info.max, (n, L, G, G, N), dtype=dt)
    lut = rng.integers(0, info.max, (G, N), dtype=dt)
    lwe = rng.integers(0, info.max, (B, n + 1), dtype=dt)
    return bsk, lut, lwe


@pytest.mark.parametrize("case", [
    dict(n=4, L=1, G=2, N=256, B=8, bl=23, bits=64),
    dict(n=3, L=2, G=2, N=256, B=8, bl=15, bits=64),
    dict(n=4, L=2, G=3, N=512, B=8, bl=8, bits=64),
    dict(n=4, L=2, G=2, N=512, B=8, bl=8, bits=32),
])
def test_fused_matches_jnp_blind_rotate(case):
    rng = np.random.default_rng(42)
    n, L, G, N, B = case["n"], case["L"], case["G"], case["N"], case["B"]
    bl, bits = case["bl"], case["bits"]
    bsk_std, lut, lwe = _rand_inputs(rng, n, L, G, N, B, bits)

    from tfhe_tpu.ops.polymul_ntt import prepare_bsk_ntt
    bsk_ntt = prepare_bsk_ntt(bsk_std, bl, bits=bits)
    want = np.asarray(pbs.blind_rotate(bsk_ntt, lut, lwe))

    bsk_f = fused_pbs.prepare_bsk_fused(bsk_std, bl, bits=bits)
    got = np.asarray(fused_pbs.blind_rotate_fused(bsk_f, lut, lwe))

    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_decompose_planes_matches_reference():
    """Plane-based signed decomposition == ops/decomposition, incl. the
    two-plane state path (base_log * levels > 31)."""
    import jax.numpy as jnp

    from tfhe_tpu.ops import decomposition

    rng = np.random.default_rng(7)
    for bl, L, bits in [(23, 1, 64), (15, 2, 64), (9, 4, 64), (6, 8, 64),
                        (18, 1, 32), (7, 3, 32)]:
        x = rng.integers(0, np.iinfo(np.uint64).max,
                         (64,), dtype=np.uint64)
        if bits == 32:
            x = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        want = np.asarray(decomposition.signed_decompose(x, bl, L, bits=bits))
        cfg = fused_pbs.make_config(256, 2, L, bl, bits)
        if bits == 64:
            dlo = jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                              .astype(np.int32))
            dhi = jnp.asarray((x >> np.uint64(32)).astype(np.uint32)
                              .view(np.int32))
        else:
            dlo = jnp.asarray(x.view(np.int32))
            dhi = None
        digs = fused_pbs._decompose_planes(dlo, dhi, cfg)
        got = np.stack([np.asarray(d) for d in digs], axis=-1)
        assert np.array_equal(got, want), (bl, L, bits)

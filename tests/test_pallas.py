"""Pallas kernel exactness tests (interpreter mode on the CPU backend).

(ref: the Shoup MAC corresponds to the reference's pulp SIMD fmadd kernel,
fft64/crypto/ggsw.rs:616-697.)
"""

import numpy as np
import pytest

from tfhe_tpu.ops import ntt
from tfhe_tpu.ops import pallas_kernels as pk


@pytest.mark.parametrize("p", ntt.PRIMES)
def test_shoup_mac_matches_reference(p):
    rng = np.random.default_rng(p)
    B, LJ, GM, N = 3, 2, 8, 256
    a = rng.integers(-(p // 2), p // 2 + 1, (B, LJ, N)).astype(np.int32)
    ks = rng.integers(-(p // 2), p // 2 + 1, (LJ, GM, N)).astype(np.int32)
    ksh = ntt.shoup_precompute_host(ks.astype(np.int64), p)
    got = np.asarray(pk.shoup_mac(a, ks, ksh, p))
    want = np.asarray(pk.shoup_mac_reference(a, ks, ksh, p))
    # both must be congruent mod p and balanced-ish
    assert ((got - want) % p == 0).all()
    assert np.abs(got).max() <= 3 * p // 2


def test_pbs_with_pallas_stage(monkeypatch):
    """End-to-end shortint PBS with the Pallas MAC stage swapped in."""
    monkeypatch.setenv("TFHE_TPU_PALLAS", "1")
    from tfhe_tpu import shortint
    from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST as P

    cks, sks = shortint.gen_keys(P, seed=4242)
    msgs = np.array([0, 1, 2, 3], dtype=np.uint64)
    ct = cks.encrypt_batch(msgs)
    lut = sks.generate_lookup_table(lambda x: (x * 2 + 1) % 4)
    out = sks.apply_lookup_table_batch(ct, lut)
    np.testing.assert_array_equal(cks.decrypt_batch(out), (msgs * 2 + 1) % 4)

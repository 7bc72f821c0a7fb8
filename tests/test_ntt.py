"""CRT-NTT backend: transform identities, exact convolution, and
backend-equivalence of the full PBS (ref strategy: SURVEY.md §4.3 FFT tests —
here the bar is exactness, not precision bounds)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.ops import ntt
from tfhe_tpu.ops.polymul_ntt import external_product_ntt, key_to_spectra
from tfhe_tpu.ops import decomposition, limbs as limbs_mod, polymul
from tfhe_tpu import core


@pytest.mark.parametrize("N", [64, 256])
def test_forward_inverse_identity(N):
    rng = np.random.default_rng(0)
    x = rng.integers(-(1 << 22), 1 << 22, (3, N)).astype(np.int64)
    back = ntt.inverse_ntt(ntt.forward_ntt(jnp.asarray(x)))
    for i, p in enumerate(ntt.PRIMES):
        want = x % p
        want = np.where(want > p // 2, want - p, want)
        assert np.array_equal(np.asarray(back[i]), want), p


def _negconv_exact(a, b, N):
    out = np.zeros(N, dtype=object)
    for i in range(N):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(N):
            t = ai * int(b[j])
            if i + j >= N:
                out[i + j - N] -= t
            else:
                out[i + j] += t
    return np.array([v % (1 << 64) for v in out], dtype=np.uint64)


def test_exact_u64_convolution():
    N = 128
    rng = np.random.default_rng(1)
    d = rng.integers(-(1 << 22), 1 << 22, N).astype(np.int64)
    k = rng.integers(0, 1 << 64, N, dtype=np.uint64)
    want = _negconv_exact(d, k, N)

    dspec = ntt.forward_ntt(jnp.asarray(d))
    kspec, kshoup = key_to_spectra(k[None])  # [P, 1, 2, N]
    prod = [
        ntt.shoup_mul(dspec[i][None, :], kspec[i, 0], kshoup[i, 0], p)
        for i, p in enumerate(ntt.PRIMES)
    ]
    coeffs = ntt.inverse_ntt(prod)
    conv_m = ntt.crt_to_u64_centered(coeffs)  # [2, N]
    got = np.asarray(ntt.planes_to_u64(conv_m[None]))[0]
    assert np.array_equal(got, want)


def test_external_product_matches_exact_backend():
    """NTT external product == int8-matrix exact path on random data."""
    N, G, L, bl = 64, 2, 2, 8
    rng = np.random.default_rng(2)
    acc_diff = rng.integers(0, 1 << 64, (3, G, N), dtype=np.uint64)
    key = rng.integers(0, 1 << 64, (L, G, G, N), dtype=np.uint64)

    # exact reference path (ops/polymul.py negacyclic_contract)
    digits = decomposition.signed_decompose(jnp.asarray(acc_diff), bl, L)
    dl = limbs_mod.digits_to_limbs(digits, bl)
    dl = jnp.transpose(dl, (0, 4, 3, 1, 2))
    ext = np.concatenate([key, (np.uint64(0) - key)], axis=-1)
    lb = limbs_mod.torus_to_limbs(jnp.asarray(ext))
    lb = jnp.moveaxis(lb, -1, -2)
    mat = polymul.ext_poly_to_limb_matrix(lb, N)
    want = np.asarray(polymul.negacyclic_contract(dl, mat))

    spec, shoup = key_to_spectra(key)  # [P, L, G, G, 2, N]
    got = np.asarray(external_product_ntt(jnp.asarray(acc_diff), spec, shoup, bl, L))
    assert np.array_equal(got, want)


def test_pbs_backends_bit_identical():
    """Full blind rotation: NTT backend decrypts identically to exact."""
    from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST as P
    from tfhe_tpu import shortint

    cks, sks = shortint.gen_keys(P, seed=3)
    msg = sks.message_modulus
    lut = sks.generate_lookup_table(lambda x: (x * 5 + 2) % msg)
    clear = np.arange(16) % msg
    ct = cks.encrypt_batch(clear)

    exact_bsk = core.prepare_bsk(sks.raw_bsk, P.pbs_base_log)
    out_ntt = core.keyswitch_then_pbs(sks.ksk, sks.bsk, lut.acc, jnp.asarray(ct.data))
    out_exact = core.keyswitch_then_pbs(sks.ksk, exact_bsk, lut.acc, jnp.asarray(ct.data))
    # both exact backends must agree bit-for-bit, not just after decryption
    assert np.array_equal(np.asarray(out_ntt), np.asarray(out_exact))
    got = cks.decrypt_batch(np.asarray(out_ntt))
    assert np.array_equal(got, (clear * 5 + 2) % msg)

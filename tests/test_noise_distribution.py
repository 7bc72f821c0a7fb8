"""Statistical noise-distribution tests.

Mirrors the reference's noise-distribution suite
(ref: tfhe/src/core_crypto/algorithms/test/noise_distribution/
lwe_encryption_noise.rs:1-80): the variance of the decryption error over
many fresh encryptions must match the parameter StandardDev within a
relative tolerance of 1/16, the mean must be ~0, and the samples must pass
a normality sanity check (empirical CDF vs the Gaussian CDF).
"""

import math

import numpy as np
import pytest

from tfhe_tpu import core
from tfhe_tpu.prng.generators import (
    EncryptionRandomGenerator,
    SecretRandomGenerator,
)
from tfhe_tpu.prng.sampling import gaussian_noise_torus
from tfhe_tpu.prng.stream import AesCtrStream, Seeder

REL_TOL = 1.0 / 16.0  # (ref: lwe_encryption_noise.rs relative tolerance)

# fast tier since the native AES backend (full suite ~2.5 s); hosts where
# the native lib cannot build fall back to the ~175x slower numpy AES, so
# downsample there to keep the default tier quick (variance tolerance
# scales as 1/sqrt(n) — the 1/16 rel-tol still holds at 1000 samples)
from tfhe_tpu.prng.aes import native_backend_available

N_SAMPLES = 4000 if native_backend_available() else 1000

def _signed(x: np.ndarray) -> np.ndarray:
    return x.astype(np.int64).astype(np.float64)


def _phi(x):
    return 0.5 * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))


def _check_normality(samples: np.ndarray, std: float):
    """Kolmogorov–Smirnov-style bound on the empirical CDF deviation
    (stands in for the reference's erf-based normality test)."""
    z = np.sort(samples / std)
    n = len(z)
    ecdf = (np.arange(n) + 0.5) / n
    d = np.abs(ecdf - _phi(z)).max()
    # KS critical value at alpha ~ 1e-3 is ~1.95/sqrt(n)
    assert d < 1.95 / math.sqrt(n), f"KS statistic {d} too large"


def test_gaussian_sampler_distribution():
    """The Box–Muller sampler itself: mean, variance, normality."""
    std = 2.0 ** -20
    stream = AesCtrStream(0x123456789)
    torus = gaussian_noise_torus(stream, N_SAMPLES, std)
    samples = _signed(torus) / 2.0 ** 64  # back to the real torus
    assert abs(samples.mean()) < 5 * std / math.sqrt(N_SAMPLES)
    var = samples.var()
    assert abs(var - std ** 2) <= REL_TOL * std ** 2, (var, std ** 2)
    _check_normality(samples, std)


def test_lwe_encryption_noise_variance():
    """Decryption error of fresh LWE encryptions follows the parameter
    StandardDev (ref: lwe_encryption_noise.rs
    lwe_compact_public_encrypt_noise_distribution analogue for secret-key
    encryption)."""
    std = 0.000007069849454709433  # 2_2 lwe_modular_std_dev
    seeder = Seeder(42)
    sec = SecretRandomGenerator(seeder.seed())
    gen = EncryptionRandomGenerator(seeder.seed(), seeder)
    sk = core.generate_binary_lwe_secret_key(742, sec)

    encoded = np.zeros(N_SAMPLES, dtype=np.uint64)
    ct = core.encrypt_lwe(sk, encoded, std, gen)
    phase = core.decrypt_lwe(sk, ct)  # error only (message is 0)
    err = _signed(phase) / 2.0 ** 64
    var = err.var()
    assert abs(var - std ** 2) <= REL_TOL * std ** 2, (var, std ** 2)
    assert abs(err.mean()) < 5 * std / math.sqrt(N_SAMPLES)
    _check_normality(err, std)


def test_glwe_encryption_noise_variance():
    std = 2.0 ** -24
    seeder = Seeder(43)
    sec = SecretRandomGenerator(seeder.seed())
    gen = EncryptionRandomGenerator(seeder.seed(), seeder)
    glwe_sk = core.generate_binary_glwe_secret_key(1, 256, sec)
    B = N_SAMPLES // 256 + 1
    body = np.zeros((B, 256), dtype=np.uint64)
    ct = core.encrypt_glwe_assign(glwe_sk, body, std, gen)
    phase = core.decrypt_glwe(glwe_sk, ct).reshape(-1)[:N_SAMPLES]
    err = _signed(phase) / 2.0 ** 64
    var = err.var()
    assert abs(var - std ** 2) <= REL_TOL * std ** 2, (var, std ** 2)
    _check_normality(err, std)


def test_zero_noise_consumes_no_bytes():
    stream = AesCtrStream(7)
    before = stream.current
    out = gaussian_noise_torus(stream, 100, 0.0)
    assert stream.current == before
    assert not out.any()


def test_uniform_mask_distribution():
    """Mask words are uniform on the torus: mean ~ 2^63, chi-square on the
    top 4 bits (stands in for the dieharder battery of
    scripts/dieharder_test.sh at CI scale)."""
    from tfhe_tpu.prng.sampling import uniform_torus

    stream = AesCtrStream(0xABCDEF)
    x = uniform_torus(stream, 1 << 16)
    top = (x >> np.uint64(60)).astype(np.int64)
    counts = np.bincount(top, minlength=16)
    expected = len(x) / 16.0
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # 15 dof; P(chi2 > 50) < 1e-5
    assert chi2 < 50.0, chi2

"""CSPRNG statistical battery (the in-repo dieharder analog.

The reference runs the dieharder suite over concrete-csprng output in CI
(ref: scripts/dieharder_test.sh, .github/workflows/
csprng_randomness_testing.yml); the binary is not available in this
environment, so this applies the core battery members directly to the
AES-CTR stream: monobit frequency, per-byte chi-square, runs test, serial
byte correlation, and block frequency.  Thresholds are 4-sigma-ish so the
battery is deterministic for our fixed seeds while still catching any
structural break of the generator."""

import math

import numpy as np
import pytest

from tfhe_tpu.prng.stream import AesCtrStream

pytestmark = pytest.mark.slow  # statistical battery: run via `pytest -m slow`

N_BYTES = 1 << 20  # 1 MiB of stream per seed


@pytest.fixture(scope="module", params=[0, 123456789, (1 << 127) + 5])
def stream_bytes(request):
    gen = AesCtrStream(request.param)
    return np.asarray(gen.next_bytes(N_BYTES), dtype=np.uint8)


def test_monobit_frequency(stream_bytes):
    bits = np.unpackbits(stream_bytes)
    n = bits.size
    s = abs(int(bits.sum()) * 2 - n)
    # |S| / sqrt(n) ~ half-normal; 4 sigma
    assert s / math.sqrt(n) < 4.0


def test_byte_chi_square(stream_bytes):
    counts = np.bincount(stream_bytes, minlength=256)
    expected = N_BYTES / 256.0
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    # chi2 with 255 dof: mean 255, std sqrt(510) ~ 22.6; 4 sigma
    assert abs(chi2 - 255.0) < 4.0 * math.sqrt(510.0)


def test_runs(stream_bytes):
    bits = np.unpackbits(stream_bytes)
    n = bits.size
    pi = float(bits.mean())
    runs = 1 + int((bits[1:] != bits[:-1]).sum())
    expected = 2 * n * pi * (1 - pi) + 1
    std = math.sqrt(2 * n) * 2 * pi * (1 - pi)
    assert abs(runs - expected) < 4.0 * std


def test_serial_byte_correlation(stream_bytes):
    x = stream_bytes.astype(np.float64)
    a, b = x[:-1], x[1:]
    r = float(np.corrcoef(a, b)[0, 1])
    # corr std ~ 1/sqrt(n); 4 sigma
    assert abs(r) < 4.0 / math.sqrt(x.size - 1)


def test_block_frequency(stream_bytes):
    bits = np.unpackbits(stream_bytes).reshape(-1, 4096)
    pi = bits.mean(axis=1)
    chi2 = float((4 * 4096 * (pi - 0.5) ** 2).sum())
    m = bits.shape[0]  # dof
    assert abs(chi2 - m) < 4.0 * math.sqrt(2.0 * m)


def test_fork_streams_uncorrelated():
    """Bytes of sibling forked streams look independent."""
    gen = AesCtrStream(42)
    kids = gen.try_fork(2, 1 << 16)
    a = np.asarray(kids[0].next_bytes(1 << 16), dtype=np.float64)
    b = np.asarray(kids[1].next_bytes(1 << 16), dtype=np.float64)
    r = float(np.corrcoef(a, b)[0, 1])
    assert abs(r) < 4.0 / math.sqrt(a.size)
    assert not np.array_equal(a, b)

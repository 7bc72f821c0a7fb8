"""128-bit torus path (the fft128 analog; ref: tfhe/src/core_crypto/
fft_impl/{fft128,fft128_u128}/ and the f128 PBS at
algorithms/lwe_programmable_bootstrapping.rs:1327).

Toy dimensions, same strategy as the u64 core tests: exactness of the pair
arithmetic against Python ints, encrypt/decrypt round trips, and an
end-to-end f128 PBS evaluating LUTs."""

import numpy as np
import pytest

import jax.numpy as jnp

from tfhe_tpu import core
from tfhe_tpu.ops import u128
from tfhe_tpu.prng.generators import (EncryptionRandomGenerator,
                                      SecretRandomGenerator)
from tfhe_tpu.prng.stream import Seeder

MOD = 1 << 128


def test_u128_pair_arithmetic():
    rng = np.random.default_rng(0)
    a_ints = [int.from_bytes(rng.bytes(16), "little") for _ in range(32)]
    b_ints = [int.from_bytes(rng.bytes(16), "little") for _ in range(32)]
    a = jnp.asarray(u128.np_pack(a_ints))
    b = jnp.asarray(u128.np_pack(b_ints))
    assert u128.np_unpack(np.asarray(u128.add(a, b))) == [
        (x + y) % MOD for x, y in zip(a_ints, b_ints)]
    assert u128.np_unpack(np.asarray(u128.sub(a, b))) == [
        (x - y) % MOD for x, y in zip(a_ints, b_ints)]
    assert u128.np_unpack(np.asarray(u128.neg(a))) == [
        (-x) % MOD for x in a_ints]
    for k in (1, 31, 32, 64, 95):
        assert u128.np_unpack(np.asarray(u128.shl(a, k))) == [
            (x << k) % MOD for x in a_ints]


def test_u128_monomial_mul():
    N = 16
    rng = np.random.default_rng(1)
    poly_ints = [int.from_bytes(rng.bytes(16), "little") for _ in range(N)]
    poly = jnp.asarray(u128.np_pack(poly_ints))[None]  # [1, N, 2]
    for d in (0, 1, 5, N - 1, N, N + 3, 2 * N - 1, 2 * N):
        out = np.asarray(u128.monomial_mul(
            poly, jnp.asarray([[d]], jnp.int32)[..., 0], N))
        got = u128.np_unpack(out[0])
        want = [0] * N
        for i, c in enumerate(poly_ints):
            j = (i + d) % (2 * N)
            if j < N:
                want[j] = (want[j] + c) % MOD
            else:
                want[j - N] = (want[j - N] - c) % MOD
        assert got == want, f"degree {d}"


def test_u128_lwe_roundtrip():
    sec = SecretRandomGenerator(7)
    enc = EncryptionRandomGenerator(8, Seeder(8))
    n = 16
    from tfhe_tpu.core.u128_crypto import (decrypt_lwe_u128,
                                           encrypt_lwe_u128)

    bits = sec.random_binary(n)
    delta = 1 << 120
    msgs = [0, 1, 5, 255]
    ct = encrypt_lwe_u128(bits, [m * delta for m in msgs], 2.0 ** -40, enc)
    assert ct.shape == (4, n + 1, 2)
    for ph, m in zip(decrypt_lwe_u128(bits, ct), msgs):
        dec = ((ph + delta // 2) // delta) % 256
        assert dec == m


def test_u128_glwe_roundtrip():
    sec = SecretRandomGenerator(9)
    enc = EncryptionRandomGenerator(10, Seeder(10))
    from tfhe_tpu.core.u128_crypto import (decrypt_glwe_u128,
                                           encrypt_glwe_preset_u128)

    k, N = 2, 32
    gbits = sec.random_binary(k * N).reshape(k, N)
    delta = 1 << 121
    vals = [(i % 5) * delta for i in range(N)]
    ct = encrypt_glwe_preset_u128(gbits, vals, 2.0 ** -40, enc)
    phase = decrypt_glwe_u128(gbits, ct)
    for ph, want in zip(phase, vals):
        got = ((ph + delta // 2) // delta) * delta % MOD
        assert got == want


def test_f128_pbs_end_to_end():
    """encrypt -> blind rotate (CRT-NTT, 4 planes) -> sample extract ->
    decrypt, evaluating LUTs over the u128 torus."""
    from tfhe_tpu.core.u128_crypto import (decrypt_lwe_u128,
                                           encrypt_lwe_u128,
                                           generate_bootstrap_key_u128)
    from tfhe_tpu.ops.polymul_ntt import prepare_bsk_ntt

    sec = SecretRandomGenerator(11)
    enc = EncryptionRandomGenerator(12, Seeder(12))
    n, k, N = 4, 1, 64
    base_log, levels = 18, 2
    msup = 4
    delta = MOD // (2 * msup)
    lwe_bits = sec.random_binary(n)
    glwe_bits = sec.random_binary(k * N).reshape(k, N)
    big_bits = glwe_bits.reshape(-1)

    bsk = generate_bootstrap_key_u128(lwe_bits, glwe_bits, base_log, levels,
                                      2.0 ** -60, enc)
    pbsk = prepare_bsk_ntt(bsk, base_log, bits=128)

    msgs = [0, 1, 2, 3]
    cts = encrypt_lwe_u128(lwe_bits, [m * delta for m in msgs],
                           2.0 ** -60, enc)
    for f in (lambda x: x, lambda x: (3 * x + 1) % msup):
        lut = core.fill_accumulator_u128(f, N, k + 1, msup, delta)
        out = np.asarray(core.programmable_bootstrap(
            pbsk, jnp.asarray(lut), jnp.asarray(cts)))
        assert out.shape == (4, k * N + 1, 2)
        for ph, m in zip(decrypt_lwe_u128(big_bits, out), msgs):
            got = ((ph + delta // 2) // delta) % (2 * msup)
            assert got == f(m) % msup, (m, got, f(m))

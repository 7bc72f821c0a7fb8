"""Core crypto round-trip tests on toy (insecure, fast) parameters
(ref strategy: SURVEY.md §4.1 — encrypt/decrypt round-trips, KS/PBS
correctness; §4.7 toy-dimension fixture params)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_tpu import core
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_COMPACT_TEST as P
from tfhe_tpu.prng import Seeder
from tfhe_tpu.prng.generators import EncryptionRandomGenerator, SecretRandomGenerator


@pytest.fixture(scope="module")
def keys():
    seeder = Seeder(1234)
    sec = SecretRandomGenerator(seeder.seed())
    enc = EncryptionRandomGenerator(seeder.seed(), seeder)
    small = core.generate_binary_lwe_secret_key(P.lwe_dimension, sec)
    glwe = core.generate_binary_glwe_secret_key(
        P.glwe_dimension, P.polynomial_size, sec
    )
    big = glwe.as_lwe_secret_key()
    bsk = core.generate_bootstrap_key(
        small, glwe, P.pbs_base_log, P.pbs_level, P.glwe_modular_std_dev, enc
    )
    ksk = core.generate_keyswitch_key(
        big, small, P.ks_base_log, P.ks_level, P.lwe_modular_std_dev, enc
    )
    return dict(
        small=small,
        glwe=glwe,
        big=big,
        pbsk=core.prepare_bsk(bsk, P.pbs_base_log),
        pksk=core.prepare_ksk(ksk, P.ks_base_log),
        enc=enc,
    )


def _decode(phase):
    delta = np.uint64(P.delta)
    return ((phase + (delta >> np.uint64(1))) // delta) % np.uint64(
        2 * P.total_modulus
    )


def test_lwe_roundtrip(keys):
    msgs = np.arange(16, dtype=np.uint64)
    cts = core.encrypt_lwe(
        keys["big"], msgs * np.uint64(P.delta), P.glwe_modular_std_dev, keys["enc"]
    )
    assert np.array_equal(_decode(core.decrypt_lwe(keys["big"], cts)), msgs)


def test_glwe_roundtrip(keys):
    rng = np.random.default_rng(5)
    pt = (rng.integers(0, 16, (3, P.polynomial_size), dtype=np.uint64)
          * np.uint64(P.delta))
    ct = core.encrypt_glwe_assign(
        keys["glwe"], pt, P.glwe_modular_std_dev, keys["enc"]
    )
    dec = _decode(core.decrypt_glwe(keys["glwe"], ct))
    assert np.array_equal(dec, pt // np.uint64(P.delta))


def test_trivial_lwe(keys):
    ct = core.trivial_lwe(np.uint64(3 * P.delta), P.big_lwe_dimension)
    assert _decode(core.decrypt_lwe(keys["big"], ct)) == 3


def test_keyswitch(keys):
    msgs = np.arange(16, dtype=np.uint64)
    cts = core.encrypt_lwe(
        keys["big"], msgs * np.uint64(P.delta), P.glwe_modular_std_dev, keys["enc"]
    )
    out = np.asarray(core.keyswitch(keys["pksk"], jnp.asarray(cts)))
    assert out.shape == (16, P.lwe_dimension + 1)
    assert np.array_equal(_decode(core.decrypt_lwe(keys["small"], out)), msgs)


def test_pbs_luts(keys):
    msgs = np.arange(16, dtype=np.uint64)
    cts = core.encrypt_lwe(
        keys["big"], msgs * np.uint64(P.delta), P.glwe_modular_std_dev, keys["enc"]
    )
    small = core.keyswitch(keys["pksk"], jnp.asarray(cts))
    for f in [lambda x: x, lambda x: (x * x) % 4, lambda x: x % 4]:
        lut, _ = core.fill_accumulator(
            f, P.polynomial_size, P.glwe_size, P.total_modulus, P.delta
        )
        out = np.asarray(
            core.programmable_bootstrap(keys["pbsk"], jnp.asarray(lut), small)
        )
        dec = _decode(core.decrypt_lwe(keys["big"], out))
        exp = np.array([f(int(m)) % (1 << 64) for m in msgs], dtype=np.uint64)
        assert np.array_equal(dec, exp), f"{dec} != {exp}"


def test_pbs_per_ciphertext_luts(keys):
    """Batched PBS where each ciphertext evaluates a different LUT."""
    msgs = np.array([1, 2, 3], dtype=np.uint64)
    cts = core.encrypt_lwe(
        keys["big"], msgs * np.uint64(P.delta), P.glwe_modular_std_dev, keys["enc"]
    )
    small = core.keyswitch(keys["pksk"], jnp.asarray(cts))
    luts = np.stack(
        [
            core.fill_accumulator(f, P.polynomial_size, P.glwe_size,
                                  P.total_modulus, P.delta)[0]
            for f in (lambda x: x + 1, lambda x: 2 * x, lambda x: x * x)
        ]
    )
    out = np.asarray(
        core.programmable_bootstrap(keys["pbsk"], jnp.asarray(luts), small)
    )
    dec = _decode(core.decrypt_lwe(keys["big"], out))
    assert np.array_equal(dec, np.array([2, 4, 9], dtype=np.uint64))


def test_keygen_deterministic():
    def gen():
        seeder = Seeder(77)
        sec = SecretRandomGenerator(seeder.seed())
        enc = EncryptionRandomGenerator(seeder.seed(), seeder)
        small = core.generate_binary_lwe_secret_key(P.lwe_dimension, sec)
        glwe = core.generate_binary_glwe_secret_key(
            P.glwe_dimension, P.polynomial_size, sec
        )
        bsk = core.generate_bootstrap_key(
            small, glwe, P.pbs_base_log, P.pbs_level, P.glwe_modular_std_dev, enc
        )
        return small.bits_array, glwe.bits_array, bsk

    s1, g1, b1 = gen()
    s2, g2, b2 = gen()
    assert np.array_equal(s1, s2)
    assert np.array_equal(g1, g2)
    assert np.array_equal(b1, b2)

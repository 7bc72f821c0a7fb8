"""Correctness at REAL (128-bit secure) parameters.

Everything else in tests/ runs toy `*_TEST` fixtures for speed (SURVEY §4.7);
this module runs the actual PARAM_MESSAGE_2_CARRY_2_KS_PBS set the reference
tests its core with (ref: core_crypto/algorithms/test/mod.rs:56-73 real
4-bit native params; shortint tests at PARAM_MESSAGE_2_CARRY_2).  The
keycache (.keycache/PARAM_MESSAGE_2_CARRY_2_KS_PBS_s99.npz, also used by
bench.py) makes keygen affordable.
"""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS as P

pytestmark = pytest.mark.slow  # real params: run via `pytest -m slow`


@pytest.fixture(scope="module")
def keys():
    return shortint.gen_keys(P, seed=99, cache_dir=".keycache")


def test_real_params_ks_pbs_roundtrip(keys):
    """encrypt -> keyswitch+PBS (LUT) -> decrypt at real parameters."""
    cks, sks = keys
    msg = sks.message_modulus
    lut = sks.generate_lookup_table(lambda x: (x * 3 + 1) % msg)
    clear = np.arange(8, dtype=np.uint64) % msg
    ct = cks.encrypt_batch(clear)
    out = sks.apply_lookup_table_batch(ct, lut)
    got = cks.decrypt_batch(out.data)
    np.testing.assert_array_equal(got, (clear * 3 + 1) % msg)


def test_real_params_radix_add(keys):
    """4-block radix addition with carry propagation at real parameters
    (ref: integer tests at PARAM_MESSAGE_2_CARRY_2,
    radix_parallel/tests_cases_unsigned.rs)."""
    from tfhe_tpu.integer.ciphertext import RadixCiphertext
    from tfhe_tpu.integer.server_key import IntegerServerKey

    cks, sks = keys
    isk = IntegerServerKey(sks)
    msg = sks.message_modulus
    nb = 4
    modulus = msg ** nb

    def enc(v):
        return RadixCiphertext(cks.encrypt_batch(
            [(int(v) // msg**j) % msg for j in range(nb)]))

    def dec(ct):
        blocks = cks.decrypt_batch(ct.blocks.data)
        return sum(int(b) * msg**j for j, b in enumerate(blocks)) % modulus

    a, b = 173, 215  # carries propagate across all four blocks
    out = isk.add_parallelized(enc(a), enc(b))
    assert dec(out) == (a + b) % modulus

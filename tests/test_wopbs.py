"""WoPBS tests: bit extraction, circuit bootstrap, vertical packing, and
the shortint WopbsKey wrapper.

(ref: tfhe/src/core_crypto/fft_impl/fft64/crypto/wop_pbs/tests.rs and
shortint wopbs doc tests.)
"""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.params import WOPBS_PARAM_MESSAGE_2_CARRY_2_TEST as P


pytestmark = pytest.mark.slow  # matrix suite: run via `pytest -m slow`

@pytest.fixture(scope="module")
def keys():
    return shortint.gen_keys_wopbs(P, seed=515)


def test_wopbs_identity(keys):
    cks, sks, wk = keys
    lut = wk.generate_lut(lambda x: x)
    for v in (1, 2):
        ct = cks.encrypt(v)
        out = wk.wopbs(ct, lut)
        assert cks.decrypt(out) == v, v


def test_wopbs_function(keys):
    cks, sks, wk = keys
    lut = wk.generate_lut(lambda x: (x * 3 + 1) % 4)
    msgs = np.array([0, 1, 2, 3], dtype=np.uint64)
    batch = cks.encrypt_batch(msgs)
    out = wk.wopbs_batch(batch, lut)
    np.testing.assert_array_equal(cks.decrypt_batch(out), (msgs * 3 + 1) % 4)


def test_wopbs_full_domain(keys):
    """LUT over the packed (message, carry) value — the capability a
    classic PBS with padding cannot offer at full width."""
    cks, sks, wk = keys
    lut = wk.generate_lut_full_domain(lambda x: (x * x) % 16)
    msgs = np.array([0, 3, 7, 15], dtype=np.uint64)
    batch = cks.encrypt_batch(msgs)
    out = wk.wopbs_batch(batch, lut)
    np.testing.assert_array_equal(
        cks.decrypt_batch_message_and_carry(out), (msgs * msgs) % 16)


def test_wopbs_after_arithmetic(keys):
    """WoPBS digests a carry-laden ciphertext (degree < total) fine."""
    cks, sks, wk = keys
    a = cks.encrypt_batch([3])
    b = cks.encrypt_batch([3])
    s = sks.unchecked_add_batch(a, b)  # value 6 with carry
    lut = wk.generate_lut_full_domain(lambda x: x % 4)
    out = wk.wopbs_batch(s, lut)
    assert cks.decrypt_batch(out)[0] == 6 % 4


# -- integer-level wopbs (ref: tfhe/src/integer/wopbs/mod.rs tests) ---------


def test_integer_wopbs(keys):
    from tfhe_tpu.integer import IntegerWopbsKey, RadixClientKey

    cks, sks, wk = keys
    rck = RadixClientKey.__new__(RadixClientKey)
    rck.key = cks  # reuse the wopbs client key so the same server keys apply
    rck.num_blocks = 2
    rck.params = P
    iwk = IntegerWopbsKey(wk)
    modulus = 16

    ct = rck.encrypt(11)
    lut = iwk.generate_lut(ct, lambda x: (x * 3 + 5) % modulus)
    out = iwk.wopbs(ct, lut)
    assert rck.decrypt(out) == (11 * 3 + 5) % modulus


# -- vertical-packing edge cases (ref: fft64/crypto/wop_pbs/tests.rs) --------


def _bits_and_cbs(wk, cks, values, n_bits):
    import jax.numpy as jnp
    p = wk.params
    delta_log = p.delta.bit_length() - 1
    batch = cks.encrypt_batch(np.asarray(values, np.uint64))
    bits = wk.extract_bits_batch(batch, delta_log, n_bits)
    return [wk.cbs.circuit_bootstrap(bits[:, j], 63) for j in range(n_bits)]


def test_vertical_packing_non_pow2_luts(keys):
    """LUT count 3 (non-power-of-2): the tree zero-pads to width 4."""
    from tfhe_tpu.core import wopbs as wop

    cks, sks, wk = keys
    p = wk.params
    N = p.polynomial_size
    n_bits = 4  # bits select lut index (MSB tree bits) + rotation
    ggsw = _bits_and_cbs(wk, cks, [0b0110, 0b1011], n_bits)
    # 3 luts of N coeffs: tree consumes ceil(log2(4))=2 MSB bits, the
    # remaining 2 bits blind-rotate; lut[i][r] = encode(i + r)
    delta = np.uint64(p.delta)
    luts = np.stack([
        (np.arange(N, dtype=np.uint64) * 0 + 0),
        np.full(N, 1, np.uint64),
        np.full(N, 2, np.uint64),
    ]) * delta
    out = np.asarray(wop.vertical_packing(
        luts, ggsw, p.glwe_size, p.cbs_base_log, p.cbs_level))
    got = cks.decrypt_batch_message_and_carry(out)
    # value v = b3 b2 b1 b0; tree bits (MSB) pick lut v>>2, rotation
    # picks coeff v & 3 (constant polys -> rotation irrelevant); lut 3
    # is the zero pad
    for v, g in zip([0b0110, 0b1011], got):
        want = (v >> 2) if (v >> 2) < 3 else 0
        assert g == want, (bin(v), g)


def test_vertical_packing_multi_output_shared_cbs(keys):
    """Several output LUTs reuse ONE extract-bits + CBS pass (the
    reference's vector-LUT wop evaluation)."""
    from tfhe_tpu.core import wopbs as wop

    cks, sks, wk = keys
    p = wk.params
    vals = [5, 12, 3]
    n_bits = 4
    ggsw = _bits_and_cbs(wk, cks, vals, n_bits)
    for f in (lambda x: (x * x) % 16, lambda x: (x + 7) % 16):
        lut = wk.generate_lut_full_domain(f)
        out = np.asarray(wop.vertical_packing(
            lut.polys, ggsw, p.glwe_size, p.cbs_base_log, p.cbs_level))
        got = cks.decrypt_batch_message_and_carry(out)
        assert got.tolist() == [f(v) for v in vals]


def test_extract_bits_partial_counts(keys):
    """extract_bits with fewer bits than the full domain (the reference
    tests 1..=total bits, wop_pbs/tests.rs extract_bits cases)."""
    import jax.numpy as jnp

    cks, sks, wk = keys
    p = wk.params
    delta_log = p.delta.bit_length() - 1
    vals = np.asarray([0b1010, 0b0111], np.uint64)
    batch = cks.encrypt_batch(vals)
    for n_bits in (1, 2, 3):
        bits = wk.extract_bits_batch(batch, delta_log, n_bits)
        # extracted bits are keyswitched to the SMALL key at torus scale
        # 2^63 (ref: wop_pbs extract_bits output key)
        from tfhe_tpu.core import encrypt as core_enc

        for bi, v in enumerate(vals):
            for j in range(n_bits):
                lwe = np.asarray(bits[bi, j])[None]
                phase = int(core_enc.decrypt_lwe(cks.lwe_sk, lwe)[0])
                got = ((phase + (1 << 62)) >> 63) & 1
                # partial extraction takes the LOW n_bits, MSB-first
                want = (int(v) >> (n_bits - 1 - j)) & 1
                assert got == want, (n_bits, bin(int(v)), j, phase)

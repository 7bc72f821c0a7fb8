"""Programmable bootstrap: modulus switch -> blind rotation -> sample extract.

Reference call stack (ref: fft_impl/fft64/crypto/bootstrap.rs:242-364 and
fft_impl/common.rs:26-43).  TPU formulation: the accumulator batch [B, G, N]
is carried through a lax.scan over the n_in mask elements; each step performs
a per-ciphertext negacyclic monomial rotation (gather) and an exact external
product (int8 limb einsum on the MXU).  A zero mask element contributes an
exactly-zero update (ct1 = acc*X^0 - acc = 0), so the reference's skip-if-zero
branch needs no data-dependent control flow here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import decomposition, limbs as limbs_mod, polymul
from ..ops.polymul_ntt import PreparedBskNtt, external_product_ntt
from .keygen import PreparedBsk


def modulus_switch(x, N: int, bits: int = 64):
    """Round torus values onto Z_{2N}; may return 2N (== 0 as a rotation)
    (ref: fft_impl/common.rs:26-43 fast_pbs_modulus_switch)."""
    dt = jnp.uint64 if bits == 64 else jnp.uint32
    x = jnp.asarray(x, dt)
    log2n = N.bit_length() - 1
    out = x >> (bits - log2n - 2)
    out = out + jnp.asarray(1, dt)
    out = out >> 1
    return out.astype(jnp.int32)


def external_product_digits(acc_diff, bsk_step_limbs, base_log: int,
                            levels: int, bits: int = 64):
    """decompose(acc_diff [B,G,N]) and contract against one step's GGSW."""
    N = acc_diff.shape[-1]
    digits = decomposition.signed_decompose(acc_diff, base_log, levels, bits=bits)
    # [B, G, N, L] -> limbs [B, G, N, L, I] -> [B, I, L, J=G, N]
    dl = limbs_mod.digits_to_limbs(digits, base_log)
    dl = jnp.transpose(dl, (0, 4, 3, 1, 2))
    mat = polymul.ext_poly_to_limb_matrix(bsk_step_limbs, N)  # [L,J,O,M,N,N]
    return polymul.negacyclic_contract(dl, mat, bits=bits)  # [B, O, N]


def blind_rotate(bsk: PreparedBsk, lut, lwe):
    """lut [B, G, N] (or [G, N]) uint, lwe [B, n+1] uint -> [B, G, N].

    acc := lut * X^{-b~}; then for each mask element a_i:
      ct1 = acc * X^{a~_i} - acc;  acc += GGSW_i  (x)  ct1
    (ref: bootstrap.rs:242-331 blind_rotate_assign).
    """
    bits = bsk.bits
    N = bsk.polynomial_size
    if bits == 128:
        return _blind_rotate_u128(bsk, lut, lwe)
    dt = jnp.uint64 if bits == 64 else jnp.uint32
    lwe = jnp.asarray(lwe, dt)
    B = lwe.shape[0]
    lut = jnp.asarray(lut, dt)
    if lut.ndim == 2:
        lut = jnp.broadcast_to(lut[None], (B,) + lut.shape)

    b_hat = modulus_switch(lwe[:, -1], N, bits=bits)  # [B]
    acc = polymul.monomial_div(lut, b_hat[:, None], N, bits=bits)

    from ..ops.fused_pbs import PreparedBskFused, blind_rotate_fused

    if isinstance(bsk, PreparedBskFused):
        return blind_rotate_fused(bsk, lut, lwe)

    mask_t = jnp.transpose(lwe[:, :-1])  # [n, B]

    if isinstance(bsk, PreparedBskNtt):

        def step(acc, xs):
            a_raw, spec_i, shoup_i = xs
            a_hat = modulus_switch(a_raw, N, bits=bits)  # [B]
            rotated = polymul.monomial_mul(acc, a_hat[:, None], N, bits=bits)
            ct1 = rotated - acc
            delta = external_product_ntt(
                ct1, spec_i, shoup_i, bsk.base_log, bsk.levels, bits=bits,
                fwd_mats=bsk.fwd_mats, inv_mats=bsk.inv_mats,
            )
            return acc + delta, None

        acc, _ = jax.lax.scan(step, acc, (mask_t, bsk.spectra, bsk.shoup))
        return acc

    def step(acc, xs):
        a_raw, bsk_i = xs
        a_hat = modulus_switch(a_raw, N, bits=bits)  # [B]
        rotated = polymul.monomial_mul(acc, a_hat[:, None], N, bits=bits)
        ct1 = rotated - acc
        delta = external_product_digits(
            ct1, bsk_i, bsk.base_log, bsk.levels, bits=bits
        )
        return acc + delta, None

    acc, _ = jax.lax.scan(step, acc, (mask_t, bsk.ext_limbs))
    return acc


def _blind_rotate_u128(bsk: PreparedBskNtt, lut, lwe):
    """128-bit-torus blind rotation (the fft128 analog, ref: fft_impl/
    fft128_u128/ and lwe_programmable_bootstrapping.rs:1327 f128 PBS).

    lut [B, G, N, 2] (or [G, N, 2]) u64 pairs; lwe [B, n+1, 2] pairs.
    The modulus switch and gadget decomposition read only the high word;
    rotations/adds carry across the pair; the external product runs the
    same exact CRT-NTT with four 32-bit planes.
    """
    from ..ops import u128

    N = bsk.polynomial_size
    lwe = jnp.asarray(lwe, jnp.uint64)
    B = lwe.shape[0]
    lut = jnp.asarray(lut, jnp.uint64)
    if lut.ndim == 3:
        lut = jnp.broadcast_to(lut[None], (B,) + lut.shape)

    b_hat = modulus_switch(lwe[:, -1, 1], N, bits=64)  # high word only
    acc = u128.monomial_div(lut, b_hat[:, None], N)

    mask_t = jnp.moveaxis(lwe[:, :-1, :], 0, 1)  # [n, B, 2]

    def step(acc, xs):
        a_raw, spec_i, shoup_i = xs
        a_hat = modulus_switch(a_raw[:, 1], N, bits=64)
        rotated = u128.monomial_mul(acc, a_hat[:, None], N)
        ct1 = u128.sub(rotated, acc)
        delta = external_product_ntt(
            ct1, spec_i, shoup_i, bsk.base_log, bsk.levels, bits=128,
            fwd_mats=bsk.fwd_mats, inv_mats=bsk.inv_mats,
        )
        return u128.add(acc, delta), None

    acc, _ = jax.lax.scan(step, acc, (mask_t, bsk.spectra, bsk.shoup))
    return acc


def sample_extract_u128(glwe):
    """u128 sample extract: glwe [..., G, N, 2] -> lwe [..., k*N + 1, 2]."""
    from ..ops import u128

    mask = glwe[..., :-1, :, :]
    body = glwe[..., -1, 0, :]
    first = mask[..., :, 0:1, :]
    rest = u128.neg(mask[..., :, -1:0:-1, :])
    out_mask = jnp.concatenate([first, rest], axis=-2)
    out_mask = out_mask.reshape(*glwe.shape[:-3], -1, 2)
    return jnp.concatenate([out_mask, body[..., None, :]], axis=-2)


def sample_extract(glwe):
    """Extract the constant coefficient as an LWE ciphertext.

    glwe [..., G, N] -> lwe [..., k*N + 1]
    (ref: algorithms/glwe_sample_extraction.rs:91-147, nth = 0:
     out_mask[j*N] = mask[j, 0]; out_mask[j*N + i] = -mask[j, N-i] for i>0).
    """
    mask = glwe[..., :-1, :]
    body = glwe[..., -1, 0]
    first = mask[..., :, 0:1]
    rest = -mask[..., :, -1:0:-1]  # m[N-1], ..., m[1] at positions 1..N-1
    out_mask = jnp.concatenate([first, rest], axis=-1)
    out_mask = out_mask.reshape(*glwe.shape[:-2], -1)
    return jnp.concatenate([out_mask, body[..., None]], axis=-1)


def programmable_bootstrap(bsk: PreparedBsk, lut, lwe):
    """Classic PBS: [B, n+1] -> [B, k*N + 1] evaluating the LUT.
    (ref: algorithms/lwe_programmable_bootstrapping.rs:1017/1067;
    the bits=128 path is the f128 variant at :1327)."""
    if bsk.bits == 128:
        return sample_extract_u128(blind_rotate(bsk, lut, lwe))
    return sample_extract(blind_rotate(bsk, lut, lwe))


def keyswitch_then_pbs(ksk, bsk: PreparedBsk, lut, ct_big):
    """The shortint default pipeline (PBSOrder::KeyswitchBootstrap,
    ref: shortint/server_key/mod.rs:783-857)."""
    from .keyswitch import keyswitch

    ct_small = keyswitch(ksk, ct_big)
    return programmable_bootstrap(bsk, lut, ct_small)


def pbs_then_keyswitch(ksk, bsk: PreparedBsk, lut, ct_small):
    """PBSOrder::BootstrapKeyswitch (boolean DEFAULT_PARAMETERS path)."""
    from .keyswitch import keyswitch

    ct_big = programmable_bootstrap(bsk, lut, ct_small)
    return keyswitch(ksk, ct_big)

"""Multi-bit programmable bootstrap.

TPU re-design of the reference's multi-bit PBS
(ref: tfhe/src/core_crypto/algorithms/
 lwe_multi_bit_bootstrap_key_generation.rs:87-178 keygen +
 :401-427 combine_key_bits;
 lwe_multi_bit_programmable_bootstrapping.rs:18-84
 prepare_multi_bit_ggsw_mem_optimized, :295-460 blind rotation):

- The BSK groups `grouping_factor` (gf) secret bits; each group stores
  2^gf GGSW ciphertexts, the j-th encrypting the indicator
  prod_i (s_i XOR NOT j_i) — i.e. 1 exactly when the group's key bits
  match the bit pattern of j (MSB-first), else 0.
- Per blind-rotation step, the per-ciphertext combined GGSW
      G = GGSW_0 + sum_{j>=1} GGSW_j * X^{switch(<a_group, bits(j)>)}
  encrypts X^{switch(<a_group, s_group>)}, and the accumulator is replaced
  by the external product G (x) acc.  n/gf sequential steps instead of n.

TPU-native twist: the reference FFTs the combined GGSW on every step
(its produce/consume thread machinery exists just to hide that cost).
Here the group GGSWs are NTT-transformed **once at key preparation**, and
the per-step combination happens in the spectrum domain: the spectrum of
X^d is a gather from a psi-power table (see ops/ntt.py
psi_pow_tables_device), so each step costs one gather + fused
multiply-accumulate over the 2^gf group spectra — no key-side NTT at
all.  The sequential NTT work per bootstrap drops by the full factor gf.

Determinism: the reference offers a `deterministic_execution` toggle
because its thread pool can reorder the GGSW sums; on TPU the reduction
order is fixed by the program, so execution is always deterministic
(ref: shortint/server_key/mod.rs:104-276).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import decomposition, ntt, polymul
from ..ops.polymul_ntt import key_to_spectra
from ..prng.generators import EncryptionRandomGenerator
from .secret import LweSecretKey, GlweSecretKey, binary_ext_matrix, glwe_phase
from .pbs import modulus_switch, sample_extract


def combine_key_bits(bit_selector: int, key_bits) -> int:
    """Indicator that the group's key bits equal `bit_selector` (MSB-first)
    (ref: lwe_multi_bit_bootstrap_key_generation.rs:401-427)."""
    acc = 1
    gf = len(key_bits)
    for bit_idx, key_bit in enumerate(key_bits):
        bit_position = gf - (bit_idx + 1)
        inversion_bit = ((bit_selector >> bit_position) & 1) ^ 1
        acc *= int(key_bit) ^ inversion_bit
    return acc


def generate_multi_bit_bootstrap_key(
    lwe_sk: LweSecretKey,
    glwe_sk: GlweSecretKey,
    base_log: int,
    levels: int,
    noise_std: float,
    grouping_factor: int,
    gen: EncryptionRandomGenerator,
) -> np.ndarray:
    """Standard-domain multi-bit BSK:
    [n/gf groups, 2^gf, levels, G (row), G (poly), N] uint64.

    Each GGSW encrypts the constant combine_key_bits(j, s_group), generated
    through the same deterministic fork tree as the reference so key
    material is independent of generation order
    (ref: lwe_multi_bit_bootstrap_key_generation.rs:87-178)."""
    bits = glwe_sk.bits
    dt = np.uint64 if bits == 64 else np.uint32
    n = lwe_sk.lwe_dimension
    gf = grouping_factor
    if n % gf:
        raise ValueError(f"lwe_dimension {n} not divisible by grouping {gf}")
    n_groups = n // gf
    per = 1 << gf
    k, N = glwe_sk.bits_array.shape
    G = k + 1

    masks = np.empty((n_groups, per, levels, G, k, N), dtype=dt)
    noises = np.empty((n_groups, per, levels, G, N), dtype=dt)
    presets = np.zeros((n_groups, per, levels, G, N), dtype=dt)

    s_polys = glwe_sk.bits_array.astype(dt)  # [k, N]
    key_bits = lwe_sk.bits_array

    group_children = gen.fork_multi_bit_bsk_to_ggsw_group(
        n, levels, G, N, gf, bits=bits)
    with np.errstate(over="ignore"):
        for g, child in enumerate(group_children):
            group_bits = key_bits[g * gf:(g + 1) * gf]
            ggsw_children = child.fork_multi_bit_bsk_ggsw_group_to_ggsw(
                levels, G, N, gf, bits=bits)
            for j, genj in enumerate(ggsw_children):
                m = dt(combine_key_bits(j, group_bits))
                lev_children = genj.fork_ggsw_to_ggsw_levels(
                    levels, G, N, bits=bits)
                for lev, genl in enumerate(lev_children):
                    factor = (dt(0) - m) << dt(bits - base_log * (lev + 1))
                    row_children = genl.fork_ggsw_level_to_glwe(
                        G, N, bits=bits)
                    for r, genr in enumerate(row_children):
                        masks[g, j, lev, r] = genr.random_mask(
                            k * N, bits=bits).reshape(k, N)
                        noises[g, j, lev, r] = genr.random_noise(
                            N, noise_std, bits=bits)
                        if r < G - 1:
                            presets[g, j, lev, r] = s_polys[r] * factor
                        else:
                            presets[g, j, lev, r, 0] = dt(0) - factor

    smat = binary_ext_matrix(glwe_sk.bits_array, N)
    phase = np.asarray(
        glwe_phase(smat, jnp.asarray(masks.reshape(-1, k, N)), bits=bits)
    ).reshape(n_groups, per, levels, G, N)
    with np.errstate(over="ignore"):
        bodies = presets + phase + noises
    return np.concatenate([masks, bodies[..., None, :]], axis=4)


# ---------------------------------------------------------------------------
# device preparation + blind rotation
# ---------------------------------------------------------------------------


@dataclass
class PreparedMultiBitBskNtt:
    """Group GGSW spectra [n_groups, P, 2^gf, L, J=G, O=G, M=2, N] int32.
    DFT matrices ride along as pytree leaves (see PreparedBskNtt)."""

    spectra: Any
    fwd_mats: Any
    inv_mats: Any
    base_log: int
    levels: int
    glwe_size: int
    polynomial_size: int
    input_dim: int
    grouping_factor: int
    bits: int = 64


jax.tree_util.register_pytree_node(
    PreparedMultiBitBskNtt,
    lambda b: ((b.spectra, b.fwd_mats, b.inv_mats),
               (b.base_log, b.levels, b.glwe_size,
                b.polynomial_size, b.input_dim,
                b.grouping_factor, b.bits)),
    lambda meta, data: PreparedMultiBitBskNtt(data[0], data[1], data[2],
                                              *meta),
)


def prepare_multi_bit_bsk_ntt(mbsk: np.ndarray, base_log: int,
                              grouping_factor: int,
                              bits: int = 64) -> PreparedMultiBitBskNtt:
    """One-time NTT transform of every group GGSW — the reference's
    standard->Fourier conversion (ref: fft64/crypto/bootstrap.rs
    par_fill_with_forward_fourier on the multi-bit key), after which no
    key-side transform ever runs again."""
    n_groups, per, L, G, _, N = mbsk.shape
    spectra, _shoup = key_to_spectra(mbsk)  # [P, n_groups, per, L, J, O, M, N]
    spectra = jnp.moveaxis(spectra, 0, 1)   # [n_groups, P, ...]
    fwd, inv = ntt.dft_matrices_device(N)
    return PreparedMultiBitBskNtt(
        spectra=spectra,
        fwd_mats=fwd,
        inv_mats=inv,
        base_log=base_log,
        levels=L,
        glwe_size=G,
        polynomial_size=N,
        input_dim=n_groups * grouping_factor,
        grouping_factor=grouping_factor,
        bits=bits,
    )


def _selection_matrix(gf: int) -> np.ndarray:
    """[2^gf, gf] bit-selection matrix: row j holds bits of j MSB-first
    (ref: lwe_multi_bit_programmable_bootstrapping.rs:53-62)."""
    per = 1 << gf
    return np.array(
        [[(j >> (gf - 1 - i)) & 1 for i in range(gf)] for j in range(per)],
        dtype=np.uint64,
    )


def prepare_multi_bit_bsk_auto(mbsk: np.ndarray, base_log: int,
                               grouping_factor: int, bits: int = 64):
    """Pick the multi-bit BSK representation for the current backend: the
    fused Pallas layout on TPU, the jnp CRT-NTT layout elsewhere.  Both
    produce bit-identical blind rotations; TFHE_TPU_FUSED=0 forces jnp."""
    import os

    use_fused = (jax.default_backend() == "tpu"
                 and os.environ.get("TFHE_TPU_FUSED", "1") != "0")
    if use_fused:
        from ..ops.fused_multibit import prepare_multi_bit_bsk_fused

        return prepare_multi_bit_bsk_fused(mbsk, base_log, grouping_factor,
                                           bits=bits)
    return prepare_multi_bit_bsk_ntt(mbsk, base_log, grouping_factor,
                                     bits=bits)


def multi_bit_blind_rotate(mbsk, lut, lwe):
    """lut [B, G, N] or [G, N]; lwe [B, n+1] -> acc [B, G, N].

    lax.scan over n/gf groups; each step combines the group's GGSW spectra
    with monomial-spectrum gathers and replaces the accumulator by the
    external product (ref: lwe_multi_bit_programmable_bootstrapping.rs
    multi_bit_blind_rotate_assign).  Dispatches to the fused Pallas kernel
    when handed a PreparedMultiBitBskFused."""
    from ..ops.fused_multibit import (PreparedMultiBitBskFused,
                                      multi_bit_blind_rotate_fused)

    if isinstance(mbsk, PreparedMultiBitBskFused):
        return multi_bit_blind_rotate_fused(mbsk, lut, lwe)
    bits = mbsk.bits
    dt = jnp.uint64 if bits == 64 else jnp.uint32
    N = mbsk.polynomial_size
    G = mbsk.glwe_size
    L = mbsk.levels
    gf = mbsk.grouping_factor
    per = 1 << gf

    lwe = jnp.asarray(lwe, dt)
    B = lwe.shape[0]
    lut = jnp.asarray(lut, dt)
    if lut.ndim == 2:
        lut = jnp.broadcast_to(lut[None], (B,) + lut.shape)

    b_hat = modulus_switch(lwe[:, -1], N, bits=bits)
    acc = polymul.monomial_div(lut, b_hat[:, None], N, bits=bits)

    n_groups = mbsk.input_dim // gf
    # [n_groups, gf, B]
    mask_groups = jnp.transpose(
        lwe[:, :-1].reshape(B, n_groups, gf), (1, 2, 0))
    sel = jnp.asarray(_selection_matrix(gf), dt)  # [per, gf]
    psi_tabs = [jnp.asarray(t) for t in ntt.psi_pow_tables_device(N)]
    # natural DFT index held at each stored spectrum position (the
    # four-step transform stores X[k1 + R*k2] at position k1*C + k2)
    k_nat = jnp.asarray(ntt.spectrum_natural_k(N))
    two_k_plus_1 = 2 * k_nat + 1  # [N]

    def step(acc, xs):
        a_group, spec_group = xs  # [gf, B], [P, per, L, J, O, M, N]
        # switched degrees of every selection-subset sum: [per, B]
        sums = (sel[:, :, None] * a_group[None, :, :]).sum(axis=1, dtype=dt)
        d = modulus_switch(sums, N, bits=bits)  # [per, B] in [0, 2N]
        # monomial spectra: idx [per, B, N] into the [2N] psi tables
        idx = (d[..., None] * two_k_plus_1[None, None, :]) % (2 * N)

        # digits of the full accumulator: [B, G, N, L] -> [B, L*J, N]
        digits = decomposition.signed_decompose(
            acc, mbsk.base_log, L, bits=bits)
        dspec_list = ntt.forward_ntt(
            jnp.transpose(digits, (0, 3, 1, 2)).reshape(B, L * G, N),
            mats=mbsk.fwd_mats)

        prods = []
        for i, p in enumerate(ntt.PRIMES):
            mon = psi_tabs[i][idx]  # [per, B, N] balanced int32
            ks = spec_group[i]  # [per, L, J, O, M, N] balanced int32
            # combined spectrum per ciphertext: GGSW_0 + sum_j GGSW_j*mon_j
            # (all int32 VPU work; emulated int64 was ~10x slower)
            rot = ntt.mulmod_f32(
                ks[1:, None], mon[1:, :, None, None, None, None, :], p
            )  # [per-1, B, L, J, O, M, N]
            combined = ks[0][None] + rot.sum(axis=0, dtype=jnp.int32)
            combined = ntt.fold_p_f32(combined, p)  # |.| <= per * p/2 < 2^24
            a = dspec_list[i].reshape(B, L, G, 1, 1, N)
            r = ntt.mulmod_f32(a, combined, p)  # [B, L, J, O, M, N]
            s = r.reshape(B, L * G, G, 2, N).sum(
                axis=1, dtype=jnp.int32)  # [B, O, M, N]
            prods.append(ntt.fold_p_f32(s, p))

        coeffs = ntt.inverse_ntt(prods, mats=mbsk.inv_mats)
        conv = ntt.crt_to_u64_centered(coeffs)
        return ntt.planes_to_u64(conv), None

    acc, _ = jax.lax.scan(step, acc, (mask_groups, mbsk.spectra))
    return acc


def multi_bit_programmable_bootstrap(mbsk: PreparedMultiBitBskNtt, lut, lwe):
    """(ref: lwe_multi_bit_programmable_bootstrapping.rs
    multi_bit_programmable_bootstrap_lwe_ciphertext; always deterministic
    on TPU)"""
    return sample_extract(multi_bit_blind_rotate(mbsk, lut, lwe))


def keyswitch_then_multi_bit_pbs(ksk, mbsk: PreparedMultiBitBskNtt, lut,
                                 ct_big):
    from .keyswitch import keyswitch

    return multi_bit_programmable_bootstrap(
        mbsk, lut, keyswitch(ksk, ct_big))


def multi_bit_pbs_then_keyswitch(ksk, mbsk: PreparedMultiBitBskNtt, lut,
                                 ct_small):
    from .keyswitch import keyswitch

    return keyswitch(
        ksk, multi_bit_programmable_bootstrap(mbsk, lut, ct_small))

"""WoPBS: bit extraction, circuit bootstrapping, CMux tree, vertical packing.

TPU re-design of the reference's without-padding programmable bootstrap
(ref: tfhe/src/core_crypto/fft_impl/fft64/crypto/wop_pbs/mod.rs —
extract_bits :66, circuit_bootstrap_boolean :243, homomorphic shift,
cmux_tree_memory_optimized :468, vertical_packing :785; PFPKS keys:
algorithms/lwe_private_functional_packing_keyswitch_key_generation.rs and
lwe_wopbs.rs generate_circuit_bootstrap_lwe_pfpksk_list:80-160).

Everything is batched over the ciphertext axis: bit extraction runs the
existing fused keyswitch/PBS kernels per bit, the private functional
keyswitch is a single decompose->einsum contraction (MXU), and the CMux
tree / vertical-packing blind rotation reuse the exact CRT-NTT external
product with the per-input GGSWs produced by circuit bootstrapping.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import decomposition, ntt, polymul
from ..prng.generators import EncryptionRandomGenerator
from .secret import LweSecretKey, GlweSecretKey
from .encrypt import encrypt_glwe_assign
from .keygen import PreparedKsk
from .keyswitch import keyswitch
from .pbs import sample_extract, programmable_bootstrap

_U64 = np.uint64


# ---------------------------------------------------------------------------
# private functional packing keyswitch (ref: lwe_private_functional_
# packing_keyswitch_key_generation.rs + lwe_private_functional_packing_
# keyswitch.rs:21-85)
# ---------------------------------------------------------------------------


def generate_cbs_pfpksk_list(
    big_lwe_sk: LweSecretKey,
    glwe_sk: GlweSecretKey,
    base_log: int,
    levels: int,
    noise_std: float,
    gen: EncryptionRandomGenerator,
) -> np.ndarray:
    """[G, n_in+1, levels, G, N]: pfpksk o packs into GLWE row o.

    pfpksk o encrypts, for each input key bit s_i (body slot uses the
    constant -1) and level l, GLWE(poly_o * (-s_i) * 2^(64 - l*base)) where
    poly_o = glwe_sk polynomial o for o < k and -X^0 for the body slot
    (ref: lwe_wopbs.rs:80-160)."""
    bits = glwe_sk.bits
    n_in = big_lwe_sk.lwe_dimension
    k, N = glwe_sk.bits_array.shape
    G = k + 1

    polys = np.zeros((G, N), dtype=_U64)
    polys[:k] = glwe_sk.bits_array.astype(_U64)
    with np.errstate(over="ignore"):
        polys[k, 0] = _U64(0) - _U64(1)  # -X^0

    key_bits = np.concatenate([
        big_lwe_sk.bits_array.astype(_U64),
        np.array([(1 << 64) - 1], dtype=_U64),  # Scalar::MAX == -1
    ])

    out = np.empty((G, n_in + 1, levels, G, N), dtype=_U64)
    with np.errstate(over="ignore"):
        for o in range(G):
            for i in range(n_in + 1):
                # messages: level l encodes poly * (-1 * key_bit) * w_l
                msgs = np.empty((levels, N), dtype=_U64)
                for l in range(levels):
                    w = _U64(0) - (key_bits[i] << _U64(bits - base_log * (l + 1)))
                    msgs[l] = polys[o] * w
                out[o, i] = encrypt_glwe_assign(glwe_sk, msgs, noise_std, gen)
    return out


def pfpks_to_glwe(pfpksk: np.ndarray, lwe: Any, base_log: int,
                  levels: int) -> Any:
    """Batched private functional packing keyswitch.

    pfpksk: [n_in+1, levels, G, N]; lwe: [B, n_in+1] ->
    GLWE [B, G, N] = -sum_{i,l} digit_{i,l}(lwe_i) * K[i,l]
    (ref: lwe_private_functional_packing_keyswitch.rs:55-85) —
    one signed-decompose + einsum contraction on the MXU."""
    lwe = jnp.asarray(lwe, jnp.uint64)
    digits = decomposition.signed_decompose(lwe, base_log, levels)
    # digits [B, n_in+1, L] int32; key [n_in+1, L, G, N]
    kf = jax.lax.bitcast_convert_type(jnp.asarray(pfpksk, jnp.uint64),
                                      jnp.int64)
    acc = jnp.einsum(
        "bil,ilgn->bgn",
        digits.astype(jnp.int64),
        kf,  # int64 wrap-around == arithmetic mod 2^64
        preferred_element_type=jnp.int64,
    )
    return (jnp.zeros((), jnp.uint64)
            - jax.lax.bitcast_convert_type(acc, jnp.uint64))


# ---------------------------------------------------------------------------
# dynamic-key external product / cmux (NTT, exact)
# ---------------------------------------------------------------------------


def external_product_dynamic(ggsw_std: Any, glwe: Any, base_log: int,
                             levels: int) -> Any:
    """GGSW (x) GLWE with a per-batch standard-domain GGSW.

    ggsw_std: [B, L, J=G, O=G, N] u64; glwe: [B, G, N] u64 -> [B, G, N].
    The GGSW is fresh per input (it came out of circuit bootstrapping), so
    its forward NTT happens here; the digit side matches the classic path
    (ref: fft64/crypto/ggsw.rs add_external_product_assign)."""
    B, L, G, _, N = ggsw_std.shape
    digits = decomposition.signed_decompose(
        jnp.asarray(glwe, jnp.uint64), base_log, levels)  # [B, G, N, L]
    d = jnp.transpose(digits, (0, 3, 1, 2)).reshape(B, L * G, N)
    dspec = ntt.forward_ntt(d)

    kg = jnp.asarray(ggsw_std)
    planes = jnp.stack(
        [jax.lax.bitcast_convert_type(
            ((kg >> jnp.uint64(s)) & jnp.uint64(0xFFFFFFFF)).astype(
                jnp.uint32), jnp.int32)
         for s in ntt.TORUS_LIMB_SHIFTS],
        axis=-2,
    )  # [B, L, J, O, M, N]
    kspec = ntt.forward_ntt(planes, u32_bits=True)

    prods = []
    for i, p in enumerate(ntt.PRIMES):
        a = dspec[i].reshape(B, L, G, 1, 1, N)
        r = ntt.mulmod_f32(a, kspec[i], p)
        # int32 sum (|sum| <= L*G * p/2 < 2^24); default .sum() would run
        # in emulated int64 on the 32-bit VPU
        s = r.reshape(B, L * G, G, 2, N).sum(axis=1, dtype=jnp.int32)
        prods.append(ntt.fold_p_f32(s, p))
    coeffs = ntt.inverse_ntt(prods)
    conv = ntt.crt_to_u64_centered(coeffs)
    return ntt.planes_to_u64(conv)


def cmux_dynamic(ct0: Any, ct1: Any, ggsw_std: Any, base_log: int,
                 levels: int) -> Any:
    """ct0 + GGSW (x) (ct1 - ct0): selects ct1 when the GGSW encrypts 1
    (ref: fft64/crypto/ggsw.rs:766-777)."""
    diff = jnp.asarray(ct1, jnp.uint64) - jnp.asarray(ct0, jnp.uint64)
    return jnp.asarray(ct0, jnp.uint64) + external_product_dynamic(
        ggsw_std, diff, base_log, levels)


# ---------------------------------------------------------------------------
# bit extraction (ref: wop_pbs/mod.rs:66-231)
# ---------------------------------------------------------------------------


def extract_bits(bsk_prepared, ksk_prepared: PreparedKsk, lwe_in: Any,
                 delta_log: int, n_bits: int) -> np.ndarray:
    """[B, n_big+1] -> [B, n_bits, n_small+1], MSB first.

    Iteratively peels the least significant remaining bit: shift it onto
    the sign position, keyswitch down (that IS the output bit), then a
    negacyclic sign LUT recovers the bit's torus contribution which is
    subtracted before the next round.  Extraction runs LSB->MSB; the
    output list is reversed so index 0 holds the MSB, matching the
    reference's `.rev()` storage (ref: wop_pbs/mod.rs:128-130)."""
    bits = 64
    lwe = jnp.asarray(lwe_in, jnp.uint64)
    B = lwe.shape[0]
    outs = []
    for bit_idx in range(n_bits):
        # bit at position delta_log + bit_idx lands on the sign bit
        shift = bits - delta_log - bit_idx - 1
        shifted = lwe * jnp.uint64(1 << shift)
        ks = keyswitch(ksk_prepared, shifted)  # [B, n_small+1]
        outs.append(ks)
        if bit_idx == n_bits - 1:
            break
        # center the error, then sign-LUT at scale delta_log - 1 + bit_idx
        ks_c = ks.at[:, -1].add(jnp.uint64(1 << (bits - 2)))
        alpha = jnp.uint64(1 << (delta_log - 1 + bit_idx))
        N = bsk_prepared.polynomial_size
        G = bsk_prepared.glwe_size
        acc = jnp.zeros((G, N), jnp.uint64)
        acc = acc.at[-1, :].set(jnp.uint64(0) - alpha)
        pbs_out = programmable_bootstrap(bsk_prepared, acc, ks_c)
        pbs_out = pbs_out.at[:, -1].add(alpha)
        lwe = lwe - pbs_out
    return jnp.stack(outs[::-1], axis=1)


# ---------------------------------------------------------------------------
# circuit bootstrapping (ref: wop_pbs/mod.rs:243-360)
# ---------------------------------------------------------------------------


def homomorphic_shift_boolean(bsk_prepared, lwe_in: Any, level: int,
                              cbs_base_log: int, delta_log: int) -> Any:
    """LWE(b * 2^delta_log) -> LWE(b * 2^(64 - base*level)) via one
    negacyclic PBS (ref: wop_pbs/mod.rs homomorphic_shift_boolean)."""
    bits = 64
    lwe = jnp.asarray(lwe_in, jnp.uint64)
    shifted = lwe * jnp.uint64(1 << (bits - delta_log - 1))
    shifted = shifted.at[:, -1].add(jnp.uint64(1 << (bits - 2)))
    alpha = jnp.uint64(1 << (bits - 1 - cbs_base_log * level))
    N = bsk_prepared.polynomial_size
    G = bsk_prepared.glwe_size
    acc = jnp.zeros((G, N), jnp.uint64)
    acc = acc.at[-1, :].set(jnp.uint64(0) - alpha)
    out = programmable_bootstrap(bsk_prepared, acc, shifted)
    return out.at[:, -1].add(alpha)


@dataclass
class CircuitBootstrapper:
    """Bundles the keys + decomposition parameters of the CBS pipeline."""

    bsk_prepared: Any            # PBS key (wopbs params)
    ksk_prepared: PreparedKsk    # big -> small keyswitch
    pfpksk_list: Any             # [G, n_in+1, pfks_levels, G, N]
    pfks_base_log: int
    pfks_levels: int
    cbs_base_log: int
    cbs_levels: int

    def circuit_bootstrap(self, lwe_in: Any, delta_log: int) -> Any:
        """[B, n_small+1] bit LWEs -> GGSW [B, cbs_levels, G, G, N]."""
        G = self.pfpksk_list.shape[0]
        levels_out = []
        for level in range(1, self.cbs_levels + 1):
            shifted = homomorphic_shift_boolean(
                self.bsk_prepared, lwe_in, level, self.cbs_base_log,
                delta_log)  # [B, n_big+1]
            rows = [
                pfpks_to_glwe(self.pfpksk_list[o], shifted,
                              self.pfks_base_log, self.pfks_levels)
                for o in range(G)
            ]  # each [B, G, N]
            levels_out.append(jnp.stack(rows, axis=1))  # [B, G(row), G, N]
        return jnp.stack(levels_out, axis=1)  # [B, L, G, G, N]


# ---------------------------------------------------------------------------
# cmux tree + vertical packing (ref: wop_pbs/mod.rs:468-900)
# ---------------------------------------------------------------------------


def cmux_tree(luts: np.ndarray, ggsw_bits: List[Any], glwe_size: int,
              cbs_base_log: int, cbs_levels: int) -> Any:
    """luts [count, N] clear polynomials; ggsw_bits: list of
    [B, L, G, G, N] (MSB first), len == log2(count) -> GLWE [B, G, N].

    Layer 0 pairs adjacent LUTs under the LAST (least significant) tree
    bit, like the reference's memory-optimized tree consumed in reverse
    (ref: wop_pbs/mod.rs:468-560)."""
    B = ggsw_bits[0].shape[0]
    N = luts.shape[-1]
    layer = [
        jnp.broadcast_to(
            jnp.concatenate([
                jnp.zeros((glwe_size - 1, N), jnp.uint64), lut[None]
            ])[None], (B, glwe_size, N)).astype(jnp.uint64)
        for lut in jnp.asarray(luts, jnp.uint64)
    ]
    for ggsw in reversed(ggsw_bits):
        nxt = []
        for i in range(0, len(layer), 2):
            nxt.append(cmux_dynamic(layer[i], layer[i + 1], ggsw,
                                    cbs_base_log, cbs_levels))
        layer = nxt
    assert len(layer) == 1
    return layer[0]


def vp_blind_rotate(glwe: Any, ggsw_bits: List[Any], cbs_base_log: int,
                    cbs_levels: int) -> Any:
    """Blind rotation by the packed value of the remaining (LSB-side)
    GGSW bits: bit j rotates by 2^j via a cmux
    (ref: wop_pbs/mod.rs blind_rotate_assign:740-770)."""
    N = glwe.shape[-1]
    degree = 1
    acc = jnp.asarray(glwe, jnp.uint64)
    for ggsw in reversed(ggsw_bits):
        rotated = polymul.monomial_div(acc, jnp.int32(degree), N)
        acc = cmux_dynamic(acc, rotated, ggsw, cbs_base_log, cbs_levels)
        degree <<= 1
    return acc


def vertical_packing(luts: np.ndarray, ggsw_bits: List[Any],
                     glwe_size: int, cbs_base_log: int,
                     cbs_levels: int) -> Any:
    """luts [count, N], ggsw_bits MSB-first -> LWE [B, k*N+1] holding
    lut[extracted_value] (ref: wop_pbs/mod.rs vertical_packing:785-850).

    Non-power-of-2 LUT counts are zero-padded up to the tree width (the
    reference sizes the tree by ceil(log2) and treats missing leaves as
    zero polynomials, wop_pbs/mod.rs:468-560)."""
    count = luts.shape[0]
    if count > 1 and count & (count - 1):
        pow2 = 1 << (count - 1).bit_length()
        luts = np.concatenate(
            [np.asarray(luts),
             np.zeros((pow2 - count, luts.shape[-1]), np.uint64)])
        count = pow2
    log_count = max(count.bit_length() - 1, 0)
    n_tree = log_count if log_count <= len(ggsw_bits) else 0
    tree_bits = ggsw_bits[:n_tree]
    br_bits = ggsw_bits[n_tree:]
    if n_tree:
        glwe = cmux_tree(luts, tree_bits, glwe_size, cbs_base_log,
                         cbs_levels)
    else:
        B = ggsw_bits[0].shape[0]
        N = luts.shape[-1]
        glwe = jnp.broadcast_to(
            jnp.concatenate([
                jnp.zeros((glwe_size - 1, N), jnp.uint64),
                jnp.asarray(luts[0], jnp.uint64)[None]
            ])[None], (B, glwe_size, N)).astype(jnp.uint64)
    glwe = vp_blind_rotate(glwe, br_bits, cbs_base_log, cbs_levels)
    return sample_extract(glwe)

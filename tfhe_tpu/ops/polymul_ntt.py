"""GGSW external product in the CRT-NTT domain.

The performance replacement for `ops.polymul.negacyclic_contract`: instead
of materializing per-step negacyclic N x N key matrices (O(N^2) FLOPs and
HBM traffic per blind-rotation step), the bootstrap key is transformed
once into per-prime NTT spectra and every step is

    decompose -> forward NTT (MXU) -> Shoup pointwise + j-sum (VPU)
    -> inverse NTT (MXU) -> CRT recombine -> u64 torus update

mirroring the reference's Fourier-domain external product
(ref: tfhe/src/core_crypto/fft_impl/fft64/crypto/ggsw.rs:477-598) with an
exact integer transform instead of f64 FFTs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import decomposition, ntt, u128


def shoup_precompute_device(spec_list):
    """Per-prime balanced spectra -> Shoup companions round(b * 2^16 / p)."""
    outs = []
    for spec, p in zip(spec_list, ntt.PRIMES):
        b = spec.astype(jnp.int64)
        num = b << ntt._SHOUP_BETA
        # round-half-up division that matches np.round on .5 closely enough:
        # |b|*2^16/p is never exactly half-integral for odd p
        q = jnp.where(num >= 0, (num + p // 2) // p, -((-num + p // 2) // p))
        outs.append(q.astype(jnp.int32))
    return outs


def key_to_spectra(key_polys, bits: int = 64) -> Tuple[Any, Any]:
    """Torus key polynomials [..., N] -> (spectra, shoup) stacked
    [P, ..., M, N] with M planes (two 32-bit planes for the u64 torus, one
    for the u32 torus).

    Each per-plane convolution is exactly recoverable (< CRT/2).  The raw
    key ships to the device once; planes and spectra are computed there
    (the tunnel to the TPU is the bottleneck, not the transform).
    """
    import jax

    k = jnp.asarray(key_polys)
    if bits == 128:
        planes = u128.to_planes32(k)  # [..., 4, N] (key as [..., N, 2])
    elif bits == 64:
        planes = jnp.stack(
            [
                jax.lax.bitcast_convert_type(
                    ((k >> jnp.uint64(s)) & jnp.uint64(0xFFFFFFFF)).astype(
                        jnp.uint32), jnp.int32)
                for s in ntt.TORUS_LIMB_SHIFTS
            ],
            axis=-2,
        )  # [..., 2, N]
    else:
        planes = jax.lax.bitcast_convert_type(
            k.astype(jnp.uint32), jnp.int32)[..., None, :]  # [..., 1, N]
    spec_list = ntt.forward_ntt(planes, u32_bits=True)
    shoup_list = shoup_precompute_device(spec_list)
    return jnp.stack(spec_list), jnp.stack(shoup_list)


def external_product_ntt(acc_diff, spec_step, shoup_step, base_log: int,
                         levels: int, bits: int = 64, fwd_mats=None,
                         inv_mats=None):
    """One blind-rotation step's GGSW external product, exactly.

    acc_diff:  [B, G, N] uint  (ct1 = rotated - acc); at bits=128 the torus
               rides a trailing uint64 (lo, hi) pair axis: [B, G, N, 2]
    spec_step: [P, L, J=G, O=G, M, N] int32 balanced key spectra
    shoup_step: same shape, Shoup companions
    -> [B, O, N] uint delta to add to the accumulator ([B, O, N, 2] at 128).
    """
    if bits == 128:
        # digits depend only on the top base_log*levels (+1 rounding) bits,
        # which live entirely in the high word while blL <= 62 — every
        # realistic gadget (ref f128 PBS, lwe_programmable_bootstrapping.
        # rs:1327, uses blL well under 64)
        assert base_log * levels <= 62, "u128 decompose needs blL <= 62"
        B, G, N = acc_diff.shape[:-1]
        digits = decomposition.signed_decompose(
            acc_diff[..., 1], base_log, levels, bits=64)
    else:
        B, G, N = acc_diff.shape
        digits = decomposition.signed_decompose(
            acc_diff, base_log, levels, bits=bits
        )  # [B, G, N, L] int32
    M = spec_step.shape[-2]
    # fold (L, J): digits [B, L, J, N]; key [P, L*J, O, M, N]
    d = jnp.transpose(digits, (0, 3, 1, 2)).reshape(B, levels * G, N)
    dspec_list = ntt.forward_ntt(d, mats=fwd_mats)  # per prime [B, LJ, N]

    LJ = levels * G
    from . import pallas_kernels

    use_pallas = pallas_kernels.enabled()
    prods = []
    for i, p in enumerate(ntt.PRIMES):
        if use_pallas:
            ks = spec_step[i].reshape(LJ, G * M, N)
            ksh = shoup_step[i].reshape(LJ, G * M, N)
            s = pallas_kernels.shoup_mac(dspec_list[i], ks, ksh, p)
            prods.append(s.reshape(B, G, M, N))
            continue
        ks = spec_step[i].reshape(LJ, G, M, N)
        ksh = shoup_step[i].reshape(LJ, G, M, N)
        a = dspec_list[i][:, :, None, None, :]  # [B, LJ, 1, 1, N]
        r = ntt.shoup_mul(a, ks[None], ksh[None], p)
        # sum over LJ in int32 (|sum| <= LJ * p/2 < 2^24 for every parameter
        # set); the default dtype-less .sum() promotes to emulated int64 on
        # a chip with no 64-bit integer unit
        s = r.sum(axis=1, dtype=jnp.int32)  # [B, O, M, N]
        prods.append(ntt.fold_p_f32(s, p))

    coeffs = ntt.inverse_ntt(prods, mats=inv_mats)  # per prime [B, O, M, N]
    if bits == 128:
        pairs = ntt.crt_to_u128_centered(coeffs)  # [B, O, 4, N, 2]
        return u128.planes_to_u128(pairs)         # [B, O, N, 2]
    conv = ntt.crt_to_u64_centered(coeffs)  # [B, O, M, N] u64
    if bits == 64:
        return ntt.planes_to_u64(conv)  # [B, O, N]
    return conv[..., 0, :].astype(jnp.uint32)  # exact value mod 2^32


@dataclass
class PreparedBskNtt:
    """BSK in the CRT-NTT domain: spectra/shoup [n, P, L, J, O, M, N] int32.

    Carries the per-prime DFT limb matrices as pytree leaves so the NTT
    transforms consume them as jit *arguments* — at N=2048 the matrices are
    ~200MB and embedding them as graph constants multiplies compile time
    and executable size for every batch-shape variant."""

    spectra: Any
    shoup: Any
    fwd_mats: Any
    inv_mats: Any
    base_log: int
    levels: int
    glwe_size: int
    polynomial_size: int
    input_dim: int
    bits: int = 64


jax.tree_util.register_pytree_node(
    PreparedBskNtt,
    lambda b: ((b.spectra, b.shoup, b.fwd_mats, b.inv_mats),
               (b.base_log, b.levels, b.glwe_size, b.polynomial_size,
                b.input_dim, b.bits)),
    lambda meta, data: PreparedBskNtt(data[0], data[1], data[2], data[3],
                                      *meta),
)


def prepare_bsk_ntt(bsk_standard: np.ndarray, base_log: int,
                    bits: int = 64) -> PreparedBskNtt:
    """Standard-domain BSK [n, L, G(row j), G(poly o), N] u64 ->
    NTT-domain prepared key (the TPU analog of the reference's
    standard->Fourier conversion, ref: lwe_bootstrap_key_conversion.rs:21)."""
    if bits == 128:
        n, L, J, O, N = bsk_standard.shape[:-1]  # trailing u64 pair axis
    else:
        n, L, J, O, N = bsk_standard.shape
    spec, shoup = key_to_spectra(bsk_standard, bits=bits)  # [P,n,L,J,O,M,N]
    spec = jnp.moveaxis(spec, 0, 1)  # [n, P, L, J, O, 2, N]
    shoup = jnp.moveaxis(shoup, 0, 1)
    fwd, inv = ntt.dft_matrices_device(N)
    return PreparedBskNtt(
        spectra=spec, shoup=shoup, fwd_mats=fwd, inv_mats=inv,
        base_log=base_log, levels=L,
        glwe_size=J, polynomial_size=N, input_dim=n, bits=bits,
    )

"""Negacyclic polynomial algebra on the torus, MXU-formulated.

Polynomials live in Z_q[X]/(X^N + 1).  Multiplication by a fixed polynomial b
is a linear map whose matrix M[n, n'] = bext[(n' - n) mod 2N], where
bext = (b, -b) is the sign-extended double of b.  The hot path builds M's
int8 limb planes and contracts them against limb-decomposed digits on the
MXU (ref behavior: tfhe/src/core_crypto/fft_impl/fft64/crypto/ggsw.rs
external product; here exact integer arithmetic instead of f64 FFT).

Monomial multiplication (blind-rotation rotations) is a gather + sign flip
(ref: polynomial_algorithms.rs polynomial_wrapping_monic_monomial_{mul,div}).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from . import limbs as limbs_mod


@functools.lru_cache(maxsize=None)
def neg_gather_index(N: int) -> np.ndarray:
    """[N, N] int32 index map: M[n, n'] = bext[(n' - n) mod 2N]."""
    n = np.arange(N, dtype=np.int32)[:, None]
    np_ = np.arange(N, dtype=np.int32)[None, :]
    return ((np_ - n) % (2 * N)).astype(np.int32)


def extend_u64_poly(poly, bits: int = 64):
    """[..., N] torus poly -> [..., 2N] sign-extended double (b, -b), exact."""
    dt = jnp.uint64 if bits == 64 else jnp.uint32
    poly = jnp.asarray(poly, dt)
    zero = jnp.zeros((), dt)
    return jnp.concatenate([poly, zero - poly], axis=-1)


def ext_poly_to_limb_matrix(bext_limbs, N: int):
    """[..., M, 2N] int8 limb planes -> [..., M, N, N] negacyclic matrices."""
    idx = jnp.asarray(neg_gather_index(N))
    return bext_limbs[..., idx]


def monomial_mul(poly, degree, N: int, bits: int = 64):
    """poly * X^degree in Z_q[X]/(X^N+1); degree in [0, 2N] (2N == identity).

    poly: [..., N] uint; degree: int32 broadcastable against poly.shape[:-1].

    Barrel-rotator formulation: log2(2N) stages of STATIC negacyclic rolls
    (slice + negate + concat) gated by the bits of `degree`.  A
    take_along_axis gather here ran at ~17 ms per blind-rotation step on
    TPU (gathers serialize on the scalar unit); the barrel version is pure
    vector selects and runs ~100x faster.
    """
    dt = jnp.uint64 if bits == 64 else jnp.uint32
    poly = jnp.asarray(poly, dt)
    degree = jnp.asarray(degree, jnp.int32)
    deg = jnp.mod(degree, 2 * N)[..., None]  # [..., 1], static modulus
    zero = jnp.zeros((), dt)
    x = jnp.broadcast_to(poly, jnp.broadcast_shapes(
        poly.shape, deg.shape[:-1] + (N,)))
    nbits = (2 * N - 1).bit_length()
    for t in range(nbits):
        s = 1 << t
        if s >= N:
            rolled = zero - x  # X^N == -1
        else:
            rolled = jnp.concatenate(
                [zero - x[..., N - s:], x[..., : N - s]], axis=-1)
        bit = (deg >> t) & 1
        x = jnp.where(bit == 1, rolled, x)
    return x


def monomial_div(poly, degree, N: int, bits: int = 64):
    """poly * X^{-degree} == poly * X^{2N - degree}."""
    degree = jnp.asarray(degree, jnp.int32)
    return monomial_mul(poly, (2 * N - degree) % (2 * N), N, bits=bits)


def negacyclic_contract(dig_limbs, key_mat, bits: int = 64):
    """The external-product MXU contraction.

    dig_limbs: int8 [B, I, L, J, N]      (I operand limbs, L levels, J=G rows)
    key_mat:   int8 [L, J, O, M, N, N']  (negacyclic limb matrices of the key)
    returns:   uint [B, O, N']           sum over (L, J, N) recombined mod 2^bits
    """
    prod32 = jnp.einsum(
        "bixjn,xjomny->boimy",
        dig_limbs,
        key_mat,
        preferred_element_type=jnp.int32,
    )
    # prod32: [B, O, I, M, Y]; combine operand-limb axis 2 with key-limb axis 3
    return limbs_mod.combine_limb_products(prod32, limb_axes=(2, 3), bits=bits)

"""u128 torus arithmetic as uint64 (lo, hi) plane pairs.

JAX has no 128-bit integer dtype; the 128-bit torus (the reference's
fft128/fft128_u128 layer, ref: tfhe/src/core_crypto/fft_impl/fft128/math/
fft/mod.rs and fft128_u128/) is carried as a trailing axis of two uint64
words, little-endian: x[..., 0] = low 64 bits, x[..., 1] = high 64 bits.

Only the jnp CRT-NTT backend serves this width (the Pallas fused kernel is
reserved for the u32/u64 production paths); the NTT itself is unchanged —
a u128 polynomial is four 32-bit planes instead of two, and the CRT prime
pool already covers the per-plane convolution bound (which is independent
of the plane count).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U64 = jnp.uint64


def pack(lo, hi):
    return jnp.stack([jnp.asarray(lo, _U64), jnp.asarray(hi, _U64)], axis=-1)


def unpack(x):
    return x[..., 0], x[..., 1]


def add(a, b):
    """u128 pair + u128 pair (mod 2^128)."""
    alo, ahi = unpack(a)
    blo, bhi = unpack(b)
    lo = alo + blo
    carry = (lo < alo).astype(_U64)
    return pack(lo, ahi + bhi + carry)


def neg(a):
    """-a mod 2^128."""
    alo, ahi = unpack(a)
    lo = jnp.asarray(0, _U64) - alo
    borrow = (alo != 0).astype(_U64)
    return pack(lo, jnp.asarray(0, _U64) - ahi - borrow)


def sub(a, b):
    alo, ahi = unpack(a)
    blo, bhi = unpack(b)
    lo = alo - blo
    borrow = (alo < blo).astype(_U64)
    return pack(lo, ahi - bhi - borrow)


def to_planes32(x):
    """[..., N, 2] pairs -> [..., 4, N] int32 bit-pattern u32 planes
    (weights 2^0, 2^32, 2^64, 2^96) for the key-prep NTT."""
    import jax

    lo, hi = unpack(x)
    planes = []
    for w in (lo, hi):
        for s in (0, 32):
            planes.append(jax.lax.bitcast_convert_type(
                ((w >> jnp.uint64(s)) & jnp.uint64(0xFFFFFFFF)).astype(
                    jnp.uint32), jnp.int32))
    return jnp.stack(planes, axis=-2)


def shl(x, k: int):
    """u128 pair << k (static 0 <= k < 128)."""
    lo, hi = unpack(x)
    if k == 0:
        return x
    if k < 64:
        return pack(lo << jnp.uint64(k),
                    (hi << jnp.uint64(k)) | (lo >> jnp.uint64(64 - k)))
    return pack(jnp.zeros_like(lo), lo << jnp.uint64(k - 64))


def planes_to_u128(conv_pairs):
    """[..., 4, N, 2] u128 pair per 32-bit plane (weights 2^0..2^96) ->
    combined torus values [..., N, 2] mod 2^128."""
    out = conv_pairs[..., 0, :, :]
    for m in range(1, 4):
        out = add(out, shl(conv_pairs[..., m, :, :], 32 * m))
    return out


def monomial_mul(poly, degree, N: int):
    """poly * X^degree negacyclically, poly [..., N, 2] u64 pairs.

    Same barrel-rotator as ops.polymul.monomial_mul (static negacyclic
    rolls gated by degree bits), with the negation carried across the
    (lo, hi) pair."""
    poly = jnp.asarray(poly, _U64)
    degree = jnp.asarray(degree, jnp.int32)
    deg = jnp.mod(degree, 2 * N)[..., None, None]  # [..., 1, 1]
    x = jnp.broadcast_to(poly, jnp.broadcast_shapes(
        poly.shape, deg.shape[:-2] + (N, 2)))
    nbits = (2 * N - 1).bit_length()
    for t in range(nbits):
        s = 1 << t
        if s >= N:
            rolled = neg(x)
        else:
            wrap = neg(x[..., N - s:, :])
            rolled = jnp.concatenate([wrap, x[..., : N - s, :]], axis=-2)
        bit = (deg >> t) & 1
        x = jnp.where(bit == 1, rolled, x)
    return x


def monomial_div(poly, degree, N: int):
    degree = jnp.asarray(degree, jnp.int32)
    return monomial_mul(poly, (2 * N - degree) % (2 * N), N)


# -- host-side helpers (numpy / python ints) --------------------------------


def np_pack(vals) -> np.ndarray:
    """Iterable of python ints (mod 2^128) -> [n, 2] uint64 pairs."""
    vals = [int(v) % (1 << 128) for v in vals]
    lo = np.array([v & 0xFFFFFFFFFFFFFFFF for v in vals], dtype=np.uint64)
    hi = np.array([v >> 64 for v in vals], dtype=np.uint64)
    return np.stack([lo, hi], axis=-1)


def np_unpack(pairs: np.ndarray):
    """[..., 2] uint64 pairs -> array of python ints."""
    flat = pairs.reshape(-1, 2)
    return [int(l) | (int(h) << 64) for l, h in flat]

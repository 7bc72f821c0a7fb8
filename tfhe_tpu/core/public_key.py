"""LWE public keys: standard (zero-encryption list) and compact (Joye-style).

TPU equivalents of the reference's public-key encryption paths:
- standard: pk = list of encryptions of zero; encrypting = adding a random
  binary subset of them + the encoded plaintext on the body
  (ref: algorithms/lwe_public_key_generation.rs:17-41,
   lwe_encryption.rs:914-965 encrypt_lwe_ciphertext_with_public_key).
- compact: pk = single (mask, body) pair of length n related by a
  "semi-reverse" negacyclic convolution with the secret key; a batch of M
  messages compresses to ceil(M/n) masks + M bodies, expanded to full LWE
  ciphertexts by negacyclic monomial rotations
  (ref: algorithms/lwe_compact_public_key_generation.rs:15-51,
   lwe_encryption.rs:1684-1750 and :1837+ list variant,
   lwe_compact_ciphertext_list_expansion.rs:12-59).

The batched encryption path is one {0,1}-matrix x pk matmul — MXU-shaped —
but runs host-side in numpy since public-key encryption is a client
operation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..prng.generators import EncryptionRandomGenerator, SecretRandomGenerator
from .secret import LweSecretKey


def _np_udtype(bits: int):
    return np.uint64 if bits == 64 else np.uint32


def public_key_zero_encryption_count(lwe_size: int, bits: int = 64) -> int:
    """(n + 1) * log2(q) + 128
    (ref: shortint/engine/public_side.rs:13-20)."""
    return lwe_size * bits + 128


def negacyclic_mul(a: np.ndarray, b: np.ndarray, bits: int = 64) -> np.ndarray:
    """c = a * b in Z_q[X]/(X^n + 1), exact wrap-around arithmetic.

    Host-side O(n^2) scatter — used only during client-side key/ciphertext
    generation (ref: polynomial_algorithms.rs polynomial_wrapping_add_mul_assign)."""
    dt = _np_udtype(bits)
    a = np.asarray(a, dtype=dt)
    b = np.asarray(b, dtype=dt)
    n = a.shape[0]
    with np.errstate(over="ignore"):
        prod = np.multiply.outer(a, b)  # [n, n] wrapping
        i = np.arange(n)
        ij = i[:, None] + i[None, :]
        neg = ij >= n
        prod = np.where(neg, (dt(0) - prod), prod)
        acc = np.zeros(n, dtype=dt)
        np.add.at(acc, ij % n, prod)
    return acc


def semi_reverse_negacyclic_conv(lhs: np.ndarray, rhs: np.ndarray,
                                 bits: int = 64) -> np.ndarray:
    """out = lhs * phi_1(rhs) in X^n+1, phi_1 = coefficient reversal
    (ref: slice_algorithms.rs:621-659)."""
    return negacyclic_mul(lhs, np.asarray(rhs)[::-1], bits=bits)


def monic_monomial_mul(p: np.ndarray, degree: int, bits: int = 64) -> np.ndarray:
    """p * X^degree negacyclically (ref: polynomial_algorithms.rs
    polynomial_wrapping_monic_monomial_mul_assign)."""
    dt = _np_udtype(bits)
    p = np.asarray(p, dtype=dt)
    n = p.shape[0]
    d = degree % (2 * n)
    flip = d >= n
    d %= n
    with np.errstate(over="ignore"):
        out = np.concatenate([(dt(0) - p[n - d:]), p[:n - d]]) if d else p.copy()
        if flip:
            out = dt(0) - out
    return out


# ---------------------------------------------------------------------------
# standard public key
# ---------------------------------------------------------------------------


@dataclass
class LwePublicKey:
    """zero_encs [count, n+1]: encryptions of zero under the secret key."""

    zero_encs: np.ndarray
    bits: int = 64

    @property
    def lwe_dimension(self) -> int:
        return self.zero_encs.shape[-1] - 1

    @property
    def zero_encryption_count(self) -> int:
        return self.zero_encs.shape[0]


def generate_lwe_public_key(
    sk: LweSecretKey,
    zero_encryption_count: int,
    std: float,
    gen: EncryptionRandomGenerator,
) -> LwePublicKey:
    from .encrypt import encrypt_lwe

    zeros = np.zeros(zero_encryption_count, dtype=_np_udtype(sk.bits))
    return LwePublicKey(
        zero_encs=encrypt_lwe(sk, zeros, std, gen), bits=sk.bits
    )


def encrypt_lwe_with_public_key(
    pk: LwePublicKey,
    encoded: np.ndarray,
    secret_gen: SecretRandomGenerator,
) -> np.ndarray:
    """Batch public-key encryption: [B] encoded -> [B, n+1].

    Each ciphertext sums a fresh uniform-binary subset of the zero
    encryptions (one {0,1}-matrix x pk matmul for the whole batch), then adds
    the encoded plaintext to the body
    (ref: lwe_encryption.rs:914-965)."""
    dt = _np_udtype(pk.bits)
    encoded = np.asarray(encoded, dtype=dt)
    B = encoded.shape[0]
    count = pk.zero_encryption_count
    choice = np.stack([
        secret_gen.random_binary(count) for _ in range(B)
    ]).astype(dt)
    with np.errstate(over="ignore"):
        # [B, count] x [count, n+1] with uint64 wrap-around
        out = (choice[:, :, None] * pk.zero_encs[None, :, :]).sum(
            axis=1, dtype=dt)
        out[:, -1] += encoded
    return out


@dataclass
class SeededLwePublicKey:
    """Compressed standard PK: bodies only + the public mask seed
    (ref: entities/seeded_lwe_public_key.rs,
     algorithms/seeded_lwe_public_key_decompression.rs)."""

    bodies: np.ndarray  # [count]
    mask_seed: int
    lwe_dimension: int
    bits: int = 64


def generate_seeded_lwe_public_key(
    sk: LweSecretKey,
    zero_encryption_count: int,
    std: float,
    seeder,
) -> SeededLwePublicKey:
    from ..core.seeded import encrypt_seeded_lwe

    mask_seed = seeder.seed()
    gen = EncryptionRandomGenerator(mask_seed, seeder)
    zeros = np.zeros(zero_encryption_count, dtype=_np_udtype(sk.bits))
    seeded = encrypt_seeded_lwe(sk, zeros, std, mask_seed, gen)
    return SeededLwePublicKey(
        bodies=seeded.bodies, mask_seed=mask_seed,
        lwe_dimension=sk.lwe_dimension, bits=sk.bits,
    )


def decompress_lwe_public_key(seeded: SeededLwePublicKey) -> LwePublicKey:
    from ..core.seeded import SeededLweBatch, decompress_seeded_lwe

    full = decompress_seeded_lwe(SeededLweBatch(
        bodies=seeded.bodies, mask_seed=seeded.mask_seed,
        lwe_dimension=seeded.lwe_dimension, bits=seeded.bits,
    ))
    return LwePublicKey(zero_encs=full, bits=seeded.bits)


# ---------------------------------------------------------------------------
# compact public key
# ---------------------------------------------------------------------------


@dataclass
class LweCompactPublicKey:
    """mask [n], body [n]: body = semi_rev_conv(mask, s) + e
    (ref: entities/lwe_compact_public_key.rs)."""

    mask: np.ndarray
    body: np.ndarray
    bits: int = 64

    @property
    def lwe_dimension(self) -> int:
        return self.mask.shape[0]


@dataclass
class CompactLweCiphertextList:
    """ceil(M/n) masks + M bodies (ref: entities/lwe_compact_ciphertext_list.rs)."""

    masks: np.ndarray   # [n_bins, n]
    bodies: np.ndarray  # [M]
    bits: int = 64

    @property
    def lwe_dimension(self) -> int:
        return self.masks.shape[-1]

    def __len__(self) -> int:
        return self.bodies.shape[0]


def generate_lwe_compact_public_key(
    sk: LweSecretKey,
    std: float,
    gen: EncryptionRandomGenerator,
) -> LweCompactPublicKey:
    """(ref: lwe_compact_public_key_generation.rs:15-51)"""
    bits = sk.bits
    n = sk.lwe_dimension
    if n & (n - 1):
        raise ValueError("compact public key needs a power-of-two LWE dimension")
    mask = gen.random_mask(n, bits=bits)
    with np.errstate(over="ignore"):
        body = semi_reverse_negacyclic_conv(mask, sk.bits_array, bits=bits)
        body = body + gen.random_noise(n, std, bits=bits)
    return LweCompactPublicKey(mask=mask, body=body, bits=bits)


@dataclass
class SeededLweCompactPublicKey:
    """Compressed compact PK: the mask regenerates from the seed, so only
    the body ships (ref: entities/seeded_lwe_compact_public_key.rs,
     lwe_compact_public_key_generation.rs:80-140 seeded variant)."""

    body: np.ndarray
    mask_seed: int
    bits: int = 64


def generate_seeded_lwe_compact_public_key(
    sk: LweSecretKey,
    std: float,
    seeder,
) -> SeededLweCompactPublicKey:
    mask_seed = seeder.seed()
    gen = EncryptionRandomGenerator(mask_seed, seeder)
    pk = generate_lwe_compact_public_key(sk, std, gen)
    return SeededLweCompactPublicKey(body=pk.body, mask_seed=mask_seed,
                                     bits=sk.bits)


def decompress_lwe_compact_public_key(
    seeded: SeededLweCompactPublicKey,
) -> LweCompactPublicKey:
    from ..prng import sampling
    from ..prng.stream import AesCtrStream

    n = seeded.body.shape[0]
    mask = sampling.uniform_torus(AesCtrStream(seeded.mask_seed), n,
                                  bits=seeded.bits)
    return LweCompactPublicKey(mask=mask, body=seeded.body,
                               bits=seeded.bits)


def encrypt_compact_lwe_list(
    pk: LweCompactPublicKey,
    encoded: np.ndarray,
    mask_std: float,
    body_std: float,
    secret_gen: SecretRandomGenerator,
    enc_gen: EncryptionRandomGenerator,
) -> CompactLweCiphertextList:
    """[M] encoded -> compact list with ceil(M/n) mask bins
    (ref: lwe_encryption.rs encrypt_lwe_compact_ciphertext_list_with_compact_public_key)."""
    bits = pk.bits
    dt = _np_udtype(bits)
    encoded = np.asarray(encoded, dtype=dt)
    M = encoded.shape[0]
    n = pk.lwe_dimension
    n_bins = -(-M // n)
    # one full-length binary vector per bin; slots beyond M in the last bin
    # still contribute to the mask convolution, matching the reference
    r = secret_gen.random_binary(n_bins * n).astype(dt).reshape(n_bins, n)
    masks = np.empty((n_bins, n), dtype=dt)
    bodies = np.empty(M, dtype=dt)
    with np.errstate(over="ignore"):
        for j in range(n_bins):
            conv_mask = semi_reverse_negacyclic_conv(pk.mask, r[j], bits=bits)
            masks[j] = conv_mask + enc_gen.random_noise(n, mask_std, bits=bits)
            conv_body = semi_reverse_negacyclic_conv(pk.body, r[j], bits=bits)
            lo, hi = j * n, min((j + 1) * n, M)
            cnt = hi - lo
            bodies[lo:hi] = (
                conv_body[:cnt]
                + enc_gen.random_noise(cnt, body_std, bits=bits)
                + encoded[lo:hi]
            )
    return CompactLweCiphertextList(masks=masks, bodies=bodies, bits=bits)


def expand_compact_lwe_list(compact: CompactLweCiphertextList) -> np.ndarray:
    """Compact list -> full [M, n+1] LWE ciphertexts: slot i of a bin takes
    the bin mask rotated by X^(n-(i+1))
    (ref: lwe_compact_ciphertext_list_expansion.rs:12-59)."""
    bits = compact.bits
    dt = _np_udtype(bits)
    n = compact.lwe_dimension
    M = len(compact)
    out = np.empty((M, n + 1), dtype=dt)
    for i in range(M):
        b, idx = divmod(i, n)
        out[i, :-1] = monic_monomial_mul(
            compact.masks[b], n - (idx + 1), bits=bits)
        out[i, -1] = compact.bodies[i]
    return out

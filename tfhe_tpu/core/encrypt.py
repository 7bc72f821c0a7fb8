"""LWE/GLWE encryption and decryption (client side, host numpy).

(ref: tfhe/src/core_crypto/algorithms/{lwe_encryption.rs, glwe_encryption.rs}:
 body = <mask, s> + encoded + noise; native modulus only.)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..prng.generators import EncryptionRandomGenerator
from .secret import LweSecretKey, GlweSecretKey, binary_ext_matrix, glwe_phase


def _np_udtype(bits: int):
    return np.uint64 if bits == 64 else np.uint32


def encrypt_lwe(
    sk: LweSecretKey,
    encoded: np.ndarray,
    std: float,
    gen: EncryptionRandomGenerator,
) -> np.ndarray:
    """Encrypt a batch of encoded plaintexts: [...,] -> [..., n+1].

    Mask and noise byte order matches per-ciphertext sequential encryption
    (mask rows consumed ciphertext-by-ciphertext)."""
    bits = sk.bits
    dt = _np_udtype(bits)
    encoded = np.asarray(encoded, dtype=dt)
    shape = encoded.shape
    B = int(np.prod(shape, dtype=np.int64)) if shape else 1
    n = sk.lwe_dimension
    mask = gen.random_mask(B * n, bits=bits).reshape(B, n)
    noise = gen.random_noise(B, std, bits=bits)
    s = sk.bits_array.astype(dt)
    with np.errstate(over="ignore"):
        body = (mask * s[None, :]).sum(axis=-1, dtype=dt)
        body = body + encoded.reshape(B) + noise
    out = np.concatenate([mask, body[:, None]], axis=-1)
    return out.reshape(*shape, n + 1)


def decrypt_lwe(sk: LweSecretKey, ct: np.ndarray) -> np.ndarray:
    """Phase(s) of ct [..., n+1] -> [...,] (still noisy/encoded)."""
    dt = _np_udtype(sk.bits)
    ct = np.asarray(ct, dtype=dt)
    s = sk.bits_array.astype(dt)
    with np.errstate(over="ignore"):
        return ct[..., -1] - (ct[..., :-1] * s).sum(axis=-1, dtype=dt)


def trivial_lwe(encoded: np.ndarray, lwe_dimension: int, bits: int = 64) -> np.ndarray:
    """(0, ..., 0, encoded) — no key, no noise (ref: lwe_encryption.rs
    allocate_and_trivially_encrypt_new_lwe_ciphertext)."""
    dt = _np_udtype(bits)
    encoded = np.asarray(encoded, dtype=dt)
    out = np.zeros(encoded.shape + (lwe_dimension + 1,), dtype=dt)
    out[..., -1] = encoded
    return out


def encrypt_glwe_assign(
    sk: GlweSecretKey,
    body_preset: np.ndarray,
    std: float,
    gen: EncryptionRandomGenerator,
) -> np.ndarray:
    """GLWE-encrypt with plaintext already added into the body polynomial(s).

    body_preset: [..., N]  ->  returns [..., k+1, N]
    (ref: glwe_encryption.rs encrypt_glwe_ciphertext_assign)."""
    bits = sk.bits
    dt = _np_udtype(bits)
    k, N = sk.bits_array.shape
    body_preset = np.asarray(body_preset, dtype=dt)
    shape = body_preset.shape[:-1]
    B = int(np.prod(shape, dtype=np.int64)) if shape else 1
    mask = gen.random_mask(B * k * N, bits=bits).reshape(B, k, N)
    noise = gen.random_noise(B * N, std, bits=bits).reshape(B, N)
    smat = binary_ext_matrix(sk.bits_array, N)
    phase = np.asarray(glwe_phase(smat, jnp.asarray(mask), bits=bits))
    with np.errstate(over="ignore"):
        body = body_preset.reshape(B, N) + phase + noise
    out = np.concatenate([mask, body[:, None, :]], axis=1)
    return out.reshape(*shape, k + 1, N)


def decrypt_glwe(sk: GlweSecretKey, ct: np.ndarray) -> np.ndarray:
    """Phase polynomial(s): [..., k+1, N] -> [..., N]."""
    bits = sk.bits
    k, N = sk.bits_array.shape
    ct = np.asarray(ct, dtype=_np_udtype(bits))
    smat = binary_ext_matrix(sk.bits_array, N)
    phase = np.asarray(glwe_phase(smat, jnp.asarray(ct[..., :-1, :]), bits=bits))
    with np.errstate(over="ignore"):
        return ct[..., -1, :] - phase

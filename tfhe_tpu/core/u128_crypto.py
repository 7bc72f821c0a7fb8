"""128-bit-torus client-side crypto (the fft128_u128 layer's host half).

LWE/GLWE encryption, decryption, and BSK generation over the u128 torus
(ref: tfhe/src/core_crypto/fft_impl/fft128_u128/ and the u128
CiphertextModulus paths of lwe_encryption.rs / ggsw_encryption.rs).

Host arithmetic runs on exact Python ints (numpy has no uint128 either);
device-facing arrays use the uint64 (lo, hi) pair convention of
ops/u128.py.  PRNG byte consumption matches the u64 layouts scaled to
16-byte coefficients (prng/generators mask_bytes_per_coef(128)).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..ops.u128 import np_pack, np_unpack
from ..prng.generators import EncryptionRandomGenerator, SecretRandomGenerator

MOD = 1 << 128


def _mask_ints(gen: EncryptionRandomGenerator, count: int) -> List[int]:
    return np_unpack(gen.random_mask(count, bits=128))


def _noise_ints(gen: EncryptionRandomGenerator, count: int,
                std: float) -> List[int]:
    return np_unpack(gen.random_noise(count, std, bits=128))


def _negacyclic_mul_binary(mask_ints: List[int], s_bits: np.ndarray,
                           N: int) -> List[int]:
    """One polynomial product mask * s mod (X^N + 1, 2^128), s binary."""
    out = [0] * N
    nz = np.nonzero(s_bits)[0]
    for k in nz:
        k = int(k)
        for i in range(N):
            j = i + k
            if j < N:
                out[j] = (out[j] + mask_ints[i]) % MOD
            else:
                out[j - N] = (out[j - N] - mask_ints[i]) % MOD
    return out


def generate_binary_lwe_secret_key_u128(n: int, gen: SecretRandomGenerator
                                        ) -> np.ndarray:
    return gen.random_binary(n)


def encrypt_lwe_u128(s_bits: np.ndarray, encoded: List[int], std: float,
                     gen: EncryptionRandomGenerator) -> np.ndarray:
    """[B] python-int plaintexts -> [B, n+1, 2] uint64 pairs."""
    n = len(s_bits)
    nz = [int(i) for i in np.nonzero(s_bits)[0]]
    rows = []
    for enc in encoded:
        mask = _mask_ints(gen, n)
        noise = _noise_ints(gen, 1, std)[0]
        body = (sum(mask[i] for i in nz) + int(enc) + noise) % MOD
        rows.append(np_pack(mask + [body]))
    return np.stack(rows)


def decrypt_lwe_u128(s_bits: np.ndarray, ct: np.ndarray) -> List[int]:
    """[B, n+1, 2] pairs -> [B] python-int phases."""
    nz = [int(i) for i in np.nonzero(s_bits)[0]]
    out = []
    for row in ct:
        vals = np_unpack(row)
        out.append((vals[-1] - sum(vals[i] for i in nz)) % MOD)
    return out


def encrypt_glwe_preset_u128(glwe_bits: np.ndarray, body_preset: List[int],
                             std: float, gen: EncryptionRandomGenerator
                             ) -> np.ndarray:
    """One GLWE with the plaintext already in the body: [k+1, N, 2]."""
    k, N = glwe_bits.shape
    mask = [_mask_ints(gen, N) for _ in range(k)]
    noise = _noise_ints(gen, N, std)
    body = list(body_preset)
    for r in range(k):
        phase = _negacyclic_mul_binary(mask[r], glwe_bits[r], N)
        body = [(b + ph) % MOD for b, ph in zip(body, phase)]
    body = [(b + e) % MOD for b, e in zip(body, noise)]
    return np.stack([np_pack(m) for m in mask] + [np_pack(body)])


def decrypt_glwe_u128(glwe_bits: np.ndarray, ct: np.ndarray) -> List[int]:
    """[k+1, N, 2] -> [N] python-int phase polynomial."""
    k, N = glwe_bits.shape
    body = np_unpack(ct[-1])
    for r in range(k):
        mask = np_unpack(ct[r])
        phase = _negacyclic_mul_binary(mask, glwe_bits[r], N)
        body = [(b - ph) % MOD for b, ph in zip(body, phase)]
    return body


def generate_bootstrap_key_u128(lwe_bits: np.ndarray, glwe_bits: np.ndarray,
                                base_log: int, levels: int, std: float,
                                gen: EncryptionRandomGenerator) -> np.ndarray:
    """Standard-domain u128 BSK: [n, levels, G, G, N, 2] uint64 pairs.

    Same GGSW layout and fork tree as core.keygen.generate_bootstrap_key
    (ref: ggsw_encryption.rs:72-151), at 128-bit factor scaling."""
    n = len(lwe_bits)
    k, N = glwe_bits.shape
    G = k + 1
    out = np.empty((n, levels, G, G, N, 2), dtype=np.uint64)
    ggsw_children = gen.fork_bsk_to_ggsw(n, levels, G, N, bits=128)
    for i, child in enumerate(ggsw_children):
        m = int(lwe_bits[i])
        lev_children = child.fork_ggsw_to_ggsw_levels(levels, G, N, bits=128)
        for j, genl in enumerate(lev_children):
            factor = (-m << (128 - base_log * (j + 1))) % MOD
            row_children = genl.fork_ggsw_level_to_glwe(G, N, bits=128)
            for r, genr in enumerate(row_children):
                preset = [0] * N
                if r < G - 1:
                    for t in range(N):
                        if glwe_bits[r, t]:
                            preset[t] = factor
                else:
                    preset[0] = (-factor) % MOD
                out[i, j, r] = encrypt_glwe_preset_u128(
                    glwe_bits, preset, std, genr)
    return out

"""Seeded (compressed) ciphertexts and keys: store (mask_seed, bodies) only.

TPU equivalent of the reference's ``Seeded*`` entity twins
(ref: tfhe/src/core_crypto/entities/seeded_lwe_ciphertext.rs,
seeded_lwe_bootstrap_key.rs:201, algorithms/seeded_*_decompression.rs and
lwe_encryption.rs encrypt_seeded_lwe_ciphertext_* family): the uniformly
random mask of every ciphertext is drawn from a *public* AES-CTR stream
identified by a ``CompressionSeed``, so serialized objects only need the
bodies — masks are regenerated on decompression.  Compression ratio is
(n+1)/1 for LWE ciphertexts and (k+1)/1 for GLWE-shaped keys.

Why decompression is one contiguous CSPRNG sweep: the reference's fork tree
partitions the front of the parent stream into contiguous child windows, and
every mask child consumes exactly its byte budget
(ref: concrete-csprng/src/generators/aes_ctr/generic.rs try_fork;
commons/generators/encryption/mask_random_generator.rs:347-420).  A fresh
root stream therefore emits exactly the concatenated masks in generation
order, which on TPU is a single vectorizable AES-CTR kernel call rather than
a tree walk.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

from ..prng import sampling
from ..prng.stream import AesCtrStream
from ..prng.generators import EncryptionRandomGenerator
from .secret import LweSecretKey, GlweSecretKey
from . import keygen as keygen_mod


def _np_udtype(bits: int):
    return np.uint64 if bits == 64 else np.uint32


def _regen_mask(mask_seed: int, n_words: int, bits: int) -> np.ndarray:
    """The full mask region of a fresh compression stream, in one sweep."""
    return sampling.uniform_torus(AesCtrStream(mask_seed), n_words, bits=bits)


# ---------------------------------------------------------------------------
# seeded LWE ciphertext batches
# ---------------------------------------------------------------------------


@dataclass
class SeededLweBatch:
    """Compressed LWE batch: bodies [B] + the public mask seed.

    (ref: entities/seeded_lwe_ciphertext_list.rs)"""

    bodies: np.ndarray
    mask_seed: int
    lwe_dimension: int
    bits: int = 64


def encrypt_seeded_lwe(
    sk: LweSecretKey,
    encoded: np.ndarray,
    std: float,
    mask_seed: int,
    noise_gen: EncryptionRandomGenerator,
) -> SeededLweBatch:
    """Seeded encryption: mask from the public seed, noise from the secret
    generator; only bodies are kept
    (ref: lwe_encryption.rs encrypt_seeded_lwe_ciphertext_list)."""
    bits = sk.bits
    dt = _np_udtype(bits)
    encoded = np.asarray(encoded, dtype=dt)
    B = encoded.shape[0]
    n = sk.lwe_dimension
    mask = _regen_mask(mask_seed, B * n, bits).reshape(B, n)
    noise = noise_gen.random_noise(B, std, bits=bits)
    s = sk.bits_array.astype(dt)
    with np.errstate(over="ignore"):
        bodies = (mask * s[None, :]).sum(axis=-1, dtype=dt) + encoded + noise
    return SeededLweBatch(bodies=bodies, mask_seed=mask_seed,
                          lwe_dimension=n, bits=bits)


def decompress_seeded_lwe(seeded: SeededLweBatch) -> np.ndarray:
    """[B] bodies -> full [B, n+1] ciphertexts
    (ref: algorithms/seeded_lwe_ciphertext_list_decompression.rs)."""
    B = seeded.bodies.shape[0]
    n = seeded.lwe_dimension
    mask = _regen_mask(seeded.mask_seed, B * n, seeded.bits).reshape(B, n)
    return np.concatenate([mask, seeded.bodies[:, None]], axis=-1)


# ---------------------------------------------------------------------------
# seeded bootstrap / keyswitch keys
# ---------------------------------------------------------------------------


@dataclass
class SeededBootstrapKey:
    """bodies [n, levels, G, N] — the body polynomial of every GGSW row
    (ref: entities/seeded_lwe_bootstrap_key.rs)."""

    bodies: np.ndarray
    mask_seed: int
    glwe_dimension: int
    base_log: int
    bits: int = 64


@dataclass
class SeededKeyswitchKey:
    """bodies [n_in, levels] (ref: entities/seeded_lwe_keyswitch_key.rs)."""

    bodies: np.ndarray
    mask_seed: int
    out_dim: int
    base_log: int
    bits: int = 64


def compress_bootstrap_key(bsk: np.ndarray, mask_seed: int, base_log: int,
                           bits: int = 64) -> SeededBootstrapKey:
    """Strip the masks of a BSK generated under ``mask_seed``.

    The BSK must have been produced by ``generate_bootstrap_key`` with an
    EncryptionRandomGenerator whose mask stream was a *fresh* stream seeded
    with ``mask_seed`` (the generation-order masks then occupy the front of
    that stream)."""
    k = bsk.shape[2] - 1
    return SeededBootstrapKey(
        bodies=np.ascontiguousarray(bsk[:, :, :, k, :]),
        mask_seed=mask_seed,
        glwe_dimension=k,
        base_log=base_log,
        bits=bits,
    )


def decompress_bootstrap_key(seeded: SeededBootstrapKey) -> np.ndarray:
    """Rebuild the full [n, L, G, G, N] BSK
    (ref: algorithms/seeded_lwe_bootstrap_key_decompression.rs)."""
    n, L, G, N = seeded.bodies.shape
    k = seeded.glwe_dimension
    masks = _regen_mask(seeded.mask_seed, n * L * G * k * N, seeded.bits)
    masks = masks.reshape(n, L, G, k, N)
    return np.concatenate([masks, seeded.bodies[:, :, :, None, :]], axis=3)


def compress_keyswitch_key(ksk: np.ndarray, mask_seed: int, base_log: int,
                           bits: int = 64) -> SeededKeyswitchKey:
    return SeededKeyswitchKey(
        bodies=np.ascontiguousarray(ksk[..., -1]),
        mask_seed=mask_seed,
        out_dim=ksk.shape[-1] - 1,
        base_log=base_log,
        bits=bits,
    )


def decompress_keyswitch_key(seeded: SeededKeyswitchKey) -> np.ndarray:
    """Rebuild the full [n_in, levels, n_out+1] KSK
    (ref: algorithms/seeded_lwe_keyswitch_key_decompression.rs)."""
    n_in, levels = seeded.bodies.shape
    n_out = seeded.out_dim
    masks = _regen_mask(seeded.mask_seed, n_in * levels * n_out, seeded.bits)
    masks = masks.reshape(n_in, levels, n_out)
    return np.concatenate([masks, seeded.bodies[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# seeded key *generation* (compression-aware keygen)
# ---------------------------------------------------------------------------


def generate_seeded_server_key_material(
    lwe_sk: LweSecretKey,
    glwe_sk: GlweSecretKey,
    pbs_base_log: int,
    pbs_level: int,
    glwe_std: float,
    big_sk: LweSecretKey,
    ks_base_log: int,
    ks_level: int,
    lwe_std: float,
    seeder,
):
    """Generate (SeededBootstrapKey, SeededKeyswitchKey) directly.

    Equivalent of the reference's par_allocate_and_generate_new_seeded_*
    keygen (ref: lwe_bootstrap_key_generation.rs seeded variants): each key
    gets its own fresh public mask seed so its masks sit at the front of a
    fresh stream and decompression is a single CSPRNG sweep.
    """
    bits = glwe_sk.bits
    bsk_mask_seed = seeder.seed()
    gen = EncryptionRandomGenerator(bsk_mask_seed, seeder)
    bsk = keygen_mod.generate_bootstrap_key(
        lwe_sk, glwe_sk, pbs_base_log, pbs_level, glwe_std, gen
    )
    seeded_bsk = compress_bootstrap_key(bsk, bsk_mask_seed, pbs_base_log, bits)

    ksk_mask_seed = seeder.seed()
    gen = EncryptionRandomGenerator(ksk_mask_seed, seeder)
    ksk = keygen_mod.generate_keyswitch_key(
        big_sk, lwe_sk, ks_base_log, ks_level, lwe_std, gen
    )
    seeded_ksk = compress_keyswitch_key(ksk, ksk_mask_seed, ks_base_log, bits)
    return seeded_bsk, seeded_ksk

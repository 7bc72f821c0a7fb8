"""General LWE -> GLWE packing keyswitch.

(ref: tfhe/src/core_crypto/algorithms/lwe_packing_keyswitch.rs:102-200
keyswitch_lwe_ciphertext_into_glwe_ciphertext and :297
keyswitch_lwe_ciphertext_list_and_pack_in_glwe_ciphertext;
keygen: lwe_packing_keyswitch_key_generation.rs.)

The PKSK block for input key bit i, level j is a GLWE encryption of the
constant polynomial s_i * q/B^(j+1).  Keyswitching one LWE ciphertext:

    out = (0, ..., body at X^0) - sum_i sum_j digit_ij * PKSK[i][j]

and the list-pack variant shifts ciphertext k by X^k before summing, so
a batch of LWE ciphertexts lands in one GLWE with message m_k at
coefficient k.  Here the digit contraction is one batched einsum and the
monomial packing reuses the barrel rotator.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import decomposition, polymul
from ..prng.generators import EncryptionRandomGenerator
from .secret import GlweSecretKey, LweSecretKey, binary_ext_matrix, glwe_phase


def _np_udtype(bits: int):
    return np.uint64 if bits == 64 else np.uint32


def generate_packing_keyswitch_key(
    in_sk: LweSecretKey,
    glwe_sk: GlweSecretKey,
    base_log: int,
    levels: int,
    noise_std: float,
    gen: EncryptionRandomGenerator,
) -> np.ndarray:
    """PKSK [n_in, levels, G, N]: GLWE encryptions of s_i * q/B^(j+1).

    Fork tree: one child per input key bit (mirrors fork_ksk_to_lwe so
    parallel generation is order-independent)."""
    bits = in_sk.bits
    dt = _np_udtype(bits)
    n_in = in_sk.lwe_dimension
    k, N = glwe_sk.bits_array.shape
    G = k + 1

    masks = np.empty((n_in, levels, k, N), dtype=dt)
    noises = np.empty((n_in, levels, N), dtype=dt)
    children = gen.fork_ksk_to_lwe(n_in, levels, k * N, bits=bits)
    for i, child in enumerate(children):
        masks[i] = child.random_mask(levels * k * N, bits=bits).reshape(
            levels, k, N)
        noises[i] = child.random_noise(levels * N, noise_std,
                                       bits=bits).reshape(levels, N)

    s_in = in_sk.bits_array.astype(dt)  # [n_in]
    smat = binary_ext_matrix(glwe_sk.bits_array, N)
    phase = np.asarray(
        glwe_phase(smat, jnp.asarray(masks.reshape(-1, k, N)), bits=bits)
    ).reshape(n_in, levels, N)
    with np.errstate(over="ignore"):
        lev_shift = np.array(
            [bits - base_log * (j + 1) for j in range(levels)], dtype=dt)
        encoded = (s_in[:, None] << lev_shift[None, :]).astype(dt)
        bodies = phase + noises
        bodies[:, :, 0] += encoded
    return np.concatenate([masks, bodies[:, :, None, :]], axis=2)


def packing_keyswitch(pksk: np.ndarray, base_log: int, cts,
                      bits: int = 64):
    """LWE list [B, n_in+1] -> one GLWE [G, N] with message k at X^k.

    Also usable for a single ciphertext (B=1 -> message at X^0)."""
    dt = jnp.uint64 if bits == 64 else jnp.uint32
    pksk = jnp.asarray(pksk, dt)           # [n, L, G, N]
    n, L, G, N = pksk.shape
    cts = jnp.asarray(cts, dt)
    if cts.ndim == 1:
        cts = cts[None]
    B = cts.shape[0]
    assert B <= N, "cannot pack more ciphertexts than coefficients"

    digits = decomposition.signed_decompose(
        cts[:, :-1], base_log, L, bits=bits)          # [B, n, L] int32
    dig = digits.astype(jnp.int64).astype(dt)
    # ks_k = -(sum_{i,j} digit * PKSK[i][j]) + body_k at X^0
    acc = -jnp.einsum("bnl,nlgc->bgc", dig, pksk)     # wrapping u64
    acc = acc.at[:, -1, 0].add(cts[:, -1])            # [B, G, N]
    # pack: out = sum_k acc_k * X^k
    shifted = polymul.monomial_mul(
        acc, jnp.arange(B, dtype=jnp.int32)[:, None], N, bits=bits)
    return shifted.sum(axis=0)

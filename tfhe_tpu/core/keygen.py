"""Key generation: secret keys, bootstrap key, keyswitch key; device prep.

The fork tree reproduces the reference's deterministic parallel keygen
(ref: algorithms/lwe_bootstrap_key_generation.rs par_allocate_... +
commons/generators/encryption/mod.rs fork_bsk_to_ggsw): the RNG is forked
per GGSW, per level, per row, so key material is a pure function of the seed
regardless of generation order.  The arithmetic (GLWE phases) is hoisted out
of the fork loops into one batched MXU contraction.

Device preparation replaces the reference's standard->Fourier BSK conversion
(ref: lwe_bootstrap_key_conversion.rs:21): keys are decomposed into signed
int8 limb planes once, then every bootstrap consumes them directly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..prng.generators import EncryptionRandomGenerator, SecretRandomGenerator
from ..ops import limbs as limbs_mod
from .secret import LweSecretKey, GlweSecretKey, binary_ext_matrix, glwe_phase


def _np_udtype(bits: int):
    return np.uint64 if bits == 64 else np.uint32


def generate_binary_lwe_secret_key(
    n: int, gen: SecretRandomGenerator, bits: int = 64
) -> LweSecretKey:
    return LweSecretKey(gen.random_binary(n).astype(_np_udtype(bits)), bits=bits)


def generate_binary_glwe_secret_key(
    k: int, N: int, gen: SecretRandomGenerator, bits: int = 64
) -> GlweSecretKey:
    return GlweSecretKey(
        gen.random_binary(k * N).astype(_np_udtype(bits)).reshape(k, N), bits=bits
    )


def generate_bootstrap_key(
    lwe_sk: LweSecretKey,
    glwe_sk: GlweSecretKey,
    base_log: int,
    levels: int,
    noise_std: float,
    gen: EncryptionRandomGenerator,
) -> np.ndarray:
    """Standard-domain BSK: [n_in, levels, G (row j), G (poly o), N] uint.

    ggsw[i] encrypts lwe_sk[i]; level j row r < k presets factor * s_r,
    last row presets -factor at X^0, factor = -m * 2^(bits - bl*(j+1))
    (ref: ggsw_encryption.rs:72-151, 300-331).
    """
    bits = glwe_sk.bits
    dt = _np_udtype(bits)
    n = lwe_sk.lwe_dimension
    k, N = glwe_sk.bits_array.shape
    G = k + 1

    masks = np.empty((n, levels, G, k, N), dtype=dt)
    noises = np.empty((n, levels, G, N), dtype=dt)
    presets = np.zeros((n, levels, G, N), dtype=dt)

    s_polys = glwe_sk.bits_array.astype(dt)  # [k, N]
    m_bits = lwe_sk.bits_array.astype(dt)  # [n]

    ggsw_children = gen.fork_bsk_to_ggsw(n, levels, G, N, bits=bits)
    with np.errstate(over="ignore"):
        for i, child in enumerate(ggsw_children):
            m = m_bits[i]
            lev_children = child.fork_ggsw_to_ggsw_levels(levels, G, N, bits=bits)
            for j, genl in enumerate(lev_children):
                factor = (dt(0) - m) << dt(bits - base_log * (j + 1))
                row_children = genl.fork_ggsw_level_to_glwe(G, N, bits=bits)
                for r, genr in enumerate(row_children):
                    masks[i, j, r] = genr.random_mask(k * N, bits=bits).reshape(k, N)
                    noises[i, j, r] = genr.random_noise(N, noise_std, bits=bits)
                    if r < G - 1:
                        presets[i, j, r] = s_polys[r] * factor
                    else:
                        presets[i, j, r, 0] = dt(0) - factor

    # one batched phase contraction for every row of every GGSW
    smat = binary_ext_matrix(glwe_sk.bits_array, N)
    phase = np.asarray(
        glwe_phase(smat, jnp.asarray(masks.reshape(-1, k, N)), bits=bits)
    ).reshape(n, levels, G, N)
    with np.errstate(over="ignore"):
        bodies = presets + phase + noises
    return np.concatenate([masks, bodies[:, :, :, None, :]], axis=3)


def generate_keyswitch_key(
    in_sk: LweSecretKey,
    out_sk: LweSecretKey,
    base_log: int,
    levels: int,
    noise_std: float,
    gen: EncryptionRandomGenerator,
) -> np.ndarray:
    """KSK [n_in, levels, n_out+1]; level j encrypts s_i * 2^(bits-bl*(j+1))
    (ref: lwe_keyswitch_key_generation.rs:343)."""
    bits = in_sk.bits
    dt = _np_udtype(bits)
    n_in = in_sk.lwe_dimension
    n_out = out_sk.lwe_dimension

    masks = np.empty((n_in, levels, n_out), dtype=dt)
    noises = np.empty((n_in, levels), dtype=dt)
    children = gen.fork_ksk_to_lwe(n_in, levels, n_out, bits=bits)
    for i, child in enumerate(children):
        masks[i] = child.random_mask(levels * n_out, bits=bits).reshape(levels, n_out)
        noises[i] = child.random_noise(levels, noise_std, bits=bits)

    s_in = in_sk.bits_array.astype(dt)  # [n_in]
    s_out = out_sk.bits_array.astype(dt)  # [n_out]
    with np.errstate(over="ignore"):
        lev_shift = np.array(
            [bits - base_log * (j + 1) for j in range(levels)], dtype=dt
        )
        encoded = s_in[:, None] << lev_shift[None, :]  # [n_in, levels]
        body = (masks * s_out[None, None, :]).sum(axis=-1, dtype=dt)
        body = body + encoded + noises
    return np.concatenate([masks, body[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# device preparation
# ---------------------------------------------------------------------------


@dataclass
class PreparedBsk:
    """BSK as signed int8 limb planes of the (b, -b) extended polynomials:
    ext_limbs [n, L, J=G, O=G, M, 2N]."""

    ext_limbs: Any
    base_log: int
    levels: int
    glwe_size: int
    polynomial_size: int
    input_dim: int
    bits: int = 64


@dataclass
class PreparedKsk:
    """KSK rows as int8 limb planes: limbs [n_in, levels, M, n_out+1]."""

    limbs: Any
    base_log: int
    levels: int
    out_dim: int
    bits: int = 64


jax.tree_util.register_pytree_node(
    PreparedBsk,
    lambda b: ((b.ext_limbs,), (b.base_log, b.levels, b.glwe_size,
                                b.polynomial_size, b.input_dim, b.bits)),
    lambda meta, data: PreparedBsk(data[0], *meta),
)
jax.tree_util.register_pytree_node(
    PreparedKsk,
    lambda k: ((k.limbs,), (k.base_log, k.levels, k.out_dim, k.bits)),
    lambda meta, data: PreparedKsk(data[0], *meta),
)


@jax.jit
def _prepare_bsk_device(ext):
    lb = limbs_mod.torus_to_limbs(ext, bits=64 if ext.dtype == jnp.uint64
                                  else 32)  # [n,L,J,O,2N,M]
    return jnp.moveaxis(lb, -1, -2)  # [n,L,J,O,M,2N]


def prepare_bsk(bsk: np.ndarray, base_log: int, bits: int = 64) -> PreparedBsk:
    n, L, G, _, N = bsk.shape
    dt = _np_udtype(bits)
    with np.errstate(over="ignore"):
        ext = np.concatenate([bsk, (dt(0) - bsk)], axis=-1)  # [n,L,J,O,2N]
    lb = _prepare_bsk_device(jnp.asarray(ext))
    return PreparedBsk(
        ext_limbs=lb,
        base_log=base_log,
        levels=L,
        glwe_size=G,
        polynomial_size=N,
        input_dim=n,
        bits=bits,
    )


@jax.jit
def _prepare_ksk_device(k):
    lb = limbs_mod.torus_to_limbs(k, bits=64 if k.dtype == jnp.uint64
                                  else 32)  # [n_in,lev,n_out+1,M]
    return jnp.moveaxis(lb, -1, -2)  # [n_in, lev, M, n_out+1]


def prepare_ksk(ksk: np.ndarray, base_log: int, bits: int = 64) -> PreparedKsk:
    n_in, levels, out_size = ksk.shape
    lb = _prepare_ksk_device(jnp.asarray(ksk))
    return PreparedKsk(
        limbs=lb,
        base_log=base_log,
        levels=levels,
        out_dim=out_size - 1,
        bits=bits,
    )

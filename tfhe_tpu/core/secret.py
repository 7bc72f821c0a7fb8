"""Secret keys and the binary negacyclic phase helper.

(ref: tfhe/src/core_crypto/entities/{lwe_secret_key.rs, glwe_secret_key.rs})
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import limbs as limbs_mod
from ..ops import polymul


@dataclass
class LweSecretKey:
    bits_array: np.ndarray  # [n] uint of 0/1
    bits: int = 64

    @property
    def lwe_dimension(self) -> int:
        return self.bits_array.shape[0]


@dataclass
class GlweSecretKey:
    bits_array: np.ndarray  # [k, N] uint of 0/1
    bits: int = 64

    @property
    def glwe_dimension(self) -> int:
        return self.bits_array.shape[0]

    @property
    def polynomial_size(self) -> int:
        return self.bits_array.shape[1]

    def as_lwe_secret_key(self) -> LweSecretKey:
        """Flatten to the equivalent big LWE key (k*N bits)
        (ref: glwe_secret_key.rs into_lwe_secret_key)."""
        return LweSecretKey(self.bits_array.reshape(-1), bits=self.bits)


def binary_ext_matrix(sk_bits, N: int):
    """[k, N] binary key -> [k, N, N] int8 negacyclic matrices of +-1/0."""
    s8 = jnp.asarray(sk_bits).astype(jnp.int8)
    ext = jnp.concatenate([s8, -s8], axis=-1)  # [k, 2N]
    return polymul.ext_poly_to_limb_matrix(ext, N)  # [k, N, N]


@partial(jax.jit, static_argnames=("bits",))
def glwe_phase(smat, masks, bits: int = 64):
    """sum_j s_j (*) mask_j over the negacyclic ring, exact.

    smat: [k, N, N] int8 from binary_ext_matrix; masks: [..., k, N] uint.
    Returns [..., N] uint.  Used by GLWE encryption (add) and decryption
    (subtract from body).
    """
    mask_limbs = limbs_mod.torus_to_limbs(jnp.asarray(masks), bits=bits)  # [..., k, N, M]
    prod32 = jnp.einsum(
        "...knm,kny->...my", mask_limbs, smat, preferred_element_type=jnp.int32
    )
    # single-limb recombination: sum_m prod32[..., m, :] << 8m  (mod 2^bits)
    dt = jnp.uint64 if bits == 64 else jnp.uint32
    st = jnp.int64 if bits == 64 else jnp.int32
    acc = jnp.zeros(prod32.shape[:-2] + prod32.shape[-1:], dtype=dt)
    for m in range(prod32.shape[-2]):
        acc = acc + ((prod32[..., m, :].astype(st).astype(dt)) << (8 * m))
    return acc

"""Ciphertext and key containers.

TPU equivalent of the reference's flat-container entity types
(ref: tfhe/src/core_crypto/entities/).  Containers are thin dataclasses over
(numpy or jax) arrays with static shape metadata; they are registered as JAX
pytrees so whole ciphertext batches flow through jit/shard_map.  The Seeded*
compressed twins store (seed, body) and regenerate the mask from the CSPRNG
on decompression (ref: entities/seeded_lwe_ciphertext.rs and
algorithms/seeded_*_decompression.rs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import numpy as np


def _register(cls, data_fields, meta_fields):
    def flatten(obj):
        return (
            tuple(getattr(obj, f) for f in data_fields),
            tuple(getattr(obj, f) for f in meta_fields),
        )

    def unflatten(meta, data):
        kwargs = dict(zip(data_fields, data))
        kwargs.update(dict(zip(meta_fields, meta)))
        return cls(**kwargs)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@dataclass
class LweCiphertext:
    """LWE ciphertext(s): data [..., lwe_dimension + 1], last element = body.

    (ref: entities/lwe_ciphertext.rs)"""

    data: Any
    bits: int = 64

    @property
    def lwe_dimension(self) -> int:
        return self.data.shape[-1] - 1

    @property
    def mask(self):
        return self.data[..., :-1]

    @property
    def body(self):
        return self.data[..., -1]


@dataclass
class GlweCiphertext:
    """GLWE ciphertext(s): data [..., glwe_size, N]; last poly = body.

    (ref: entities/glwe_ciphertext.rs)"""

    data: Any
    bits: int = 64

    @property
    def glwe_size(self) -> int:
        return self.data.shape[-2]

    @property
    def polynomial_size(self) -> int:
        return self.data.shape[-1]

    @property
    def mask(self):
        return self.data[..., :-1, :]

    @property
    def body(self):
        return self.data[..., -1, :]


@dataclass
class GgswCiphertext:
    """GGSW ciphertext: data [levels, glwe_size (row j), glwe_size (poly o), N].

    Level axis index j encrypts with factor -m * q/B^(j+1)
    (ref: entities/ggsw_ciphertext.rs; algorithms/ggsw_encryption.rs:72-151)."""

    data: Any
    base_log: int
    bits: int = 64

    @property
    def levels(self) -> int:
        return self.data.shape[0]


@dataclass
class LweBootstrapKey:
    """Standard-domain bootstrap key: data [n_in, levels, G, G, N]
    (ref: entities/lwe_bootstrap_key.rs)."""

    data: Any
    base_log: int
    bits: int = 64


@dataclass
class LweKeyswitchKey:
    """Keyswitch key: data [n_in, levels, n_out + 1]; level axis j holds
    encryptions of s_i * q/B^(j+1) (ref: entities/lwe_keyswitch_key.rs)."""

    data: Any
    base_log: int
    bits: int = 64


@dataclass
class SeededLweCiphertext:
    """Compressed LWE: (mask_seed, body). Decompression regenerates the mask
    from the public AES-CTR stream."""

    body: Any
    mask_seed: int
    lwe_dimension: int
    bits: int = 64


for _cls, _data, _meta in [
    (LweCiphertext, ("data",), ("bits",)),
    (GlweCiphertext, ("data",), ("bits",)),
    (GgswCiphertext, ("data",), ("base_log", "bits")),
    (LweBootstrapKey, ("data",), ("base_log", "bits")),
    (LweKeyswitchKey, ("data",), ("base_log", "bits")),
]:
    _register(_cls, _data, _meta)

"""Batched LWE keyswitch as one MXU contraction.

Reference semantics (ref: algorithms/lwe_keyswitch.rs:143-169): the output is
(0,...,0, body_in) minus the sum over input mask elements and levels of
digit * KSK_row.  Here all (input element, level) digit planes of the whole
batch contract against the limb-decomposed KSK in a single int8 einsum.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import decomposition, limbs as limbs_mod
from .keygen import PreparedKsk


def keyswitch(ksk: PreparedKsk, ct):
    """ct [..., n_in+1] uint -> [..., n_out+1] uint."""
    bits = ksk.bits
    dt = jnp.uint64 if bits == 64 else jnp.uint32
    ct = jnp.asarray(ct, dt)
    mask_in = ct[..., :-1]
    body_in = ct[..., -1]

    digits = decomposition.signed_decompose(
        mask_in, ksk.base_log, ksk.levels, bits=bits
    )  # [..., n_in, lev] int32
    dig_limbs = limbs_mod.digits_to_limbs(digits, ksk.base_log)  # [..., n_in, lev, I]
    prod32 = jnp.einsum(
        "...nli,nlmt->...imt",
        dig_limbs,
        ksk.limbs,
        preferred_element_type=jnp.int32,
    )  # [..., I, M, n_out+1]
    acc = limbs_mod.combine_limb_products(prod32, limb_axes=(-3, -2), bits=bits)

    out = jnp.zeros(ct.shape[:-1] + (ksk.out_dim + 1,), dtype=dt)
    out = out.at[..., -1].set(body_in)
    return out - acc

"""Sharding layouts for ciphertext batches and server keys.

Ciphertext batches shard their leading (batch) axis over the mesh ``batch``
axis — the TPU form of the reference's rayon fan-out over independent PBS
(ref: integer/server_key/radix_parallel/add.rs:92-97).  The bootstrap key's
extended-polynomial axis (the dominant HBM tensor) shards over ``poly``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.keygen import PreparedBsk, PreparedKsk


def batch_spec(ndim: int, axis: str = "batch") -> P:
    """Leading axis sharded, everything else replicated."""
    return P(axis, *([None] * (ndim - 1)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x, axis: str = "batch"):
    return jax.device_put(x, NamedSharding(mesh, batch_spec(x.ndim, axis)))


def bsk_spec(ndim: int, poly_axis: str = "poly") -> P:
    """Shard the trailing polynomial/spectrum axis of large BSK tensors
    (ext_limbs [n, L, J, O, M, 2N] or spectra/shoup [n, P, L, J, O, M, N]);
    small auxiliary leaves (e.g. the rank-3 DFT limb matrices carried in
    PreparedBskNtt) are replicated."""
    if ndim >= 6:
        return P(*([None] * (ndim - 1)), poly_axis)
    return P()


def key_shardings(mesh: Mesh, bsk: PreparedBsk, ksk: PreparedKsk):
    """(bsk_sharding_tree, ksk_sharding_tree) matching the key pytrees."""
    bsk_sh = jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, bsk_spec(leaf.ndim)), bsk)
    ksk_sh = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), ksk)
    return bsk_sh, ksk_sh


def shard_server_key(mesh: Mesh, bsk: PreparedBsk, ksk: PreparedKsk):
    """Place the prepared keys on the mesh: BSK poly-sharded, KSK replicated."""
    bsk_sh, ksk_sh = key_shardings(mesh, bsk, ksk)
    return (
        jax.tree_util.tree_map(jax.device_put, bsk, bsk_sh),
        jax.tree_util.tree_map(jax.device_put, ksk, ksk_sh),
    )

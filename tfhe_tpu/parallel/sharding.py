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


def key_shardings(mesh: Mesh, bsk: PreparedBsk, ksk: PreparedKsk):
    """(bsk_sharding_tree, ksk_sharding_tree) matching the key pytrees.

    Keys are REPLICATED by design.  Batch data-parallelism needs no
    cross-chip communication on the hot path (each chip bootstraps its own
    ciphertexts against a full key copy), and the prepared 2_2 BSK is a few
    hundred MB — a small fraction of per-chip HBM.  An earlier revision
    sharded the BSK's trailing spectrum axis ("poly"), but the blind
    rotation contracts that axis inside the Pallas kernel, which GSPMD
    cannot partition — the spec was inert.  A genuinely sharded kernel
    (key halves + spectrum-domain halo exchange over ICI) is the documented
    scale-out path for keys that outgrow HBM; until then, replication is
    the honest, collectives-free layout.  Cross-chip collectives DO appear
    where they pay: the block-sharded carry scan (fused.py
    make_blockshard_radix_add) ppermutes carry states between chips."""
    bsk_sh = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), bsk)
    ksk_sh = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), ksk)
    return bsk_sh, ksk_sh


def shard_server_key(mesh: Mesh, bsk: PreparedBsk, ksk: PreparedKsk):
    """Place the prepared keys on the mesh (replicated; see key_shardings)."""
    bsk_sh, ksk_sh = key_shardings(mesh, bsk, ksk)
    return (
        jax.tree_util.tree_map(jax.device_put, bsk, bsk_sh),
        jax.tree_util.tree_map(jax.device_put, ksk, ksk_sh),
    )

"""Device-mesh scaling: the subsystem the reference does not have.

The reference's parallelism is single-node rayon (SURVEY.md component #27/#28);
here ciphertext batches are sharded over a `jax.sharding.Mesh` and XLA inserts
the collectives.  Axes:

- ``batch``: data parallelism over independent ciphertexts (the reference's
  rayon par_iter over blocks/PBS, ref: integer/server_key/radix_parallel/).
- ``poly``: tensor-style parallelism over the bootstrap key's extended
  polynomial axis — the BSK (the dominant HBM tensor) is sharded like weights
  and the external-product contraction gathers per step.
"""

from .mesh import create_mesh, initialize_multihost, local_mesh
from .sharding import (
    batch_spec,
    key_shardings,
    replicated,
    shard_batch,
    shard_server_key,
)
from .fused import (fused_ks_pbs, fused_radix_add, fused_radix_mul,
                    fused_strings_contains, make_blockshard_radix_add,
                    make_sharded_radix_add, make_sharded_radix_mul,
                    make_sharded_strings_contains)
from .checkpoint import (
    CheckpointManager,
    DeviceFailure,
    ResumableBatchRunner,
)

__all__ = [
    "create_mesh",
    "initialize_multihost",
    "local_mesh",
    "batch_spec",
    "key_shardings",
    "replicated",
    "shard_batch",
    "shard_server_key",
    "fused_ks_pbs",
    "fused_radix_add",
    "make_blockshard_radix_add",
    "make_sharded_radix_add",
    "make_sharded_radix_mul",
    "make_sharded_strings_contains",
    "fused_radix_mul",
    "fused_strings_contains",
    "CheckpointManager",
    "DeviceFailure",
    "ResumableBatchRunner",
]

"""Fully-jitted fused radix ops for mesh execution.

The host-driven integer layer (`integer/server_key.py`) interleaves Python
degree bookkeeping between device calls; this module is the compiled-step
formulation: one `jit` covers torus adds, the Hillis-Steele carry-state scan
(ref: integer/server_key/radix_parallel/add.rs:518-603), and every PBS round,
so the whole radix addition runs as a single XLA computation that can be
sharded over a mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import keyswitch_then_pbs
from ..core.keygen import PreparedBsk, PreparedKsk


def fused_ks_pbs(ksk: PreparedKsk, bsk: PreparedBsk, acc, cts):
    """Batched keyswitch+PBS over arbitrary leading axes: [..., n+1]."""
    lead = cts.shape[:-1]
    flat = cts.reshape((-1, cts.shape[-1]))
    out = keyswitch_then_pbs(ksk, bsk, acc, flat)
    return out.reshape(lead + (out.shape[-1],))


def _shift_blocks_up(x, d: int):
    """[B, nb, sz]: new[:, i] = old[:, i-d]; trivial zeros (= trivial LWE
    encryptions of 0) shifted in at the least-significant end."""
    if d == 0:
        return x
    B, nb, sz = x.shape
    zeros = jnp.zeros((B, min(d, nb), sz), dtype=x.dtype)
    return jnp.concatenate([zeros, x[:, : max(nb - d, 0)]], axis=1)


def fused_radix_add(
    ksk: PreparedKsk,
    bsk: PreparedBsk,
    state_acc,
    resolve_acc,
    carry_acc,
    msgext_acc,
    a,
    b,
    *,
    message_modulus: int,
):
    """Radix add with single-carry propagation, entirely in one computation.

    a, b: [B, nb, lwe_size] uint64 fresh/clean radix blocks (degree < msg).
    Returns clean sum blocks [B, nb, lwe_size].

    Mirrors IntegerServerKey.add_parallelized + propagate_single_carry:
    state PBS -> log2(nb) bivariate resolve rounds -> carry extract ->
    add carry-in -> message extract.  All LUT accumulators are prebuilt
    [G, N] tables from ShortintServerKey.generate_lookup_table.
    """
    msg = jnp.asarray(message_modulus, a.dtype)
    nb = a.shape[1]

    s = a + b  # torus add; degrees <= 2*msg - 2
    state = fused_ks_pbs(ksk, bsk, state_acc, s)
    d = 1
    while d < nb:
        prev = _shift_blocks_up(state, d)
        packed = state * msg + prev  # bivariate packing (bivariate_pbs.rs:167)
        state = fused_ks_pbs(ksk, bsk, resolve_acc, packed)
        d *= 2
    carries = fused_ks_pbs(ksk, bsk, carry_acc, state)
    carry_in = _shift_blocks_up(carries, 1)
    return fused_ks_pbs(ksk, bsk, msgext_acc, s + carry_in)


def make_sharded_radix_add(mesh, sks, num_blocks: int):
    """Bind a ShortintServerKey + mesh into a jitted sharded radix-add step.

    Returns (step, place) where step(a, b) -> clean sum, with a/b sharded
    on the mesh 'batch' axis and the BSK sharded on 'poly'; place(x) puts a
    host batch [B, nb, lwe_size] onto the mesh.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .sharding import batch_spec, key_shardings, shard_server_key

    msg = sks.message_modulus
    state_acc = sks.generate_lookup_table(
        lambda v: 2 if v >= msg else (1 if v == msg - 1 else 0)).acc
    resolve_acc = sks.generate_lookup_table_bivariate(
        lambda cur, prev: min(prev if cur == 1 else cur, 2)).acc.acc
    carry_acc = sks.generate_lookup_table(lambda x: 1 if x == 2 else 0).acc
    msgext_acc = sks.generate_lookup_table(lambda x: x % msg).acc

    bsk, ksk = shard_server_key(mesh, sks.bsk, sks.ksk)
    ct_sh = NamedSharding(mesh, batch_spec(3))
    bsk_sh, ksk_sh = key_shardings(mesh, sks.bsk, sks.ksk)
    acc_sh = NamedSharding(mesh, P())

    fn = jax.jit(
        functools.partial(fused_radix_add, message_modulus=msg),
        static_argnames=(),
        in_shardings=(ksk_sh, bsk_sh, acc_sh, acc_sh, acc_sh, acc_sh,
                      ct_sh, ct_sh),
        out_shardings=ct_sh,
    )

    def step(a, b):
        return fn(ksk, bsk, state_acc, resolve_acc, carry_acc, msgext_acc,
                  a, b)

    def place(x):
        return jax.device_put(jnp.asarray(x), ct_sh)

    return step, place

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
import numpy as np

from ..core import keyswitch_then_pbs
from ..core.keygen import PreparedBsk, PreparedKsk


def fused_ks_pbs(ksk: PreparedKsk, bsk, acc, cts):
    """Batched keyswitch+PBS over arbitrary leading axes: [..., n+1].

    acc may be a shared [G, N] accumulator or per-ciphertext accumulators
    with the same leading axes as cts ([..., G, N]).  Dispatches to the
    multi-bit PBS when handed a multi-bit prepared key."""
    from ..core.multibit import (PreparedMultiBitBskNtt,
                                 keyswitch_then_multi_bit_pbs)
    from ..ops.fused_multibit import PreparedMultiBitBskFused

    lead = cts.shape[:-1]
    flat = cts.reshape((-1, cts.shape[-1]))
    if hasattr(acc, "ndim") and acc.ndim > 3:
        acc = acc.reshape((-1,) + acc.shape[-2:])
    if isinstance(bsk, (PreparedMultiBitBskNtt, PreparedMultiBitBskFused)):
        out = keyswitch_then_multi_bit_pbs(ksk, bsk, acc, flat)
    else:
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


def _propagate_single_carry(ksk, bsk, state_acc, resolve_acc, carry_acc,
                            msgext_acc, s, msg_u):
    """Hillis-Steele single-carry propagation on [B, nb, sz] blocks."""
    nb = s.shape[1]
    state = fused_ks_pbs(ksk, bsk, state_acc, s)
    d = 1
    while d < nb:
        prev = _shift_blocks_up(state, d)
        state = fused_ks_pbs(ksk, bsk, resolve_acc, state * msg_u + prev)
        d *= 2
    carries = fused_ks_pbs(ksk, bsk, carry_acc, state)
    carry_in = _shift_blocks_up(carries, 1)
    return fused_ks_pbs(ksk, bsk, msgext_acc, s + carry_in)


def fused_radix_mul(
    ksk: PreparedKsk,
    bsk: PreparedBsk,
    lsb_acc,
    msb_acc,
    msgext_acc,
    carryext_acc,
    state_acc,
    resolve_acc,
    carry_acc,
    a,
    b,
    *,
    message_modulus: int,
    carry_modulus: int,
):
    """Radix multiplication as one jittable computation (msg >= 4 params).

    a, b: [B, nb, lwe_size] uint64 CLEAN radix blocks (degree < msg).
    Mirrors IntegerServerKey.mul_parallelized (ref: radix_parallel/
    mul.rs:329-464 block products + add.rs:789 carry-save tree): bivariate
    lsb/msb block products in two PBS batches, a statically-scheduled
    carry-save column reduction (the degree bookkeeping that drives the
    host schedule is deterministic for clean inputs), then one
    single-carry propagation.
    """
    msg = message_modulus
    msg_u = jnp.asarray(msg, a.dtype)
    B, nb, sz = a.shape

    pairs_lsb = [(i, j) for j in range(nb) for i in range(nb - j)]
    pairs_msb = [(i, j) for j in range(nb) for i in range(nb - j)
                 if i + j + 1 < nb]

    def products(pairs, acc):
        ai = [i for i, _ in pairs]
        bj = [j for _, j in pairs]
        packed = a[:, ai] * msg_u + b[:, bj]  # bivariate_pbs.rs:167 packing
        return fused_ks_pbs(ksk, bsk, acc, packed)  # [B, len(pairs), sz]

    prod_lsb = products(pairs_lsb, lsb_acc)
    columns = [[] for _ in range(nb)]
    for t, (i, j) in enumerate(pairs_lsb):
        columns[i + j].append(prod_lsb[:, t])
    if pairs_msb:
        prod_msb = products(pairs_msb, msb_acc)
        for t, (i, j) in enumerate(pairs_msb):
            columns[i + j + 1].append(prod_msb[:, t])

    # carry-save reduction with the host schedule made static: every block
    # entering a column has degree < msg, so chunk sizing is deterministic
    max_degree = msg * carry_modulus - 1
    chunk = max(max_degree // (msg - 1), 2)
    while max(len(c) for c in columns) > 2:
        new_columns = [[] for _ in range(nb)]
        to_extract = []
        for p, col in enumerate(columns):
            for lo in range(0, len(col), chunk):
                part = col[lo:lo + chunk]
                if len(part) == 1:
                    new_columns[p].append(part[0])
                    continue
                acc_s = part[0]
                for other in part[1:]:
                    acc_s = acc_s + other
                to_extract.append((p, acc_s))
        if to_extract:
            stacked = jnp.stack([t[1] for t in to_extract], axis=1)
            msgs = fused_ks_pbs(ksk, bsk, msgext_acc, stacked)
            carries = fused_ks_pbs(ksk, bsk, carryext_acc, stacked)
            for t, (p, _) in enumerate(to_extract):
                new_columns[p].append(msgs[:, t])
                if p + 1 < nb:
                    new_columns[p + 1].append(carries[:, t])
        columns = new_columns

    zero = jnp.zeros((B, sz), a.dtype)
    top = jnp.stack([c[0] if c else zero for c in columns], axis=1)
    bot = jnp.stack([c[1] if len(c) > 1 else zero for c in columns], axis=1)
    return _propagate_single_carry(ksk, bsk, state_acc, resolve_acc,
                                   carry_acc, msgext_acc, top + bot, msg_u)


def fused_strings_contains(
    ksk: PreparedKsk,
    bsk: PreparedBsk,
    sign_acc,
    resolve_acc,
    eq0_acc,
    and_acc,
    or_acc,
    s,
    *,
    pat_digits: Tuple[Tuple[int, ...], ...],
    message_modulus: int,
    delta: int,
):
    """contains(s, clear_pattern) for a batch of strings, one computation.

    s: [B, n, nb, sz] uint64 clean char blocks, FINAL padding (chars past
    the string length are encryptions of 0).  pat_digits[j] holds the nb
    radix digits of pattern char j (static).  Mirrors the host path
    (ref: pattern.rs:106-115 is_contained_in OR-fold; contains.rs:18-41):
    per-(offset, char) 3-state sign blocks, block tree-reduce, ==0 LUT,
    AND-fold over pattern chars, OR-fold over offsets.
    Returns [B, sz] boolean (0/1) LWE blocks.
    """
    msg_u = jnp.asarray(message_modulus, s.dtype)
    B, n, nb, sz = s.shape
    plen = len(pat_digits)

    def tree(x, acc):
        """Reduce axis -2 pairing (2i, 2i+1) with the higher index as the
        bivariate lhs (matches StringServerKey._tree_reduce)."""
        while x.shape[-2] > 1:
            m = x.shape[-2]
            lo = x[..., 0:m - 1:2, :]
            hi = x[..., 1:m:2, :]
            merged = fused_ks_pbs(ksk, bsk, acc, hi * msg_u + lo)
            if m % 2 == 1:
                merged = jnp.concatenate([merged, x[..., m - 1:m, :]],
                                         axis=-2)
            x = merged
        return x[..., 0, :]

    if plen > 1:
        pad = jnp.zeros((B, plen - 1, nb, sz), s.dtype)
        sx = jnp.concatenate([s, pad], axis=1)
    else:
        sx = s
    gather = sx[:, jnp.arange(n)[:, None] + jnp.arange(plen)[None, :]]
    # bivariate packing against the trivial pattern block: lhs*msg then the
    # clear digit rides the body coefficient (trivial LWE add)
    packed = gather * msg_u                       # [B, n, plen, nb, sz]
    digit_body = (jnp.asarray(pat_digits, s.dtype)
                  * jnp.asarray(delta, s.dtype))  # [plen, nb]
    packed = packed.at[..., -1].add(digit_body[None, None])
    signs = fused_ks_pbs(ksk, bsk, sign_acc, packed)
    sign = tree(signs, resolve_acc)               # [B, n, plen, sz]
    eqs = fused_ks_pbs(ksk, bsk, eq0_acc, sign)
    match = tree(eqs, and_acc)                    # [B, n, sz]
    return tree(match, or_acc)                    # [B, sz]


def _neg_correct(b, *, message_modulus: int, carry_modulus: int, delta: int):
    """Per-block negation of CLEAN radix blocks with the borrow-absorbing
    correcting terms (ref: integer/server_key/radix/neg.rs).  For clean
    inputs (degree <= msg-1) the host's degree-driven schedule is static:
    z = msg for every block, carry-in 0 for block 0 and 1 above, so the
    body correction is msg*delta on block 0 and (msg-1)*delta elsewhere."""
    msg = message_modulus
    B, nb, sz = b.shape
    term = np.full(nb, msg, dtype=np.int64)
    term[1:] -= 1
    body = jnp.asarray(
        (term % (2 * msg * carry_modulus)).astype(np.uint64)
        * np.uint64(delta), b.dtype)
    out = jnp.zeros_like(b) - b
    return out.at[..., -1].add(body[None, :])


def fused_radix_neg(ksk, bsk, state_acc, resolve_acc, carry_acc, msgext_acc,
                    a, *, message_modulus: int, carry_modulus: int,
                    delta: int):
    """Radix negation of clean blocks in one computation
    (ref: radix_parallel/neg.rs + the single-carry propagation)."""
    msg_u = jnp.asarray(message_modulus, a.dtype)
    s = _neg_correct(a, message_modulus=message_modulus,
                     carry_modulus=carry_modulus, delta=delta)
    return _propagate_single_carry(ksk, bsk, state_acc, resolve_acc,
                                   carry_acc, msgext_acc, s, msg_u)


def fused_radix_sub(ksk, bsk, state_acc, resolve_acc, carry_acc, msgext_acc,
                    a, b, *, message_modulus: int, carry_modulus: int,
                    delta: int):
    """a - b over clean radix blocks, one computation
    (ref: radix_parallel/sub.rs sub_parallelized)."""
    msg_u = jnp.asarray(message_modulus, a.dtype)
    s = a + _neg_correct(b, message_modulus=message_modulus,
                         carry_modulus=carry_modulus, delta=delta)
    return _propagate_single_carry(ksk, bsk, state_acc, resolve_acc,
                                   carry_acc, msgext_acc, s, msg_u)


def _tree_reduce(ksk, bsk, acc, x, msg_u):
    """Pairwise reduce axis -2: merged = LUT(hi * msg + lo) with the higher
    index as the bivariate lhs (matches IntegerServerKey._reduce_signs)."""
    while x.shape[-2] > 1:
        m = x.shape[-2]
        lo = x[..., 0:m - 1:2, :]
        hi = x[..., 1:m:2, :]
        merged = fused_ks_pbs(ksk, bsk, acc, hi * msg_u + lo)
        if m % 2 == 1:
            merged = jnp.concatenate([merged, x[..., m - 1:m, :]], axis=-2)
        x = merged
    return x[..., 0, :]


def fused_radix_eq(ksk, bsk, beq_acc, and_accs, a, b, *,
                   message_modulus: int, carry_modulus: int, delta: int,
                   negate: bool = False):
    """Equality of clean radix ciphertexts via carry-space sum-thresholds.

    One bivariate block-eq round, then log_cap sum-threshold rounds
    (cap = max_noise_level fresh 0/1 blocks per chunk) — 3 PBS rounds and
    nb + ~nb/4 PBS for nb=16, vs the sign/resolve-tree path's 6 rounds
    and ~2nb PBS (ref: integer/server_key/comparator.rs eq loops).

    and_accs: dict {c: acc} with acc the (sum == c) LUT for every chunk
    width on the (static) reduction path — see eq_chunk_widths."""
    msg_u = jnp.asarray(message_modulus, a.dtype)
    cap = (carry_modulus * message_modulus - 1) // (message_modulus - 1)
    bits = fused_ks_pbs(ksk, bsk, beq_acc, a * msg_u + b)  # [B, nb, sz]
    B, nb, sz = bits.shape
    while nb > 1:
        c = min(cap, nb)
        pad = (-nb) % c
        if pad:
            one = jnp.zeros((B, pad, sz), bits.dtype)
            one = one.at[..., -1].set(jnp.asarray(delta, bits.dtype))
            bits = jnp.concatenate([bits, one], axis=1)
            nb += pad
        s = bits.reshape(B, nb // c, c, sz).sum(axis=2)
        bits = fused_ks_pbs(ksk, bsk, and_accs[c], s)
        nb //= c
    if negate:
        return fused_ks_pbs(ksk, bsk, and_accs["not"], bits[:, 0])
    return bits[:, 0]


def eq_chunk_widths(nb: int, cap: int):
    """The static chunk widths fused_radix_eq uses for nb blocks."""
    widths = set()
    while nb > 1:
        c = min(cap, nb)
        widths.add(c)
        nb = (nb + (-nb) % c) // c
    return widths


def fused_radix_cmp(ksk, bsk, sign_acc, resolve_acc, out_acc, a, b, *,
                    message_modulus: int):
    """Comparison of clean radix ciphertexts in one computation: per-block
    3-state signs, MSB-first reduction tree, then a final LUT mapping the
    sign to the op's boolean (ref: integer/server_key/comparator.rs:31-60).

    a, b: [B, nb, sz]; returns [B, sz] boolean (0/1) blocks."""
    msg_u = jnp.asarray(message_modulus, a.dtype)
    signs = fused_ks_pbs(ksk, bsk, sign_acc, a * msg_u + b)
    s = _tree_reduce(ksk, bsk, resolve_acc, signs, msg_u)
    return fused_ks_pbs(ksk, bsk, out_acc, s)


def fused_radix_bitop(ksk, bsk, op_acc, a, b, *, message_modulus: int):
    """Blockwise bivariate op (bitand/or/xor), one PBS round
    (ref: radix_parallel/bitwise_op.rs)."""
    msg_u = jnp.asarray(message_modulus, a.dtype)
    return fused_ks_pbs(ksk, bsk, op_acc, a * msg_u + b)


def fused_radix_univariate(ksk, bsk, acc, a):
    """Blockwise univariate LUT (bitnot etc.), one PBS round."""
    return fused_ks_pbs(ksk, bsk, acc, a)


def fused_radix_select(ksk, bsk, then_acc, else_acc, msgext_acc, cond, a, b,
                       *, message_modulus: int):
    """if cond then a else b (ref: radix_parallel/cmux.rs:27).

    cond [B, sz] with value in the thenacc/else_acc packing domain
    (a 0/1 boolean, or a 3-state comparison sign when the accs encode the
    selection); a, b [B, nb, sz].  Both branch LUT batches run in ONE PBS
    round via per-ciphertext accumulators, then one message extract."""
    B, nb, sz = a.shape
    msg_u = jnp.asarray(message_modulus, a.dtype)
    condr = jnp.broadcast_to(cond[:, None, :], a.shape)
    packed = jnp.concatenate([condr * msg_u + a, condr * msg_u + b], axis=1)
    accs = jnp.concatenate([
        jnp.broadcast_to(then_acc[None], (nb,) + then_acc.shape),
        jnp.broadcast_to(else_acc[None], (nb,) + else_acc.shape),
    ], axis=0)                                         # [2nb, G, N]
    accs = jnp.broadcast_to(accs[None], (B,) + accs.shape)
    out = fused_ks_pbs(ksk, bsk, accs, packed)         # [B, 2nb, sz]
    return fused_ks_pbs(ksk, bsk, msgext_acc, out[:, :nb] + out[:, nb:])


def fused_radix_minmax(ksk, bsk, sign_acc, resolve_acc, then_acc, else_acc,
                       msgext_acc, a, b, *, message_modulus: int):
    """max/min of clean radix ciphertexts in one computation: the reduced
    comparison sign drives the cmux directly (then/else accs encode the
    s != 1 / s == 1 selection), skipping the bool-conversion round
    (ref: radix_parallel/comparator.rs max_parallelized)."""
    msg_u = jnp.asarray(message_modulus, a.dtype)
    signs = fused_ks_pbs(ksk, bsk, sign_acc, a * msg_u + b)
    s = _tree_reduce(ksk, bsk, resolve_acc, signs, msg_u)
    return fused_radix_select(ksk, bsk, then_acc, else_acc, msgext_acc,
                              s, a, b, message_modulus=message_modulus)


def _shift_up_collective(x, d: int, ndev: int, axis: str):
    """Global block shift towards higher significance for BLOCK-SHARDED
    radix state: x [B, nbl, sz] is this chip's contiguous slice of the
    global [B, nb, sz] block axis (chip i holds blocks [i*nbl, (i+1)*nbl)).
    out_global[k] = in_global[k - d], zeros shifted in at the bottom.

    Whole-shard moves and the partial-boundary halo both ride
    lax.ppermute over the mesh axis (ICI); non-cyclic perms give the
    bottom chip its zeros for free (unaddressed destinations receive 0).
    """
    nbl = x.shape[1]
    k, r = divmod(d, nbl)
    if k:
        if k >= ndev:
            return jnp.zeros_like(x)
        x = jax.lax.ppermute(
            x, axis, [(i, i + k) for i in range(ndev - k)])
    if r:
        tail = x[:, nbl - r:]
        recv = jax.lax.ppermute(
            tail, axis, [(i, i + 1) for i in range(ndev - 1)])
        x = jnp.concatenate([recv, x[:, :nbl - r]], axis=1)
    return x


def fused_radix_add_blockshard(ksk, bsk, state_acc, resolve_acc, carry_acc,
                               msgext_acc, a, b, *, message_modulus: int,
                               num_blocks: int, ndev: int, axis: str):
    """Radix add with the BLOCK axis sharded across chips — the collective
    Hillis-Steele carry scan (SURVEY #28): every scan round's block shift
    crosses chip boundaries via ppermute while the PBS batches stay local.
    Runs INSIDE shard_map; a, b are the local shards [B, nb/ndev, sz].
    (ref: radix_parallel/add.rs:518-603 — the rayon scan, here spanning
    chips for radix widths that exceed one chip's batch budget.)"""
    msg = jnp.asarray(message_modulus, a.dtype)
    s = a + b
    state = fused_ks_pbs(ksk, bsk, state_acc, s)
    d = 1
    while d < num_blocks:
        prev = _shift_up_collective(state, d, ndev, axis)
        state = fused_ks_pbs(ksk, bsk, resolve_acc, state * msg + prev)
        d *= 2
    carries = fused_ks_pbs(ksk, bsk, carry_acc, state)
    carry_in = _shift_up_collective(carries, 1, ndev, axis)
    return fused_ks_pbs(ksk, bsk, msgext_acc, s + carry_in)


def make_blockshard_radix_add(mesh, sks, num_blocks: int,
                              axis: str = "batch"):
    """Bind a ShortintServerKey + mesh into a jitted radix add whose BLOCK
    axis spans the mesh (keys replicated, carry states ppermuted).

    Returns (step, place): step(a, b) -> clean sum with a/b [B, nb, sz]
    sharded on the block axis; the compiled program contains real
    collective-permutes (asserted in tests/test_mesh.py)."""
    import jax.sharding as jsh
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .sharding import shard_server_key

    ndev = mesh.shape[axis]
    if num_blocks % ndev:
        raise ValueError(f"num_blocks {num_blocks} not divisible by "
                         f"mesh axis {axis}={ndev}")
    msg = sks.message_modulus
    state_acc = sks.generate_lookup_table(
        lambda v: 2 if v >= msg else (1 if v == msg - 1 else 0)).acc
    resolve_acc = sks.generate_lookup_table_bivariate(
        lambda cur, prev: min(prev if cur == 1 else cur, 2)).acc.acc
    carry_acc = sks.generate_lookup_table(lambda x: 1 if x == 2 else 0).acc
    msgext_acc = sks.generate_lookup_table(lambda x: x % msg).acc

    bsk, ksk = shard_server_key(mesh, sks.bsk, sks.ksk)
    ct_spec = P(None, axis, None)
    rep = P()
    body = functools.partial(
        fused_radix_add_blockshard, message_modulus=msg,
        num_blocks=num_blocks, ndev=ndev, axis=axis)
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, ct_spec, ct_spec),
        out_specs=ct_spec, check_vma=False))

    ct_sh = NamedSharding(mesh, ct_spec)

    def step(a, b):
        return fn(ksk, bsk, state_acc, resolve_acc, carry_acc, msgext_acc,
                  a, b)

    def place(x):
        return jax.device_put(jnp.asarray(x), ct_sh)

    return step, place


def make_sharded_radix_mul(mesh, sks, num_blocks: int):
    """Bind a ShortintServerKey + mesh into a jitted sharded radix-mul step
    (same contract as make_sharded_radix_add)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .sharding import batch_spec, key_shardings, shard_server_key

    msg = sks.message_modulus
    accs = (
        sks.generate_lookup_table_bivariate(
            lambda x, y: (x * y) % msg).acc.acc,
        sks.generate_lookup_table_bivariate(
            lambda x, y: (x * y) // msg).acc.acc,
        sks.generate_lookup_table(lambda x: x % msg).acc,
        sks.generate_lookup_table(lambda x: x // msg).acc,
        sks.generate_lookup_table(
            lambda v: 2 if v >= msg else (1 if v == msg - 1 else 0)).acc,
        sks.generate_lookup_table_bivariate(
            lambda cur, prev: min(prev if cur == 1 else cur, 2)).acc.acc,
        sks.generate_lookup_table(lambda x: 1 if x == 2 else 0).acc,
    )

    bsk, ksk = shard_server_key(mesh, sks.bsk, sks.ksk)
    ct_sh = NamedSharding(mesh, batch_spec(3))
    bsk_sh, ksk_sh = key_shardings(mesh, sks.bsk, sks.ksk)
    acc_sh = NamedSharding(mesh, P())

    fn = jax.jit(
        functools.partial(fused_radix_mul, message_modulus=msg,
                          carry_modulus=sks.carry_modulus),
        in_shardings=(ksk_sh, bsk_sh) + (acc_sh,) * 7 + (ct_sh, ct_sh),
        out_shardings=ct_sh,
    )

    def step(a, b):
        return fn(ksk, bsk, *accs, a, b)

    def place(x):
        return jax.device_put(jnp.asarray(x), ct_sh)

    return step, place


def make_sharded_strings_contains(mesh, sks, pattern: str):
    """Bind a ShortintServerKey + mesh + clear pattern into a jitted
    sharded contains step over [B, n, nb, sz] char batches."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..strings.client_key import NUMBER_BLOCKS
    from .sharding import batch_spec, key_shardings, shard_server_key

    msg = sks.message_modulus
    nb = NUMBER_BLOCKS
    pat_digits = tuple(
        tuple((ord(c) // msg**d) % msg for d in range(nb)) for c in pattern)
    accs = (
        sks.generate_lookup_table_bivariate(
            lambda x, y: 0 if x == y else (1 if x < y else 2)).acc.acc,
        sks.generate_lookup_table_bivariate(
            lambda high, low: min(low if high == 0 else high, 2)).acc.acc,
        sks.generate_lookup_table(lambda v: int(v == 0)).acc,
        sks.generate_lookup_table_bivariate(
            lambda x, y: int(bool(x) and bool(y))).acc.acc,
        sks.generate_lookup_table_bivariate(
            lambda x, y: int(bool(x) or bool(y))).acc.acc,
    )

    bsk, ksk = shard_server_key(mesh, sks.bsk, sks.ksk)
    ct_sh = NamedSharding(mesh, batch_spec(4))
    out_sh = NamedSharding(mesh, batch_spec(2))
    bsk_sh, ksk_sh = key_shardings(mesh, sks.bsk, sks.ksk)
    acc_sh = NamedSharding(mesh, P())

    fn = jax.jit(
        functools.partial(fused_strings_contains, pat_digits=pat_digits,
                          message_modulus=msg, delta=sks.delta),
        in_shardings=(ksk_sh, bsk_sh) + (acc_sh,) * 5 + (ct_sh,),
        out_shardings=out_sh,
    )

    def step(chars):
        return fn(ksk, bsk, *accs, chars)

    def place(x):
        return jax.device_put(jnp.asarray(x), ct_sh)

    return step, place


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

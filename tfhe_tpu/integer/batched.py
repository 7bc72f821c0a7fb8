"""Host-scheduled batched radix ops: one fused ks+pbs wave per PBS round.

The single-program formulation (integer/fused_dispatch.py + parallel/
fused.py) traces every PBS round of a radix op into ONE XLA program; at
batch 64 that program OOM-killed the remote Mosaic compile helper
(BENCH_SUITE_r04.json:20).  This module inverts the structure: the only
compiled device program is the shared keyswitch+PBS wave (the same
bucket-shaped executables the shortint layer uses, batch-chunked at the
kernel's B=128 sweet spot), and a radix op is a host-side schedule of
waves over [B, nb] block grids with linear torus glue (adds / shifts /
bivariate packing) between rounds.  Any batch size reuses the same
handful of compiled shapes — no giant programs, no compile cliffs.

Reference schedules mirrored:
- add/sub/neg: Hillis-Steele single-carry propagation
  (ref: integer/server_key/radix_parallel/add.rs:518-603)
- mul: bivariate block products + carry-save column reduction
  (ref: radix_parallel/mul.rs:329-464)
- eq/ne: sum-packed block equality (carry-space sums of fresh 0/1 blocks
  replace the pairwise AND tree — depth log_5 instead of log_2)
- lt/le/gt/ge: 3-state sign blocks + MSB-first resolve tree
  (ref: integer/server_key/comparator.rs:31-60)
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

_U64 = np.uint64


class BatchedRadixOps:
    """Batched radix arithmetic over raw block grids.

    Ciphertext format: np.uint64 [B, nb, lwe_size] of CLEAN radix blocks
    (degree < message_modulus), little-endian block order — the same
    layout RadixCiphertext.blocks.data.reshape(nb, -1) stacks to.
    """

    def __init__(self, sks):
        self.sks = sks                      # shortint ServerKey
        self.msg = sks.message_modulus
        self.cap = int(sks.max_noise_level)
        self._luts = {}

    # -- wave primitive ---------------------------------------------------

    def _lut(self, key, f):
        if key not in self._luts:
            self._luts[key] = self.sks.generate_lookup_table(f)
        return self._luts[key]

    def _wave(self, data, lut_key, f):
        """One fused ks+pbs device wave over [..., sz] torus rows —
        device-resident end to end (no host round-trips between rounds,
        which dominate through the TPU tunnel at these array sizes)."""
        lut = self._lut(lut_key, f)
        flat = data.reshape(-1, data.shape[-1])
        out = self.sks._pbs_device(flat, lut.acc)
        return out.reshape(data.shape)

    def _biv(self, a, b, lut_key, f):
        """Bivariate wave: LUT(x*msg + y) with x, y clean blocks."""
        packed = a * _U64(self.msg) + b
        return self._wave(packed, ("biv", lut_key),
                          lambda v: f(v // self.msg, v % self.msg))

    # -- carry propagation (ref: radix_parallel/add.rs:518-603) -----------

    def _shift_up(self, x, d):
        """[B, nb, sz]: new[:, i] = old[:, i-d], zeros in at the bottom."""
        if d == 0:
            return x
        nb = x.shape[1]
        zeros = jnp.zeros((x.shape[0], min(d, nb), x.shape[2]), x.dtype)
        return jnp.concatenate([zeros, x[:, :max(nb - d, 0)]], axis=1)

    def _propagate(self, s, mode: str | None = None):
        """Clean up [B, nb, sz] blocks holding degree <= 2*msg-1 sums.

        Two schedules (ref: radix_parallel/add.rs:518-603 for the scan):

        - "scan": Hillis-Steele over 3-state blocks — depth 3+log2(nb)
          waves, each nb*B wide.  Best latency; PBS work is
          (3+log2 nb) per block.
        - "ripple": sequential carry chain — 1 carry PBS per block
          (width B) plus one final nb*B-wide message extract.  ~2 PBS
          per block total vs 7 at nb=16, so it wins whenever the op is
          PBS-THROUGHPUT-bound (batched ops); loses on single-op
          latency (depth nb).

        "auto" picks by a device cost model (kernel chunks are 128
        lanes at ~0.24 s each + ~0.03 s dispatch per wave call).
        """
        msg = self.msg
        nb = s.shape[1]
        B = s.shape[0]
        mode = mode or os.environ.get("TFHE_TPU_CARRY_MODE", "auto")
        if mode == "auto":
            chunks = lambda w: -(-w // 128)
            ripple_cost = ((nb - 1) * (0.03 + 0.24 * chunks(B))
                           + 0.03 + 0.24 * chunks(B * nb))
            scan_cost = ((3 + max(1, (nb - 1).bit_length()))
                         * (0.03 + 0.24 * chunks(B * nb)))
            mode = "ripple" if ripple_cost < scan_cost else "scan"
        if mode == "ripple":
            return self._propagate_ripple(s)
        state = self._wave(
            s, "state",
            lambda v: 2 if v >= msg else (1 if v == msg - 1 else 0))
        d = 1
        while d < nb:
            prev = self._shift_up(state, d)
            packed = state * _U64(msg) + prev
            state = self._wave(
                packed, "resolve",
                lambda v: min((v % msg) if (v // msg) == 1 else (v // msg),
                              2))
            d *= 2
        carries = self._wave(state, "carry", lambda v: 1 if v == 2 else 0)
        return self._wave(s + self._shift_up(carries, 1), "msgext",
                          lambda v: v % msg)

    def _propagate_ripple(self, s):
        """Serial carry chain: carry_i = LUT(s_i + carry_{i-1}) >= msg.

        Inputs s_i are sums of two clean blocks (degree <= 2*msg-2); with
        the 0/1 carry the LUT argument stays < 2*msg <= msg*carry_mod and
        the noise level is 3 fresh blocks <= max_noise_level (2_2: 5)."""
        msg = self.msg
        nb = s.shape[1]
        if nb == 1:
            return self._wave(s, "msgext", lambda v: v % msg)
        carry_lut = ("rcarry", lambda v: 1 if v >= msg else 0)
        carry = self._wave(s[:, 0], *carry_lut)
        carries = [carry]
        for i in range(1, nb - 1):
            carry = self._wave(s[:, i] + carry, *carry_lut)
            carries.append(carry)
        shifted = jnp.concatenate(
            [jnp.zeros_like(s[:, :1]), jnp.stack(carries, axis=1)], axis=1)
        return self._wave(s + shifted, "msgext", lambda v: v % msg)

    # -- public ops --------------------------------------------------------

    def add(self, a, b):
        return self._propagate(jnp.asarray(a) + jnp.asarray(b))

    def _neg_correct(self, b):
        """Per-block negation correcting terms for clean blocks
        (ref: integer/server_key/radix/neg.rs; see parallel/fused.py)."""
        sks = self.sks
        msg = self.msg
        B, nb, sz = b.shape
        term = np.full(nb, msg, dtype=np.int64)
        term[1:] -= 1
        body = ((term % (2 * msg * sks.carry_modulus)).astype(_U64)
                * _U64(sks.delta))
        out = jnp.zeros_like(jnp.asarray(b)) - b
        return out.at[..., -1].add(jnp.asarray(body)[None, :])

    def sub(self, a, b):
        return self._propagate(jnp.asarray(a) + self._neg_correct(b))

    def neg(self, a):
        return self._propagate(self._neg_correct(a))

    def eq(self, a, b):
        """[B, nb, sz] x2 -> [B, sz] 0/1 boolean blocks, sum-packed."""
        beq = self._biv(jnp.asarray(a), jnp.asarray(b),
                        "eq", lambda x, y: int(x == y))
        return self._all_ones(beq)

    def ne(self, a, b):
        return self._wave(self.eq(a, b), "not01", lambda v: int(v == 0))

    def _all_ones(self, bits):
        """AND over axis 1 of 0/1 blocks via carry-space sum-thresholds
        (fan-in = max_noise_level per round)."""
        while bits.shape[1] > 1:
            m = bits.shape[1]
            c = min(self.cap, m)
            pad = (-m) % c
            if pad:
                one = jnp.zeros((bits.shape[0], pad, bits.shape[2]),
                                bits.dtype)
                one = one.at[..., -1].set(_U64(self.sks.delta))  # trivial 1
                bits = jnp.concatenate([bits, one], axis=1)
                m += pad
            s = bits.reshape(bits.shape[0], m // c, c,
                             bits.shape[2]).sum(axis=2)
            bits = self._wave(s, ("and_sum", c), lambda v, c=c: int(v == c))
        return bits[:, 0]

    def _signs(self, a, b):
        """MSB-first reduced 3-state comparison sign [B, sz]
        (ref: comparator.rs:31-60)."""
        signs = self._biv(a, b, "sign",
                          lambda x, y: 0 if x == y else (1 if x < y else 2))
        # resolve tree, most-significant block wins unless equal
        while signs.shape[1] > 1:
            m = signs.shape[1]
            lo = signs[:, 0:m - 1:2]
            hi = signs[:, 1:m:2]
            packed = hi * _U64(self.msg) + lo
            merged = self._wave(
                packed, "sresolve",
                lambda v: min((v % self.msg) if (v // self.msg) == 0
                              else (v // self.msg), 2))
            if m % 2 == 1:
                merged = jnp.concatenate([merged, signs[:, m - 1:m]],
                                         axis=1)
            signs = merged
        return signs[:, 0]

    def _cmp(self, a, b, name, f):
        return self._wave(self._signs(a, b), ("cmp", name), f)

    def lt(self, a, b):
        return self._cmp(a, b, "lt", lambda s: int(s == 1))

    def le(self, a, b):
        return self._cmp(a, b, "le", lambda s: int(s != 2))

    def gt(self, a, b):
        return self._cmp(a, b, "gt", lambda s: int(s == 2))

    def ge(self, a, b):
        return self._cmp(a, b, "ge", lambda s: int(s != 1))

    def mul(self, a, b):
        """Carry-save block-product multiplication
        (ref: radix_parallel/mul.rs:329-464 + add.rs:789 sum trees)."""
        msg = self.msg
        a = jnp.asarray(a)
        b = jnp.asarray(b)
        B, nb, sz = a.shape
        pairs_lsb = [(i, j) for j in range(nb) for i in range(nb - j)]
        pairs_msb = [(i, j) for j in range(nb) for i in range(nb - j)
                     if i + j + 1 < nb]

        def products(pairs, key, f):
            ai = jnp.asarray([i for i, _ in pairs])
            bj = jnp.asarray([j for _, j in pairs])
            return self._biv(a[:, ai], b[:, bj], key, f)

        prod_lsb = products(pairs_lsb, "mlsb", lambda x, y: (x * y) % msg)
        columns = [[] for _ in range(nb)]
        for t, (i, j) in enumerate(pairs_lsb):
            columns[i + j].append(prod_lsb[:, t])
        if pairs_msb:
            prod_msb = products(pairs_msb, "mmsb",
                                lambda x, y: (x * y) // msg)
            for t, (i, j) in enumerate(pairs_msb):
                columns[i + j + 1].append(prod_msb[:, t])

        max_degree = msg * self.sks.carry_modulus - 1
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
                    acc = part[0]
                    for other in part[1:]:
                        acc = acc + other
                    to_extract.append((p, acc))
            if to_extract:
                stacked = jnp.stack([t[1] for t in to_extract], axis=1)
                msgs = self._wave(stacked, "msgext", lambda v: v % msg)
                carries = self._wave(stacked, "carryext",
                                     lambda v: v // msg)
                for t, (p, _) in enumerate(to_extract):
                    new_columns[p].append(msgs[:, t])
                    if p + 1 < nb:
                        new_columns[p + 1].append(carries[:, t])
            columns = new_columns

        zero = jnp.zeros((B, sz), a.dtype)
        top = jnp.stack([c[0] if c else zero for c in columns], axis=1)
        bot = jnp.stack([c[1] if len(c) > 1 else zero for c in columns],
                        axis=1)
        return self._propagate(top + bot)


def encrypt_batch_radix(icks, values, num_blocks: int) -> np.ndarray:
    """Encrypt a list of clear ints -> [B, nb, sz] for BatchedRadixOps."""
    msg = icks.message_modulus
    digs = [(int(v) // msg**j) % msg
            for v in values for j in range(num_blocks)]
    data = icks.key.encrypt_batch(np.asarray(digs, _U64)).data
    return data.reshape(len(values), num_blocks, -1)


def decrypt_batch_radix(icks, data) -> list:
    """[B, nb, sz] -> clear ints (mod msg**nb)."""
    data = np.asarray(data)
    B, nb, sz = data.shape
    msg = icks.message_modulus
    digs = icks.key.decrypt_batch(data.reshape(-1, sz)).reshape(B, nb)
    return [int(sum(int(d) * msg**j for j, d in enumerate(row)))
            for row in digs]

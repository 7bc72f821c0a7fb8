"""Batched string pattern ops: host-scheduled ks+pbs waves over [B] strings.

Throughput framing of the string ops (the single-string API in
server_key.py is depth/latency-bound): B haystacks run through the same
wave schedule, every PBS round covering all strings at once through the
batch-chunked fused kernel.  Replaces the single-program
fused_strings_contains for large batches (its real-params compile wedged
the remote compiler — BENCH_SUITE_r04.json round-4 note).

Clear patterns additionally use PAIR-PACKED block equality: two radix
blocks of a char pack into one PBS input (b_hi*msg + b_lo, noise level
msg+1 = in contract), and one univariate LUT compares against the clear
4-bit digit pair — 2 PBS per char-eq instead of 4
(ref: fhe_strings server_key/comparisons.rs per-char eq loops).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U64 = np.uint64


class BatchedStringOps:
    """Batched pattern matching over raw char-block grids.

    String format: np.uint64 [B, n, nb, sz] clean radix char blocks,
    FINAL padding (chars past the logical length encrypt 0).
    """

    def __init__(self, sks):
        self.sks = sks
        self.msg = sks.message_modulus
        self.cap = int(sks.max_noise_level)
        self._luts = {}

    def _lut(self, key, f):
        if key not in self._luts:
            self._luts[key] = self.sks.generate_lookup_table(f)
        return self._luts[key]

    def _wave(self, data, lut_key, f):
        """Device-resident wave (see integer/batched.py _wave)."""
        flat = data.reshape(-1, data.shape[-1])
        out = self.sks._pbs_device(flat, self._lut(lut_key, f).acc)
        return out.reshape(data.shape)

    def _trivial_one(self, shape):
        return jnp.zeros(shape, jnp.uint64).at[..., -1].set(
            _U64(self.sks.delta))

    def _sum_thresh(self, bits, op: str):
        """Collapse axis 1 of 0/1 blocks: AND (== count) or OR (!= 0)."""
        while bits.shape[1] > 1:
            m = bits.shape[1]
            c = min(self.cap, m)
            pad = (-m) % c
            if pad:
                fill = (self._trivial_one(
                    (bits.shape[0], pad, bits.shape[2])) if op == "and"
                    else jnp.zeros((bits.shape[0], pad, bits.shape[2]),
                                   jnp.uint64))
                bits = jnp.concatenate([bits, fill], axis=1)
                m += pad
            s = bits.reshape(bits.shape[0], m // c, c,
                             bits.shape[2]).sum(axis=2)
            if op == "and":
                bits = self._wave(s, ("and_sum", c),
                                  lambda v, c=c: int(v == c))
            else:
                bits = self._wave(s, ("or_sum", c), lambda v: int(v != 0))
        return bits[:, 0]

    def _pair_eqs(self, blocks, pattern: str):
        """Pair-packed block equality of every (offset, pattern char).

        blocks [B, n, nb, sz]; returns 0/1 bits [B, n_off, plen*npair, sz].
        """
        sks = self.sks
        msg = self.msg
        B, n, nb, sz = blocks.shape
        assert nb % 2 == 0
        npair = nb // 2
        plen = len(pattern)
        n_off = n - plen + 1
        assert n_off >= 1, "pattern longer than haystack"
        # gather [B, n_off, plen, nb, sz]
        idx = np.arange(n_off)[:, None] + np.arange(plen)[None, :]
        g = jnp.asarray(blocks)[:, jnp.asarray(idx)]
        packed = g[:, :, :, 1::2] * _U64(msg) + g[:, :, :, 0::2]
        packed = packed.reshape(B, n_off, plen * npair, sz)
        # per-slot clear digit-pair values -> per-ct eq LUT selection
        vals = []
        for c in pattern:
            digs = [(ord(c) // msg**d) % msg for d in range(nb)]
            vals.extend(digs[2 * p + 1] * msg + digs[2 * p]
                        for p in range(npair))
        dom = msg * msg
        luts = [self._lut(("pair_eq", v), lambda x, v=v: int(x == v))
                for v in range(dom)]
        accs = jnp.stack([l.acc for l in luts])
        sel = np.tile(np.asarray(vals, np.int64), B * n_off)
        flat = packed.reshape(-1, sz)
        out = self.sks._pbs_device(flat, accs[jnp.asarray(sel)])
        return out.reshape(B, n_off, plen * npair, sz)

    def _offset_matches(self, blocks, pattern: str):
        """[B, n_off, sz] 0/1: pattern matches at each offset."""
        bits = self._pair_eqs(blocks, pattern)         # [B, n_off, m, sz]
        B, n_off, m, sz = bits.shape
        flat = bits.reshape(B * n_off, m, sz)
        match = self._sum_thresh(flat, "and")          # [B*n_off, sz]
        return match.reshape(B, n_off, sz)

    def contains(self, blocks, pattern: str):
        """[B, n, nb, sz] -> [B, sz] 0/1 blocks (ref: contains.rs:18-41)."""
        match = self._offset_matches(blocks, pattern)
        return self._sum_thresh(match, "or")

    def find(self, blocks, pattern: str):
        """-> (found [B, sz], first-match index bits [B, n_off, sz]).

        Index isolation via chunked prefix-OR (3 waves; see
        strings/server_key._prefix_or for the depth argument)."""
        match = self._offset_matches(blocks, pattern)  # [B, n_off, sz]
        B, n_off, sz = match.shape
        cap = self.cap
        # intra-chunk inclusive prefix sums (linear; noise <= cap)
        pad = (-n_off) % cap
        mp = jnp.concatenate(
            [match, jnp.zeros((B, pad, sz), match.dtype)], axis=1)
        nchunk = mp.shape[1] // cap
        s = jnp.cumsum(mp.reshape(B, nchunk, cap, sz), axis=2).reshape(
            B, nchunk * cap, sz)[:, :n_off]
        pc = self._wave(s, ("or_sum", cap), lambda v: int(v != 0))
        if nchunk > 1:
            ends = np.minimum(np.arange(1, nchunk + 1) * cap - 1, n_off - 1)
            t = pc[:, jnp.asarray(ends)]
            # exclusive prefix sums of the <= cap chunk bools (linear)
            e = jnp.concatenate(
                [jnp.zeros((B, 1, sz), t.dtype),
                 jnp.cumsum(t[:, :-1], axis=1)], axis=1)
            pb = self._wave(e, ("or_sum", cap), lambda v: int(v != 0))
            rep = np.repeat(np.arange(nchunk), cap)[:n_off]
            packed = pc * _U64(self.msg) + pb[:, jnp.asarray(rep)]
            seen = self._wave(packed, "or_biv",
                              lambda v: int(bool(v // self.msg)
                                            or bool(v % self.msg)))
        else:
            seen = pc
        found = seen[:, -1]
        before = jnp.concatenate(
            [jnp.zeros((B, 1, sz), seen.dtype), seen[:, :-1]], axis=1)
        packed = match * _U64(self.msg) + before
        firsts = self._wave(
            packed, "first",
            lambda v: int(bool(v // self.msg) and not (v % self.msg)))
        return found, firsts


def encrypt_batch_strings(scks, texts, max_len: int) -> np.ndarray:
    """Encrypt B python strings -> [B, max_len, nb, sz] (FINAL padding)."""
    from .client_key import NUMBER_BLOCKS

    key = scks.integer_key.key
    msg = key.params.message_modulus
    digs = []
    for t in texts:
        chars = [ord(c) for c in t] + [0] * (max_len - len(t))
        digs.extend((c // msg**d) % msg
                    for c in chars for d in range(NUMBER_BLOCKS))
    data = key.encrypt_batch(np.asarray(digs, _U64)).data
    return data.reshape(len(texts), max_len, NUMBER_BLOCKS, -1)

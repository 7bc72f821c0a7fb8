"""String server key: ~30 std-string operations over encrypted ASCII
(ref: tfhe/examples/fhe_strings/server_key/ — comparisons.rs, contains.rs,
starts_with.rs, ends_with.rs, find.rs, change_case.rs, change_padding.rs,
add.rs, repeat.rs, substring.rs, trim.rs, strip.rs, is_empty.rs).

TPU formulation: every per-character loop in the reference becomes a stacked
ShortintBatch so each round of character comparisons / selects / folds is ONE
fused keyswitch+PBS device call; AND/OR folds and prefix scans run in log2
rounds (the reference folds sequentially or with rayon).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from ..integer import IntegerServerKey
from ..integer.ciphertext import BooleanBlock, RadixCiphertext
from ..shortint.ciphertext import ShortintBatch
from .ciphertext import FheAsciiChar, FheString, Padding
from .client_key import NUMBER_BLOCKS
from .split import SplitOps

_U64 = np.uint64

Pattern = Union[str, bytes, int, FheAsciiChar, FheString]


def _cat(batches: List[ShortintBatch]) -> ShortintBatch:
    return ShortintBatch(
        data=np.concatenate([b.data for b in batches], axis=0),
        degrees=np.concatenate([b.degrees for b in batches]),
        message_modulus=batches[0].message_modulus,
        carry_modulus=batches[0].carry_modulus,
        noise=np.concatenate([b.noise for b in batches]),
    )


def _take(b: ShortintBatch, idx) -> ShortintBatch:
    idx = np.asarray(idx)
    return ShortintBatch(
        data=b.data[idx], degrees=b.degrees[idx],
        message_modulus=b.message_modulus, carry_modulus=b.carry_modulus,
        noise=b.noise[idx],
    )


class StringServerKey(SplitOps):
    def __init__(self, integer_key: IntegerServerKey):
        self.integer_key = integer_key
        self.sks = integer_key.key
        self.nb = NUMBER_BLOCKS
        self.msg = integer_key.message_modulus

    # ==================================================================
    # stacked-character machinery
    # ==================================================================

    def _stack(self, cts: List[RadixCiphertext]) -> ShortintBatch:
        return _cat([c.blocks for c in cts])

    def _unstack(self, b: ShortintBatch, n: int) -> List[RadixCiphertext]:
        nb = len(b) // n
        return [RadixCiphertext(_take(b, range(i * nb, (i + 1) * nb)))
                for i in range(n)]

    def _trivial_chars(self, values) -> ShortintBatch:
        """Trivial radix blocks for a list of clear chars -> [n*nb]."""
        msg = self.msg
        digits = []
        for v in values:
            digits.extend((int(v) // msg**j) % msg for j in range(self.nb))
        return self.sks.trivial_batch(np.asarray(digits, dtype=_U64),
                                      len(values) * self.nb)

    def _content_stack(self, s: FheString, upto: Optional[int] = None
                       ) -> ShortintBatch:
        n = upto if upto is not None else s.max_len
        parts = [c.ct.blocks for c in s.content[:n]]
        if n > s.max_len:
            parts.append(self._trivial_chars([0] * (n - s.max_len)))
        if not parts:
            return self._trivial_chars([])
        return _cat(parts)

    def _gather_chars(self, s: FheString, indices: List[int]) -> ShortintBatch:
        """Stack s.content[i] for each i (trivial zero char when i >= max_len)."""
        zero = None
        parts = []
        for i in indices:
            if i < s.max_len:
                parts.append(s.content[i].ct.blocks)
            else:
                if zero is None:
                    zero = self._trivial_chars([0])
                parts.append(zero)
        return _cat(parts) if parts else self._trivial_chars([])

    # -- generic grouped binary-tree reduction ------------------------

    def _tree_reduce(self, b: ShortintBatch, num: int, blut) -> ShortintBatch:
        """Reduce groups of m contiguous blocks to one block per group.

        Pairing combines (2i, 2i+1) with the HIGHER index as the bivariate
        lhs; odd leftovers (most significant) pass through and are appended
        at the end of the group."""
        m = len(b) // num
        while m > 1:
            arr = np.arange(num * m).reshape(num, m)
            lo_idx = arr[:, 0:m - 1:2].ravel()
            hi_idx = arr[:, 1:m:2].ravel()
            lo = _take(b, lo_idx)
            hi = _take(b, hi_idx)
            merged = self.sks.unchecked_bivariate_batch(hi, lo, blut)
            pairs = (m // 2)
            new_m = pairs + (m % 2)
            if m % 2 == 1:
                leftover = _take(b, arr[:, m - 1])
                # interleave: per group [merged..., leftover]
                out_rows = []
                md = merged
                for g in range(num):
                    out_rows.append(_take(md, range(g * pairs, (g + 1) * pairs)))
                    out_rows.append(_take(leftover, [g]))
                b = _cat(out_rows)
            else:
                b = merged
            m = new_m
        return b

    def _scan(self, b: ShortintBatch, num: int, blut, reverse: bool = False,
              fill: int = 0) -> ShortintBatch:
        """Grouped inclusive Hillis-Steele prefix combine (left-to-right, or
        right-to-left when reverse).  `fill` is the identity element shifted
        in at the boundary (0 for OR, 1 for AND)."""
        m = len(b) // num
        d = 1
        while d < m:
            if reverse:
                prev = self.integer_key._shift_blocks_down(b, d, num=num)
            else:
                prev = self.integer_key._shift_blocks_up(b, d, num=num)
            if fill:
                arr = np.arange(num * m).reshape(num, m)
                pad_idx = (arr[:, m - d:].ravel() if reverse
                           else arr[:, :d].ravel())
                fills = self.sks.trivial_batch(
                    np.full(len(pad_idx), fill, dtype=_U64), len(pad_idx))
                prev.data[pad_idx] = fills.data
                prev.degrees[pad_idx] = fills.degrees
                prev.noise[pad_idx] = fills.noise
            b = self.sks.unchecked_bivariate_batch(b, prev, blut)
            d *= 2
        return b

    # -- character-level comparisons ----------------------------------

    def _sign_blut(self):
        return self.sks.generate_lookup_table_bivariate(
            lambda x, y: 0 if x == y else (1 if x < y else 2))

    def _resolve_blut(self):
        """combine(high, low) = high unless equal.  Inputs are 3-state signs
        (<= 2); the table is clamped there so the tracked degree stays 2."""
        return self.sks.generate_lookup_table_bivariate(
            lambda high, low: min(low if high == 0 else high, 2))

    def _char_signs(self, a_stack: ShortintBatch, b_stack: ShortintBatch,
                    n: int) -> ShortintBatch:
        """Per-char 3-state sign (0 eq, 1 lt, 2 gt) -> [n]."""
        signs = self.sks.unchecked_bivariate_batch(
            a_stack, b_stack, self._sign_blut())
        return self._tree_reduce(signs, n, self._resolve_blut())

    def _cached_lut(self, key, build):
        cache = getattr(self, "_lut_cache", None)
        if cache is None:
            cache = self._lut_cache = {}
        if key not in cache:
            cache[key] = build()
        return cache[key]

    def _beq_blut(self):
        return self._cached_lut("beq", lambda: (
            self.sks.generate_lookup_table_bivariate(
                lambda x, y: int(x == y))))

    def _char_eq(self, a_stack, b_stack, n) -> ShortintBatch:
        """Per-char 0/1 equality in TWO PBS rounds: one bivariate block-eq
        wave, then one sum-threshold wave over the nb bits per char
        (carry-space sums of fresh bools stay inside max_noise_level).
        Replaces the 4-round sign/resolve-tree/==0 chain — the TPU
        depth-optimal form of the reference's per-char eq
        (ref: fhe_strings server_key/comparisons.rs eq loops)."""
        sks = self.sks
        beq = sks.unchecked_bivariate_batch(a_stack, b_stack,
                                            self._beq_blut())
        nb = self.nb
        if nb == 1:
            return beq
        assert nb <= sks.max_noise_level, "sum-packed char eq needs nb bits"
        arr = np.arange(n * nb).reshape(n, nb)
        s = _take(beq, arr[:, 0])
        for k in range(1, nb):
            s = sks.unchecked_add_batch(s, _take(beq, arr[:, k]))
        lut = self._cached_lut(("sum_eq", nb), lambda: (
            sks.generate_lookup_table(lambda x: int(x == nb))))
        return sks.apply_lookup_table_batch(s, lut)

    def _bool_reduce(self, b: ShortintBatch, num: int, op: str
                     ) -> ShortintBatch:
        """Grouped AND/OR over 0/1 blocks via carry-space sum-thresholds.

        Each round collapses min(max_noise_level, m) bools per chunk with
        ONE PBS (sum of k unit-noise bools has noise level k and degree k,
        both in contract), so fan-in is 5 instead of the bivariate tree's
        2 — fewer rounds AND fewer PBS than pairwise folding
        (ref: pattern.rs:106-115 folds pairwise)."""
        sks = self.sks
        m = len(b) // num
        cap = int(sks.max_noise_level)
        fillv = 1 if op == "and" else 0
        while m > 1:
            c = min(cap, m)
            pad = (-m) % c
            if pad:
                fills = sks.trivial_batch(
                    np.full(num * pad, fillv, dtype=_U64), num * pad)
                rows = []
                for g in range(num):
                    rows.append(_take(b, range(g * m, (g + 1) * m)))
                    rows.append(_take(fills, range(g * pad, (g + 1) * pad)))
                b = _cat(rows)
                m += pad
            arr = np.arange(num * m).reshape(num * (m // c), c)
            s = _take(b, arr[:, 0])
            for k in range(1, c):
                s = sks.unchecked_add_batch(s, _take(b, arr[:, k]))
            if op == "and":
                lut = self._cached_lut(("and_sum", c), lambda c=c: (
                    sks.generate_lookup_table(lambda x: int(x == c))))
            else:
                lut = self._cached_lut(("or_sum", c), lambda c=c: (
                    sks.generate_lookup_table(lambda x: int(x != 0))))
            b = sks.apply_lookup_table_batch(s, lut)
            m //= c
        return b

    def _prefix_or(self, b: ShortintBatch, reverse: bool = False
                   ) -> ShortintBatch:
        """Inclusive prefix-OR of a 0/1 block vector in ~3 PBS rounds.

        Within chunks of max_noise_level the prefix sums are linear
        (noise <= cap), one threshold LUT gives intra-chunk prefix-ORs;
        exclusive chunk prefixes reduce recursively; one bivariate OR
        merges.  Replaces the log2(n)-round Hillis-Steele _scan for the
        boolean-OR case (find/rfind hot path)."""
        sks = self.sks
        n = len(b)
        if n == 1:
            return _take(b, [0])
        if reverse:
            rev = np.arange(n - 1, -1, -1)
            return _take(self._prefix_or(_take(b, rev)), rev)
        cap = int(sks.max_noise_level)
        or_lut = self._cached_lut(("or_sum", cap), lambda: (
            sks.generate_lookup_table(lambda x: int(x != 0))))
        # intra-chunk inclusive prefix sums (linear)
        s = _take(b, np.arange(n))
        for k in range(1, cap):
            idx = np.asarray([i for i in range(n) if i % cap >= k])
            if idx.size == 0:
                break
            # s[i] += b[i - k]: after all k, s[i] = sum of b over its chunk
            # prefix (i % cap + 1 terms, noise <= cap)
            add = sks.unchecked_add_batch(_take(s, idx), _take(b, idx - k))
            s.data[idx] = add.data
            s.degrees[idx] = add.degrees
            s.noise[idx] = add.noise
        pc = sks.apply_lookup_table_batch(s, or_lut)       # [n]
        nchunk = -(-n // cap)
        if nchunk == 1:
            return pc
        ends = np.minimum(np.arange(1, nchunk + 1) * cap - 1, n - 1)
        t = _take(pc, ends)                                # chunk ORs
        tp = self._prefix_or(t)                            # inclusive
        # exclusive shift: chunk j sees OR of chunks < j
        prev = _take(tp, np.maximum(np.arange(nchunk) - 1, 0))
        zero = sks.trivial_batch(np.zeros(1, dtype=_U64), 1)
        prev.data[0] = zero.data[0]
        prev.degrees[0] = 0
        prev.noise[0] = 0
        prev_rep = _take(prev, np.repeat(np.arange(nchunk), cap)[:n])
        return sks.unchecked_bivariate_batch(pc, prev_rep, self._or_blut())

    def _and_blut(self):
        # explicit 0/1 output: keeps the tracked degree at 1 for boolean
        # blocks (a plain `a & b` table has full-domain max 3)
        return self.sks.generate_lookup_table_bivariate(
            lambda a, b: int(bool(a) and bool(b)))

    def _or_blut(self):
        return self.sks.generate_lookup_table_bivariate(
            lambda a, b: int(bool(a) or bool(b)))

    def _bool_fold(self, bools: ShortintBatch, op: str) -> BooleanBlock:
        return BooleanBlock(self._bool_reduce(bools, 1, op))

    def _bools_count(self, bools: ShortintBatch) -> RadixCiphertext:
        """Sum of 0/1 blocks as a radix integer."""
        columns = [[_take(bools, [i]) for i in range(len(bools))]]
        columns += [[] for _ in range(self.nb - 1)]
        return RadixCiphertext(self.integer_key._sum_columns(columns))

    def _weighted_index_sum(self, firsts: ShortintBatch) -> RadixCiphertext:
        """sum_i i * firsts[i] as a radix integer (no PBS for the weighting)."""
        msg = self.msg
        columns: List[List[ShortintBatch]] = [[] for _ in range(self.nb)]
        for i in range(len(firsts)):
            for j in range(self.nb):
                dgt = (i // msg**j) % msg
                if dgt:
                    columns[j].append(
                        self.sks.unchecked_scalar_mul_batch(_take(firsts, [i]), dgt))
        if not any(columns):
            return self.integer_key.create_trivial_radix(0, self.nb)
        return RadixCiphertext(self.integer_key._sum_columns(columns))

    # -- batched per-char select / arithmetic -------------------------

    def _repeat_bool_per_block(self, cond: ShortintBatch) -> ShortintBatch:
        """[n] 0/1 blocks -> [n*nb] repeated per char block."""
        return _take(cond, np.repeat(np.arange(len(cond)), self.nb))

    def _char_cmux(self, cond: ShortintBatch, a_stack: ShortintBatch,
                   b_stack: ShortintBatch) -> ShortintBatch:
        """per char: cond ? a : b (cond: [n] 0/1; stacks [n*nb])."""
        sks = self.sks
        c = self._repeat_bool_per_block(cond)
        then_lut = sks.generate_lookup_table_bivariate(lambda cc, x: x if cc else 0)
        else_lut = sks.generate_lookup_table_bivariate(lambda cc, x: 0 if cc else x)
        ta = sks.unchecked_bivariate_batch(c, a_stack, then_lut)
        tb = sks.unchecked_bivariate_batch(c, b_stack, else_lut)
        return sks.message_extract_batch(sks.unchecked_add_batch(ta, tb))

    def _char_zero_if(self, cond: ShortintBatch, stack: ShortintBatch
                      ) -> ShortintBatch:
        """per char: cond ? 0 : char."""
        sks = self.sks
        c = self._repeat_bool_per_block(cond)
        lut = sks.generate_lookup_table_bivariate(lambda cc, x: 0 if cc else x)
        return sks.unchecked_bivariate_batch(c, stack, lut)

    def _sub_stacks(self, a_stack: ShortintBatch, b_stack: ShortintBatch,
                    num: int) -> ShortintBatch:
        """Per-char radix subtraction over stacked chars."""
        nbk = self.integer_key._neg_blocks(b_stack, num=num)
        s = self.sks.unchecked_add_batch(a_stack, nbk)
        clean, _ = self.integer_key.propagate_single_carry(s, num=num)
        return clean

    # ==================================================================
    # pattern normalization
    # ==================================================================

    def _pattern_stack(self, pattern: Pattern) -> Tuple[ShortintBatch, int, bool]:
        """-> (stack [plen*nb], plen, is_encrypted_with_padding)."""
        if isinstance(pattern, FheAsciiChar):
            return pattern.ct.blocks, 1, False
        if isinstance(pattern, int):
            return self._trivial_chars([pattern]), 1, False
        if isinstance(pattern, (str, bytes)):
            data = pattern.encode("ascii") if isinstance(pattern, str) else pattern
            return self._trivial_chars(list(data)), len(data), False
        if isinstance(pattern, FheString):
            p = self._with_final_padding(pattern)
            return (self._content_stack(p), p.max_len,
                    p.padding != Padding.NONE)
        raise TypeError(f"unsupported pattern type {type(pattern)}")

    def _with_final_padding(self, s: FheString) -> FheString:
        """Normalize so any padding zeros are at the end
        (ref: change_padding.rs push_padding_to_end)."""
        if s.padding in (Padding.NONE, Padding.FINAL):
            return s
        return self.push_padding_to_end(s)

    # ==================================================================
    # operations
    # ==================================================================

    # -- length (ref: accessors.rs, is_empty.rs, length_arithmetic.rs) --

    def len_(self, s: FheString):
        return s.length

    def is_empty(self, s: FheString) -> BooleanBlock:
        if isinstance(s.length, int):
            return self.integer_key.create_trivial_bool(s.length == 0)
        return self.integer_key.scalar_eq_parallelized(s.length, 0)

    def _length_radix(self, s: FheString) -> RadixCiphertext:
        if isinstance(s.length, int):
            return self.integer_key.create_trivial_radix(s.length, self.nb)
        return s.length

    # -- comparisons (ref: comparisons.rs) ----------------------------

    def eq(self, s: FheString, pattern: Pattern) -> BooleanBlock:
        pstack, plen, _ = self._pattern_stack(pattern)
        if isinstance(pattern, (str, bytes)) and isinstance(s.length, int) \
                and s.padding == Padding.NONE and plen != s.length:
            return self.integer_key.create_trivial_bool(False)
        s = self._with_final_padding(s)
        n = max(s.max_len, plen)
        if n == 0:  # both empty
            return self.integer_key.create_trivial_bool(True)
        a = self._content_stack(s, upto=n)
        if plen < n:
            pstack = _cat([pstack, self._trivial_chars([0] * (n - plen))])
        eqs = self._char_eq(a, pstack, n)
        return self._bool_fold(eqs, "and")

    def ne(self, s: FheString, pattern: Pattern) -> BooleanBlock:
        return self.integer_key.boolean_bitnot(self.eq(s, pattern))

    def eq_ignore_case(self, s: FheString, pattern: Pattern) -> BooleanBlock:
        s_low = self.to_lowercase(s)
        if isinstance(pattern, (str, bytes)):
            p = pattern.lower() if isinstance(pattern, str) else pattern.lower()
            return self.eq(s_low, p)
        if isinstance(pattern, FheString):
            return self.eq(s_low, self.to_lowercase(pattern))
        raise TypeError("eq_ignore_case expects a string pattern")

    def _lex_sign(self, s: FheString, pattern: Pattern) -> ShortintBatch:
        """3-state lexicographic sign of (s vs pattern); 0 eq, 1 lt, 2 gt."""
        pstack, plen, _ = self._pattern_stack(pattern)
        s = self._with_final_padding(s)
        n = max(s.max_len, plen)
        if n == 0:  # both empty -> equal
            return self.sks.trivial_batch(np.zeros(1, dtype=_U64), 1)
        a = self._content_stack(s, upto=n)
        if plen < n:
            pstack = _cat([pstack, self._trivial_chars([0] * (n - plen))])
        signs = self._char_signs(a, pstack, n)  # [n], leftmost most significant
        rev = _take(signs, np.arange(n - 1, -1, -1))
        return self._tree_reduce(rev, 1, self._resolve_blut())

    def le(self, s: FheString, pattern: Pattern) -> BooleanBlock:
        sign = self._lex_sign(s, pattern)
        lut = self.sks.generate_lookup_table(lambda x: int(x != 2))
        return BooleanBlock(self.sks.apply_lookup_table_batch(sign, lut))

    def ge(self, s: FheString, pattern: Pattern) -> BooleanBlock:
        sign = self._lex_sign(s, pattern)
        lut = self.sks.generate_lookup_table(lambda x: int(x != 1))
        return BooleanBlock(self.sks.apply_lookup_table_batch(sign, lut))

    def lt(self, s: FheString, pattern: Pattern) -> BooleanBlock:
        sign = self._lex_sign(s, pattern)
        lut = self.sks.generate_lookup_table(lambda x: int(x == 1))
        return BooleanBlock(self.sks.apply_lookup_table_batch(sign, lut))

    def gt(self, s: FheString, pattern: Pattern) -> BooleanBlock:
        sign = self._lex_sign(s, pattern)
        lut = self.sks.generate_lookup_table(lambda x: int(x == 2))
        return BooleanBlock(self.sks.apply_lookup_table_batch(sign, lut))

    # -- pattern matching core ----------------------------------------
    # (ref: pattern.rs:106-115 is_contained_in OR-fold over offsets;
    #  contains.rs:18-41)

    def _prefix_matches(self, s: FheString, pattern: Pattern,
                        offsets: List[int]) -> ShortintBatch:
        """match[i] = 1 iff pattern is a prefix of s[i..] — [len(offsets)]."""
        pstack, plen, p_padded = self._pattern_stack(pattern)
        if plen == 0:
            ones = self.sks.trivial_batch(
                np.ones(len(offsets), dtype=_U64), len(offsets))
            return ones
        s = self._with_final_padding(s)
        # gather all (offset, j) character pairs
        idx = [i + j for i in offsets for j in range(plen)]
        schars = self._gather_chars(s, idx)
        prep = _take(pstack, np.tile(np.arange(plen * self.nb), len(offsets)))
        eqs = self._char_eq(schars, prep, len(offsets) * plen)
        if p_padded:
            # pattern padding zeros match anything: term = is_pad | eq
            zeros = self._trivial_chars([0] * plen)
            is_pad = self._char_eq(pstack, zeros, plen)
            is_pad_rep = _take(is_pad, np.tile(np.arange(plen), len(offsets)))
            eqs = self.sks.unchecked_bivariate_batch(
                is_pad_rep, eqs, self._or_blut())
        return self._bool_reduce(eqs, len(offsets), "and")

    def contains(self, s: FheString, pattern: Pattern) -> BooleanBlock:
        """(ref: contains.rs:18-41)"""
        offsets = list(range(s.max_len))
        if not offsets:
            # empty haystack contains only the empty pattern
            _, plen, p_padded = self._pattern_stack(pattern)
            if plen == 0:
                return self.integer_key.create_trivial_bool(True)
            if not p_padded:
                return self.integer_key.create_trivial_bool(False)
            return self.is_empty_pattern(pattern)
        matches = self._prefix_matches(s, pattern, offsets)
        return self._bool_fold(matches, "or")

    def is_empty_pattern(self, pattern: Pattern) -> BooleanBlock:
        if isinstance(pattern, FheString):
            return self.is_empty(pattern)
        _, plen, _ = self._pattern_stack(pattern)
        return self.integer_key.create_trivial_bool(plen == 0)

    def starts_with(self, s: FheString, pattern: Pattern) -> BooleanBlock:
        """(ref: starts_with.rs)"""
        m = self._prefix_matches(s, pattern, [0])
        return BooleanBlock(m)

    def ends_with(self, s: FheString, pattern: Pattern) -> BooleanBlock:
        """(ref: ends_with.rs) — match at offset len(s)-len(p)."""
        _, plen, p_padded = self._pattern_stack(pattern)
        if isinstance(s.length, int) and not p_padded:
            if plen > s.length:
                return self.integer_key.create_trivial_bool(False)
            m = self._prefix_matches(s, pattern, [s.length - plen])
            return BooleanBlock(m)
        # encrypted length: OR_i ( prefix_match[i] AND i == len(s)-len(p) )
        offsets = list(range(s.max_len + 1))
        matches = self._prefix_matches(s, pattern, offsets)
        len_s = self._length_radix(s)
        if isinstance(pattern, FheString) and pattern.is_encrypted_length():
            d = self.integer_key.sub_parallelized(len_s, pattern.length)
        else:
            d = self.integer_key.scalar_sub_parallelized(len_s, plen)
        # indicator[i] = (d == i), all offsets batched
        n = len(offsets)
        d_rep = _take(d.blocks, np.tile(np.arange(self.nb), n))
        triv = self._trivial_chars(offsets)
        ind = self._char_eq(d_rep, triv, n)
        both = self.sks.unchecked_bivariate_batch(matches, ind, self._and_blut())
        return self._bool_fold(both, "or")

    # -- find / rfind (ref: find.rs) ----------------------------------

    def _first_matches(self, matches: ShortintBatch, reverse: bool = False
                       ) -> ShortintBatch:
        """Isolate the first (or last) set bit of a 0/1 vector."""
        return self._first_matches_and_found(matches, reverse)[0]

    def _first_matches_and_found(self, matches: ShortintBatch,
                                 reverse: bool = False):
        """(first-set-bit indicator vector, OR of all bits) — the found
        flag is the prefix-OR's last element, shared for free."""
        seen = self._prefix_or(matches, reverse=reverse)
        found = BooleanBlock(_take(seen, [0 if reverse
                                          else len(matches) - 1]))
        # inclusive scan; shift to exclusive
        if reverse:
            before = self.integer_key._shift_blocks_down(seen, 1)
        else:
            before = self.integer_key._shift_blocks_up(seen, 1)
        not_seen_blut = self.sks.generate_lookup_table_bivariate(
            lambda m, sb: int(bool(m) and not sb))
        firsts = self.sks.unchecked_bivariate_batch(matches, before,
                                                    not_seen_blut)
        return firsts, found

    def find(self, s: FheString, pattern: Pattern
             ) -> Tuple[BooleanBlock, RadixCiphertext]:
        """-> (found, index of first match) (ref: find.rs)."""
        offsets = list(range(max(s.max_len, 1)))
        matches = self._prefix_matches(s, pattern, offsets)
        firsts, found = self._first_matches_and_found(matches)
        return found, self._weighted_index_sum(firsts)

    def rfind(self, s: FheString, pattern: Pattern
              ) -> Tuple[BooleanBlock, RadixCiphertext]:
        offsets = list(range(max(s.max_len, 1)))
        matches = self._prefix_matches(s, pattern, offsets)
        lasts, found = self._first_matches_and_found(matches, reverse=True)
        return found, self._weighted_index_sum(lasts)

    # -- case mapping (ref: change_case.rs:18-82, branchless +-32) ----

    def _case_shift(self, s: FheString, lo: int, hi: int, up: bool) -> FheString:
        n = s.max_len
        if n == 0:
            return s.copy()
        stack = self._content_stack(s)
        in_range = self._char_range_mask(stack, n, lo, hi)
        # delta = 32 * mask as a radix char: per-block scalar mul by the
        # base-msg digits of 32 (no PBS)
        msg = self.msg
        digits32 = [(32 // msg**j) % msg for j in range(self.nb)]
        mask_rep = self._repeat_bool_per_block(in_range)  # [n*nb]
        delta_stack = self.sks.unchecked_scalar_mul_batch(
            mask_rep, np.tile(np.asarray(digits32, dtype=np.int64), n))
        if up:
            out = self._sub_stacks(stack, delta_stack, n)
        else:
            ssum = self.sks.unchecked_add_batch(stack, delta_stack)
            out, _ = self.integer_key.propagate_single_carry(ssum, num=n)
        return FheString(
            content=[FheAsciiChar(c) for c in self._unstack(out, n)],
            padding=s.padding,
            length=s.length if isinstance(s.length, int) else s.length.copy(),
        )

    def _char_range_mask(self, stack: ShortintBatch, n: int, lo: int, hi: int
                         ) -> ShortintBatch:
        """[n] booleans: lo <= char <= hi (batched sign comparisons)."""
        lo_stack = self._trivial_chars([lo] * n)
        hi_stack = self._trivial_chars([hi] * n)
        sign_lo = self._char_signs(stack, lo_stack, n)   # vs lo
        sign_hi = self._char_signs(stack, hi_stack, n)   # vs hi
        ge_lut = self.sks.generate_lookup_table(lambda x: int(x != 1))
        le_lut = self.sks.generate_lookup_table(lambda x: int(x != 2))
        ge = self.sks.apply_lookup_table_batch(sign_lo, ge_lut)
        le = self.sks.apply_lookup_table_batch(sign_hi, le_lut)
        return self.sks.unchecked_bivariate_batch(ge, le, self._and_blut())

    def to_uppercase(self, s: FheString) -> FheString:
        return self._case_shift(s, ord("a"), ord("z"), up=True)

    def to_lowercase(self, s: FheString) -> FheString:
        return self._case_shift(s, ord("A"), ord("Z"), up=False)

    # -- concat / repeat (ref: add.rs, repeat.rs) ---------------------

    def concat(self, s1: FheString, s2: FheString) -> FheString:
        content = [FheAsciiChar(c.ct.copy()) for c in s1.content] + \
                  [FheAsciiChar(c.ct.copy()) for c in s2.content]
        if isinstance(s1.length, int) and isinstance(s2.length, int):
            length: object = s1.length + s2.length
        else:
            length = self.integer_key.add_parallelized(
                self._length_radix(s1), self._length_radix(s2))
        if s1.padding == Padding.NONE:
            padding = s2.padding
        elif s1.padding == Padding.FINAL and s2.max_len == 0:
            padding = Padding.FINAL
        else:
            padding = Padding.ANYWHERE
        return FheString(content=content, padding=padding, length=length)

    add = concat

    def repeat(self, s: FheString, n: int) -> FheString:
        """Clear repetition count (ref: repeat.rs)."""
        if n == 0:
            return FheString(content=[], padding=Padding.NONE, length=0)
        out = s.copy()
        for _ in range(n - 1):
            out = self.concat(out, s)
        return out

    # -- substring (clear range; ref: substring.rs) -------------------

    def substring(self, s: FheString, start: int, end: int) -> FheString:
        s = self._with_final_padding(s)
        end = min(end, s.max_len)
        start = min(start, end)
        content = [FheAsciiChar(c.ct.copy()) for c in s.content[start:end]]
        width = end - start
        if isinstance(s.length, int):
            length: object = max(min(s.length, end) - start, 0)
            padding = s.padding if length == width else Padding.FINAL
        else:
            ik = self.integer_key
            ge = ik.scalar_cmp_parallelized(s.length, start, "ge")
            diff = ik.scalar_sub_parallelized(s.length, start)
            zero = ik.create_trivial_radix(0, self.nb)
            rem = ik.if_then_else_parallelized(ge, diff, zero)
            width_ct = ik.create_trivial_radix(width, self.nb)
            over = ik.scalar_cmp_parallelized(rem, width, "gt")
            length = ik.if_then_else_parallelized(over, width_ct, rem)
            padding = Padding.FINAL
        return FheString(content=content, padding=padding, length=length)

    # -- accessors (ref: accessors.rs:9-113, substring.rs:59-152) -----

    def nth_clear(self, s: FheString, n: int) -> FheAsciiChar:
        """The n-th character (zero char when out of range)
        (ref: accessors.rs nth_clear)."""
        s = self._with_final_padding(s)
        if n >= s.max_len:
            return FheAsciiChar(RadixCiphertext(self._trivial_chars([0])))
        return FheAsciiChar(RadixCiphertext(
            _take(s.content[n].ct.blocks, list(range(self.nb)))))

    def nth_encrypted(self, s: FheString, n: RadixCiphertext) -> FheAsciiChar:
        """Character at an encrypted index: one batched index-equality over
        every position and a weighted select (ref: accessors.rs
        nth_encrypted — the reference's per-position loop becomes two
        fused PBS batches)."""
        s = self._with_final_padding(s)
        ln = s.max_len
        stack = self._content_stack(s)
        idx_stack = self._trivial_chars(list(range(ln)))
        n_rep = _take(n.blocks, list(np.tile(np.arange(self.nb), ln)))
        eqs = self._char_eq(idx_stack, n_rep, ln)  # [ln] bools
        c = self._repeat_bool_per_block(eqs)
        pick_lut = self.sks.generate_lookup_table_bivariate(
            lambda cc, x: x if cc else 0)
        masked = self.sks.unchecked_bivariate_batch(c, stack, pick_lut)
        # exactly one position matches: plain block-wise sum, then clean
        data = np.asarray(masked.data).reshape(ln, self.nb, -1)
        with np.errstate(over="ignore"):
            acc = data.sum(axis=0, dtype=np.uint64)
        summed = ShortintBatch(
            data=acc,
            degrees=np.full(self.nb, min(int(masked.degrees.max(initial=0))
                                         * 1, self.msg - 1), dtype=np.int64),
            message_modulus=self.msg,
            carry_modulus=masked.carry_modulus,
        )
        return FheAsciiChar(RadixCiphertext(
            self.sks.message_extract_batch(summed)))

    def _shift_chars_left_encrypted(self, stack: ShortintBatch, ln: int,
                                    amount: RadixCiphertext) -> ShortintBatch:
        """Barrel shift of the char stack by an encrypted amount: one
        4-way select per radix digit of the amount (batched bivariate
        PBS), zero-filling past the end."""
        sks = self.sks
        msg = self.msg
        cur = stack
        digit = 0
        while msg ** digit < ln:
            weight = msg ** digit
            blk = _take(amount.blocks, [digit]) if digit < amount.num_blocks \
                else None
            if blk is None:
                break
            parts = []
            for d in range(msg):
                shift = d * weight
                data = np.asarray(cur.data).reshape(ln, self.nb, -1)
                if shift == 0:
                    rolled = data
                else:
                    zero = np.asarray(
                        self._trivial_chars([0] * min(shift, ln)).data
                    ).reshape(-1, self.nb, data.shape[-1])
                    rolled = np.concatenate([data[shift:], zero], axis=0) \
                        if shift < ln else np.broadcast_to(
                            zero[:1], data.shape)
                rolled_b = ShortintBatch(
                    data=np.ascontiguousarray(rolled).reshape(
                        ln * self.nb, -1),
                    degrees=np.full(ln * self.nb, msg - 1, dtype=np.int64),
                    message_modulus=msg, carry_modulus=cur.carry_modulus,
                )
                eq_lut = sks.generate_lookup_table_bivariate(
                    lambda b_, x, d_=d: x if (b_ % msg) == d_ else 0)
                cond = _take(blk, [0] * (ln * self.nb))
                parts.append(sks.unchecked_bivariate_batch(
                    cond, rolled_b, eq_lut))
            with np.errstate(over="ignore"):
                acc_data = np.sum([np.asarray(p.data) for p in parts],
                                  axis=0, dtype=np.uint64)
            summed = ShortintBatch(
                data=acc_data,
                degrees=np.full(ln * self.nb, msg - 1, dtype=np.int64),
                message_modulus=msg, carry_modulus=cur.carry_modulus,
            )
            cur = sks.message_extract_batch(summed)
            digit += 1
        return cur

    def substring_encrypted(self, s: FheString, start: RadixCiphertext,
                            end: RadixCiphertext) -> FheString:
        """s[start..end] with encrypted bounds (ref: substring.rs
        substring_encrypted:59-116)."""
        ik = self.integer_key
        s = self._with_final_padding(s)
        ln = s.max_len
        stack = self._content_stack(s)
        shifted = self._shift_chars_left_encrypted(stack, ln, start)

        # keep position i iff i < end - start (saturating)
        ge = ik.ge_parallelized(end, start)
        diff = ik.sub_parallelized(end, start)
        zero = ik.create_trivial_radix(0, self.nb)
        keep_len = ik.if_then_else_parallelized(ge, diff, zero)
        idx_stack = self._trivial_chars(list(range(ln)))
        keep_rep = _take(keep_len.blocks,
                         list(np.tile(np.arange(self.nb), ln)))
        signs = self._char_signs(idx_stack, keep_rep, ln)  # 1 means i < keep
        drop_lut = self.sks.generate_lookup_table(lambda x: int(x != 1))
        drop = self.sks.apply_lookup_table_batch(signs, drop_lut)
        masked = self._char_zero_if(drop, shifted)

        # length = clamp(min(end, len) - start, 0)
        len_radix = self._length_radix(s)
        over = ik.gt_parallelized(end, len_radix)
        e = ik.if_then_else_parallelized(over, len_radix, end)
        ge2 = ik.ge_parallelized(e, start)
        d2 = ik.sub_parallelized(e, start)
        length = ik.if_then_else_parallelized(ge2, d2, zero)
        return FheString(
            content=[FheAsciiChar(c)
                     for c in self._unstack(masked, ln)],
            padding=Padding.FINAL,
            length=length,
        )

    # -- trim family (ref: trim.rs) -----------------------------------

    _WHITESPACE = (9, 10, 11, 12, 13, 32)

    def _is_ws_or_zero(self, stack: ShortintBatch, n: int) -> ShortintBatch:
        """[n] booleans: char is ascii whitespace or the padding zero."""
        ws = set(self._WHITESPACE) | {0}
        # Cascade of bivariate LUTs over the radix digits: fold blocks 0..nb-1
        # into a membership bit.  State after block j = set of ws codes whose
        # low digits match so far, encoded as a small class id.
        msg = self.msg
        nb = self.nb
        arr = np.arange(n * nb).reshape(n, nb)
        # enumerate digit tuples of each ws code (all < 64: top digit is 0)
        tuples = {tuple((c // msg**j) % msg for j in range(nb)) for c in ws}
        assert all(t[3:] == (0,) * (nb - 3) for t in tuples)
        # behavioral class of (b0, b1) = the set of block-2 digits that keep
        # the char a ws candidate; only a handful of classes arise, each
        # encodable in one block's message space.
        prefix_to_d2: dict = {}
        for t in tuples:
            prefix_to_d2.setdefault(t[:2], set()).add(t[2])
        classes = sorted({frozenset(v) for v in prefix_to_d2.values()},
                         key=sorted)
        class_ids = {c: i + 1 for i, c in enumerate(classes)}
        assert len(class_ids) + 1 <= msg, "too many ws digit classes"

        def pair_f(x1, x0):
            d2s = prefix_to_d2.get((x0, x1))
            return class_ids[frozenset(d2s)] if d2s else 0

        b0 = _take(stack, arr[:, 0])
        b1 = _take(stack, arr[:, 1])
        state = self.sks.unchecked_bivariate_batch(
            b1, b0, self.sks.generate_lookup_table_bivariate(pair_f))
        id_to_class = {v: k for k, v in class_ids.items()}

        def f2(cls, d):
            return int(cls != 0 and d in id_to_class.get(cls, ()))

        state = self.sks.unchecked_bivariate_batch(
            state, _take(stack, arr[:, 2]),
            self.sks.generate_lookup_table_bivariate(f2))
        for j in range(3, nb):
            state = self.sks.unchecked_bivariate_batch(
                state, _take(stack, arr[:, j]),
                self.sks.generate_lookup_table_bivariate(
                    lambda st, d: int(bool(st) and d == 0)))
        return state

    def trim_end(self, s: FheString) -> FheString:
        """Strip trailing whitespace (ref: trim.rs)."""
        s = self._with_final_padding(s)
        n = s.max_len
        if n == 0:
            return s.copy()
        stack = self._content_stack(s)
        wsz = self._is_ws_or_zero(stack, n)
        trailing = self._scan(wsz, 1, self._and_blut(), reverse=True, fill=1)
        new_stack = self._char_zero_if(trailing, stack)
        keep_lut = self.sks.generate_lookup_table(lambda x: 1 - (x % 2))
        kept = self.sks.apply_lookup_table_batch(trailing, keep_lut)
        length = self._bools_count(kept)
        return FheString(
            content=[FheAsciiChar(c) for c in self._unstack(new_stack, n)],
            padding=Padding.FINAL,
            length=length,
        )

    def trim_start(self, s: FheString) -> FheString:
        """Strip leading whitespace; zeros stay in front -> INITIAL padding."""
        s = self._with_final_padding(s)
        n = s.max_len
        if n == 0:
            return s.copy()
        stack = self._content_stack(s)
        is_ws = self._is_ws_or_zero(stack, n)
        leading = self._scan(is_ws, 1, self._and_blut(), reverse=False, fill=1)
        new_stack = self._char_zero_if(leading, stack)
        keep_lut = self.sks.generate_lookup_table(lambda x: 1 - (x % 2))
        kept = self.sks.apply_lookup_table_batch(leading, keep_lut)
        length = self._bools_count(kept)
        # `kept` = n - #leading, but trailing padding zeros are also counted
        # (the leading scan stops at the first real char): true length is
        # len(s) - #leading = kept - (n - len(s)).
        if not (isinstance(s.length, int) and s.length == n):
            pad_count = self.integer_key.sub_parallelized(
                self.integer_key.create_trivial_radix(n, self.nb),
                self._length_radix(s))
            length = self.integer_key.sub_parallelized(length, pad_count)
        return FheString(
            content=[FheAsciiChar(c) for c in self._unstack(new_stack, n)],
            padding=(Padding.INITIAL if s.padding == Padding.NONE
                     else Padding.INITIAL_AND_FINAL),
            length=length,
        )

    def trim(self, s: FheString) -> FheString:
        return self.trim_start(self.trim_end(s))

    # -- strip prefix/suffix (ref: strip.rs) --------------------------

    def strip_prefix(self, s: FheString, pattern: Pattern
                     ) -> Tuple[BooleanBlock, FheString]:
        """-> (stripped?, result). Result keeps zeros in place of the prefix
        (INITIAL padding)."""
        pstack, plen, p_padded = self._pattern_stack(pattern)
        matched = self.starts_with(s, pattern)
        s = self._with_final_padding(s)
        n = s.max_len
        if plen == 0 or n == 0:
            return matched, s.copy()
        k = min(plen, n)
        stack = self._content_stack(s)
        # zero out position j < k when matched AND (pattern char j not pad)
        m_rep = _take(matched.block, np.zeros(k, dtype=np.int64))
        if p_padded:
            zeros = self._trivial_chars([0] * plen)
            is_pad = self._char_eq(pstack, zeros, plen)
            is_real = self.sks.apply_lookup_table_batch(
                _take(is_pad, range(k)),
                self.sks.generate_lookup_table(lambda x: 1 - (x % 2)))
            cond = self.sks.unchecked_bivariate_batch(
                m_rep, is_real, self._and_blut())
        else:
            cond = m_rep
        head = _take(stack, range(k * self.nb))
        new_head = self._char_zero_if(cond, head)
        tail = _take(stack, range(k * self.nb, n * self.nb))
        new_stack = _cat([new_head, tail]) if n > k else new_head
        # length: matched ? len - len(p) : len
        ik = self.integer_key
        len_s = self._length_radix(s)
        if isinstance(pattern, FheString) and pattern.is_encrypted_length():
            stripped_len = ik.sub_parallelized(len_s, pattern.length)
        else:
            stripped_len = ik.scalar_sub_parallelized(len_s, plen)
        new_len = ik.if_then_else_parallelized(matched, stripped_len, len_s)
        return matched, FheString(
            content=[FheAsciiChar(c) for c in self._unstack(new_stack, n)],
            padding=Padding.INITIAL_AND_FINAL,
            length=new_len,
        )

    def strip_suffix(self, s: FheString, pattern: Pattern
                     ) -> Tuple[BooleanBlock, FheString]:
        pstack, plen, p_padded = self._pattern_stack(pattern)
        matched = self.ends_with(s, pattern)
        s = self._with_final_padding(s)
        n = s.max_len
        if plen == 0 or n == 0:
            return matched, s.copy()
        # zero position i when matched AND i >= len(s) - len(p)
        ik = self.integer_key
        len_s = self._length_radix(s)
        if isinstance(pattern, FheString) and pattern.is_encrypted_length():
            cutoff = ik.sub_parallelized(len_s, pattern.length)
        else:
            cutoff = ik.scalar_sub_parallelized(len_s, plen)
        # indicator per position: i >= cutoff  (batched sign vs trivial i)
        d_rep = _take(cutoff.blocks, np.tile(np.arange(self.nb), n))
        triv = self._trivial_chars(list(range(n)))
        signs = self._char_signs(triv, d_rep, n)  # sign(i, cutoff)
        ge_lut = self.sks.generate_lookup_table(lambda x: int(x != 1))
        ge = self.sks.apply_lookup_table_batch(signs, ge_lut)
        m_rep = _take(matched.block, np.zeros(n, dtype=np.int64))
        cond = self.sks.unchecked_bivariate_batch(m_rep, ge, self._and_blut())
        stack = self._content_stack(s)
        new_stack = self._char_zero_if(cond, stack)
        new_len = ik.if_then_else_parallelized(matched, cutoff, len_s)
        return matched, FheString(
            content=[FheAsciiChar(c) for c in self._unstack(new_stack, n)],
            padding=Padding.FINAL,
            length=new_len,
        )

    # -- padding normalization (ref: change_padding.rs:push_padding_to_end,
    #    O(len^2) in the reference; here len odd-even transposition phases
    #    of batched cmux) --

    def push_padding_to_end(self, s: FheString) -> FheString:
        """Compact non-zero chars to the front, padding zeros to the end
        (ref: change_padding.rs push_padding_to_end).

        Two TPU/CPU strategies, picked by backend: the position-matrix
        compaction (few huge fused batches — optimal where lanes are free,
        i.e. real TPU hardware) and an odd-even transposition pass (more,
        smaller batches — cheaper on the CPU test backend where per-lane
        compute dominates)."""
        import jax

        if s.padding in (Padding.NONE, Padding.FINAL) or s.max_len <= 1:
            out = s.copy()
            if out.padding not in (Padding.NONE, Padding.FINAL):
                out.padding = Padding.FINAL
            return out
        if jax.default_backend() == "cpu":
            return self._push_padding_bubble(s)
        return self._push_padding_compact(s)

    def _push_padding_bubble(self, s: FheString) -> FheString:
        """O(n) phases of pairwise zero-bubbling (mirrors the reference's
        cmux chains, batched per phase)."""
        n = s.max_len
        stack = self._content_stack(s)
        zero_chars = self._trivial_chars([0] * n)
        for phase in range(n):
            start = phase % 2
            li = list(range(start, n - 1, 2))
            if not li:
                continue
            ri = [i + 1 for i in li]
            arr = np.arange(n * self.nb).reshape(n, self.nb)
            lstack = _take(stack, arr[li].ravel())
            rstack = _take(stack, arr[ri].ravel())
            iz = self._char_eq(lstack, _take(zero_chars,
                                             arr[:len(li)].ravel()), len(li))
            new_l = self._char_cmux(iz, rstack, lstack)
            new_r = self._char_zero_if(iz, rstack)
            data = stack.data.copy()
            degs = stack.degrees.copy()
            noise = stack.noise.copy()
            data[arr[li].ravel()] = new_l.data
            degs[arr[li].ravel()] = new_l.degrees
            noise[arr[li].ravel()] = new_l.noise
            data[arr[ri].ravel()] = new_r.data
            degs[arr[ri].ravel()] = new_r.degrees
            noise[arr[ri].ravel()] = new_r.noise
            stack = ShortintBatch(data, degs, stack.message_modulus,
                                  stack.carry_modulus, noise)
        return FheString(
            content=[FheAsciiChar(c) for c in self._unstack(stack, n)],
            padding=Padding.FINAL,
            length=(s.length if isinstance(s.length, int)
                    else s.length.copy()),
        )

    def _push_padding_compact(self, s: FheString) -> FheString:
        """Target position of each char = exclusive prefix count of
        non-padding chars (log-depth batched scan), then one n x n
        position-match matrix and one batched select gather every char to
        its slot — ~20 large fused PBS batches regardless of length.
        Padding chars contribute 0 to every slot, so no masking is needed
        beyond the zero chars themselves."""
        n = s.max_len
        sks = self.sks
        nb = self.nb
        ik = self.integer_key
        stack = self._content_stack(s)

        # 1. per-char non-zero bit
        zero_chars = self._trivial_chars([0] * n)
        iz = self._char_eq(stack, zero_chars, n)           # [n] bools
        nz_lut = sks.generate_lookup_table(lambda x: 1 - (x % 2))
        nz = sks.apply_lookup_table_batch(iz, nz_lut)      # [n] bools

        # 2. exclusive prefix count of non-zeros as per-char radix values
        vals = sks.trivial_batch(np.zeros(n * nb, dtype=_U64), n * nb)
        arr = np.arange(n * nb).reshape(n, nb)
        vals.data[arr[:, 0]] = nz.data
        vals.degrees[arr[:, 0]] = nz.degrees
        vals.noise[arr[:, 0]] = nz.noise
        # shift down by one char for the exclusive scan
        data = np.roll(vals.data, nb, axis=0)
        data[:nb] = sks.trivial_batch(np.zeros(nb, dtype=_U64), nb).data
        degs = np.roll(vals.degrees, nb)
        degs[:nb] = 0
        noise = np.roll(vals.noise, nb)
        noise[:nb] = 1
        pos = ShortintBatch(data, degs, vals.message_modulus,
                            vals.carry_modulus, noise)
        d = 1
        while d < n:
            shifted = np.roll(pos.data, d * nb, axis=0).copy()
            shifted[:d * nb] = 0
            sdegs = np.roll(pos.degrees, d * nb).copy()
            sdegs[:d * nb] = 0
            snoise = np.roll(pos.noise, d * nb).copy()
            snoise[:d * nb] = 1
            prev = ShortintBatch(
                shifted, sdegs, pos.message_modulus, pos.carry_modulus,
                snoise)
            ssum = sks.unchecked_add_batch(pos, prev)
            pos, _ = ik.propagate_single_carry(ssum, num=n)
            d *= 2

        # 3. position-match matrix (pos_i == j) over all n^2 pairs at once
        pos_rep = _take(pos, np.tile(arr, (n, 1)).reshape(-1))  # [n*n*nb]
        js = self._trivial_chars(list(np.repeat(np.arange(n), n)))
        eqm = self._char_eq(pos_rep, js, n * n)            # [n*n] (j major)

        # 4. batched select: slot j = sum_i char_i * (pos_i == j)
        chars_rep = _take(stack, np.tile(arr.reshape(-1), n))
        cond = _take(eqm, np.repeat(np.arange(n * n), nb))
        pick_lut = sks.generate_lookup_table_bivariate(
            lambda cc, x: x if cc else 0)
        masked = sks.unchecked_bivariate_batch(cond, chars_rep, pick_lut)
        md = np.asarray(masked.data).reshape(n, n, nb, -1)
        with np.errstate(over="ignore"):
            acc = md.sum(axis=1, dtype=np.uint64).reshape(n * nb, -1)
        summed = ShortintBatch(
            data=acc,
            degrees=np.full(n * nb, self.msg - 1, dtype=np.int64),
            message_modulus=self.msg,
            carry_modulus=stack.carry_modulus,
        )
        # refresh noise accumulated by the n-way sum
        clean = sks.message_extract_batch(summed)
        return FheString(
            content=[FheAsciiChar(c) for c in self._unstack(clean, n)],
            padding=Padding.FINAL,
            length=(s.length if isinstance(s.length, int) else s.length.copy()),
        )

    # -- replace (char for char; ref: replace.rs) ---------------------

    def replace_char(self, s: FheString, old: Pattern, new: Pattern) -> FheString:
        """Replace every occurrence of a single-char pattern."""
        ostack, olen, _ = self._pattern_stack(old)
        nstack, nlen, _ = self._pattern_stack(new)
        assert olen == 1 and nlen == 1, "replace_char expects single chars"
        n = s.max_len
        if n == 0:
            return s.copy()
        s = self._with_final_padding(s)
        stack = self._content_stack(s)
        orep = _take(ostack, np.tile(np.arange(self.nb), n))
        eqs = self._char_eq(stack, orep, n)
        nrep = _take(nstack, np.tile(np.arange(self.nb), n))
        out = self._char_cmux(eqs, nrep, stack)
        return FheString(
            content=[FheAsciiChar(c) for c in self._unstack(out, n)],
            padding=s.padding,
            length=(s.length if isinstance(s.length, int) else s.length.copy()),
        )

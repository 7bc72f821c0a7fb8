"""Compiled-op dispatch for the radix integer API.

Routes CLEAN-input radix ops through the single-computation formulations
in parallel/fused.py: the host degree bookkeeping that drives the
reference's rayon schedules (ref: integer/server_key/radix_parallel/) is
deterministic for clean blocks, so it happens once at trace time and the
whole radix op compiles to ONE device program — one dispatch round-trip
instead of one per PBS round (through the axon tunnel each round-trip
costs ~25 ms, which dominated the round-3 FheUint latencies).

Dispatch preconditions (else the caller falls back to the host path):
- every input block is clean (degree < message_modulus; boolean/sign
  conditions additionally <= their packing domain),
- message_modulus >= 4 (the 3-state carry/sign resolves need packing
  room, same bound as IntegerServerKey.propagate_single_carry).

Enabled by default on TPU; TFHE_TPU_FUSED_INTEGER=1/0 forces it on/off
(on CPU the jnp kernels run the same math, used by the equivalence tests).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import fused as F
from ..shortint.ciphertext import ShortintBatch


def fused_integer_enabled() -> bool:
    v = os.environ.get("TFHE_TPU_FUSED_INTEGER", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    return jax.default_backend() == "tpu"


class FusedIntegerOps:
    """Jit-cached compiled radix ops bound to one shortint server key."""

    def __init__(self, isk):
        self.isk = isk
        self.sks = isk.key
        self._luts: dict = {}
        self._jits: dict = {}

    # -- lookup tables ---------------------------------------------------

    def _lut(self, name: str):
        if name in self._luts:
            return self._luts[name]
        sks = self.sks
        msg = sks.message_modulus
        uni = sks.generate_lookup_table
        biv = sks.generate_lookup_table_bivariate
        build = {
            # carry propagation (ref: radix_parallel/add.rs:518-603)
            "state": lambda: uni(
                lambda v: 2 if v >= msg else (1 if v == msg - 1 else 0)),
            "resolve": lambda: biv(
                lambda cur, prev: min(prev if cur == 1 else cur, 2)),
            "carry": lambda: uni(lambda x: 1 if x == 2 else 0),
            "msgext": lambda: uni(lambda x: x % msg),
            "carryext": lambda: uni(lambda x: x // msg),
            # comparator (ref: integer/server_key/comparator.rs:31-60)
            "sign": lambda: biv(
                lambda x, y: 0 if x == y else (1 if x < y else 2)),
            "sresolve": lambda: biv(
                lambda high, low: min(low if high == 0 else high, 2)),
            "eq": lambda: uni(lambda s: int(s == 0)),
            "ne": lambda: uni(lambda s: int(s != 0)),
            "lt": lambda: uni(lambda s: int(s == 1)),
            "le": lambda: uni(lambda s: int(s != 2)),
            "gt": lambda: uni(lambda s: int(s == 2)),
            "ge": lambda: uni(lambda s: int(s != 1)),
            # bitwise (ref: radix_parallel/bitwise_op.rs)
            "band": lambda: biv(lambda x, y: x & y),
            "bor": lambda: biv(lambda x, y: x | y),
            "bxor": lambda: biv(lambda x, y: x ^ y),
            "bnot": lambda: uni(lambda x: (msg - 1) - (x % msg)),
            # cmux (ref: radix_parallel/cmux.rs:27)
            "cthen": lambda: biv(lambda c, x: x if c else 0),
            "celse": lambda: biv(lambda c, x: 0 if c else x),
            # sign-driven cmux for max/min (s==1 means lhs < rhs)
            "maxthen": lambda: biv(lambda s, x: x if s != 1 else 0),
            "maxelse": lambda: biv(lambda s, x: x if s == 1 else 0),
            "minthen": lambda: biv(lambda s, x: x if s != 2 else 0),
            "minelse": lambda: biv(lambda s, x: x if s == 2 else 0),
            # multiplication (ref: radix_parallel/mul.rs:329-464)
            "mlsb": lambda: biv(lambda x, y: (x * y) % msg),
            "mmsb": lambda: biv(lambda x, y: (x * y) // msg),
        }[name]()
        self._luts[name] = build
        return build

    def _acc(self, name: str):
        l = self._lut(name)
        return l.acc.acc if hasattr(l.acc, "acc") else l.acc

    # -- jitted programs -------------------------------------------------

    def _fn(self, op: str, shape: tuple):
        key = (op, shape)
        if key in self._jits:
            return self._jits[key]
        sks = self.sks
        msg = sks.message_modulus

        if op in ("add", "sub", "neg"):
            accs = tuple(self._acc(n)
                         for n in ("state", "resolve", "carry", "msgext"))
            if op == "add":
                base = functools.partial(F.fused_radix_add,
                                         message_modulus=msg)
            elif op == "sub":
                base = functools.partial(F.fused_radix_sub,
                                         message_modulus=msg,
                                         carry_modulus=sks.carry_modulus,
                                         delta=sks.delta)
            else:
                base = functools.partial(F.fused_radix_neg,
                                         message_modulus=msg,
                                         carry_modulus=sks.carry_modulus,
                                         delta=sks.delta)
            fn = jax.jit(lambda ksk, bsk, *a: base(ksk, bsk, *accs, *a))
        elif op == "mul":
            accs = tuple(self._acc(n)
                         for n in ("mlsb", "mmsb", "msgext", "carryext",
                                   "state", "resolve", "carry"))
            base = functools.partial(F.fused_radix_mul, message_modulus=msg,
                                     carry_modulus=sks.carry_modulus)
            fn = jax.jit(lambda ksk, bsk, a, b: base(ksk, bsk, *accs, a, b))
        elif op in ("eq", "ne"):
            nb = shape[0][1]
            if "beq_01" not in self._luts:
                self._luts["beq_01"] = sks.generate_lookup_table_bivariate(
                    lambda x, y: int(x == y))
            beq_acc = self._luts["beq_01"].acc.acc
            cap = (sks.carry_modulus * msg - 1) // (msg - 1)
            and_accs = {
                c: sks.generate_lookup_table(
                    lambda v, c=c: int(v == c)).acc
                for c in F.eq_chunk_widths(nb, cap)}
            and_accs["not"] = sks.generate_lookup_table(
                lambda v: int(v == 0)).acc
            base = functools.partial(
                F.fused_radix_eq, message_modulus=msg,
                carry_modulus=sks.carry_modulus, delta=sks.delta,
                negate=(op == "ne"))
            fn = jax.jit(lambda ksk, bsk, a, b:
                         base(ksk, bsk, beq_acc, and_accs, a, b))
        elif op in ("lt", "le", "gt", "ge"):
            accs = (self._acc("sign"), self._acc("sresolve"), self._acc(op))
            base = functools.partial(F.fused_radix_cmp, message_modulus=msg)
            fn = jax.jit(lambda ksk, bsk, a, b: base(ksk, bsk, *accs, a, b))
        elif op in ("band", "bor", "bxor"):
            acc = self._acc(op)
            base = functools.partial(F.fused_radix_bitop,
                                     message_modulus=msg)
            fn = jax.jit(lambda ksk, bsk, a, b: base(ksk, bsk, acc, a, b))
        elif op == "bnot":
            acc = self._acc(op)
            fn = jax.jit(lambda ksk, bsk, a:
                         F.fused_radix_univariate(ksk, bsk, acc, a))
        elif op == "select":
            accs = (self._acc("cthen"), self._acc("celse"),
                    self._acc("msgext"))
            base = functools.partial(F.fused_radix_select,
                                     message_modulus=msg)
            fn = jax.jit(lambda ksk, bsk, c, a, b:
                         base(ksk, bsk, *accs, c, a, b))
        elif op in ("max", "min"):
            accs = (self._acc("sign"), self._acc("sresolve"),
                    self._acc(op + "then"), self._acc(op + "else"),
                    self._acc("msgext"))
            base = functools.partial(F.fused_radix_minmax,
                                     message_modulus=msg)
            fn = jax.jit(lambda ksk, bsk, a, b:
                         base(ksk, bsk, *accs, a, b))
        else:  # pragma: no cover
            raise KeyError(op)
        self._jits[key] = fn
        return fn

    # -- block wrapping --------------------------------------------------

    def _clean(self, *batches) -> bool:
        msg = self.sks.message_modulus
        return all(int(b.degrees.max(initial=0)) < msg for b in batches)

    def _to_dev(self, b: ShortintBatch):
        return jnp.asarray(b.data)[None]          # [1, nb, sz]

    def _wrap(self, out, like: ShortintBatch, degree: int) -> ShortintBatch:
        arr = np.asarray(out)[0]
        if arr.ndim == 1:                          # single boolean block
            arr = arr[None]
        return ShortintBatch(
            data=arr,
            degrees=np.full(arr.shape[0], degree, dtype=np.int64),
            message_modulus=like.message_modulus,
            carry_modulus=like.carry_modulus,
        )

    # -- public entry ----------------------------------------------------

    def try_op(self, op: str, *args) -> Optional[ShortintBatch]:
        """Run `op` over ShortintBatch args if the fused preconditions
        hold; returns None to signal host-path fallback."""
        sks = self.sks
        msg = sks.message_modulus
        if msg < 4 or not fused_integer_enabled():
            return None
        if not self._clean(*args):
            return None
        dev = [self._to_dev(b) for b in args]
        if op == "select":
            dev[0] = dev[0][:, 0, :]               # cond: [1, sz]
        shape = tuple(d.shape for d in dev)
        fn = self._fn(op, shape)
        out = fn(sks.ksk, sks.bsk, *dev)
        if op in ("eq", "ne", "lt", "le", "gt", "ge"):
            degree = 1
        elif op in ("band", "bor", "bxor", "bnot"):
            l = self._lut(op)
            degree = l.degree if hasattr(l, "degree") else l.acc.degree
        else:
            degree = msg - 1
        return self._wrap(out, args[-1], degree)

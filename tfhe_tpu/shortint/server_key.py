"""Shortint server key and operations.

(ref: tfhe/src/shortint/server_key/mod.rs — ServerKey = {KSK, BSK,
MessageModulus, CarryModulus, MaxDegree, MaxNoiseLevel, PBSOrder}; op files
add.rs, sub.rs, neg.rs, mul.rs, div_mod.rs, bitwise_op.rs, shift.rs,
comp_op.rs, scalar_*.rs, bivariate_pbs.rs.)

The universal hot path is apply_lookup_table = keyswitch + programmable
bootstrap (ref: mod.rs:783-857); here it is one jitted fused device call over
a whole batch of blocks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import core
from ..params import ClassicPBSParameters, MultiBitPBSParameters, PBSOrder
from .ciphertext import CheckError, Ciphertext, ShortintBatch, NOMINAL_NOISE
from .client_key import ClientKey

_U64 = np.uint64


@dataclass(frozen=True)
class LookupTable:
    """(ref: shortint/server_key/mod.rs LookupTableOwned)"""

    acc: object  # jnp [G, N] uint64
    degree: int


@dataclass(frozen=True)
class BivariateLookupTable:
    acc: LookupTable
    factor: int  # lhs is scaled by this before packing


_ks_pbs_jit = jax.jit(core.keyswitch_then_pbs)
_pbs_ks_jit = jax.jit(core.pbs_then_keyswitch)
_ks_mb_pbs_jit = jax.jit(core.keyswitch_then_multi_bit_pbs)
_mb_pbs_ks_jit = jax.jit(core.multi_bit_pbs_then_keyswitch)


class _ParamsShell:
    """Minimal stand-in for a ClientKey when reconstructing a ServerKey from
    raw key material (only `.params` is consulted in that path)."""

    def __init__(self, params):
        self.params = params


class ServerKey:
    def __init__(self, cks: ClientKey, _raw=None):
        p = cks.params
        self.params = p
        self.message_modulus = p.message_modulus
        self.carry_modulus = p.carry_modulus
        self.max_degree = p.total_modulus - 1
        # (ref: shortint/ciphertext/mod.rs MaxNoiseLevel::from_msg_carry_modulus)
        self.max_noise_level = (p.carry_modulus * p.message_modulus - 1) // (
            p.message_modulus - 1)
        self.delta = p.delta
        self.is_multi_bit = isinstance(p, MultiBitPBSParameters)
        if _raw is None:
            if self.is_multi_bit:
                bsk = core.generate_multi_bit_bootstrap_key(
                    cks.lwe_sk, cks.glwe_sk, p.pbs_base_log, p.pbs_level,
                    p.glwe_modular_std_dev, p.grouping_factor, cks.enc_gen,
                )
            else:
                bsk = core.generate_bootstrap_key(
                    cks.lwe_sk, cks.glwe_sk, p.pbs_base_log, p.pbs_level,
                    p.glwe_modular_std_dev, cks.enc_gen,
                )
            ksk = core.generate_keyswitch_key(
                cks.big_sk, cks.lwe_sk, p.ks_base_log, p.ks_level,
                p.lwe_modular_std_dev, cks.enc_gen,
            )
        else:
            bsk, ksk = _raw
        self.raw_bsk = bsk
        self.raw_ksk = ksk
        # CRT-NTT domain by default: exact, and the per-step work is MXU
        # matmuls against constant DFT matrices instead of materialized
        # N x N key matrices (see ops/ntt.py)
        if self.is_multi_bit:
            self.bsk = core.prepare_multi_bit_bsk_auto(
                bsk, p.pbs_base_log, p.grouping_factor)
        else:
            self.bsk = core.prepare_bsk_auto(bsk, p.pbs_base_log)
        self.ksk = core.prepare_ksk(ksk, p.ks_base_log)
        self._lut_cache: dict = {}
        if p.encryption_key_choice.value == "big":
            self.ciphertext_lwe_size = p.big_lwe_dimension + 1
        else:
            self.ciphertext_lwe_size = p.lwe_dimension + 1

    @classmethod
    def from_raw(cls, params, bsk: np.ndarray, ksk: np.ndarray) -> "ServerKey":
        """Rebuild a server key from raw standard-domain BSK/KSK arrays
        (deserialization / decompression path)."""
        shell = _ParamsShell(params)
        return cls(shell, _raw=(np.asarray(bsk), np.asarray(ksk)))

    # ------------------------------------------------------------------
    # lookup tables
    # ------------------------------------------------------------------

    def generate_lookup_table(self, f: Callable[[int], int]) -> LookupTable:
        """(ref: mod.rs:383-399 generate_lookup_table; engine/mod.rs:72-128)"""
        p = self.params
        table = tuple(int(f(i)) % (1 << 64) for i in range(p.total_modulus))
        if table in self._lut_cache:
            return self._lut_cache[table]
        acc, degree = core.make_lut_glwe(
            list(table), p.polynomial_size, p.glwe_size, p.total_modulus, p.delta
        )
        lut = LookupTable(acc=jnp.asarray(acc), degree=min(degree, self.max_degree))
        self._lut_cache[table] = lut
        return lut

    def generate_lookup_table_bivariate_with_factor(
        self, f: Callable[[int, int], int], factor: int
    ) -> BivariateLookupTable:
        """(ref: bivariate_pbs.rs:71-129) packed input = lhs*factor + rhs."""
        msg = self.message_modulus

        def wrapped(x):
            return f((x // factor) % msg, (x % factor) % msg)

        return BivariateLookupTable(
            acc=self.generate_lookup_table(wrapped), factor=factor
        )

    def generate_lookup_table_bivariate(self, f) -> BivariateLookupTable:
        return self.generate_lookup_table_bivariate_with_factor(
            f, self.message_modulus
        )

    # ------------------------------------------------------------------
    # batched primitives (TPU-native)
    # ------------------------------------------------------------------

    @staticmethod
    def _bucket(B: int) -> int:
        """Smallest m * 2^e >= B with m in [4, 8] (and >= 8).

        A 3-bit-mantissa ladder: <= 1.25x padding waste (the old
        power-of-two buckets wasted up to 2x PBS cost on odd string-op
        shapes) at ~4 compiled shapes per octave."""
        if B <= 8:
            return 8
        e = (B - 1).bit_length() - 3
        return -(-B // (1 << e)) << e

    def _pbs_device(self, data, acc):
        """Device-resident fused keyswitch+bootstrap: jnp in, jnp out.

        Bucket-pads like _pbs but never round-trips the batch through the
        host — the wave-scheduled layers (integer/batched.py,
        strings/batched.py) chain many rounds and a [B, lwe_size] u64
        array is tens of MB through the TPU tunnel."""
        data = jnp.asarray(data)
        B = data.shape[0]
        bucket = self._bucket(B)
        acc_arr = acc
        if bucket != B:
            pad = bucket - B
            data = jnp.concatenate(
                [data, jnp.broadcast_to(data[:1], (pad,) + data.shape[1:])])
            a = jnp.asarray(acc)
            if a.ndim == 3:  # per-element accumulators [B, G, N]
                acc_arr = jnp.concatenate(
                    [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
        if self.params.pbs_order is PBSOrder.KEYSWITCH_BOOTSTRAP:
            fn = _ks_mb_pbs_jit if self.is_multi_bit else _ks_pbs_jit
        else:
            fn = _mb_pbs_ks_jit if self.is_multi_bit else _pbs_ks_jit
        return fn(self.ksk, self.bsk, acc_arr, data)[:B]

    def _pbs(self, data: np.ndarray, acc) -> np.ndarray:
        """One fused keyswitch+bootstrap device call over a batch.

        Batch sizes are padded up to bucket shapes so arbitrary
        scheme-level batch shapes (string ops produce many) reuse a small
        set of compiled programs — compile-cache hygiene that also keeps
        XLA shapes stable on TPU."""
        return np.asarray(self._pbs_device(np.asarray(data), acc))

    def apply_lookup_table_batch(self, batch: ShortintBatch,
                                 lut: LookupTable) -> ShortintBatch:
        out = self._pbs(batch.data, lut.acc)
        return ShortintBatch(
            data=out,
            degrees=np.full(len(batch), lut.degree, dtype=np.int64),
            message_modulus=batch.message_modulus,
            carry_modulus=batch.carry_modulus,
        )

    def apply_many_lookup_tables_batch(self, batch: ShortintBatch,
                                       luts: list[LookupTable],
                                       selector: np.ndarray) -> ShortintBatch:
        """Each element i evaluates luts[selector[i]] — one fused PBS call."""
        accs = jnp.stack([l.acc for l in luts])[np.asarray(selector)]
        out = self._pbs(batch.data, accs)
        degs = np.array([luts[s].degree for s in selector], dtype=np.int64)
        return ShortintBatch(
            data=out, degrees=degs,
            message_modulus=batch.message_modulus,
            carry_modulus=batch.carry_modulus,
        )

    def unchecked_add_batch(self, a: ShortintBatch, b: ShortintBatch) -> ShortintBatch:
        with np.errstate(over="ignore"):
            return ShortintBatch(
                data=a.data + b.data,
                degrees=a.degrees + b.degrees,
                message_modulus=a.message_modulus,
                carry_modulus=a.carry_modulus,
                noise=a.noise + b.noise,
            )

    def unchecked_scalar_add_batch(self, a: ShortintBatch, scalars) -> ShortintBatch:
        scalars = np.broadcast_to(
            np.asarray(scalars, dtype=np.int64), (len(a),)
        )
        out = a.data.copy()
        with np.errstate(over="ignore"):
            out[:, -1] += (scalars % (2 * self.params.total_modulus)).astype(
                _U64
            ) * _U64(self.delta)
        return ShortintBatch(
            data=out, degrees=a.degrees + scalars,
            message_modulus=a.message_modulus, carry_modulus=a.carry_modulus,
            noise=a.noise.copy(),
        )

    def unchecked_scalar_mul_batch(self, a: ShortintBatch, scalars) -> ShortintBatch:
        scalars = np.broadcast_to(np.asarray(scalars, dtype=np.int64), (len(a),))
        with np.errstate(over="ignore"):
            return ShortintBatch(
                data=a.data * scalars.astype(_U64)[:, None],
                degrees=a.degrees * scalars,
                message_modulus=a.message_modulus,
                carry_modulus=a.carry_modulus,
                noise=a.noise * scalars,
            )

    def unchecked_neg_batch(self, a: ShortintBatch):
        """(ref: neg.rs:223-245) returns (result, correcting terms z)."""
        msg = self.message_modulus
        z = np.maximum(-(-a.degrees // msg), 1) * msg  # ceil(deg/msg)*msg, >= msg
        with np.errstate(over="ignore"):
            data = (_U64(0) - a.data)
            data[:, -1] += z.astype(_U64) * _U64(self.delta)
        return (
            ShortintBatch(
                data=data, degrees=z,
                message_modulus=a.message_modulus,
                carry_modulus=a.carry_modulus, noise=a.noise.copy(),
            ),
            z,
        )

    def unchecked_sub_batch(self, a: ShortintBatch, b: ShortintBatch):
        nb, z = self.unchecked_neg_batch(b)
        return self.unchecked_add_batch(a, nb), z

    def unchecked_bivariate_batch(self, a: ShortintBatch, b: ShortintBatch,
                                  blut: BivariateLookupTable) -> ShortintBatch:
        """(ref: bivariate_pbs.rs:167-182) packed = a*factor + b, then LUT."""
        assert int(b.degrees.max(initial=0)) < blut.factor, (
            "bivariate rhs degree must be < packing factor"
        )
        packed = self.unchecked_add_batch(
            self.unchecked_scalar_mul_batch(a, blut.factor), b
        )
        return self.apply_lookup_table_batch(packed, blut.acc)

    def message_extract_batch(self, a: ShortintBatch) -> ShortintBatch:
        lut = self.generate_lookup_table(lambda x: x % self.message_modulus)
        return self.apply_lookup_table_batch(a, lut)

    def carry_extract_batch(self, a: ShortintBatch) -> ShortintBatch:
        lut = self.generate_lookup_table(lambda x: x // self.message_modulus)
        return self.apply_lookup_table_batch(a, lut)

    def trivial_batch(self, values, n: int) -> ShortintBatch:
        p = self.params
        values = np.asarray(values, dtype=_U64) % _U64(p.total_modulus)
        lwe_size = self.ciphertext_lwe_size
        if n == 0:
            data = np.zeros((0, lwe_size), dtype=_U64)
        else:
            data = np.asarray(
                core.trivial_lwe(values * _U64(p.delta), lwe_size - 1))
        return ShortintBatch(
            data=data.reshape(n, lwe_size),
            degrees=values.astype(np.int64),
            message_modulus=p.message_modulus,
            carry_modulus=p.carry_modulus,
            noise=np.zeros(n, dtype=np.int64),
        )

    # ------------------------------------------------------------------
    # degree / noise guards
    # ------------------------------------------------------------------

    def is_add_possible(self, a: Ciphertext, b: Ciphertext) -> bool:
        return (a.degree + b.degree <= self.max_degree
                and a.noise_level + b.noise_level <= self.max_noise_level)

    def checked_add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        if not self.is_add_possible(a, b):
            raise CheckError("degree or noise overflow in add")
        return self.unchecked_add(a, b)

    # ------------------------------------------------------------------
    # scalar API (one-block ops over Ciphertext)
    # ------------------------------------------------------------------

    def _b1(self, ct: Ciphertext) -> ShortintBatch:
        return ShortintBatch(
            data=ct.data[None].copy(),
            degrees=np.array([ct.degree]),
            message_modulus=ct.message_modulus,
            carry_modulus=ct.carry_modulus,
            noise=np.array([ct.noise_level]),
        )

    def _c1(self, b: ShortintBatch, trivial: bool = False) -> Ciphertext:
        return Ciphertext(
            data=b.data[0], degree=int(b.degrees[0]),
            message_modulus=b.message_modulus, carry_modulus=b.carry_modulus,
            noise_level=int(b.noise[0]), is_trivial=trivial,
        )

    def create_trivial(self, value: int) -> Ciphertext:
        return self._c1(self.trivial_batch(np.asarray([value]), 1), trivial=True)

    def apply_lookup_table(self, ct: Ciphertext, lut_or_f) -> Ciphertext:
        lut = (lut_or_f if isinstance(lut_or_f, LookupTable)
               else self.generate_lookup_table(lut_or_f))
        return self._c1(self.apply_lookup_table_batch(self._b1(ct), lut))

    def unchecked_add(self, a, b):
        return self._c1(self.unchecked_add_batch(self._b1(a), self._b1(b)))

    def unchecked_sub(self, a, b):
        out, _ = self.unchecked_sub_batch(self._b1(a), self._b1(b))
        return self._c1(out)

    def unchecked_neg(self, a):
        out, _ = self.unchecked_neg_batch(self._b1(a))
        return self._c1(out)

    def unchecked_scalar_add(self, a, s: int):
        return self._c1(self.unchecked_scalar_add_batch(self._b1(a), s))

    def unchecked_scalar_mul(self, a, s: int):
        return self._c1(self.unchecked_scalar_mul_batch(self._b1(a), s))

    def unchecked_bivariate(self, a, b, f) -> Ciphertext:
        blut = self.generate_lookup_table_bivariate(f)
        return self._c1(
            self.unchecked_bivariate_batch(self._b1(a), self._b1(b), blut)
        )

    def message_extract(self, a):
        return self.apply_lookup_table(a, lambda x: x % self.message_modulus)

    def carry_extract(self, a):
        return self.apply_lookup_table(a, lambda x: x // self.message_modulus)

    def _clean(self, ct: Ciphertext) -> Ciphertext:
        """Refresh a block so its carry space is empty."""
        if ct.carry_is_empty() and ct.noise_level <= NOMINAL_NOISE:
            return ct
        return self.message_extract(ct)

    def _smart_bivariate(self, a, b, f) -> Ciphertext:
        if a.degree >= self.message_modulus or a.noise_level > NOMINAL_NOISE:
            a = self.message_extract(a)
        if b.degree >= self.message_modulus or b.noise_level > NOMINAL_NOISE:
            b = self.message_extract(b)
        return self.unchecked_bivariate(a, b, f)

    # the reference's op files (each is a LUT family):
    def add(self, a, b):  # (ref: add.rs)
        if not self.is_add_possible(a, b):
            a, b = self._clean(a), self._clean(b)
        out = self.unchecked_add(a, b)
        return self.message_extract(out)

    def sub(self, a, b):  # (ref: sub.rs)
        if a.degree + ((b.degree // self.message_modulus + 1)
                       * self.message_modulus) > self.max_degree:
            a, b = self._clean(a), self._clean(b)
        return self.message_extract(self.unchecked_sub(a, b))

    def neg(self, a):  # (ref: neg.rs)
        return self.message_extract(self.unchecked_neg(a))

    def mul_lsb(self, a, b):  # (ref: mul.rs)
        m = self.message_modulus
        return self._smart_bivariate(a, b, lambda x, y: (x * y) % m)

    def mul_msb(self, a, b):
        m = self.message_modulus
        return self._smart_bivariate(a, b, lambda x, y: (x * y) // m)

    def div(self, a, b):  # (ref: div_mod.rs; division by zero yields msg-1)
        m = self.message_modulus
        return self._smart_bivariate(
            a, b, lambda x, y: (x // y) % m if y != 0 else m - 1
        )

    def mod_(self, a, b):
        m = self.message_modulus
        return self._smart_bivariate(
            a, b, lambda x, y: (x % y) % m if y != 0 else x % m
        )

    def bitand(self, a, b):  # (ref: bitwise_op.rs)
        return self._smart_bivariate(a, b, lambda x, y: x & y)

    def bitor(self, a, b):
        return self._smart_bivariate(a, b, lambda x, y: x | y)

    def bitxor(self, a, b):
        return self._smart_bivariate(a, b, lambda x, y: x ^ y)

    def scalar_left_shift(self, a, shift: int):  # (ref: shift.rs)
        m = self.message_modulus
        return self.apply_lookup_table(a, lambda x: ((x % m) << shift) % m)

    def scalar_right_shift(self, a, shift: int):
        m = self.message_modulus
        return self.apply_lookup_table(a, lambda x: (x % m) >> shift)

    # comparisons return 0/1 blocks (ref: comp_op.rs)
    def eq(self, a, b):
        return self._smart_bivariate(a, b, lambda x, y: int(x == y))

    def ne(self, a, b):
        return self._smart_bivariate(a, b, lambda x, y: int(x != y))

    def lt(self, a, b):
        return self._smart_bivariate(a, b, lambda x, y: int(x < y))

    def le(self, a, b):
        return self._smart_bivariate(a, b, lambda x, y: int(x <= y))

    def gt(self, a, b):
        return self._smart_bivariate(a, b, lambda x, y: int(x > y))

    def ge(self, a, b):
        return self._smart_bivariate(a, b, lambda x, y: int(x >= y))


def gen_keys(params: ClassicPBSParameters, seed: Optional[int] = None,
             cache_dir: Optional[str] = None):
    """(ref: shortint/mod.rs:87 gen_keys)

    With `cache_dir` and a fixed seed, raw bsk/ksk arrays are persisted on
    disk keyed by (param set name, seed) and the encryption generator is
    fast-forwarded on hit — the reference's keycache (ref:
    tfhe/src/keycache/mod.rs:58-228, shortint/keycache.rs)."""
    cks = ClientKey(params, seed=seed)
    if cache_dir is None or seed is None:
        return cks, ServerKey(cks)

    import os

    path = os.path.join(cache_dir, f"{params.name}_s{seed}.npz")
    if os.path.exists(path):
        data = np.load(path)
        cks.enc_gen.mask.current = int(data["mask_cur"])
        cks.enc_gen.noise.current = int(data["noise_cur"])
        return cks, ServerKey(cks, _raw=(data["bsk"], data["ksk"]))
    sks = ServerKey(cks)
    os.makedirs(cache_dir, exist_ok=True)
    np.savez(path, bsk=sks.raw_bsk, ksk=sks.raw_ksk,
             mask_cur=cks.enc_gen.mask.current,
             noise_cur=cks.enc_gen.noise.current)
    return cks, sks

"""FHE boolean gates over the u32 torus (ref: tfhe/src/boolean/).

Encoding: true = 1/8 (2^29), false = -1/8 (7*2^29)
(ref: boolean/mod.rs:74-80).  A binary gate is a linear combination of input
LWE ciphertexts followed by a sign-test bootstrap whose accumulator body is
the constant 1/8 polynomial (ref: boolean/engine/bootstrapping.rs:60), then a
keyswitch in the order dictated by the parameter set.

TPU-native additions: every gate also exists in a batched form operating on
ciphertext arrays [B, n+1] — one fused keyswitch + blind rotation over the
whole batch (the reference parallelizes gate-by-gate with rayon instead).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import core
from ..params import BooleanParameters, DEFAULT_PARAMETERS, PBSOrder
from ..prng import Seeder, system_seeder
from ..prng.generators import EncryptionRandomGenerator, SecretRandomGenerator

PLAINTEXT_TRUE = np.uint32(1 << 29)
PLAINTEXT_FALSE = np.uint32(7 << 29)


@dataclass
class Ciphertext:
    """Trivial (clear bool) or encrypted boolean (ref: boolean/ciphertext.rs)."""

    data: Optional[np.ndarray] = None  # [n+1] uint32
    trivial: Optional[bool] = None

    @property
    def is_trivial(self) -> bool:
        return self.trivial is not None


class ClientKey:
    """(ref: boolean/client_key/mod.rs)"""

    def __init__(self, params: BooleanParameters, seed: Optional[int] = None):
        self.params = params
        seeder = Seeder(seed) if seed is not None else system_seeder()
        sec = SecretRandomGenerator(seeder.seed())
        self._enc_gen = EncryptionRandomGenerator(seeder.seed(), seeder)
        self.lwe_sk = core.generate_binary_lwe_secret_key(
            params.lwe_dimension, sec, bits=32
        )
        self.glwe_sk = core.generate_binary_glwe_secret_key(
            params.glwe_dimension, params.polynomial_size, sec, bits=32
        )
        self.big_sk = self.glwe_sk.as_lwe_secret_key()
        self._seeder = seeder

    @property
    def encryption_sk(self):
        from ..params import EncryptionKeyChoice

        if self.params.encryption_key_choice is EncryptionKeyChoice.SMALL:
            return self.lwe_sk, self.params.lwe_modular_std_dev
        return self.big_sk, self.params.glwe_modular_std_dev

    def encrypt(self, message: bool) -> Ciphertext:
        return Ciphertext(data=self.encrypt_batch(np.asarray([message]))[0])

    def encrypt_batch(self, messages) -> np.ndarray:
        messages = np.asarray(messages, dtype=bool)
        encoded = np.where(messages, PLAINTEXT_TRUE, PLAINTEXT_FALSE)
        sk, std = self.encryption_sk
        return core.encrypt_lwe(sk, encoded, std, self._enc_gen)

    def decrypt(self, ct: Ciphertext) -> bool:
        if ct.is_trivial:
            return ct.trivial
        return bool(self.decrypt_batch(ct.data[None])[0])

    def decrypt_batch(self, data) -> np.ndarray:
        sk, _ = self.encryption_sk
        phase = core.decrypt_lwe(sk, np.asarray(data, np.uint32))
        return phase < np.uint32(1 << 31)


class ServerKey:
    """BSK (small -> GLWE) + KSK (big -> small) (ref: boolean/server_key)."""

    def __init__(self, cks: ClientKey):
        p = cks.params
        self.params = p
        bsk = core.generate_bootstrap_key(
            cks.lwe_sk, cks.glwe_sk, p.pbs_base_log, p.pbs_level,
            p.glwe_modular_std_dev, cks._enc_gen,
        )
        ksk = core.generate_keyswitch_key(
            cks.big_sk, cks.lwe_sk, p.ks_base_log, p.ks_level,
            p.lwe_modular_std_dev, cks._enc_gen,
        )
        # CRT-NTT domain (single 32-bit plane): exact, MXU-shaped
        self.bsk = core.prepare_bsk_auto(bsk, p.pbs_base_log, bits=32)
        self.ksk = core.prepare_ksk(ksk, p.ks_base_log, bits=32)
        acc = np.zeros((p.glwe_size, p.polynomial_size), dtype=np.uint32)
        acc[-1] = PLAINTEXT_TRUE
        self.accumulator = jnp.asarray(acc)

    # -- the bootstrapping pattern (ref: engine/bootstrapping.rs
    #    apply_bootstrapping_pattern) --

    def _bootstrap_pattern(self, lin_comb: np.ndarray) -> np.ndarray:
        ct = jnp.asarray(np.atleast_2d(lin_comb))
        if self.params.pbs_order is PBSOrder.KEYSWITCH_BOOTSTRAP:
            out = _ks_pbs_jit(self.ksk, self.bsk, self.accumulator, ct)
        else:
            out = _pbs_ks_jit(self.ksk, self.bsk, self.accumulator, ct)
        return np.asarray(out)

    # -- batched gates (TPU-native API) --

    def and_batch(self, a, b):
        with np.errstate(over="ignore"):
            return self._bootstrap_pattern(a + b + PLAINTEXT_FALSE * _unit(a))

    def or_batch(self, a, b):
        with np.errstate(over="ignore"):
            return self._bootstrap_pattern(a + b + PLAINTEXT_TRUE * _unit(a))

    def nand_batch(self, a, b):
        with np.errstate(over="ignore"):
            return self._bootstrap_pattern(
                (np.uint32(0) - (a + b)) + PLAINTEXT_TRUE * _unit(a)
            )

    def nor_batch(self, a, b):
        with np.errstate(over="ignore"):
            return self._bootstrap_pattern(
                (np.uint32(0) - (a + b)) + PLAINTEXT_FALSE * _unit(a)
            )

    def xor_batch(self, a, b):
        with np.errstate(over="ignore"):
            return self._bootstrap_pattern(
                np.uint32(2) * (a + b + PLAINTEXT_TRUE * _unit(a))
            )

    def xnor_batch(self, a, b):
        with np.errstate(over="ignore"):
            return self._bootstrap_pattern(
                np.uint32(2) * ((np.uint32(0) - (a + b)) + PLAINTEXT_FALSE * _unit(a))
            )

    def not_batch(self, a):
        with np.errstate(over="ignore"):
            return np.uint32(0) - np.asarray(a, np.uint32)

    def mux_batch(self, cond, then_ct, else_ct):
        """(ref: boolean/engine/mod.rs:461-570 mux)"""
        with np.errstate(over="ignore"):
            u = _unit(cond)
            t1 = cond + then_ct + PLAINTEXT_FALSE * u
            t2 = (np.uint32(0) - cond) + else_ct + PLAINTEXT_FALSE * u
            p1 = self._bootstrap_pattern(t1)
            p2 = self._bootstrap_pattern(t2)
            return p1 + p2 + PLAINTEXT_TRUE * _unit(p1)

    # -- scalar gate API with trivial-ciphertext dispatch (ref semantics) --

    def _binary_gate(self, a: Ciphertext, b: Ciphertext, batch_fn, clear_fn,
                     mixed_fn):
        if a.is_trivial and b.is_trivial:
            return Ciphertext(trivial=clear_fn(a.trivial, b.trivial))
        if a.is_trivial or b.is_trivial:
            enc, clear = (b, a.trivial) if a.is_trivial else (a, b.trivial)
            return mixed_fn(enc, clear)
        return Ciphertext(data=batch_fn(a.data[None], b.data[None])[0])

    def and_(self, a, b):
        return self._binary_gate(
            a, b, self.and_batch, lambda x, y: x and y,
            lambda enc, clear: (Ciphertext(data=enc.data.copy()) if clear
                                else Ciphertext(trivial=False)),
        )

    def or_(self, a, b):
        return self._binary_gate(
            a, b, self.or_batch, lambda x, y: x or y,
            lambda enc, clear: (Ciphertext(trivial=True) if clear
                                else Ciphertext(data=enc.data.copy())),
        )

    def nand(self, a, b):
        return self.not_(self.and_(a, b))

    def nor(self, a, b):
        return self.not_(self.or_(a, b))

    def xor(self, a, b):
        return self._binary_gate(
            a, b, self.xor_batch, lambda x, y: x != y,
            lambda enc, clear: (self.not_(enc) if clear
                                else Ciphertext(data=enc.data.copy())),
        )

    def xnor(self, a, b):
        return self.not_(self.xor(a, b))

    def not_(self, a: Ciphertext) -> Ciphertext:
        if a.is_trivial:
            return Ciphertext(trivial=not a.trivial)
        return Ciphertext(data=self.not_batch(a.data))

    def mux(self, cond: Ciphertext, then_ct: Ciphertext, else_ct: Ciphertext):
        if cond.is_trivial:
            return then_ct if cond.trivial else else_ct
        if then_ct.is_trivial:
            return (self.or_(cond, else_ct) if then_ct.trivial
                    else self.and_(self.not_(cond), else_ct))
        if else_ct.is_trivial:
            return (self.or_(then_ct, self.not_(cond)) if else_ct.trivial
                    else self.and_(cond, then_ct))
        return Ciphertext(
            data=self.mux_batch(cond.data[None], then_ct.data[None],
                                else_ct.data[None])[0]
        )

    def trivial_encrypt(self, value: bool) -> Ciphertext:
        return Ciphertext(trivial=value)


def _unit(a):
    """all-zero-mask unit vector matching a's shape: adds a plaintext const."""
    u = np.zeros(np.asarray(a).shape[-1], dtype=np.uint32)
    u[-1] = 1
    return u


@partial(jax.jit, static_argnames=())
def _ks_pbs_jit(ksk, bsk, accumulator, ct):
    return core.keyswitch_then_pbs(ksk, bsk, accumulator, ct)


@partial(jax.jit, static_argnames=())
def _pbs_ks_jit(ksk, bsk, accumulator, ct):
    return core.pbs_then_keyswitch(ksk, bsk, accumulator, ct)


class PublicKey:
    """Boolean public key: zero-encryption list over the u32 torus
    (ref: tfhe/src/boolean/public_key/mod.rs)."""

    def __init__(self, cks: ClientKey):
        from ..core import public_key as core_pk

        self.params = cks.params
        sk, std = cks.encryption_sk
        count = core_pk.public_key_zero_encryption_count(
            sk.lwe_dimension + 1, bits=32)
        self.key = core_pk.generate_lwe_public_key(sk, count, std,
                                                   cks._enc_gen)

    def encrypt_batch(self, messages, seed: Optional[int] = None
                      ) -> np.ndarray:
        from ..core import public_key as core_pk
        from ..prng.generators import SecretRandomGenerator

        seeder = Seeder(seed) if seed is not None else system_seeder()
        sec = SecretRandomGenerator(seeder.seed())
        messages = np.asarray(messages, dtype=bool)
        encoded = np.where(messages, PLAINTEXT_TRUE, PLAINTEXT_FALSE)
        return core_pk.encrypt_lwe_with_public_key(self.key, encoded, sec)

    def encrypt(self, message: bool, seed: Optional[int] = None) -> Ciphertext:
        return Ciphertext(data=self.encrypt_batch([message], seed=seed)[0])


def gen_keys(params: BooleanParameters = DEFAULT_PARAMETERS,
             seed: Optional[int] = None):
    """(ref: boolean/mod.rs gen_keys)"""
    cks = ClientKey(params, seed=seed)
    sks = ServerKey(cks)
    return cks, sks

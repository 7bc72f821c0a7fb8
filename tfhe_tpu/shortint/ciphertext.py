"""Shortint ciphertext with static health metadata.

(ref: tfhe/src/shortint/ciphertext/mod.rs:27-259 — Degree and NoiseLevel are
host-side bookkeeping; `checked_` ops validate them against MaxDegree /
MaxNoiseLevel and smart ops use them to decide when to clean carries.)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


class CheckError(Exception):
    """Raised when an operation would overflow degree or noise budget
    (ref: shortint/server_key/mod.rs CheckError)."""


NOMINAL_NOISE = 1


@dataclass
class Ciphertext:
    """One shortint block: LWE data + (degree, noise_level) metadata."""

    data: np.ndarray  # [lwe_size] uint64
    degree: int
    message_modulus: int
    carry_modulus: int
    noise_level: int = NOMINAL_NOISE
    is_trivial: bool = False

    def copy(self) -> "Ciphertext":
        return Ciphertext(
            data=self.data.copy(),
            degree=self.degree,
            message_modulus=self.message_modulus,
            carry_modulus=self.carry_modulus,
            noise_level=self.noise_level,
            is_trivial=self.is_trivial,
        )

    @property
    def total_modulus(self) -> int:
        return self.message_modulus * self.carry_modulus

    def carry_is_empty(self) -> bool:
        return self.degree < self.message_modulus


@dataclass
class ShortintBatch:
    """A batch of shortint blocks: the TPU-native unit of work.

    data [B, lwe_size] uint64; degrees/noise [B] host metadata.  Integer radix
    operations are expressed as transformations of these batches so every PBS
    in a radix op is one fused device call.
    """

    data: np.ndarray
    degrees: np.ndarray
    message_modulus: int
    carry_modulus: int
    noise: np.ndarray = None

    def __post_init__(self):
        if self.noise is None:
            self.noise = np.full(self.data.shape[0], NOMINAL_NOISE, dtype=np.int64)
        self.degrees = np.asarray(self.degrees, dtype=np.int64)

    def __len__(self):
        return self.data.shape[0]

    def copy(self) -> "ShortintBatch":
        return ShortintBatch(
            self.data.copy(), self.degrees.copy(), self.message_modulus,
            self.carry_modulus, self.noise.copy(),
        )

    def _conformance_check(self, params) -> None:
        """Structural conformance vs a parameter set
        (ref: tfhe/src/conformance.rs ParameterSetConformant for shortint
        ciphertexts: moduli + LWE size must match)."""
        from ..utils.serialization import ConformanceError

        if (self.message_modulus != params.message_modulus
                or self.carry_modulus != params.carry_modulus):
            raise ConformanceError(
                f"modulus mismatch: ct ({self.message_modulus},"
                f"{self.carry_modulus}) != params "
                f"({params.message_modulus},{params.carry_modulus})"
            )
        if self.data.shape[-1] != params.ciphertext_lwe_size:
            raise ConformanceError(
                f"LWE size mismatch: ct {self.data.shape[-1]} != params "
                f"{params.ciphertext_lwe_size}"
            )

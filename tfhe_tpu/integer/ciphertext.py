"""Radix ciphertexts: big integers as vectors of shortint blocks, LSB first
(ref: tfhe/src/integer/ciphertext/mod.rs:18-30)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..shortint.ciphertext import ShortintBatch


@dataclass
class RadixCiphertext:
    """blocks: a ShortintBatch of num_blocks blocks, least significant first."""

    blocks: ShortintBatch

    @property
    def num_blocks(self) -> int:
        return len(self.blocks)

    def copy(self) -> "RadixCiphertext":
        return RadixCiphertext(self.blocks.copy())

    def block_degrees(self) -> np.ndarray:
        return self.blocks.degrees

    def _conformance_check(self, params) -> None:
        self.blocks._conformance_check(params)


@dataclass
class BooleanBlock:
    """A single block known to hold 0/1 (ref: integer/ciphertext/boolean_value.rs)."""

    block: ShortintBatch  # batch of size 1

    def copy(self) -> "BooleanBlock":
        return BooleanBlock(self.block.copy())

    def _conformance_check(self, params) -> None:
        self.block._conformance_check(params)

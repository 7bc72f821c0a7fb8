"""Integer (radix) WoPBS: evaluate an arbitrary function of a whole radix
integer with one vertical-packing lookup per output block.

(ref: tfhe/src/integer/wopbs/mod.rs:277-340 wopbs + generate_lut — bits
are extracted per block, MSB block first, then circuit-bootstrapped once
and shared by every output block's vertical packing.)
"""

from __future__ import annotations

import math
from typing import Callable, List

import jax.numpy as jnp
import numpy as np

from ..core import wopbs as wop
from ..shortint.ciphertext import ShortintBatch
from ..shortint.wopbs import WopbsKey
from .ciphertext import RadixCiphertext


class IntegerWopbsLUT:
    """One LUT polynomial list per output block
    (ref: integer/wopbs/mod.rs IntegerWopbsLUT)."""

    def __init__(self, polys_per_block: List[np.ndarray], message_modulus: int):
        self.polys_per_block = polys_per_block
        self.message_modulus = message_modulus


class IntegerWopbsKey:
    def __init__(self, wopbs_key: WopbsKey):
        self.key = wopbs_key
        self.params = wopbs_key.params

    def _bits_per_block(self, degrees) -> int:
        deg = int(np.max(degrees))
        return max(1, math.ceil(math.log2(deg + 1)))

    def generate_lut(self, ct: RadixCiphertext,
                     f: Callable[[int], int]) -> IntegerWopbsLUT:
        """LUT indexed by the packed extracted bits of `ct` (MSB block
        first == the plain integer value for power-of-two radix)
        (ref: integer/wopbs/mod.rs generate_lut)."""
        p = self.params
        msg = p.message_modulus
        nb = ct.num_blocks
        bits_pb = self._bits_per_block(ct.blocks.degrees)
        total_bits = bits_pb * nb
        count = max(1, (1 << total_bits) // p.polynomial_size)
        N = p.polynomial_size
        delta_log = p.delta.bit_length() - 1
        modulus = msg ** nb
        polys = []
        for j in range(nb):
            poly = np.zeros((count, N), dtype=np.uint64)
            for v in range(1 << total_bits):
                out = int(f(v % modulus)) % modulus
                block_val = (out // msg ** j) % msg
                poly[v // N, v % N] = np.uint64(block_val) << np.uint64(
                    delta_log)
            polys.append(poly)
        return IntegerWopbsLUT(polys, msg)

    def wopbs(self, ct: RadixCiphertext,
              lut: IntegerWopbsLUT) -> RadixCiphertext:
        """(ref: integer/wopbs/mod.rs:277-340)"""
        p = self.params
        wk = self.key
        nb = ct.num_blocks
        bits_pb = self._bits_per_block(ct.blocks.degrees)
        delta_log = p.delta.bit_length() - 1

        # one batched extraction over all blocks, then reorder to the
        # MSB-block-first, MSB-bit-first list the packing expects
        bits = wk.extract_bits_batch(ct.blocks, delta_log, bits_pb)
        # bits: [nb, bits_pb, n_small+1], blocks LSB first; flatten reversed
        ordered = [bits[blk, j] for blk in range(nb - 1, -1, -1)
                   for j in range(bits_pb)]

        # one batched circuit bootstrap over every extracted bit
        stacked = jnp.stack(ordered)  # [total_bits, n_small+1]
        ggsw_all = wk.cbs.circuit_bootstrap(stacked, 63)
        ggsw_list = [ggsw_all[i:i + 1] for i in range(len(ordered))]
        out_blocks = []
        for j in range(nb):
            out = np.asarray(wop.vertical_packing(
                lut.polys_per_block[j], ggsw_list, p.glwe_size,
                p.cbs_base_log, p.cbs_level))
            out_blocks.append(out[0])
        data = np.stack(out_blocks)
        return RadixCiphertext(ShortintBatch(
            data=data,
            degrees=np.full(nb, p.message_modulus - 1, dtype=np.int64),
            message_modulus=p.message_modulus,
            carry_modulus=p.carry_modulus,
        ))

"""Signed gadget decomposition, vectorized.

Bit-exact re-expression of the reference's branchless decomposer
(ref: tfhe/src/core_crypto/commons/math/decomposition/decomposer.rs:98-118
`closest_representable`; decomposition/iter.rs:120-127 `decompose_one_level`).

Convention: digit index j of the output corresponds to decomposition level
l = j+1, i.e. recomposition weight q / B^(j+1) (largest weight first).  The
reference's iterator yields levels in the opposite order; key material in
this framework is generated with the same j-indexing so the contraction in
the keyswitch/external product lines up.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _udtype(bits: int):
    return jnp.uint64 if bits == 64 else jnp.uint32


def closest_representable(x, base_log: int, levels: int, bits: int = 64):
    """Round x to the nearest multiple of q / B^levels (ties away from zero
    in the reference's shift-and-mask formulation)."""
    non_rep = bits - levels * base_log
    assert non_rep >= 1, "decomposition covers the full torus width"
    shift = non_rep - 1
    dt = _udtype(bits)
    x = jnp.asarray(x, dtype=dt)
    res = x >> shift
    res = res + jnp.asarray(1, dt)
    res = res & ~jnp.asarray(1, dt)
    return res << shift


def signed_decompose(x, base_log: int, levels: int, bits: int = 64):
    """Signed decomposition -> int32 digits [..., levels], digit j has weight
    q/B^(j+1); each digit lies in [-B/2, B/2]."""
    dt = _udtype(bits)
    x = closest_representable(x, base_log, levels, bits)
    state = x >> (bits - base_log * levels)
    mod_b_mask = jnp.asarray((1 << base_log) - 1, dt)
    one = jnp.asarray(1, dt)
    digits = []
    for _ in range(levels):
        res = state & mod_b_mask
        state = state >> base_log
        carry = ((res - one) | state) & res
        carry = carry >> (base_log - 1)
        state = state + carry
        digit = res.astype(jnp.int32) - (carry.astype(jnp.int32) << base_log)
        digits.append(digit)
    # emitted smallest weight (level=levels) first; return largest weight first
    digits.reverse()
    return jnp.stack(digits, axis=-1)


def recompose(digits, base_log: int, levels: int, bits: int = 64):
    """Sum digit_j * q/B^(j+1); inverse of signed_decompose up to rounding."""
    dt = _udtype(bits)
    acc = jnp.zeros(digits.shape[:-1], dtype=dt)
    for j in range(levels):
        weight_log = bits - base_log * (j + 1)
        term = digits[..., j].astype(jnp.int64).astype(jnp.uint64)
        if bits == 32:
            term = term.astype(jnp.uint32)
        acc = acc + (term.astype(dt) << weight_log)
    return acc


# numpy versions for host-side (client) code ---------------------------------


def np_closest_representable(x: np.ndarray, base_log: int, levels: int,
                             bits: int = 64) -> np.ndarray:
    non_rep = bits - levels * base_log
    assert non_rep >= 1
    shift = non_rep - 1
    dt = np.uint64 if bits == 64 else np.uint32
    x = x.astype(dt)
    with np.errstate(over="ignore"):
        res = x >> dt(shift)
        res = res + dt(1)
        res = res & ~dt(1)
        return res << dt(shift)

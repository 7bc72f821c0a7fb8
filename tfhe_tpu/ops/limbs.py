"""Signed 8-bit limb decomposition of torus words.

The exact-arithmetic backbone: a torus word x in Z_{2^64} is written as
    x = sum_j m_j * 2^(8j)  (mod 2^64),  m_j in [-128, 127]
via the balanced-byte trick  m_j = byte_j(x + 0x8080..80) - 128.  Products of
two limb-decomposed operands then become int8 x int8 -> int32 MXU dot
products, recombined by shifted adds modulo 2^64.  This replaces the
reference's torus <-> f64 Fourier conversions (ref: tfhe/src/core_crypto/
fft_impl/fft64/math/fft/mod.rs, x86.rs) with error-free integer arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp


def n_key_limbs(bits: int) -> int:
    """Limbs needed for a full torus word (8 for u64, 4 for u32)."""
    return bits // 8


def n_operand_limbs(base_log: int) -> int:
    """Limbs needed for a signed decomposition digit in [-B/2, B/2].

    Smallest t with 2^(base_log-1) + 0x80..80 (t bytes) < 2^(8t)."""
    t = 1
    while (1 << (base_log - 1)) + int.from_bytes(b"\x80" * t, "little") >= (1 << (8 * t)):
        t += 1
    return t


def torus_to_limbs(x, bits: int = 64):
    """[...,] uint torus -> [..., bits/8] int8 balanced limbs, exact mod 2^bits."""
    m = bits // 8
    dt = jnp.uint64 if bits == 64 else jnp.uint32
    x = jnp.asarray(x, dt)
    bias = jnp.asarray(int.from_bytes(b"\x80" * m, "little"), dt)
    y = x + bias  # wrapping add mod 2^bits
    out = []
    for j in range(m):
        b = ((y >> (8 * j)) & jnp.asarray(0xFF, dt)).astype(jnp.int32) - 128
        out.append(b.astype(jnp.int8))
    return jnp.stack(out, axis=-1)


def digits_to_limbs(d, base_log: int):
    """[...,] int32 signed digits in [-B/2, B/2] -> [..., t] int8 limbs, exact."""
    t = n_operand_limbs(base_log)
    bias = int.from_bytes(b"\x80" * t, "little")
    y = d.astype(jnp.int32) + bias  # positive, < 2^(8t)
    out = []
    for j in range(t):
        b = ((y >> (8 * j)) & 0xFF) - 128
        out.append(b.astype(jnp.int8))
    return jnp.stack(out, axis=-1)


def combine_limb_products(prod32, limb_axes, bits: int = 64):
    """Recombine int32 limb-pair products into a torus word.

    prod32: int32 array with two limb axes (operand limb i, key limb m) at
    positions `limb_axes` = (axis_i, axis_m).  Returns the uint sum
        sum_{i,m} prod32[..., i, ..., m, ...] << 8*(i+m)   (mod 2^bits)
    with pairs whose weight is >= 2^bits dropped (they vanish mod 2^bits).
    """
    ax_i, ax_m = limb_axes
    ax_i = ax_i % prod32.ndim
    ax_m = ax_m % prod32.ndim
    assert ax_i < ax_m, "pass limb axes as (operand_axis, key_axis), in order"
    ni = prod32.shape[ax_i]
    nm = prod32.shape[ax_m]
    dt = jnp.uint64 if bits == 64 else jnp.uint32
    st = jnp.int64 if bits == 64 else jnp.int32
    acc = None
    # group pairs by s = i + m; each diagonal sum stays well inside int32
    max_s = bits // 8 - 1
    for s in range(0, min(ni + nm - 2, max_s) + 1):
        diag = None
        for i in range(ni):
            m = s - i
            if 0 <= m < nm:
                term = jnp.take(jnp.take(prod32, i, axis=ax_i), m, axis=ax_m - 1)
                diag = term if diag is None else diag + term
        shifted = (diag.astype(st).astype(dt)) << (8 * s)
        acc = shifted if acc is None else acc + shifted
    return acc

"""Pallas TPU kernels for the external-product hot path.

The blind-rotation step is three stages: forward NTT (dense int8 matmul —
already MXU-shaped via XLA einsum), the Shoup spectrum multiply-accumulate
(VPU elementwise + a small reduction), and the inverse NTT.  XLA fuses the
middle stage reasonably, but a hand-written kernel removes the int64
round-trips XLA inserts for the centering arithmetic and keeps the whole
accumulation in VMEM across the LJ reduction.

This module provides that middle stage as a Pallas kernel
(`shoup_mac`), grid-parallel over the ciphertext batch.  It is opt-in
(TFHE_TPU_PALLAS=1) and falls back to the jnp path everywhere else; tests
run it in interpreter mode so CI validates exactness without TPU hardware.

(ref: the stage corresponds to fft64/crypto/ggsw.rs update_with_fmadd
:616-697, the reference's pulp-SIMD kernel.)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import ntt


def enabled() -> bool:
    return os.environ.get("TFHE_TPU_PALLAS", "") == "1"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shoup_mac_kernel(a_ref, ks_ref, ksh_ref, o_ref, *, p: int, lj: int):
    """One batch element: acc[gm, n] = center(sum_j shoup(a[j], ks[j, gm])).

    All arithmetic stays int32 on the VPU: the Shoup trick bounds every
    intermediate product by |a| * 2^16 < 2^31.
    """
    half = p // 2
    acc = jnp.zeros(o_ref.shape, jnp.int32)
    for j in range(lj):  # static unroll: lj = levels * glwe_size (small)
        a_j = a_ref[0, j][None, :]          # [1, N] broadcast over GM rows
        ks_j = ks_ref[j]                    # [GM, N]
        ksh_j = ksh_ref[j]
        q = jax.lax.shift_right_arithmetic(a_j * ksh_j, jnp.int32(16))
        r = a_j * ks_j - q * np.int32(p)
        r = jnp.where(r > half, r - p, r)
        r = jnp.where(r > half, r - p, r)
        r = jnp.where(r < -half, r + p, r)
        r = jnp.where(r < -half, r + p, r)
        acc = acc + r
    # |acc| <= lj * p/2: one centering pass back into balanced form
    acc = acc - jnp.round(acc.astype(jnp.float32) / p).astype(jnp.int32) * p
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("p",))
def shoup_mac(a, ks, ksh, p: int):
    """a [B, LJ, N], ks/ksh [LJ, GM, N] balanced int32 -> [B, GM, N]
    balanced int32 sums mod p."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, LJ, N = a.shape
    GM = ks.shape[1]
    kernel = functools.partial(_shoup_mac_kernel, p=p, lj=LJ)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, LJ, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LJ, GM, N), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LJ, GM, N), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, GM, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, GM, N), jnp.int32),
        interpret=_interpret(),
    )(a, ks, ksh)


def shoup_mac_reference(a, ks, ksh, p: int):
    """The jnp formulation (what external_product_ntt computes inline)."""
    r = ntt.shoup_mul(a[:, :, None, :], ks[None], ksh[None], p)
    s = r.sum(axis=1, dtype=jnp.int32)
    return ntt.fold_p_f32(s, p)

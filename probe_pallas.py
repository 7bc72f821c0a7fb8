"""Probe: validate the Mosaic/Pallas primitives the fused PBS kernel needs.

Run on the real TPU.  Each probe compares the kernel output against a jnp
reference and prints PASS/FAIL plus wall time.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def check(name, got, want):
    ok = np.array_equal(np.asarray(got), np.asarray(want))
    print(f"{name:40s} {'PASS' if ok else 'FAIL'}")
    if not ok:
        g, w = np.asarray(got), np.asarray(want)
        bad = np.argwhere(g != w)
        print("  first diff at", bad[:3], g[tuple(bad[0])], w[tuple(bad[0])])
    return ok


# 1. int8 x int8 -> int32 2D matmul
def k_dot(a_ref, b_ref, o_ref):
    o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                         preferred_element_type=jnp.int32)


def probe_dot():
    rng = np.random.default_rng(0)
    a = rng.integers(-128, 128, (128, 192), dtype=np.int8)
    b = rng.integers(-128, 128, (192, 4096), dtype=np.int8)
    out = pl.pallas_call(
        k_dot,
        out_shape=jax.ShapeDtypeStruct((128, 4096), jnp.int32),
    )(a, b)
    want = a.astype(np.int32) @ b.astype(np.int32)
    check("int8 matmul [128,192]@[192,4096]", out, want)


# 2. reshape view [N, B] -> [R, C*B] and back
def k_reshape(x_ref, o_ref):
    x = x_ref[...]
    N, B = x.shape
    R, C = 64, N // 64
    y = x.reshape(R, C * B)
    o_ref[...] = y.reshape(N, B) + y.reshape(N, B)


def probe_reshape():
    rng = np.random.default_rng(1)
    x = rng.integers(-1000, 1000, (2048, 128), dtype=np.int32)
    out = pl.pallas_call(
        k_reshape,
        out_shape=jax.ShapeDtypeStruct((2048, 128), jnp.int32),
    )(x)
    check("reshape [N,B]->[R,C*B]->[N,B]", out, x + x)


# 3. transpose leading dims (K1, C, B) -> (C, K1, B)
def k_transpose(x_ref, o_ref):
    o_ref[...] = jnp.transpose(x_ref[...], (1, 0, 2))


def probe_transpose():
    rng = np.random.default_rng(2)
    x = rng.integers(-1000, 1000, (64, 32, 128), dtype=np.int32)
    out = pl.pallas_call(
        k_transpose,
        out_shape=jax.ShapeDtypeStruct((32, 64, 128), jnp.int32),
    )(x)
    check("transpose (1,0,2) [64,32,128]", out, x.transpose(1, 0, 2))


# 4. f32 round-fold (the mod-p reduction)
def k_fold(x_ref, o_ref, *, p):
    x = x_ref[...]
    q = jnp.round(x.astype(jnp.float32) * np.float32(1.0 / p)).astype(jnp.int32)
    o_ref[...] = x - q * np.int32(p)


def probe_fold():
    rng = np.random.default_rng(3)
    p = 86017
    x = rng.integers(-(1 << 23), 1 << 23, (256, 512), dtype=np.int32)
    out = pl.pallas_call(
        functools.partial(k_fold, p=p),
        out_shape=jax.ShapeDtypeStruct((256, 512), jnp.int32),
    )(x)
    q = np.round(x.astype(np.float32) / p).astype(np.int64)
    want = (x - q * p).astype(np.int32)
    check("f32 round-fold mod p", out, want)


# 5. int32 multiply + arithmetic shift (shoup)
def k_shoup(a_ref, b_ref, bs_ref, o_ref, *, p):
    a, b, bs = a_ref[...], b_ref[...], bs_ref[...]
    q = jax.lax.shift_right_arithmetic(a * bs, 16)
    r = a * b - q * np.int32(p)
    half = p // 2
    r = jnp.where(r > half, r - p, r)
    r = jnp.where(r > half, r - p, r)
    r = jnp.where(r < -half, r + p, r)
    o_ref[...] = jnp.where(r < -half, r + p, r)


def probe_shoup():
    rng = np.random.default_rng(4)
    p = 61441
    a = rng.integers(-p // 2, p // 2 + 1, (256, 512), dtype=np.int32)
    b = rng.integers(-p // 2, p // 2 + 1, (256, 512), dtype=np.int32)
    bs = np.round(b.astype(np.float64) * (1 << 16) / p).astype(np.int32)
    out = pl.pallas_call(
        functools.partial(k_shoup, p=p),
        out_shape=jax.ShapeDtypeStruct((256, 512), jnp.int32),
    )(a, b, bs)
    want = ((a.astype(np.int64) * b) % p)
    want = np.where(want > p // 2, want - p, want).astype(np.int32)
    check("shoup mulmod int32", out, want)


# 6. sublane-dim roll via concat (the barrel rotator stage)
def k_roll(x_ref, bit_ref, o_ref, *, s):
    x = x_ref[...]
    rolled = jnp.concatenate([x[-s:], x[:-s]], axis=0)
    o_ref[...] = jnp.where(bit_ref[...] == 1, rolled, x)


def probe_roll():
    rng = np.random.default_rng(5)
    x = rng.integers(-1000, 1000, (4096, 128), dtype=np.int32)
    bit = rng.integers(0, 2, (1, 128), dtype=np.int32)
    s = 8
    out = pl.pallas_call(
        functools.partial(k_roll, s=s),
        out_shape=jax.ShapeDtypeStruct((4096, 128), jnp.int32),
    )(x, bit)
    want = np.where(bit == 1, np.roll(x, s, axis=0), x)
    check("sublane roll+select [4096,128]", out, want)


# 7. int8 limb split inside a kernel
def k_limb(x_ref, o_ref):
    v = x_ref[...]
    outs = []
    for _ in range(3):
        l0 = ((v + 128) & 255) - 128
        outs.append(l0.astype(jnp.int8))
        v = (v - l0) >> 8
    o_ref[...] = jnp.stack(outs, axis=0).reshape(3 * x_ref.shape[0],
                                                 x_ref.shape[1])


def probe_limb():
    rng = np.random.default_rng(6)
    x = rng.integers(-(1 << 22), 1 << 22, (64, 512), dtype=np.int32)
    out = pl.pallas_call(
        k_limb,
        out_shape=jax.ShapeDtypeStruct((192, 512), jnp.int8),
    )(x)
    want = []
    v = x.astype(np.int64).copy()
    for _ in range(3):
        l0 = ((v + 128) & 255) - 128
        want.append(l0.astype(np.int8))
        v = (v - l0) >> 8
    want = np.stack(want, axis=0).reshape(192, 512)
    check("3-limb int8 split", out, want)


# 8. interleaved stack-reshape: [R, C*B] x3 limbs -> [(R*3), C*B] row (r,i)
def k_stackrows(x_ref, o_ref):
    v = x_ref[...]
    outs = []
    for _ in range(3):
        l0 = ((v + 128) & 255) - 128
        outs.append(l0.astype(jnp.int8))
        v = (v - l0) >> 8
    st = jnp.stack(outs, axis=1)  # [R, 3, CB]
    o_ref[...] = st.reshape(3 * x_ref.shape[0], x_ref.shape[1])


def probe_stackrows():
    rng = np.random.default_rng(7)
    x = rng.integers(-(1 << 22), 1 << 22, (64, 512), dtype=np.int32)
    out = pl.pallas_call(
        k_stackrows,
        out_shape=jax.ShapeDtypeStruct((192, 512), jnp.int8),
    )(x)
    v = x.astype(np.int64).copy()
    limbs = []
    for _ in range(3):
        l0 = ((v + 128) & 255) - 128
        limbs.append(l0.astype(np.int8))
        v = (v - l0) >> 8
    want = np.stack(limbs, axis=1).reshape(192, 512)
    check("interleaved limb rows (r,i)", out, want)


def main():
    for f in [probe_dot, probe_reshape, probe_transpose, probe_fold,
              probe_shoup, probe_roll, probe_limb, probe_stackrows]:
        t0 = time.time()
        try:
            f()
        except Exception as e:
            print(f"{f.__name__:40s} ERROR: {type(e).__name__}: {str(e)[:300]}")
        print(f"  ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()

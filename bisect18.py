"""True costs of the prime-block epilogue pieces (scanned x2000)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 2000
rng = np.random.default_rng(0)
vm = pl.BlockSpec(memory_space=pltpu.VMEM)
cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
P_ = 86017
INV = np.float32(1.0 / P_)
K1, C, B = 64, 32, 128
N = 2048


def bench(name, kernel, x, nin=1):
    call = pl.pallas_call(kernel, in_specs=[vm] * nin, out_specs=vm,
                          out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                          compiler_params=cp)

    @jax.jit
    def run(c):
        out, _ = jax.lax.scan(lambda c, _: (call(c), None), c, None,
                              length=STEPS)
        return out

    o = run(x)
    np.asarray(o.ravel()[0])
    t0 = time.time()
    o = run(x)
    np.asarray(o.ravel()[0])
    dt = (time.time() - t0 - 0.025) / STEPS
    print(f"{name}: {dt*1e6:.1f} us", flush=True)


x_i32 = jnp.asarray(rng.integers(-(P_ // 2), P_ // 2, (K1, C * B),
                                 dtype=np.int64).astype(np.int32))


# 1. the fwd transpose [K1, C, B] -> [C, K1*B]
def k_tr(x_ref, o_ref):
    y = x_ref[...].reshape(K1, C, B)
    o_ref[...] = jnp.transpose(y, (1, 0, 2)).reshape(C, K1 * B).reshape(
        K1, C * B) * 0 + jnp.transpose(
        jnp.transpose(y, (1, 0, 2)), (1, 0, 2)).reshape(K1, C * B)


bench("transpose x2 [64,32,128]", k_tr, x_i32)


# 2. horner (nl=3) from a fake [3*K1, C*B] int32
y3 = jnp.asarray(rng.integers(-(1 << 21), 1 << 21, (3 * K1, C * B),
                              dtype=np.int64).astype(np.int32))


def _fold(v):
    q = jnp.round(v.astype(jnp.float32) * INV).astype(jnp.int32)
    return v - q * np.int32(P_)


def k_horner(x_ref, o_ref):
    Y = x_ref[...]
    Yv = Y.reshape(3, K1, C * B)
    h = _fold(Yv[2])
    h = _fold(h * 256 + Yv[1])
    h = _fold(h * 256 + Yv[0])
    o_ref[...] = jnp.concatenate([h, h, h], axis=0)


bench("horner nl=3 [192,4096]", k_horner, y3)


# 3. limb split + stack (nlx=3) int8
def k_limb(x_ref, o_ref):
    v = x_ref[...]
    outs = []
    for _ in range(3):
        l0 = ((v + 128) & 255) - 128
        outs.append(l0.astype(jnp.int8))
        v = (v - l0) >> 8
    st = jnp.stack(outs, axis=1).reshape(3 * K1, C * B)
    o_ref[...] = (st.astype(jnp.int32) + x_ref[...][0:1] * 0)[
        :K1].repeat(1, axis=0) * 0 + x_ref[...]


bench("limb3+stack [64,4096]", k_limb, x_i32)


# 4. twiddle broadcast [K1, 1, C, 1]-style
tc = jnp.asarray(rng.integers(-170, 170, (K1, C),
                              dtype=np.int64).astype(np.int32))


def k_twiddle(x_ref, t_ref, o_ref):
    y = x_ref[...].reshape(K1, C, B)
    t = t_ref[...][:, :, None]
    o_ref[...] = (y * t).reshape(K1, C * B)


call_t = pl.pallas_call(k_twiddle, in_specs=[vm] * 2, out_specs=vm,
                        out_shape=jax.ShapeDtypeStruct((K1, C * B),
                                                       jnp.int32),
                        compiler_params=cp)


@jax.jit
def run_t(c):
    out, _ = jax.lax.scan(lambda c, _: (call_t(c, tc), None), c, None,
                          length=STEPS)
    return out


o = run_t(x_i32)
np.asarray(o.ravel()[0])
t0 = time.time()
o = run_t(x_i32)
np.asarray(o.ravel()[0])
print(f"twiddle bcast [K1,C,1]: {(time.time()-t0-0.025)/STEPS*1e6:.1f} us",
      flush=True)


# 5. the khi transpose [8, 2048] -> [2048, 8]
kh = jnp.asarray(rng.integers(-170, 170, (8, N), dtype=np.int16))


def k_kht(x_ref, o_ref):
    kt = jnp.transpose(x_ref[...].astype(jnp.int32))  # [N, 8]
    o_ref[...] = jnp.broadcast_to(kt[:, 0:1], (N, B)).reshape(K1, C * B)


call_k = pl.pallas_call(k_kht, in_specs=[vm], out_specs=vm,
                        out_shape=jax.ShapeDtypeStruct((K1, C * B),
                                                       jnp.int32),
                        compiler_params=cp)


@jax.jit
def run_k(c):
    def body(c, _):
        return call_k(kh) + c * 0, None
    out, _ = jax.lax.scan(body, c, None, length=STEPS)
    return out


o = run_k(x_i32)
np.asarray(o.ravel()[0])
t0 = time.time()
o = run_k(x_i32)
np.asarray(o.ravel()[0])
print(f"khi transpose+bcast: {(time.time()-t0-0.025)/STEPS*1e6:.1f} us",
      flush=True)

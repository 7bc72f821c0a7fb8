"""Microbench: cost of [N,1]-broadcast operands in Pallas chains on v5e.

Round-4 trace showed the multi-bit mon-side kernels paying ~4x more per
[N,1]-broadcast multiply than the classic MAC's identical-looking ops.
Hypothesis: Mosaic lowers a sublane-vector lane-splat per USE.  Compare:

  a) chain of x * w[:, None]           (broadcast inside every op)
  b) chain of x * Wb (pre-broadcast [N, B] once with broadcast_to)
  c) chain of x * y  ([N, B] x [N, B] baseline)
  d) the real _mb_single_chain ladder (select + shoup per level)

Each chain is CH fused multiplies inside one kernel, scanned STEPS times.
"""

import os
import sys
import time

from tfhe_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, B = 2048, 128
CH = 40
STEPS = 2000
vm = pl.BlockSpec(memory_space=pltpu.VMEM)


def run(tag, kernel, *ops):
    call = pl.pallas_call(
        kernel, in_specs=[vm] * len(ops), out_specs=vm,
        out_shape=jax.ShapeDtypeStruct((N, B), jnp.int32),
        interpret=jax.default_backend() != "tpu")

    def step(x, _):
        return call(x, *ops[1:]), None

    fn = jax.jit(lambda x: jax.lax.scan(step, x, None, length=STEPS)[0])
    x = jnp.asarray(np.random.default_rng(0).integers(-2**14, 2**14, (N, B)),
                    jnp.int32)
    out = jax.block_until_ready(fn(x))
    t0 = time.time()
    out = jax.block_until_ready(fn(x))
    dt = (time.time() - t0) / STEPS
    print(f"{tag:32s} {dt*1e6:8.2f} us/kernel  "
          f"({dt*1e6/CH*1000:6.1f} ns/op)", flush=True)


w = jnp.asarray(np.random.default_rng(1).integers(-2**14, 2**14, N),
                jnp.int32)
y = jnp.asarray(np.random.default_rng(2).integers(-100, 100, (N, B)),
                jnp.int32)
wt = jnp.asarray(np.random.default_rng(3).integers(-2**14, 2**14, (12, N)),
                 jnp.int32)


def k_bcast(x_ref, w_ref, o_ref):
    x = x_ref[...]
    wv = w_ref[...]
    for _ in range(CH):
        x = (x * wv[:, None]) >> 8
    o_ref[...] = x


def k_prebcast(x_ref, w_ref, o_ref):
    x = x_ref[...]
    wb = jnp.broadcast_to(w_ref[...][:, None], (N, B))
    for _ in range(CH):
        x = (x * wb) >> 8
    o_ref[...] = x


def k_full(x_ref, y_ref, o_ref):
    x = x_ref[...]
    yv = y_ref[...]
    for _ in range(CH):
        x = (x * yv) >> 8
    o_ref[...] = x


def k_rowsel(x_ref, wt_ref, o_ref):
    """Per-level DIFFERENT [N] row (like psi2t[t]) broadcast each op."""
    x = x_ref[...]
    for t in range(CH):
        x = (x * wt_ref[t % 12][:, None]) >> 8
    o_ref[...] = x


run("broadcast-per-op [N,1]", k_bcast, None, w)
run("pre-broadcast_to [N,B]", k_prebcast, None, w)
run("full [N,B] operand", k_full, None, y)
run("row-select + broadcast", k_rowsel, None, wt)

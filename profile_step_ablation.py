"""Subtractive per-stage attribution of the scan2 blind-rotation step.

Runs fused_blind_rotate_scan2 at real 2_2 shapes with stages ablated one at
a time (fused_pbs.ABLATE) and reports per-step deltas.  Stage stand-ins are
shape-preserving and keep data dependencies so XLA cannot dead-code the
remaining stages; values are garbage — this measures TIME only.
"""

from __future__ import annotations

import os
import sys
import time

from tfhe_tpu.utils import enable_persistent_cache

enable_persistent_cache()
# opt in to ablation stand-ins (fused_pbs refuses ABLATE without this)
os.environ["TFHE_TPU_ABLATE_OK"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

from tfhe_tpu.ops import fused_pbs

B = int(os.environ.get("PROF_B", 128))
N, G, L, BL, BITS = 2048, 2, 1, 23, 64

# Use the REAL prepared key: random host arrays carry the default layout,
# while the jitted prep's khi/klo get an XLA-chosen (physically W-major)
# layout the kernel expects — feeding default-layout keys measured 24x
# slower (layout conversion dominating), which invalidated the first
# ablation run.
from tfhe_tpu import shortint
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS as PP

_, _sks = shortint.gen_keys(PP, seed=99, cache_dir=".keycache")
cfg = _sks.bsk.cfg
khi, klo = _sks.bsk.khi, _sks.bsk.klo
NSTEPS = khi.shape[0]
P = len(cfg.primes)
LJ, OM = L * G, G * cfg.planes
W = LJ * OM

rng = np.random.default_rng(0)
ahat = jnp.asarray(rng.integers(0, 2 * N, (NSTEPS, B)), jnp.int32)
acc0 = jnp.asarray(rng.integers(-2**30, 2**30, (G, cfg.planes, N, B)),
                   jnp.int32)


def measure(tag, ablate):
    fused_pbs.ABLATE = frozenset(ablate)
    try:
        fn = jax.jit(lambda kh, kl, ah, ac:
                     fused_pbs.fused_blind_rotate_scan2(cfg, kh, kl, ah, ac))
        t0 = time.time()
        out = fn(khi, klo, ahat, acc0)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        compile_s = time.time() - t0
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = fn(khi, klo, ahat, acc0)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        dt = (time.time() - t0) / reps
        us_per_step = dt / NSTEPS * 1e6
        print(f"{tag:28s} {us_per_step:8.1f} us/step   "
              f"(total {dt*1e3:7.1f} ms, compile {compile_s:5.1f} s)",
              flush=True)
        return us_per_step
    finally:
        fused_pbs.ABLATE = frozenset()


full = measure("full", [])
for tag, ab in [
    ("no-crt", ["crt"]),
    ("no-inv", ["inv"]),
    ("no-mac+inv", ["mac", "inv"]),
    ("no-fwd+mac+inv", ["fwd", "mac", "inv"]),
    ("no-rot", ["rot"]),
    ("shell (all ablated)", ["rot", "fwd", "mac", "inv", "crt"]),
]:
    measure(tag, ab)

"""Device-trace attribution of the fused blind-rotation step.

Captures a jax.profiler device trace of the production ks+pbs pipeline at
real 2_2 params (B=128) and prints per-kernel totals parsed from the
trace.json.gz — replaces subtractive ablation for kernel attribution
(PERF_NOTES.md round-4: device traces through axon WORK).

Usage: python profile_trace.py [mode]   (mode -> TFHE_TPU_FUSED_MODE)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

from tfhe_tpu.utils import enable_persistent_cache

enable_persistent_cache()

if len(sys.argv) > 1:
    os.environ["TFHE_TPU_FUSED_MODE"] = sys.argv[1]

import jax
import numpy as np

from tfhe_tpu import shortint
from tfhe_tpu.core import keyswitch_then_pbs
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS as PP

B = int(os.environ.get("PROF_B", 128))
TRACE_DIR = os.environ.get("PROF_TRACE_DIR", "/tmp/jaxtrace")

cks, sks = shortint.gen_keys(PP, seed=99, cache_dir=".keycache")
msg = sks.message_modulus
lut = sks.generate_lookup_table(lambda x: (x * 3 + 1) % msg)
rng = np.random.default_rng(0)
ct = cks.encrypt_batch(rng.integers(0, msg, B))

fn = jax.jit(keyswitch_then_pbs)
import jax.numpy as jnp

data = jnp.asarray(ct.data)
t0 = time.time()
out = jax.block_until_ready(fn(sks.ksk, sks.bsk, lut.acc, data))
print(f"compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out = jax.block_until_ready(fn(sks.ksk, sks.bsk, lut.acc, data))
run_s = time.time() - t0
print(f"steady run {run_s*1e3:.1f} ms -> {B/run_s:.1f} PBS/s", flush=True)

os.makedirs(TRACE_DIR, exist_ok=True)
with jax.profiler.trace(TRACE_DIR):
    out = jax.block_until_ready(fn(sks.ksk, sks.bsk, lut.acc, data))

# parse newest trace.json.gz
paths = sorted(glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True),
               key=os.path.getmtime)
if not paths:
    print("no trace found under", TRACE_DIR)
    sys.exit(1)
with gzip.open(paths[-1], "rt") as f:
    trace = json.load(f)

events = trace.get("traceEvents", [])
# find device-side lanes (TensorCore / XLA Ops); host lanes excluded
pid_names = {}
tid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

dev_pids = {p for p, n in pid_names.items()
            if "TPU" in n or "Device" in n or "/device" in n.lower()}
print("processes:", {p: n for p, n in pid_names.items()}, flush=True)

by_kernel = defaultdict(float)
by_kernel_n = defaultdict(int)
lane_total = defaultdict(float)
lane_span = {}
for e in events:
    if e.get("ph") != "X":
        continue
    pid = e.get("pid")
    if dev_pids and pid not in dev_pids:
        continue
    lane = tid_names.get((pid, e.get("tid")), str(e.get("tid")))
    dur = e.get("dur", 0) / 1e3  # ms
    name = e.get("name", "?")
    by_kernel[(lane, name)] += dur
    by_kernel_n[(lane, name)] += 1
    lane_total[lane] += dur
    s = e.get("ts", 0)
    lo, hi = lane_span.get(lane, (s, s))
    lane_span[lane] = (min(lo, s), max(hi, s + e.get("dur", 0)))

for lane in sorted(lane_total, key=lambda l: -lane_total[l]):
    span = (lane_span[lane][1] - lane_span[lane][0]) / 1e3
    print(f"\n== lane {lane}: busy {lane_total[lane]:.1f} ms, "
          f"span {span:.1f} ms, idle {span - lane_total[lane]:.1f} ms")
    items = [(k[1], v, by_kernel_n[k]) for k, v in by_kernel.items()
             if k[0] == lane]
    for name, tot, n in sorted(items, key=lambda x: -x[1])[:25]:
        print(f"  {tot:9.2f} ms  x{n:5d}  ({tot/max(n,1)*1e3:8.1f} us/call)"
              f"  {name[:90]}")

"""Headline benchmark: keyswitch+PBS throughput at PARAM_MESSAGE_2_CARRY_2.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: tfhe-rs single-core keyswitch+PBS at the same params = 16.6 ms
(BASELINE.md, benchmarks.md:42) -> 60.24 PBS/s.

The TPU is reached through a tunnel that can stall for minutes on large
transfers, so the real-parameter run executes under a watchdog: a fast
small-parameter measurement is taken first and is printed as the fallback
result if the real-parameter phase wedges.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

# Persistent XLA compilation cache: compiles through the axon tunnel take
# minutes (the executable ships over a ~14MB/s link), so cache hits are the
# difference between the real-parameter phase fitting its budget or not.
# NOTE: this jax build ignores JAX_COMPILATION_CACHE_DIR — the cache must be
# enabled programmatically (utils/jaxcache.py).
from tfhe_tpu.utils import enable_persistent_cache

enable_persistent_cache()

BASELINE_PBS_PER_S = 1000.0 / 16.6
REAL_PHASE_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 480))


def _measure(params, batch: int, iters: int, platform: str):
    import jax
    import jax.numpy as jnp

    from tfhe_tpu import shortint
    from tfhe_tpu.core import keyswitch_then_multi_bit_pbs, keyswitch_then_pbs
    from tfhe_tpu.params.types import MultiBitPBSParameters

    t0 = time.time()
    cks, sks = shortint.gen_keys(params, seed=99, cache_dir=".keycache")
    keygen_s = time.time() - t0

    msg = sks.message_modulus
    lut = sks.generate_lookup_table(lambda x: (x * 3 + 1) % msg)
    rng = np.random.default_rng(0)
    clear = rng.integers(0, msg, batch)
    ct = cks.encrypt_batch(clear)

    is_mb = isinstance(params, MultiBitPBSParameters)
    fn = jax.jit(keyswitch_then_multi_bit_pbs if is_mb
                 else keyswitch_then_pbs)
    data = jnp.asarray(ct.data)
    t0 = time.time()
    out = jax.block_until_ready(fn(sks.ksk, sks.bsk, lut.acc, data))
    compile_s = time.time() - t0
    # enqueue all iterations, then block once: the axon tunnel costs ~26 ms
    # per blocking fetch (PERF_NOTES.md), which is dispatch overhead, not
    # device throughput — the device executes every enqueued program
    t0 = time.time()
    for _ in range(iters):
        out = fn(sks.ksk, sks.bsk, lut.acc, data)
    out = jax.block_until_ready(out)
    # block_until_ready has been observed returning early for some axon
    # array types; a one-element fetch is the reliable completion barrier
    np.asarray(out[:1, :1])
    elapsed = time.time() - t0
    pbs_per_s = batch * iters / elapsed

    got = cks.decrypt_batch(np.asarray(out))
    ok = bool(np.array_equal(got, (clear * 3 + 1) % msg))

    # MXU utilization: exact-NTT MAC count per PBS from the fused config
    try:
        from tfhe_tpu.ops.fused_pbs import make_config
        cfg = make_config(params.polynomial_size, params.glwe_size,
                          params.pbs_level, params.pbs_base_log,
                          params.torus_bits)
        LJ = params.pbs_level * params.glwe_size
        OM = params.glwe_size * cfg.planes
        macs_step = sum(
            cfg.nl[i] * cfg.R * (cfg.R * cfg.ld) * LJ * cfg.C      # fwd A
            + cfg.nl[i] * cfg.C * (cfg.C * cfg.nlx[i]) * LJ * cfg.R  # fwd B
            + cfg.nl[i] * cfg.C * (cfg.C * cfg.nlx[i]) * OM * cfg.R  # inv B'
            + cfg.nl[i] * cfg.R * (cfg.R * cfg.nlx[i]) * OM * cfg.C  # inv A'
            for i in range(len(cfg.primes)))
        n_steps = params.lwe_dimension
        if is_mb:
            n_steps //= params.grouping_factor
        macs_per_pbs = macs_step * n_steps
        mfu = pbs_per_s * macs_per_pbs / 197e12  # v5e ~197 T-MAC/s (int8)
    except Exception:
        macs_per_pbs, mfu = None, None

    rec = {
        "metric": "ks_pbs_throughput_" + params.name.lower(),
        "value": round(pbs_per_s, 2),
        "unit": "PBS/s/chip",
        "vs_baseline": round(pbs_per_s / BASELINE_PBS_PER_S, 3),
        "platform": platform,
        "batch": batch,
        "correct": ok,
        "keygen_s": round(keygen_s, 1),
        "compile_s": round(compile_s, 1),
    }
    if mfu is not None:
        rec["mxu_utilization"] = round(mfu, 4)
        rec["gmacs_per_pbs"] = round(macs_per_pbs / 1e9, 2)
    return rec


def main() -> None:
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:
        jax.config.update("jax_platforms", "cpu")
        platform = "cpu"

    from tfhe_tpu.params import (
        PARAM_MESSAGE_2_CARRY_2_KS_PBS,
        PARAM_MESSAGE_2_CARRY_2_TEST,
    )

    if platform != "tpu":
        result = _measure(PARAM_MESSAGE_2_CARRY_2_TEST, 64, 2, platform)
        print(json.dumps(result))
        sys.exit(0 if result["correct"] else 1)

    # Phase 1: small params (fast, small transfers) as the guaranteed result.
    fallback = _measure(PARAM_MESSAGE_2_CARRY_2_TEST, 256, 4, platform)
    fallback["note"] = "insecure test params (real-param phase timed out)"

    # Phase 2: real 128-bit-secure params under a watchdog.  Both the
    # classic 2_2 set and the multi-bit group-3 2_2 set offer the same
    # message precision at >= 128-bit security (the reference ships both,
    # shortint/parameters/multi_bit.rs; its GPU backend defaults to
    # multi-bit) — the headline is the better of the two, with the other
    # attached as a sub-record.
    box = {}

    def run_real():
        try:
            batch = int(os.environ.get("BENCH_BATCH", 128))
            box["classic"] = _measure(
                PARAM_MESSAGE_2_CARRY_2_KS_PBS, batch, 8, platform)
            if os.environ.get("BENCH_SKIP_MULTIBIT") != "1":
                from tfhe_tpu.params import (
                    PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_3_KS_PBS,
                )

                box["multibit"] = _measure(
                    PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_3_KS_PBS,
                    batch, 3, platform)
        except Exception as e:  # pragma: no cover
            box["error"] = repr(e)

    th = threading.Thread(target=run_real, daemon=True)
    th.start()
    th.join(REAL_PHASE_BUDGET_S)

    results = [box[k] for k in ("classic", "multibit")
               if k in box and box[k]["correct"]]
    if results:
        best = max(results, key=lambda r: r["value"])
        for r in results:
            if r is not best:
                best["other_param_set"] = {
                    k: r[k] for k in ("metric", "value", "unit",
                                      "vs_baseline", "batch", "correct")}
        if "error" in box:
            best["partial_error"] = box["error"]
        print(json.dumps(best))
        os._exit(0)
    fallback["real_phase_error"] = box.get("error", "timeout")
    print(json.dumps(fallback))
    os._exit(0 if fallback["correct"] else 1)


if __name__ == "__main__":
    main()

"""Extended benchmark suite: one criterion-style JSON line per metric.

Covers the reference's bench families (ref: tfhe/benches/ —
core_crypto/pbs_bench.rs incl PBS_throughput, shortint/bench.rs,
boolean/bench.rs, integer/bench.rs; JSON schema mirrors
ci/benchmark_parser.py:40-60 so its dashboard tooling can ingest records).

Usage:
    python bench_suite.py            # toy params (CPU-safe, CI)
    BENCH_REAL=1 python bench_suite.py   # 128-bit-secure params (TPU)

The headline driver benchmark stays in bench.py; this suite adds breadth:
boolean gate latency, shortint ks+pbs latency/throughput vs batch,
FheUint32 add/mul/eq, and strings contains.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent XLA compile cache (same as bench.py): compiles through the
# axon tunnel take minutes, and the suite touches many batch shapes.
from tfhe_tpu.utils import enable_persistent_cache

enable_persistent_cache()


def _record(name, value, unit, baseline_ms=None, baseline_rate=None, **extra):
    rec = {"name": name, "value": round(value, 4), "unit": unit}
    if baseline_ms is not None and unit == "ms":
        # published tfhe-rs numbers on m6i.metal (BASELINE.md)
        rec["vs_baseline_speedup"] = round(baseline_ms / value, 3)
    if baseline_rate is not None:
        # rate metrics (PBS/s, gates/s): ours / published reference rate
        rec["vs_baseline_speedup"] = round(value / baseline_rate, 3)
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def _time(fn, iters=3):
    fn()  # warm/compile
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters


def bench_boolean(real: bool):
    from tfhe_tpu import boolean
    from tfhe_tpu.params import (BOOLEAN_TEST_PARAMETERS,
                                 DEFAULT_PARAMETERS_KS_PBS)

    params = DEFAULT_PARAMETERS_KS_PBS if real else BOOLEAN_TEST_PARAMETERS
    cks, sks = boolean.gen_keys(params, seed=1)
    # single-gate latency (the reference's headline framing,
    # benchmarks.md:13: 9.19 ms on CPU — the TPU loses this row and wins
    # on batched throughput; both stated plainly)
    a1 = cks.encrypt_batch(np.ones(1, dtype=bool))
    b1 = cks.encrypt_batch(np.zeros(1, dtype=bool))
    dt = _time(lambda: sks.and_batch(a1, b1))
    _record(f"boolean_gate_single::{params.name}", dt * 1e3, "ms",
            baseline_ms=9.19)
    best, best_batch = 0.0, 0
    for batch in ((64, 256, 512, 1024) if real else (64,)):
        a = cks.encrypt_batch(np.ones(batch, dtype=bool))
        b = cks.encrypt_batch(np.zeros(batch, dtype=bool))
        dt = _time(lambda: sks.and_batch(a, b))
        _record(f"boolean_gate_batch{batch}::{params.name}", dt * 1e3, "ms",
                baseline_ms=9.19 * batch)  # 9.19 ms per scalar gate
        if batch / dt > best:
            best, best_batch = batch / dt, batch
    _record(f"boolean_gates_per_sec::{params.name}", best, "gates/s",
            batch=best_batch, baseline_rate=1000.0 / 9.19)


def bench_shortint(real: bool):
    import jax
    import jax.numpy as jnp

    from tfhe_tpu import shortint
    from tfhe_tpu.core import keyswitch_then_pbs
    from tfhe_tpu.params import (PARAM_MESSAGE_2_CARRY_2_KS_PBS,
                                 PARAM_MESSAGE_2_CARRY_2_TEST)

    params = PARAM_MESSAGE_2_CARRY_2_KS_PBS if real \
        else PARAM_MESSAGE_2_CARRY_2_TEST
    cks, sks = shortint.gen_keys(params, seed=2, cache_dir=".keycache")
    lut = sks.generate_lookup_table(lambda x: (3 * x) % 4)
    fn = jax.jit(keyswitch_then_pbs)
    # batch sweep: with the chunked kernel (ops/fused_pbs.py
    # _batch_chunk_max) throughput must grow monotonically 64 -> 512
    for batch in ((1, 64, 128, 256, 512) if real else (1, 64)):
        ct = cks.encrypt_batch(np.arange(batch) % 4)
        data = jnp.asarray(ct.data)
        dt = _time(lambda: jax.block_until_ready(
            fn(sks.ksk, sks.bsk, lut.acc, data)))
        _record(f"shortint_ks_pbs_batch{batch}::{params.name}",
                batch / dt, "PBS/s", batch=batch,
                latency_ms=round(dt * 1e3, 2),
                baseline_rate=1000.0 / 16.6)  # single-core ks+pbs, benchmarks.md:42


def bench_integer(real: bool):
    from tfhe_tpu import api
    from tfhe_tpu.params import (PARAM_MESSAGE_2_CARRY_2_KS_PBS,
                                 PARAM_MESSAGE_2_CARRY_2_TEST)

    params = PARAM_MESSAGE_2_CARRY_2_KS_PBS if real \
        else PARAM_MESSAGE_2_CARRY_2_TEST
    config = api.ConfigBuilder.default().use_custom_parameters(params).build()
    cks, sks = api.generate_keys(config, seed=99, cache_dir=".keycache")
    api.set_server_key(sks)
    a = api.FheUint32.encrypt(123456789, cks)
    b = api.FheUint32.encrypt(987654, cks)
    singles = [] if os.environ.get("BENCH_SKIP_SINGLE") else [
        ("add", lambda: a + b, 132.0),
        ("mul", lambda: a * b, 333.0),
        ("eq", lambda: a.eq(b), 57.4),
        ("ge", lambda: a.ge(b), 98.8),
        ("bitand", lambda: a & b, 21.0),
        ("shl4", lambda: a << 4, 180.0),
    ]
    for opname, fn, baseline in singles:
        dt = _time(fn, iters=2)
        _record(f"fheuint32_{opname}::{params.name}", dt * 1e3, "ms",
                baseline_ms=baseline)

    # batch-64 throughput through the wave path (integer/batched.py): the
    # only compiled program is the shared ks+pbs wave, so batch size never
    # hits a compile cliff (the round-4 single-program batch-64 add
    # OOM-killed the remote compiler).  Baseline framing: ONE reference
    # core running the same op end to end (132/333/57.4 ms,
    # tfhe/docs/getting_started/benchmarks.md:16-18).
    from tfhe_tpu import integer
    from tfhe_tpu.integer.batched import (BatchedRadixOps,
                                          encrypt_batch_radix)

    icks, isks = integer.gen_keys_radix(params, 16, seed=99,
                                        cache_dir=".keycache")
    ops = BatchedRadixOps(isks.key)
    B = 64 if real else 4
    rng = np.random.default_rng(5)
    av = encrypt_batch_radix(icks, rng.integers(0, 2**32, B).tolist(), 16)
    bv = encrypt_batch_radix(icks, rng.integers(0, 2**32, B).tolist(), 16)
    import jax

    # the wave path returns async device arrays — block for honest timing
    for opname, fn, baseline_s in [
        # one-element fetch: block_until_ready can return early on axon
        # array types (PERF_NOTES.md) — a sync fetch is the real barrier
        ("add", lambda: np.asarray(ops.add(av, bv)[:1, :1, :1]), 132e-3),
        ("eq", lambda: np.asarray(ops.eq(av, bv)[:1, :1]), 57.4e-3),
        ("mul", lambda: np.asarray(ops.mul(av, bv)[:1, :1, :1]), 333e-3),
    ]:
        dt = _time(fn, iters=1)
        _record(f"fheuint32_{opname}_batch{B}::{params.name}", B / dt,
                "ops/s", batch=B, per_op_ms=round(dt / B * 1e3, 1),
                baseline_rate=1.0 / baseline_s)


def bench_strings(real: bool):
    from tfhe_tpu import strings

    if real:
        from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS as P
        cks, sks = strings.gen_keys(P, seed=99, cache_dir=".keycache")
        tag = P.name
    else:
        cks, sks = strings.gen_keys_test(seed=4)
        tag = "TEST"
    s = cks.encrypt_str("hello world")
    pat = cks.encrypt_str("world")
    dt = _time(lambda: sks.contains(s, pat), iters=2)
    _record(f"strings_contains_len11::{tag}", dt * 1e3, "ms",
            baseline_ms=78.6)  # find("foo","oo") example output
    dt = _time(lambda: sks.find(s, pat), iters=2)
    _record(f"strings_find_len11::{tag}", dt * 1e3, "ms",
            baseline_ms=78.6)  # fhe_strings/Readme.md:32

    # batched contains/find (strings/batched.py wave path over B strings):
    # the latency numbers above are bound by PBS depth x blind-rotation
    # latency; this is the TPU's throughput framing of the same op.  The
    # round-4 single-program formulation wedged the remote compiler; the
    # wave path reuses the already-compiled ks+pbs executables.
    from tfhe_tpu.strings.batched import (BatchedStringOps,
                                          encrypt_batch_strings)

    import jax

    bops = BatchedStringOps(sks.sks)
    B = 64 if real else 4
    texts = (["hello world", "hello_worxd"] * B)[:B]
    blocks = encrypt_batch_strings(cks, texts, 11)
    dt = _time(lambda: np.asarray(bops.contains(blocks, "world")[:1, :1]),
               iters=2)
    _record(f"strings_contains_batch{B}::{tag}", B / dt, "ops/s",
            baseline_ms=None, batch=B, per_op_ms=round(dt / B * 1e3, 2),
            baseline_rate=1000.0 / 78.6)
    dt = _time(lambda: np.asarray(bops.find(blocks, "world")[1][:1, :1, :1]),
               iters=2)
    _record(f"strings_find_batch{B}::{tag}", B / dt, "ops/s",
            batch=B, per_op_ms=round(dt / B * 1e3, 2),
            baseline_rate=1000.0 / 78.6)


def bench_keygen(real: bool):
    """Keygen family (ref: par_allocate_and_generate_new_lwe_bootstrap_key —
    no published m6i number, reported absolute)."""
    from tfhe_tpu import shortint
    from tfhe_tpu.params import (PARAM_MESSAGE_2_CARRY_2_KS_PBS,
                                 PARAM_MESSAGE_2_CARRY_2_TEST)

    params = PARAM_MESSAGE_2_CARRY_2_KS_PBS if real         else PARAM_MESSAGE_2_CARRY_2_TEST
    import jax
    t0 = time.time()
    cks, sks = shortint.gen_keys(params, seed=31337)  # fresh, no cache
    jax.block_until_ready(sks.bsk.khi if hasattr(sks.bsk, "khi")
                          else sks.bsk.ext_limbs)
    _record(f"keygen_fresh::{params.name}", time.time() - t0, "s")
    t0 = time.time()
    cks, sks = shortint.gen_keys(params, seed=99, cache_dir=".keycache")
    jax.block_until_ready(sks.bsk.khi if hasattr(sks.bsk, "khi")
                          else sks.bsk.ext_limbs)
    _record(f"keygen_cached::{params.name}", time.time() - t0, "s")


def bench_pbs_throughput(real: bool):
    """pbs_throughput analog (ref: benches/core_crypto/pbs_bench.rs
    fn pbs_throughput: 512 cts, chunked) — best sustained PBS/s."""
    import jax
    import jax.numpy as jnp

    from tfhe_tpu import shortint
    from tfhe_tpu.core import keyswitch_then_pbs
    from tfhe_tpu.params import (PARAM_MESSAGE_2_CARRY_2_KS_PBS,
                                 PARAM_MESSAGE_2_CARRY_2_TEST)

    params = PARAM_MESSAGE_2_CARRY_2_KS_PBS if real         else PARAM_MESSAGE_2_CARRY_2_TEST
    cks, sks = shortint.gen_keys(params, seed=2, cache_dir=".keycache")
    lut = sks.generate_lookup_table(lambda x: (3 * x) % 4)
    fn = jax.jit(keyswitch_then_pbs)
    best = 0.0
    best_batch = 0
    for batch in ((128, 256) if real else (64,)):
        ct = cks.encrypt_batch(np.arange(batch) % 4)
        data = jnp.asarray(ct.data)
        dt = _time(lambda: jax.block_until_ready(
            fn(sks.ksk, sks.bsk, lut.acc, data)))
        if batch / dt > best:
            best, best_batch = batch / dt, batch
    _record(f"pbs_throughput::{params.name}", best, "PBS/s",
            batch=best_batch, baseline_rate=1000.0 / 16.6)


def bench_multibit(real: bool):
    """Multi-bit PBS family (ref: shortint/parameters/multi_bit.rs +
    lwe_multi_bit_programmable_bootstrapping.rs): same 2_2 precision at
    128-bit security with gf=3 grouping — n/3 blind-rotation steps."""
    import jax
    import jax.numpy as jnp

    from tfhe_tpu import shortint
    from tfhe_tpu.core import keyswitch_then_multi_bit_pbs
    from tfhe_tpu.params import (
        PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_2_TEST,
        PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_3_KS_PBS,
    )

    params = (PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_3_KS_PBS if real
              else PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_2_TEST)
    cks, sks = shortint.gen_keys(params, seed=2, cache_dir=".keycache")
    lut = sks.generate_lookup_table(lambda x: (3 * x) % 4)
    fn = jax.jit(keyswitch_then_multi_bit_pbs)
    for batch in ((128,) if real else (16,)):
        ct = cks.encrypt_batch(np.arange(batch) % 4)
        data = jnp.asarray(ct.data)
        dt = _time(lambda: jax.block_until_ready(
            fn(sks.ksk, sks.bsk, lut.acc, data)))
        _record(f"multibit_ks_pbs_batch{batch}::{params.name}",
                batch / dt, "PBS/s", batch=batch,
                latency_ms=round(dt * 1e3, 2),
                baseline_rate=1000.0 / 16.6)


def main():
    real = bool(os.environ.get("BENCH_REAL"))
    families = {
        # keygen first: fresh-keygen time measured after heavy device work
        # in the same process reads up to 8x slower (allocator/compile
        # state, not keygen code — round-5 postmortem)
        "keygen": bench_keygen,
        "strings": bench_strings,
        "pbs_throughput": bench_pbs_throughput,
        "multibit": bench_multibit,
        "boolean": bench_boolean,
        "shortint": bench_shortint,
        "integer": bench_integer,
    }
    # previously-starved families run first so a budget overrun cannot
    # starve them again (round-3 postmortem); BENCH_FAMILIES=a,b filters
    sel = os.environ.get("BENCH_FAMILIES")
    names = [n.strip() for n in sel.split(",")] if sel else list(families)
    for n in names:
        try:
            families[n](real)
        except Exception as e:  # keep the suite running
            print(json.dumps({"name": n, "error": repr(e)}), flush=True)


if __name__ == "__main__":
    main()

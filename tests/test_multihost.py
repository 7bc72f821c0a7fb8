"""Genuine multi-process mesh execution (the DCN analog, SURVEY #28).

Spawns TWO separate Python processes, each owning one CPU device, glued
by jax.distributed into a single global mesh.  The block-sharded radix
add's collective carry scan then ppermutes carry states across the
process boundary.  Also asserts bit-identity with the same program run
single-process (the exact NTT backend makes results layout-invariant)."""

import functools
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_blockshard_add(tmp_path):
    nprocs = 2
    coord = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # conftest forces 8 virtual host devices for the single-process mesh
    # tests; the workers need exactly one local device each
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(worker))
                         + os.pathsep + os.path.dirname(worker)
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(nprocs), str(i),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nprocs)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-2000:]}"

    with open(tmp_path / "result.pkl", "rb") as f:
        res = pickle.load(f)
    assert res["dec"] == res["want"], res

    # bit-identity vs the single-process fused add on the same inputs
    import jax
    import jax.numpy as jnp

    from tfhe_tpu import shortint
    from tfhe_tpu.parallel.fused import fused_radix_add
    from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST as P

    cks, sks = shortint.gen_keys(P, seed=8080)
    msg = P.message_modulus
    nb, B = 4, 2
    modulus = msg ** nb
    rng = np.random.default_rng(17)
    xs = rng.integers(0, modulus, B)
    ys = rng.integers(0, modulus, B)

    def to_blocks(vals):
        return np.stack([
            cks.encrypt_batch([(int(v) // msg**j) % msg for j in range(nb)]
                              ).data
            for v in vals
        ])

    accs = (
        sks.generate_lookup_table(
            lambda v: 2 if v >= msg else (1 if v == msg - 1 else 0)).acc,
        sks.generate_lookup_table_bivariate(
            lambda cur, prev: min(prev if cur == 1 else cur, 2)).acc.acc,
        sks.generate_lookup_table(lambda x: 1 if x == 2 else 0).acc,
        sks.generate_lookup_table(lambda x: x % msg).acc,
    )
    plain = np.asarray(jax.jit(functools.partial(
        fused_radix_add, message_modulus=msg))(
            sks.ksk, sks.bsk, *accs,
            jnp.asarray(to_blocks(xs)), jnp.asarray(to_blocks(ys))))
    np.testing.assert_array_equal(res["data"], plain)

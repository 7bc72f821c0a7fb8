"""Device-mesh scaling tests on the virtual 8-device CPU mesh.

(ref: SURVEY.md #28 — the distributed subsystem the reference lacks; the
driver's dryrun_multichip covers compile+execute of the full sharded
training step, these cover correctness of the sharded results.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfhe_tpu import parallel, shortint
from tfhe_tpu.core import keyswitch_then_pbs
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST as P


pytestmark = pytest.mark.slow  # matrix suite: run via `pytest -m slow`

@pytest.fixture(scope="module")
def keys():
    return shortint.gen_keys(P, seed=8080)


def test_mesh_construction():
    mesh = parallel.create_mesh()
    assert set(mesh.axis_names) == {"batch", "poly"}
    assert int(np.prod(mesh.devices.shape)) == len(jax.devices())


def test_sharded_pbs_matches_unsharded(keys):
    """Batch-sharded keyswitch+PBS over the mesh == single-device result."""
    cks, sks = keys
    mesh = parallel.create_mesh()
    msgs = np.arange(16, dtype=np.uint64) % 4
    ct = cks.encrypt_batch(msgs)
    lut = sks.generate_lookup_table(lambda x: (x * 3 + 2) % 4)

    plain = np.asarray(jax.jit(keyswitch_then_pbs)(
        sks.ksk, sks.bsk, lut.acc, jnp.asarray(ct.data)))

    data = parallel.shard_batch(mesh, jnp.asarray(ct.data))
    keys_sharded = jax.device_put(
        (sks.ksk, sks.bsk), parallel.replicated(mesh))
    sharded = np.asarray(jax.jit(keyswitch_then_pbs)(
        keys_sharded[0], keys_sharded[1], lut.acc, data))

    # the exact NTT backend makes results bit-identical across shardings
    np.testing.assert_array_equal(sharded, plain)
    np.testing.assert_array_equal(
        cks.decrypt_batch(sharded), (msgs * 3 + 2) % 4)


def test_sharded_radix_add(keys):
    cks, sks = keys
    mesh = parallel.create_mesh()
    add_fn, place = parallel.make_sharded_radix_add(mesh, sks, num_blocks=4)
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 256, 8).astype(np.uint64)
    ys = rng.integers(0, 256, 8).astype(np.uint64)

    nb = 4
    msg = P.message_modulus

    def to_blocks(vals):
        return np.stack([
            cks.encrypt_batch([(int(v) // msg**j) % msg for j in range(nb)]
                              ).data
            for v in vals
        ])

    out = np.asarray(add_fn(place(to_blocks(xs)), place(to_blocks(ys))))
    for i, (x, y) in enumerate(zip(xs, ys)):
        dec = cks.decrypt_batch(out[i])
        got = sum(int(b) * msg**j for j, b in enumerate(dec)) % 256
        assert got == (int(x) + int(y)) % 256, (x, y, got)

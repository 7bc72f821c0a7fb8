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


# construction + sharded-PBS smoke run in the fast tier so the default
# suite always exercises the mesh; the heavier fused-op matrices stay slow

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


@pytest.mark.slow
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


@pytest.mark.slow
def test_sharded_radix_mul(keys):
    """Fused radix mul on the mesh: decrypts to clear product AND is
    bit-identical to the same program run unsharded (exact NTT backend)."""
    cks, sks = keys
    mesh = parallel.create_mesh()
    nb = 4
    msg = P.message_modulus
    mul_fn, place = parallel.make_sharded_radix_mul(mesh, sks, num_blocks=nb)
    rng = np.random.default_rng(3)
    xs = rng.integers(0, 256, 8).astype(np.uint64)
    ys = rng.integers(0, 256, 8).astype(np.uint64)

    def to_blocks(vals):
        return np.stack([
            cks.encrypt_batch([(int(v) // msg**j) % msg for j in range(nb)]
                              ).data
            for v in vals
        ])

    a, b = to_blocks(xs), to_blocks(ys)
    out = np.asarray(mul_fn(place(a), place(b)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        dec = cks.decrypt_batch(out[i])
        got = sum(int(v) * msg**j for j, v in enumerate(dec)) % 256
        assert got == (int(x) * int(y)) % 256, (x, y, got)

    # unsharded run of the identical program
    import functools
    import jax.numpy as jnp
    from tfhe_tpu.parallel.fused import fused_radix_mul
    accs = (
        sks.generate_lookup_table_bivariate(
            lambda x, y: (x * y) % msg).acc.acc,
        sks.generate_lookup_table_bivariate(
            lambda x, y: (x * y) // msg).acc.acc,
        sks.generate_lookup_table(lambda x: x % msg).acc,
        sks.generate_lookup_table(lambda x: x // msg).acc,
        sks.generate_lookup_table(
            lambda v: 2 if v >= msg else (1 if v == msg - 1 else 0)).acc,
        sks.generate_lookup_table_bivariate(
            lambda cur, prev: min(prev if cur == 1 else cur, 2)).acc.acc,
        sks.generate_lookup_table(lambda x: 1 if x == 2 else 0).acc,
    )
    plain = np.asarray(jax.jit(functools.partial(
        fused_radix_mul, message_modulus=msg,
        carry_modulus=P.carry_modulus))(
            sks.ksk, sks.bsk, *accs, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(np.asarray(out), plain)


@pytest.mark.slow
def test_sharded_strings_contains(keys):
    """Fused strings contains on the mesh vs Python `in` over a batch."""
    cks, sks = keys
    from tfhe_tpu.strings.client_key import NUMBER_BLOCKS
    mesh = parallel.create_mesh()
    msg = P.message_modulus
    nb = NUMBER_BLOCKS
    texts = ["hello", "help!", "ohhel", "lohel", "hhhhh", "xxxxx",
             "hel", "zhelz"]
    n = max(len(t) for t in texts)
    fn, place = parallel.make_sharded_strings_contains(mesh, sks, "hel")

    def enc_text(t):
        chars = [ord(c) for c in t] + [0] * (n - len(t))
        digs = [(c // msg**d) % msg for c in chars for d in range(nb)]
        return cks.encrypt_batch(np.asarray(digs, np.uint64)).data.reshape(
            n, nb, -1)

    batch = np.stack([enc_text(t) for t in texts])
    out = np.asarray(fn(place(batch)))
    got = [bool(cks.decrypt_batch(out[i:i + 1][0][None])[0])
           for i in range(len(texts))]
    want = [("hel" in t) for t in texts]
    assert got == want, (got, want)


def test_blockshard_add_collective_carry_scan(keys):
    """Radix add with BLOCKS sharded across chips: the Hillis-Steele carry
    scan crosses chip boundaries via lax.ppermute (SURVEY #28 collective
    carry scan).  Asserts (a) clear correctness, (b) the compiled program
    really contains collective-permutes, (c) bit-identity with the
    unsharded fused add."""
    import functools
    import jax.numpy as jnp
    from tfhe_tpu.parallel.fused import (fused_radix_add,
                                         make_blockshard_radix_add)

    cks, sks = keys
    nb, B = 8, 4
    ndev = len(jax.devices())
    mesh = parallel.create_mesh(shape=(ndev,), axis_names=("batch",))
    msg = P.message_modulus
    modulus = msg ** nb
    step, place = parallel.make_blockshard_radix_add(mesh, sks, nb) \
        if hasattr(parallel, "make_blockshard_radix_add") \
        else make_blockshard_radix_add(mesh, sks, nb)
    rng = np.random.default_rng(5)
    xs = rng.integers(0, modulus, B)
    ys = rng.integers(0, modulus, B)

    def to_blocks(vals):
        return np.stack([
            cks.encrypt_batch([(int(v) // msg**j) % msg for j in range(nb)]
                              ).data
            for v in vals
        ])

    a, b = to_blocks(xs), to_blocks(ys)
    out = np.asarray(step(place(a), place(b)))
    for i in range(B):
        dec = cks.decrypt_batch(out[i])
        got = sum(int(v) * msg**j for j, v in enumerate(dec)) % modulus
        assert got == (int(xs[i]) + int(ys[i])) % modulus

    # (b) the compiled sharded program contains real collectives
    accs = (
        sks.generate_lookup_table(
            lambda v: 2 if v >= msg else (1 if v == msg - 1 else 0)).acc,
        sks.generate_lookup_table_bivariate(
            lambda cur, prev: min(prev if cur == 1 else cur, 2)).acc.acc,
        sks.generate_lookup_table(lambda x: 1 if x == 2 else 0).acc,
        sks.generate_lookup_table(lambda x: x % msg).acc,
    )
    from tfhe_tpu.parallel.fused import fused_radix_add_blockshard
    body = functools.partial(
        fused_radix_add_blockshard, message_modulus=msg, num_blocks=nb,
        ndev=ndev, axis="batch")
    from jax.sharding import PartitionSpec as PS
    ct_spec = PS(None, "batch", None)
    rep = PS()
    lowered = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, ct_spec, ct_spec),
        out_specs=ct_spec, check_vma=False)).lower(
            sks.ksk, sks.bsk, *accs, jnp.asarray(a), jnp.asarray(b))
    hlo = lowered.compiler_ir(dialect="stablehlo")
    n_collectives = str(hlo).count("collective_permute")
    assert n_collectives > 0, "no collectives in the block-sharded program"

    # (c) bit-identical to the unsharded fused add (exact NTT backend)
    plain = np.asarray(jax.jit(functools.partial(
        fused_radix_add, message_modulus=msg))(
            sks.ksk, sks.bsk, *accs, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(out, plain)

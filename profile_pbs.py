"""Stage-level profiling of the blind-rotation hot loop on the real chip.

Times each sub-stage of one blind-rotation step, scanned n=742 times (the
real step count at PARAM_MESSAGE_2_CARRY_2), so per-stage costs can be
compared against the measured full-PBS time.  Every scanned stage feeds its
output back into the carry so XLA cannot hoist it out of the loop.
"""

from __future__ import annotations

import os
import time

from tfhe_tpu.utils import enable_persistent_cache
enable_persistent_cache()
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from tfhe_tpu.ops import decomposition, ntt, polymul

B = int(os.environ.get("PROF_B", 128))
N = 2048
G = 2          # k + 1
L = 1          # pbs_level
BASE_LOG = 23
NSTEPS = 742
M = 2          # torus limb planes


def _sync(out):
    """On the axon platform block_until_ready does not actually block; a
    host read of one element is the only reliable completion barrier."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def bench(name, fn, *args):
    f = jax.jit(fn)
    _sync(f(*args))
    t0 = time.time()
    _sync(f(*args))
    dt = time.time() - t0
    print(f"{name:28s} {dt*1e3:9.1f} ms   ({dt*1e3/NSTEPS:7.3f} ms/step)",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    acc0 = jnp.asarray(rng.integers(0, 1 << 63, (B, G, N), dtype=np.uint64))
    a_hats = jnp.asarray(rng.integers(0, 2 * N, (NSTEPS, B), dtype=np.int32))
    digits0 = jnp.asarray(
        rng.integers(-(1 << 22), 1 << 22, (B, L * G, N), dtype=np.int32))
    # one step's BSK spectra: [P, L, J, O, M, N] balanced int32
    spec1 = jnp.asarray(
        rng.integers(-6000, 6000, (5, L, G, G, M, N), dtype=np.int32))
    shoup1 = spec1  # placeholder with the right shape/dtype
    specs = [jnp.asarray(rng.integers(-6000, 6000, (B, L * G, N),
                                      dtype=np.int32)) for _ in range(5)]
    inv_in = [jnp.asarray(rng.integers(-6000, 6000, (B, G, M, N),
                                       dtype=np.int32)) for _ in range(5)]

    fwd_mats, inv_mats = ntt.dft_matrices_device(N)

    def scan(body, init, xs=None):
        def run(init, xs):
            out, _ = jax.lax.scan(body, init, xs, length=NSTEPS)
            return out
        return run, init, (xs if xs is not None else jnp.zeros((NSTEPS,),
                                                               jnp.int32))

    # 1. monomial rotation + subtract (u64 gather path)
    def rot_body(acc, a):
        r = polymul.monomial_mul(acc, a[:, None], N)
        return r - acc, None
    bench("rot+sub (u64 gather)", *scan(rot_body, acc0, a_hats))

    # 2. signed decomposition
    def dec_body(acc, _):
        d = decomposition.signed_decompose(acc, BASE_LOG, L)
        return acc + d[..., 0].astype(jnp.uint64), None
    bench("signed_decompose", *scan(dec_body, acc0))

    # 3. forward NTT of digit planes [B, LJ, N]
    def fwd_body(x, _):
        s = ntt.forward_ntt(x, mats=fwd_mats)
        return x + s[0] + s[1] + s[2] + s[3] + s[4], None
    bench("forward_ntt [B,2,N]x5p", *scan(fwd_body, digits0))

    # 4. Shoup MAC (jnp path)
    def mac_body(xs, _):
        outs = []
        for i, p in enumerate(ntt.PRIMES):
            ks = spec1[i].reshape(L * G, G, M, N)
            a = xs[i][:, :, None, None, :]
            r = ntt.shoup_mul(a, ks[None], ks[None], p)
            s = r.sum(axis=1, dtype=jnp.int32)
            outs.append(ntt.fold_p_f32(s, p))
        return [xs[i] + outs[i][:, :, 0, :] for i in range(5)], None
    bench("shoup_mac x5p", *scan(mac_body, specs))

    # 5. inverse NTT [B, G, M, N] x 5 primes
    def inv_body(xs, _):
        c = ntt.inverse_ntt(xs, mats=inv_mats)
        return [xs[i] + c[i] for i in range(5)], None
    bench("inverse_ntt [B,2,2,N]x5p", *scan(inv_body, inv_in))

    # 6. CRT recombine + plane fold + u64 add
    def crt_body(carry, _):
        acc, xs = carry
        conv = ntt.crt_to_u64_centered(xs)
        delta = ntt.planes_to_u64(conv)
        return (acc + delta, [x + 1 for x in xs]), None
    bench("crt+planes+acc (u64)", *scan(crt_body, (acc0, inv_in)))

    # 7. the real full step, for reference
    from tfhe_tpu import shortint
    from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS
    from tfhe_tpu.core.pbs import blind_rotate
    cks, sks = shortint.gen_keys(PARAM_MESSAGE_2_CARRY_2_KS_PBS, seed=99,
                                 cache_dir=".keycache")
    lut = sks.generate_lookup_table(lambda x: x)
    ct = cks.encrypt_batch(np.zeros(B, dtype=np.int64))
    lwe_small = jax.jit(lambda k, c: __import__(
        "tfhe_tpu.core.keyswitch", fromlist=["keyswitch"]).keyswitch(k, c))(
            sks.ksk, jnp.asarray(ct.data))
    f = jax.jit(blind_rotate)  # bsk as argument, NOT a captured constant
    _sync(f(sks.bsk, lut.acc, lwe_small))
    t0 = time.time()
    _sync(f(sks.bsk, lut.acc, lwe_small))
    dt = time.time() - t0
    print(f"{'FULL blind_rotate':28s} {dt*1e3:9.1f} ms   "
          f"({dt*1e3/NSTEPS:7.3f} ms/step) -> {B/dt:.1f} PBS/s")


if __name__ == "__main__":
    main()

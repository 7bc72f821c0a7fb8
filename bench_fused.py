"""TPU timing + correctness for the fused blind-rotation kernel."""

import os
import time

from tfhe_tpu.utils import enable_persistent_cache
enable_persistent_cache()
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np

from tfhe_tpu import shortint
from tfhe_tpu.core import keyswitch, prepare_bsk_ntt
from tfhe_tpu.core.pbs import blind_rotate
from tfhe_tpu.ops import fused_pbs
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS

B = int(os.environ.get("BENCH_B", 128))
CHECK = os.environ.get("BENCH_CHECK", "1") == "1"


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    p = PARAM_MESSAGE_2_CARRY_2_KS_PBS
    t0 = time.time()
    cks, sks = shortint.gen_keys(p, seed=99, cache_dir=".keycache")
    print(f"keygen(+prep): {time.time()-t0:.1f}s; bsk type: "
          f"{type(sks.bsk).__name__}", flush=True)

    lut = sks.generate_lookup_table(lambda x: (3 * x + 1) % 16)
    rng = np.random.default_rng(0)
    clear = rng.integers(0, 16, B)
    ct = cks.encrypt_batch(clear)
    lwe_small = jax.jit(keyswitch)(sks.ksk, jnp.asarray(ct.data))
    lwe_small = jax.block_until_ready(lwe_small)

    fused = jax.jit(blind_rotate)
    t0 = time.time()
    out = fused(sks.bsk, lut.acc, lwe_small)
    _sync(out)
    print(f"fused compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        out = fused(sks.bsk, lut.acc, lwe_small)
        _sync(out)
    dt = (time.time() - t0) / iters
    print(f"fused blind_rotate: {dt*1e3:.1f} ms for B={B} "
          f"-> {B/dt:.1f} PBS/s/chip", flush=True)

    if CHECK:
        # decryption check (end-to-end correct LUT evaluation)
        from tfhe_tpu.core.pbs import sample_extract
        lwe_out = np.asarray(sample_extract(np.asarray(out)))
        from tfhe_tpu.shortint.ciphertext import ShortintBatch
        got = cks.decrypt_batch(
            ShortintBatch(data=lwe_out, degrees=np.zeros(B, np.int64),
                          message_modulus=4, carry_modulus=4).data
            if hasattr(cks, "decrypt_batch") else lwe_out)
        want = (3 * clear + 1) % 16
        print("decrypt check:", np.array_equal(np.asarray(got) % 16, want),
              flush=True)

        # bit-exactness vs the jnp path on a smaller batch
        Bs = 8
        bsk_ntt = prepare_bsk_ntt(sks.raw_bsk, p.pbs_base_log)
        ref = jax.jit(blind_rotate)(bsk_ntt, lut.acc, lwe_small[:Bs])
        ref = np.asarray(ref)
        gotf = np.asarray(fused(sks.bsk, lut.acc, lwe_small[:Bs]))
        print("bit-exact vs jnp path:", np.array_equal(gotf, ref), flush=True)


if __name__ == "__main__":
    main()

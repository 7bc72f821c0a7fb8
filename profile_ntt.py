"""Microbenchmark alternative MXU formulations of the four-step NTT stage-1.

Candidates (per prime, N=2048 -> R=64, C=32, nl=2):
  A. current einsum "...kci,kqj->...qcij"   (XLA chooses batching)
  B. flat dot: rows=[B*LJ*nl_i*C, K=R] x [R, R*nl_j]  (M huge, K=64)
  C. R=128/C=16 split flat dot (K=128)
  D. dense [N, N] single dot (K=2048, 21x FLOPs but perfect MXU shape)
All int8 x int8 -> int32.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax, jax.numpy as jnp, numpy as np

B, LJ, N = 128, 2, 2048
NSTEPS = 742

def bench(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.time(); jax.block_until_ready(f(*args)); dt = time.time() - t0
    print(f"{name:44s} {dt*1e3:9.1f} ms ({dt*1e3/NSTEPS:7.4f} ms/step)")

def scanned(body):
    def run(x, w):
        def step(c, _):
            return body(c, w), None
        out, _ = jax.lax.scan(step, x, None, length=NSTEPS)
        return out
    return run

rng = np.random.default_rng(0)

# A: current einsum, 5 primes, nl=2,2,2,3,3
def make_A():
    xs = jnp.asarray(rng.integers(-128, 127, (B, LJ, 64, 32, 2), dtype=np.int8))
    ws = [jnp.asarray(rng.integers(-128, 127, (64, 64, nl), dtype=np.int8))
          for nl in (2, 2, 2, 3, 3)]
    def body(x, ws):
        acc = None
        for w in ws:
            nl = w.shape[-1]
            p = jnp.einsum("bkci,kqj->bqcij", x.reshape(B*LJ, 64, 32, 2)[..., :1].repeat(nl, -1) if nl != 2 else x.reshape(B*LJ, 64, 32, 2),
                           w, preferred_element_type=jnp.int32)
            r = p.sum((-1, -2), dtype=jnp.int32)
            acc = r if acc is None else acc + r
        out = (acc & 127).astype(jnp.int8)
        return out[..., None].repeat(2, -1).reshape(B, LJ, 64, 32, 2)
    return scanned(body), xs, ws

# B: flat dot rows x [64, 64*nl]
def make_B():
    xs = jnp.asarray(rng.integers(-128, 127, (B*LJ*2*32, 64), dtype=np.int8))
    ws = [jnp.asarray(rng.integers(-128, 127, (64, 64*nl), dtype=np.int8))
          for nl in (2, 2, 2, 3, 3)]
    def body(x, ws):
        acc = None
        for w in ws:
            r = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            r = r.reshape(x.shape[0], 64, -1).sum(-1, dtype=jnp.int32)
            acc = r if acc is None else acc + r
        return (acc & 127).astype(jnp.int8)
    return scanned(body), xs, ws

# C: K=128 split (R=128, C=16)
def make_C():
    xs = jnp.asarray(rng.integers(-128, 127, (B*LJ*2*16, 128), dtype=np.int8))
    ws = [jnp.asarray(rng.integers(-128, 127, (128, 128*nl), dtype=np.int8))
          for nl in (2, 2, 2, 3, 3)]
    def body(x, ws):
        acc = None
        for w in ws:
            r = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            r = r.reshape(x.shape[0], 128, -1).sum(-1, dtype=jnp.int32)
            acc = r if acc is None else acc + r
        return (acc & 127).astype(jnp.int8)
    return scanned(body), xs, ws

# D: dense [N, N]
def make_D():
    xs = jnp.asarray(rng.integers(-128, 127, (B*LJ*2, N), dtype=np.int8))
    ws = [jnp.asarray(rng.integers(-128, 127, (N, N*nl), dtype=np.int8))
          for nl in (2, 2)]  # only 2 primes to keep HBM sane; scale x2.5
    def body(x, ws):
        acc = None
        for w in ws:
            r = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            r = r.reshape(x.shape[0], N, -1).sum(-1, dtype=jnp.int32)
            acc = r if acc is None else acc + r
        return (acc & 127).astype(jnp.int8)
    return scanned(body), xs, ws

for name, mk in [("A: einsum 4-step (approx current)", make_A),
                 ("B: flat dot K=64 N=128/192", make_B),
                 ("C: flat dot K=128 N=256/384", make_C),
                 ("D: dense K=2048 (2 primes only, x2.5)", make_D)]:
    try:
        fn, x, w = mk()
        bench(name, fn, x, w)
    except Exception as e:
        print(name, "FAILED:", repr(e)[:200])

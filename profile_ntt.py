"""NTT stage formulation microbench (host-read synced; axon's
block_until_ready does not block).

Compares the four-step stage-1 contraction as:
  A. int8 einsum (current `_mm_contract_second` shape)
  B. bf16 einsum, f32 accumulation (exact for 8-bit limbs, K<=64)
  C. int8 flat dot_general
  D. bf16 flat dot_general
and the full forward_ntt/inverse_ntt as shipped.
"""
import os, time
from tfhe_tpu.utils import enable_persistent_cache
enable_persistent_cache()
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax, jax.numpy as jnp, numpy as np
from tfhe_tpu.ops import ntt

B, LJ, N = 128, 2, 2048
R, C = 64, 32
NSTEPS = 742
rng = np.random.default_rng(0)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0] if leaf.ndim else leaf)


def bench(name, fn, *args):
    f = jax.jit(fn)
    _sync(f(*args))
    t0 = time.time()
    _sync(f(*args))
    dt = time.time() - t0
    print(f"{name:40s} {dt*1e3:9.1f} ms ({dt*1e3/NSTEPS:7.4f} ms/step)",
          flush=True)


def scanned(body, feedback):
    def run(x, w):
        def step(c, _):
            return feedback(c, body(c, w)), None
        out, _ = jax.lax.scan(step, x, None, length=NSTEPS)
        return out
    return run


# stage-1-like contraction, all 5 primes, nl=(2,2,2,3,3)
NLS = (2, 2, 2, 3, 3)
x0 = jnp.asarray(rng.integers(-40000, 40000, (B, LJ, R, C), dtype=np.int32))
Ws8 = [jnp.asarray(rng.integers(-127, 127, (R, R, nl), dtype=np.int8))
       for nl in NLS]
Wsb = [w.astype(jnp.bfloat16) for w in Ws8]
Ws8f = [jnp.asarray(np.asarray(w).transpose(0, 2, 1).reshape(R, -1))
        for w in Ws8]  # [k, nl*q]
Wsbf = [w.astype(jnp.bfloat16) for w in Ws8f]


def body_int8(x, ws):
    outs = []
    for w, p, nl in zip(ws, ntt.PRIMES, NLS):
        xl = jnp.moveaxis(
            jnp.stack([((x >> (8 * j)) & 255).astype(jnp.int8)
                       for j in range(nl)]), 0, -1)
        pr = jnp.einsum("bjkci,kqm->bjqcim", xl, w,
                        preferred_element_type=jnp.int32)
        outs.append(ntt.fold_p_f32(pr.sum((-1, -2), dtype=jnp.int32), p))
    return outs


def body_bf16(x, ws):
    outs = []
    for w, p, nl in zip(ws, ntt.PRIMES, NLS):
        xl = jnp.moveaxis(
            jnp.stack([((x >> (8 * j)) & 255).astype(jnp.bfloat16)
                       for j in range(nl)]), 0, -1)
        pr = jnp.einsum("bjkci,kqm->bjqcim", xl, w,
                        preferred_element_type=jnp.float32)
        outs.append(ntt.fold_p_f32(
            pr.sum((-1, -2)).astype(jnp.int32), p))
    return outs


def body_int8_flat(x, ws):
    # rows = B*LJ*C*nl_in, contract k, cols = q*nl_m
    outs = []
    for w, p, nl in zip(ws, ntt.PRIMES, NLS):
        xl = jnp.stack([((x >> (8 * j)) & 255).astype(jnp.int8)
                        for j in range(nl)])          # [i, B, LJ, k, c]
        xf = jnp.moveaxis(xl, 3, -1).reshape(-1, R)   # [i*B*LJ*c, k]
        pr = jax.lax.dot_general(xf, w.reshape(R, -1),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        pr = pr.reshape(nl, B, LJ, C, R, nl).sum((0, -1), dtype=jnp.int32)
        outs.append(ntt.fold_p_f32(pr, p))
    return outs


def body_bf16_flat(x, ws):
    outs = []
    for w, p, nl in zip(ws, ntt.PRIMES, NLS):
        xl = jnp.stack([((x >> (8 * j)) & 255).astype(jnp.bfloat16)
                        for j in range(nl)])
        xf = jnp.moveaxis(xl, 3, -1).reshape(-1, R)
        pr = jax.lax.dot_general(xf, w.reshape(R, -1).astype(jnp.bfloat16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        pr = pr.reshape(nl, B, LJ, C, R, nl).sum((0, -1)).astype(jnp.int32)
        outs.append(ntt.fold_p_f32(pr, p))
    return outs


def fb(c, outs):
    return c + outs[0].reshape(c.shape) + outs[3].reshape(c.shape)


for name, body, ws in [
    ("A stage1 int8 einsum x5p", body_int8, Ws8),
    ("B stage1 bf16 einsum x5p", body_bf16, Wsb),
    ("C stage1 int8 flat-dot x5p", body_int8_flat, Ws8),
    ("D stage1 bf16 flat-dot x5p", body_bf16_flat, Wsb),
]:
    bench(name, scanned(body, fb), x0, ws)

# shipped full transforms for reference
fwd_mats, inv_mats = ntt.dft_matrices_device(N)
d0 = jnp.asarray(rng.integers(-(1 << 22), 1 << 22, (B, LJ, N), dtype=np.int32))


def fwd_body(x, _):
    s = ntt.forward_ntt(x, mats=fwd_mats)
    return x + s[0] + s[4], None


def run_fwd(x):
    out, _ = jax.lax.scan(fwd_body, x, None, length=NSTEPS)
    return out


bench("shipped forward_ntt [B,2,N]", lambda x: run_fwd(x), d0)

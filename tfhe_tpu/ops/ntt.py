"""Exact negacyclic polynomial products via CRT NTTs, MXU-formulated.

Replaces the reference's f64 negacyclic FFT (ref: tfhe/src/core_crypto/
fft_impl/fft64/math/fft/mod.rs) with an error-free number-theoretic
transform built for the TPU:

- Five NTT-friendly primes, all == 1 mod 4096 so 2N-th roots exist for
  every polynomial size in the parameter registry (N <= 2048).  Residues
  are kept in *balanced* form (|x| <= (p-1)/2 <= 43008) so every product
  of two residues fits a native int32 multiply on the VPU.
- The negacyclic forward/inverse DFTs are dense constant matrices per
  prime (psi-twist and N^-1 folded in), applied as int8-limb-plane
  einsums on the MXU: balanced values split into 2-3 signed int8 limbs,
  limb-pair products accumulate exactly in int32, and the shifted planes
  recombine mod p on the VPU.
- The u64 torus operand (bootstrap-key polynomials) splits into two
  32-bit limb planes; each per-plane convolution against signed
  decomposition digits (|d| <= 2^22) is bounded by 2^67 < CRT/2 ~ 2^76,
  so it is recovered exactly by CRT (Garner mixed-radix), then planes
  recombine as conv_0 + 2^32 conv_1 mod 2^64.
- Spectrum-domain key multiplication uses signed Shoup multiplication:
  the fixed operand carries a precomputed round(b * 2^16 / p) companion,
  making each modmul two int32 multiplies, a shift and a correction.

The transform is exact, so unlike the reference's f64 path the TPU
results are bit-reproducible regardless of batch size or fusion order.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# NTT-friendly primes == 1 mod 4096; balanced residues fit int16-ish and
# all pairwise products fit int32.  (12289, 40961, 61441 need 2 int8
# limbs; 65537, 86017 need 3.)
PRIMES: Tuple[int, ...] = (12289, 40961, 61441, 65537, 86017)
N_LIMBS: Tuple[int, ...] = (2, 2, 2, 3, 3)
CRT_MODULUS = 1
for _p in PRIMES:
    CRT_MODULUS *= _p

# torus limb split: 64 = 32 + 32
TORUS_LIMB_BITS: Tuple[int, ...] = (32, 32)
TORUS_LIMB_SHIFTS: Tuple[int, ...] = (0, 32)

_SHOUP_BETA = 16


def _pow_mod(base: int, exp: int, mod: int) -> int:
    return pow(base, exp, mod)


def _find_generator(p: int) -> int:
    factors = []
    n = p - 1
    d = 2
    while d * d <= n:
        if n % d == 0:
            factors.append(d)
            while n % d == 0:
                n //= d
        d += 1
    if n > 1:
        factors.append(n)
    for g in range(2, p):
        if all(_pow_mod(g, (p - 1) // f, p) != 1 for f in factors):
            return g
    raise ValueError(f"no generator for {p}")


@functools.lru_cache(maxsize=None)
def _host_tables(p: int, N: int):
    """Negacyclic DFT matrices mod p (numpy int64, canonical [0, p)).

    V[k, n]   = psi^n omega^(k n)          (forward; psi = primitive 2N-th root)
    Vinv[n,k] = N^-1 psi^-n omega^(-k n)   (inverse, scaling folded in)
    """
    assert (p - 1) % (2 * N) == 0, f"{p} has no 2*{N}-th root"
    g = _find_generator(p)
    psi = _pow_mod(g, (p - 1) // (2 * N), p)
    omega = (psi * psi) % p
    psi_pows = np.array([_pow_mod(psi, i, p) for i in range(N)], dtype=np.int64)
    om_pows = np.array([_pow_mod(omega, i, p) for i in range(N)], dtype=np.int64)
    kn = np.outer(np.arange(N, dtype=np.int64), np.arange(N, dtype=np.int64)) % N
    V = om_pows[kn] * psi_pows[None, :] % p
    ninv = _pow_mod(N, p - 2, p)
    psi_inv_pows = np.array(
        [_pow_mod(psi, (p - 2) * i % (p - 1), p) for i in range(N)], dtype=np.int64
    )
    om_inv_pows = np.array(
        [_pow_mod(omega, (p - 2) * i % (p - 1), p) for i in range(N)], dtype=np.int64
    )
    Vinv = om_inv_pows[kn] * (psi_inv_pows * ninv % p)[:, None] % p
    return V, Vinv


def _balance_host(x: np.ndarray, p: int) -> np.ndarray:
    return np.where(x > p // 2, x - p, x).astype(np.int64)


@functools.lru_cache(maxsize=None)
def psi_pow_tables_device(N: int):
    """Per-prime [2N] balanced int32 tables of psi^t (psi = primitive 2N-th
    root used by `_host_tables`).

    The negacyclic forward transform of the monomial X^d is
    spec(X^d)[k] = psi^d omega^(k d) = psi^(d (2k+1) mod 2N), so monomial
    multiplication in the spectrum domain is one gather from these tables —
    the key enabler for combining multi-bit GGSW groups without re-running
    a forward NTT per blind-rotation step.

    Cached as host numpy (converting under a jit trace would cache leaked
    tracers); callers convert with jnp.asarray per trace."""
    outs = []
    for p in PRIMES:
        g = _find_generator(p)
        psi = _pow_mod(g, (p - 1) // (2 * N), p)
        pows = np.array([_pow_mod(psi, t, p) for t in range(2 * N)],
                        dtype=np.int64)
        outs.append(_balance_host(pows, p).astype(np.int32))
    return tuple(outs)


def _limbs_host(x: np.ndarray, n_limbs: int) -> np.ndarray:
    """Balanced int64 -> [..., n_limbs] signed int8 balanced-digit limbs."""
    out = []
    v = x.copy()
    for _ in range(n_limbs):
        l0 = ((v + 128) & 255) - 128
        out.append(l0)
        v = (v - l0) >> 8
    assert np.all(v == 0), "limb overflow"
    return np.stack(out, axis=-1).astype(np.int8)


def four_step_factors(N: int):
    """N = R*C with R >= C, both powers of two (R = C or 2C)."""
    m = N.bit_length() - 1
    R = 1 << ((m + 1) // 2)
    return R, N // R


@functools.lru_cache(maxsize=None)
def spectrum_natural_k(N: int) -> np.ndarray:
    """[N] int32: the natural DFT index k held at each stored spectrum
    position.  The four-step transform stores X[k1 + R*k2] at flat position
    k1*C + k2; pointwise spectrum consumers that need k (e.g. monomial
    spectra psi^(d(2k+1))) must index through this map."""
    R, C = four_step_factors(N)
    k1 = np.arange(R, dtype=np.int32)[:, None]
    k2 = np.arange(C, dtype=np.int32)[None, :]
    return (k1 + R * k2).reshape(-1)


@functools.lru_cache(maxsize=None)
def _four_step_tables_host(N: int):
    """Per-prime host tables for the four-step negacyclic NTT.

    Forward (contract r, twiddle, contract c; x stored [r, c] = i = r*C + c,
    spectrum stored [k1, k2] = X[k1 + R*k2]):
      W1[r, k1]  = psi^(rC) omega^(C r k1)
      T[k1, c]   = psi^c omega^(c k1)
      W2[c, k2]  = omega^(R c k2)
    Inverse (contract k2, twiddle, contract k1; 1/N folded into Ti):
      W2i[k2, c] = omega^(-R c k2)
      Ti[k1, c]  = psi^(-c) omega^(-c k1) / N
      W1i[k1, r] = psi^(-rC) omega^(-C r k1)
    """
    R, C = four_step_factors(N)
    fwd, inv = [], []
    for p, nl in zip(PRIMES, N_LIMBS):
        g = _find_generator(p)
        psi = _pow_mod(g, (p - 1) // (2 * N), p)
        om = psi * psi % p
        psi_t = np.array([_pow_mod(psi, t, p) for t in range(2 * N)],
                         dtype=np.int64)
        om_t = np.array([_pow_mod(om, t, p) for t in range(N)],
                        dtype=np.int64)
        psi_it = np.array(
            [_pow_mod(psi, (2 * N - t) % (2 * N), p) for t in range(2 * N)],
            dtype=np.int64)
        om_it = np.array([_pow_mod(om, (N - t) % N, p) for t in range(N)],
                         dtype=np.int64)
        ninv = _pow_mod(N, p - 2, p)
        r = np.arange(R, dtype=np.int64)
        c = np.arange(C, dtype=np.int64)
        k1 = np.arange(R, dtype=np.int64)
        k2 = np.arange(C, dtype=np.int64)

        W1 = psi_t[(r * C) % (2 * N)][:, None] * om_t[
            (C * np.outer(r, k1)) % N] % p                      # [r, k1]
        T = psi_t[c % (2 * N)][None, :] * om_t[
            np.outer(k1, c) % N] % p                            # [k1, c]
        W2 = om_t[(R * np.outer(c, k2)) % N] % p                # [c, k2]
        W2i = om_it[(R * np.outer(k2, c)) % N] % p              # [k2, c]
        Ti = psi_it[c % (2 * N)][None, :] * om_it[
            np.outer(k1, c) % N] % p * ninv % p                 # [k1, c]
        W1i = psi_it[(r * C) % (2 * N)][None, :] * om_it[
            (C * np.outer(k1, r)) % N] % p                      # [k1, r]

        def _tw(x):
            b = _balance_host(x % p, p).astype(np.int32)
            return b, shoup_precompute_host(b, p)

        Tb, Tsh = _tw(T)
        Tib, Tish = _tw(Ti)
        fwd.append((
            _limbs_host(_balance_host(W1, p), nl),
            Tb, Tsh,
            _limbs_host(_balance_host(W2, p), nl),
        ))
        inv.append((
            _limbs_host(_balance_host(W2i, p), nl),
            Tib, Tish,
            _limbs_host(_balance_host(W1i, p), nl),
        ))
    return tuple(fwd), tuple(inv)


_DFT_DEVICE_CACHE: dict = {}


def dft_matrices_device(N: int):
    """Per-prime (fwd, inv) four-step NTT table pytrees on device.

    Each forward entry is (W1_limbs [R,R,nl], T [R,C], T_shoup [R,C],
    W2_limbs [C,C,nl]); inverse entries are (W2i_limbs, Ti, Ti_shoup,
    W1i_limbs).  Total size is O(sqrt(N) * N) bytes — small enough to embed
    as jit constants (the former dense [N,N] matrices were ~200MB at
    N=2048 and had to be threaded through pytrees).

    Memoized by hand instead of lru_cache: when the first call for a given N
    happens inside a jit trace, jnp.asarray yields tracers, and caching those
    would leak them into later calls (UnexpectedTracerError).  Concrete
    arrays are cached; tracer results are returned uncached (they embed as
    constants of the program being traced)."""
    if N in _DFT_DEVICE_CACHE:
        return _DFT_DEVICE_CACHE[N]
    fwd_h, inv_h = _four_step_tables_host(N)
    to_dev = lambda tabs: tuple(
        tuple(jnp.asarray(a) for a in entry) for entry in tabs)
    out = (to_dev(fwd_h), to_dev(inv_h))
    import jax

    if not isinstance(out[0][0][0], jax.core.Tracer):
        _DFT_DEVICE_CACHE[N] = out
    return out


# ---------------------------------------------------------------------------
# device-side modular helpers (balanced representation)
# ---------------------------------------------------------------------------


def _center_mod(x, p: int):
    """int array (any magnitude fitting its dtype) -> balanced mod p."""
    half = p // 2
    return jnp.mod(x + half, p) - half


def _center_u32_bytes(x, p: int):
    """int32 bit-patterns of u32 values -> balanced mod p, pure int32 VPU.

    Byte-plane reduction: v = sum_i b_i 2^(8i) with b_i in [0, 256), so
    v mod p = fold(sum_i b_i * bal(2^(8i) mod p)); |sum| <= 4*255*p/2
    < 2^26, one loose f32 fold (q off by <= 1) then one exact fold lands
    strictly balanced.  Replaces the int64 `jnp.mod` centering that
    dominated BSK prep on TPU (no 64-bit integer unit; PERF_NOTES.md #5)."""
    c = [np.int32(_balanced_const(1 << (8 * i), p)) for i in range(4)]
    b0 = x & 255
    b1 = (x >> 8) & 255
    b2 = (x >> 16) & 255
    b3 = (x >> 24) & 255  # arithmetic shift then mask = logical byte
    t = b0 * c[0] + b1 * c[1] + b2 * c[2] + b3 * c[3]
    return fold_p_f32(fold_p_f32(t, p), p)


def _to_limbs_i8(x, n_limbs: int):
    """Balanced int32 -> [..., n_limbs] signed int8 balanced-digit limbs."""
    out = []
    v = x
    for _ in range(n_limbs):
        l0 = ((v + 128) & 255) - 128
        out.append(l0.astype(jnp.int8))
        v = (v - l0) >> 8
    return jnp.stack(out, axis=-1)


def fold_p_f32(x, p: int):
    """x int32 with |x| < 2^24 -> x mod p, nearly balanced (|out| <= p/2 + 1).

    One f32 multiply + round replaces integer division: q = round(x/p) is
    within 1 of the nearest integer (f32 is exact below 2^24), so
    x - q*p stays within p/2 + p*2^-10 of balanced — the cheap VPU
    reduction for every post-matmul/post-sum fold in the hot path."""
    q = jnp.round(x.astype(jnp.float32) * np.float32(1.0 / p)).astype(
        jnp.int32)
    return x - q * np.int32(p)


@functools.lru_cache(maxsize=None)
def _limb_scale_consts(p: int, n_limbs: int):
    """Balanced 2^(8s) mod p and its Shoup companion, s = 0..2*n_limbs-2."""
    outs = []
    for s in range(2 * n_limbs - 1):
        sc = (1 << (8 * s)) % p
        sc = sc - p if sc > p // 2 else sc
        sh = int(np.round(sc * (1 << _SHOUP_BETA) / p))
        outs.append((np.int32(sc), np.int32(sh)))
    return outs


def _combine_limb_planes(prod, p: int, n_limbs: int):
    """prod [..., i, j] int32 limb-pair matmul outputs (contraction K <= 64,
    so |entry| <= 127*127*64 < 2^21) -> balanced int32 mod p.

    Same-weight planes (i + j = s) are summed raw (<= 3 terms, still < 2^23),
    folded once, scaled by the balanced constant 2^(8s) mod p via Shoup."""
    consts = _limb_scale_consts(p, n_limbs)
    groups = {}
    for i in range(n_limbs):
        for j in range(n_limbs):
            groups.setdefault(i + j, []).append(prod[..., i, j])
    total = None
    for s, terms in groups.items():
        g = terms[0]
        for t in terms[1:]:
            g = g + t
        t = fold_p_f32(g, p)
        sc, sh = consts[s]
        if s:
            t = shoup_mul(t, sc, sh, p)
        total = t if total is None else total + t
    # <= 2*n_limbs - 1 balanced terms: |total| <= 5*(p/2+1) << 2^24
    return fold_p_f32(total, p)


def _mm_contract_last(x_bal, mat_limbs, p: int, n_limbs: int):
    """x [..., K] balanced int32, mat [K, Q, nl] int8 -> [..., Q] balanced."""
    xl = _to_limbs_i8(x_bal, n_limbs)  # [..., K, i]
    prod = jnp.einsum("...ki,kqj->...qij", xl, mat_limbs,
                      preferred_element_type=jnp.int32)
    return _combine_limb_planes(prod, p, n_limbs)


def _mm_contract_second(x_bal, mat_limbs, p: int, n_limbs: int):
    """x [..., K, C] balanced int32, mat [K, Q, nl] int8 -> [..., Q, C]."""
    xl = _to_limbs_i8(x_bal, n_limbs)  # [..., K, C, i]
    prod = jnp.einsum("...kci,kqj->...qcij", xl, mat_limbs,
                      preferred_element_type=jnp.int32)
    return _combine_limb_planes(prod, p, n_limbs)


def forward_ntt(x_int, mats=None, u32_bits: bool = False):
    """x [..., N] signed int (|x| < 2^32) -> list per prime of [..., N]
    balanced int32 negacyclic spectra in four-step storage order
    (position k1*C + k2 holds X[k1 + R*k2]; see spectrum_natural_k).

    With u32_bits=True, x is int32 BIT-PATTERNS of u32 values (the key-prep
    path): centering runs on int32 byte planes instead of emulated int64.

    Four-step: reshape to [R, C], contract r on the MXU, pointwise twiddle
    (Shoup), contract c on the MXU — O(N(R+C)) MACs instead of the dense
    O(N^2) matrix (the TPU analog of the reference's FFT,
    ref: fft_impl/fft64/math/fft/mod.rs:196-326)."""
    N = x_int.shape[-1]
    R, C = four_step_factors(N)
    fwd = mats if mats is not None else dft_matrices_device(N)[0]
    wide = x_int.dtype not in (jnp.int32, np.dtype(np.int32))
    lead = x_int.shape[:-1]
    outs = []
    for i, (p, nl) in enumerate(zip(PRIMES, N_LIMBS)):
        # int64 centering only when the input really is 64-bit (key planes
        # at prep time); per-step digit inputs are int32: |digit| <= 2^23
        # fits the f32 fold.
        if u32_bits:
            xc = _center_u32_bytes(x_int, p)
        elif wide:
            xc = _center_mod(x_int.astype(jnp.int64), p).astype(jnp.int32)
        else:
            xc = fold_p_f32(x_int, p)
        W1, T, Tsh, W2 = fwd[i]
        xr = xc.reshape(*lead, R, C)
        u = _mm_contract_second(xr, W1, p, nl)       # [..., k1, c]
        u = shoup_mul(u, T, Tsh, p)
        v = _mm_contract_last(u, W2, p, nl)          # [..., k1, k2]
        outs.append(v.reshape(*lead, N))
    return outs


def inverse_ntt(spec_list, mats=None):
    """list per prime of [..., N] balanced four-step-order spectra ->
    list of balanced coefficient arrays (see forward_ntt)."""
    N = spec_list[0].shape[-1]
    R, C = four_step_factors(N)
    inv = mats if mats is not None else dft_matrices_device(N)[1]
    outs = []
    for i, (p, nl) in enumerate(zip(PRIMES, N_LIMBS)):
        W2i, Ti, Tish, W1i = inv[i]
        lead = spec_list[i].shape[:-1]
        zr = spec_list[i].reshape(*lead, R, C)
        u = _mm_contract_last(zr, W2i, p, nl)        # [..., k1, c]
        u = shoup_mul(u, Ti, Tish, p)
        v = _mm_contract_second(u, W1i, p, nl)       # [..., r, c]
        outs.append(v.reshape(*lead, N))
    return outs


def mulmod_f32(a, b, p: int):
    """Balanced a*b mod p for runtime operands (no precomputed Shoup
    companion), |a|, |b| <= p/2, all int32 on the VPU.

    b splits into high/low bytes so every partial product stays below 2^24
    and the f32 round-fold applies: a*b_hi <= (p/2)*(p/512) < 2^24 and
    fold(a*b_hi)*256 + a*b_lo <= 256(p/2+1) + 128(p/2) < 2^24."""
    b_lo = ((b + 128) & 255) - 128          # [-128, 127]
    b_hi = (b - b_lo) >> 8                  # |b_hi| <= p/512 + 1
    t = fold_p_f32(a * b_hi, p)
    return fold_p_f32(t * np.int32(256) + a * b_lo, p)


def shoup_mul(a, b, bs, p: int):
    """Balanced a*b mod p with Shoup companion bs = round(b*2^16/p).
    All int32; |result| <= p/2 on return."""
    q = (a * bs) >> _SHOUP_BETA  # arithmetic shift, error <= ~2
    r = a * b - q * np.int32(p)
    half = p // 2
    r = jnp.where(r > half, r - p, r)
    r = jnp.where(r > half, r - p, r)
    r = jnp.where(r < -half, r + p, r)
    r = jnp.where(r < -half, r + p, r)
    return r


def pointwise_shoup(a_list, b_list, b_shoup_list):
    """Per-prime balanced products a*b mod p (lists parallel to PRIMES)."""
    return [
        shoup_mul(a_list[i], b_list[i], b_shoup_list[i], p)
        for i, p in enumerate(PRIMES)
    ]


def shoup_precompute_host(b_bal: np.ndarray, p: int) -> np.ndarray:
    """round(b * 2^16 / p) for balanced b (signed)."""
    return np.round(b_bal.astype(np.float64) * (1 << _SHOUP_BETA) / p).astype(
        np.int32
    )


# ---------------------------------------------------------------------------
# CRT reconstruction (Garner mixed-radix) to u64
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _garner_consts():
    """Balanced Shoup constants for device-side Garner reconstruction.

    cj[i][j] = p_0 ... p_{j-1} mod p_i (balanced, with Shoup companion) for
    j < i; inv[i] = (p_0 ... p_{i-1})^-1 mod p_i (balanced, with Shoup);
    pp_u64[i] = p_0 ... p_{i-1} mod 2^64."""
    p = [int(x) for x in PRIMES]

    def _sh(v, pi):
        b = _balanced_const(v, pi)
        return np.int32(b), np.int32(round(b * (1 << _SHOUP_BETA) / pi))

    cj = []
    inv = []
    for i in range(len(p)):
        row = []
        prod = 1
        for j in range(i):
            if j:
                row.append(_sh(prod, p[i]))
            prod = prod * p[j] % p[i]
        cj.append(row)  # constants for digit terms j = 1 .. i-1
        inv.append(_sh(pow(prod, p[i] - 2, p[i]), p[i]) if i else None)
    pp_u64 = []  # p_0 ... p_{i-1} mod 2^64
    prod = 1
    for i in range(len(p)):
        pp_u64.append(prod % (1 << 64))
        prod *= p[i]
    return p, cj, inv, pp_u64


def _balanced_const(v: int, p: int) -> int:
    v %= p
    return v - p if v > p // 2 else v


def crt_to_u64_centered(res_list):
    """Per-prime balanced residues -> the true integer's value mod 2^64.

    Balanced-digit Garner: mixed-radix digits b_i with |b_i| <= p_i/2 give
    x = sum_i b_i * prod_{l<i} p_l with |x| <= CRT/2 (1 + eps); since the
    true convolution value is |x| < 2^70 << CRT/2 ~ 2^75.6, the balanced
    reconstruction IS the true integer — no sign ladder or canonicalization
    needed.

    Everything stays in int32 on the VPU (TPU v5e has no 64-bit integer
    unit): constant multiplies use Shoup companions, folds use the f32
    round trick — `jnp.mod` (magic-number division with emulated 64-bit
    high multiplies) never appears.  Only the final 5-term reconstruction
    mod 2^64 touches emulated u64 multiply-adds."""
    bs = _garner_digits(res_list)
    _, _, _, pp_u64 = _garner_consts()
    x64 = jnp.zeros(bs[0].shape, jnp.uint64)
    for i in range(len(bs)):
        # sign-extend int32 -> int64, then wrap into u64 (two's complement)
        t = bs[i].astype(jnp.int64).astype(jnp.uint64)
        x64 = x64 + t * jnp.uint64(pp_u64[i])
    return x64


def _garner_digits(res_list):
    """Per-prime balanced residues -> balanced mixed-radix digits b_i
    (|b_i| <= p_i/2) with x = sum_i b_i * prod_{l<i} p_l."""
    p, cj, inv, _ = _garner_consts()
    bs = [res_list[0]]  # |b_0| <= p_0/2 <= p_i/2 for all i (primes ascend)
    for i in range(1, len(p)):
        # partial = (b_0 + sum_{j>=1} b_j * (p_0..p_{j-1} mod p_i)) mod p_i
        partial = bs[0]
        for j in range(1, i):
            c, csh = cj[i][j - 1]
            partial = partial + shoup_mul(bs[j], c, csh, p[i])
        if i > 1:
            partial = fold_p_f32(partial, p[i])  # |.| <= i * p_i/2 < 2^19
        diff = fold_p_f32(res_list[i] - partial, p[i])
        ic, icsh = inv[i]
        bs.append(shoup_mul(diff, ic, icsh, p[i]))
    return bs


def crt_to_u128_centered(res_list):
    """Per-prime balanced residues -> the true integer mod 2^128 as
    uint64 (lo, hi) pairs [..., 2] (the fft128 analog of
    crt_to_u64_centered; ref: fft_impl/fft128_u128/).

    Same balanced-Garner argument: |x| < 2^70 << CRT/2, so the balanced
    reconstruction is the true integer; here its full 128-bit wrap is kept
    because a u128 plane combine consumes bits above 2^64."""
    bs = _garner_digits(res_list)
    p, _, _, _ = _garner_consts()
    prod = 1
    lo = jnp.zeros(bs[0].shape, jnp.uint64)
    hi = jnp.zeros(bs[0].shape, jnp.uint64)
    for i in range(len(bs)):
        pp = prod % (1 << 128)
        prod *= p[i]
        pl0 = jnp.uint64(pp & 0xFFFFFFFF)
        pl1 = jnp.uint64((pp >> 32) & 0xFFFFFFFF)
        ph = jnp.uint64((pp >> 64) % (1 << 64))
        b = bs[i]
        babs = jnp.abs(b).astype(jnp.uint64)          # |b| <= p_i/2 < 2^16
        p0 = babs * pl0                               # < 2^48
        p1 = babs * pl1                               # < 2^48
        t = (p1 & jnp.uint64(0xFFFFFFFF)) << jnp.uint64(32)
        term_lo = p0 + t
        carry = (term_lo < p0).astype(jnp.uint64)
        term_hi = (p1 >> jnp.uint64(32)) + carry + babs * ph
        neg = b < 0
        # x += term  (or x -= term when b < 0), with explicit carry/borrow
        add_lo = lo + term_lo
        add_hi = hi + term_hi + (add_lo < lo).astype(jnp.uint64)
        sub_lo = lo - term_lo
        sub_hi = hi - term_hi - (lo < term_lo).astype(jnp.uint64)
        lo = jnp.where(neg, sub_lo, add_lo)
        hi = jnp.where(neg, sub_hi, add_hi)
    return jnp.stack([lo, hi], axis=-1)


# ---------------------------------------------------------------------------
# torus limb planes
# ---------------------------------------------------------------------------


def torus_to_planes_host(poly: np.ndarray) -> np.ndarray:
    """u64 [..., N] -> int64 [..., 2, N] planes of 32 unsigned bits."""
    planes = [
        ((poly >> np.uint64(s)) & np.uint64(0xFFFFFFFF)).astype(np.int64)
        for s in TORUS_LIMB_SHIFTS
    ]
    return np.stack(planes, axis=-2)


def planes_to_u64(conv_planes):
    """[..., 2, N] u64 exact per-plane convolutions -> mod 2^64."""
    return conv_planes[..., 0, :] + (
        conv_planes[..., 1, :] << jnp.uint64(TORUS_LIMB_SHIFTS[1])
    )

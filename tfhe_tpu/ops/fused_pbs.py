"""Fused blind-rotation Pallas kernel: the whole PBS hot loop in VMEM.

One pallas_call runs the full blind rotation (ref: fft_impl/fft64/crypto/
bootstrap.rs:242-331 blind_rotate_assign + ggsw.rs:477-697 external product):
the accumulator lives in VMEM scratch across a grid over the n mask
elements, and each grid step performs

  barrel-rotate (X^a_i, 2N-embedded) -> u64 subtract -> signed decompose
  -> per-prime four-step forward NTT (bf16 MXU matmuls, exact for int8
     limb data with f32 accumulation)
  -> spectrum MAC against the streamed BSK slice (hi/lo mulmod, VPU)
  -> per-prime inverse NTT (bf16 MXU matmuls)
  -> streaming explicit-CRT accumulate into the u64 accumulator planes.

Design notes (all arithmetic exact; the final accumulator is bit-identical
to the jnp path in ops/polymul_ntt.py):

- Layouts are [rows, N-sublanes, batch-lanes]: a coefficient array is
  [N, B], reshaped [R, C*B] for stage A, so every NTT stage is one 2D
  bf16 x bf16 -> f32 matmul (exact: int8 limbs are exact in bf16 and
  the f32 accumulator never exceeds 2^24 — asserted in make_config).
- The digit limb split is shared across primes: stage-A tables carry
  limb_j(W * 2^(8i) mod p) so the operand-limb index i rides the matmul
  contraction dimension (K = R * ld) instead of multiplying matmul count.
- Torus u64 values are (lo, hi) int32 planes; adds/subs carry explicitly.
- CRT streams per prime into the accumulator: x = sum_p c_p * (M/p) - a*M
  with c_p = conv * (M/p)^-1 mod p (folded into the inverse-NTT tables)
  and a recovered exactly from an f32 sum of c_p / p (the fractional
  distance to an integer is |conv|/M < 2^-9, far above f32 error).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ntt

_IMIN = np.int32(-(2 ** 31))


# ---------------------------------------------------------------------------
# configuration
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FusedConfig:
    """Static shape/arithmetic metadata for one parameter family."""

    N: int
    R: int
    C: int
    glwe_size: int      # G
    levels: int         # L
    base_log: int
    bits: int           # 32 or 64
    planes: int         # M torus planes (2 for u64, 1 for u32)
    primes: Tuple[int, ...]
    nl: Tuple[int, ...]   # table limb count per prime
    nlx: Tuple[int, ...]  # balanced-residue limb count per prime
    ld: int               # digit limb count
    # CRT constants (per prime): 16-bit chunk tuples
    k64: Tuple[Tuple[int, ...], ...]    # chunks of (M/p) mod 2^64
    k64s: Tuple[Tuple[int, ...], ...]   # chunks of (M/p * 2^16) mod 2^64
    k32: Tuple[Tuple[int, ...], ...]    # chunks of (M/p) mod 2^32
    k32s: Tuple[Tuple[int, ...], ...]   # chunks of (M/p * 2^16) mod 2^32
    km64: Tuple[int, ...]               # chunks of M mod 2^64
    km32: Tuple[int, ...]               # chunks of M mod 2^32


def _limb_cover_bits(nlimb: int) -> int:
    """Magnitudes < 2^(8*nlimb - 1) split exactly into nlimb int8 limbs."""
    return 8 * nlimb - 1


def _chunks16(v: int, n: int) -> Tuple[int, ...]:
    return tuple((v >> (16 * s)) & 0xFFFF for s in range(n))


@functools.lru_cache(maxsize=None)
def make_config(N: int, glwe_size: int, levels: int, base_log: int,
                bits: int) -> FusedConfig:
    R, C = ntt.four_step_factors(N)
    planes = 2 if bits == 64 else 1
    LJ = levels * glwe_size
    # digit limbs: |digit| <= 2^(base_log - 1)
    ld = 1
    while (1 << (base_log - 1)) >= (1 << _limb_cover_bits(ld)):
        ld += 1
    # integer convolution bound: LJ * N * max|digit| * max plane value
    bound = LJ * N * (1 << (base_log - 1)) * (1 << 32)
    # choose the largest primes first until CRT covers 2 * bound with the
    # >= 2^5 margin that keeps the alpha recovery trivially exact
    order = sorted(range(len(ntt.PRIMES)), key=lambda i: -ntt.PRIMES[i])
    primes, prod = [], 1
    for i in order:
        primes.append(i)
        prod *= ntt.PRIMES[i]
        if prod >= bound * 64:
            break
    assert prod >= bound * 64, "CRT prime pool too small for these params"
    primes = tuple(sorted(primes))
    plist = tuple(ntt.PRIMES[i] for i in primes)
    nl = tuple(ntt.N_LIMBS[i] for i in primes)
    nlx = []
    for p in plist:
        n_ = 1
        while p // 2 + p // 64 >= (1 << _limb_cover_bits(n_)):
            n_ += 1
        nlx.append(n_)
    # Fold drift model: folding an input of magnitude X yields a
    # representative within p/2 + X*2^-22.4 of zero (three f32 roundings in
    # q = round(f32(X) * f32(1/p))), and the mod-p class is exact.
    #
    # The lazy horner (no initial fold; see _horner) folds arguments up to
    # X = 257 * K * 2^14 with K <= R*max(ld, nlx), so residue drift is
    # bounded by 257*K*2^14*2^-22.4 — asserted against the limb-cover
    # margin p//64 below.  The MAC sum-before-fold drift must also stay
    # inside p//64: with spec magnitude smag = p/2 + p//64,
    # |sum_lj spec*khi| <= LJ*smag*(p/512+128) and the lo combine
    # |t1*256 + sum_lj spec*klo| <= smag*256 + LJ*smag*128.
    horner_drift = int(257 * R * max(ld, max(nlx)) * (1 << 14) * 2 ** -22.4)
    for p in plist:
        assert horner_drift <= p // 64, "lazy-horner drift exceeds margin"
        cap = min((p // 64) << 22, 1 << 30)
        smag = p // 2 + p // 64
        x_hi = LJ * smag * (p // 512 + 128)
        x_lo = smag * 256 + LJ * smag * 128
        assert x_hi < cap, "MAC hi partial-product sum exceeds fold bound"
        assert x_lo < cap, "MAC lo combine exceeds fold bound"
    # bf16 matmul exactness: every _dot8 contraction (K in {R*ld, C*nlx,
    # R*nlx}) sums K terms of |a*b| <= 128*128 in an f32 accumulator,
    # which is exact only while the partial sums stay under 2^24
    assert max(R * ld, C * max(nlx), R * max(nlx)) * 16384 <= 1 << 24, (
        "bf16 MXU contraction would exceed exact f32 range")
    M = prod
    k64, k64s, k32, k32s = [], [], [], []
    for p in plist:
        Mp = M // p
        k64.append(_chunks16(Mp % (1 << 64), 4))
        k64s.append(_chunks16((Mp << 16) % (1 << 64), 4))
        k32.append(_chunks16(Mp % (1 << 32), 2))
        k32s.append(_chunks16((Mp << 16) % (1 << 32), 2))
    return FusedConfig(
        N=N, R=R, C=C, glwe_size=glwe_size, levels=levels, base_log=base_log,
        bits=bits, planes=planes, primes=plist, nl=nl, nlx=tuple(nlx), ld=ld,
        k64=tuple(k64), k64s=tuple(k64s), k32=tuple(k32), k32s=tuple(k32s),
        km64=_chunks16(M % (1 << 64), 4), km32=_chunks16(M % (1 << 32), 2),
    )


# ---------------------------------------------------------------------------
# host table builder
# ---------------------------------------------------------------------------


def _bal(x: np.ndarray, p: int) -> np.ndarray:
    x = np.mod(x, p)
    return np.where(x > p // 2, x - p, x).astype(np.int64)


def _limb_cols(mat: np.ndarray, p: int, nlimb_tab: int,
               nlimb_op: int) -> np.ndarray:
    """mat [Q, K] int64 balanced -> int8 [(nlimb_tab * Q), (nlimb_op * K)]:
    row (j, q) = limb_j, column (i, k) carries the 2^(8i) operand-limb
    weight folded in mod p (i-major)."""
    Q, K = mat.shape
    w = np.array([(1 << (8 * i)) % p for i in range(nlimb_op)], dtype=object)
    ext = np.zeros((Q, nlimb_op, K), dtype=np.int64)
    for i in range(nlimb_op):
        ext[:, i, :] = _bal(mat * int(w[i]), p)
    limbs = ntt._limbs_host(ext.reshape(Q, nlimb_op * K), nlimb_tab)
    # [Q, nlimb_op*K, nlimb_tab] -> [(j, q), (i, k)]: i-major columns match
    # the concat-based operand limb rows (cheap buffer concat, no interleave)
    return np.transpose(limbs, (2, 0, 1)).reshape(
        nlimb_tab * Q, nlimb_op * K).astype(np.int8)


@functools.lru_cache(maxsize=None)
def _host_tables_fused(cfg: FusedConfig):
    """Per-prime packed matmul/twiddle tables (numpy)."""
    N, R, C = cfg.N, cfg.R, cfg.C
    Msub = 1
    for p in cfg.primes:
        Msub *= p
    out = []
    for idx, p in enumerate(cfg.primes):
        nl, nlx = cfg.nl[idx], cfg.nlx[idx]
        g = ntt._find_generator(p)
        psi = ntt._pow_mod(g, (p - 1) // (2 * N), p)
        om = psi * psi % p
        psi_t = np.array([ntt._pow_mod(psi, t % (2 * N), p)
                          for t in range(2 * N)], dtype=np.int64)
        om_t = np.array([ntt._pow_mod(om, t, p) for t in range(N)],
                        dtype=np.int64)
        psi_it = np.array([ntt._pow_mod(psi, (2 * N - t) % (2 * N), p)
                           for t in range(2 * N)], dtype=np.int64)
        om_it = np.array([ntt._pow_mod(om, (N - t) % N, p)
                          for t in range(N)], dtype=np.int64)
        ninv = ntt._pow_mod(N, p - 2, p)
        cinv = pow((Msub // p) % p, p - 2, p)

        r = np.arange(R, dtype=np.int64)
        c = np.arange(C, dtype=np.int64)
        k1 = np.arange(R, dtype=np.int64)
        k2 = np.arange(C, dtype=np.int64)

        W1T = psi_t[(k1[:, None] * 0 + r[None, :] * C) % (2 * N)] * om_t[
            (C * np.outer(k1, r)) % N] % p                        # [K1, R]
        TC = psi_t[c % (2 * N)][None, :] * om_t[
            np.outer(k1, c) % N] % p                              # [K1, C]
        W2T = om_t[(R * np.outer(k2, c)) % N] % p                 # [K2, C]
        W2iT = om_it[(R * np.outer(c, k2)) % N] % p               # [C, K2]
        TIC = psi_it[c % (2 * N)][:, None] * om_it[
            np.outer(c, k1) % N] % p * ninv % p                   # [C, K1]
        W1iT = psi_it[(r * C) % (2 * N)][:, None] * om_it[
            (C * np.outer(r, k1)) % N] % p * cinv % p             # [R, K1]

        def _sh(x):
            b = _bal(x, p).astype(np.int32)
            return b, ntt.shoup_precompute_host(b, p)

        TCb, TCsh = _sh(TC)
        TICb, TICsh = _sh(TIC)
        out.append(dict(
            W1A8=_limb_cols(_bal(W1T, p), p, nl, cfg.ld),    # [nl*K1, R*ld]
            W2B8=_limb_cols(_bal(W2T, p), p, nl, nlx),       # [nl*K2, C*nlx]
            W2I8=_limb_cols(_bal(W2iT, p), p, nl, nlx),      # [nl*C, K2*nlx]
            W1I8=_limb_cols(_bal(W1iT, p), p, nl, nlx),      # [nl*R, K1*nlx]
            TC=TCb.astype(np.int32),                         # [K1, C]
            TCsh=TCsh.astype(np.int32),
            TIC=TICb.astype(np.int32),                       # [C, K1]
            TICsh=TICsh.astype(np.int32),
        ))
    return tuple(out)


_TABLE_KEYS = ("W1A8", "W2B8", "W2I8", "W1I8", "TC", "TCsh", "TIC", "TICsh")

# The limb-plane DFT matrices feed the MXU as bfloat16: int8 limbs are
# exact in bf16 (integers up to 2^8), the MXU accumulates in f32, and the
# largest contraction (K = R*ld = 192 terms of |a*b| <= 128*128) is
# bounded by 3.2M < 2^24, so every matmul result is an exact integer.
# Measured on v5e: bf16 sustains ~55 T-MAC/s vs ~34 for int8 on these
# shapes (PERF_NOTES.md), a direct ~1.6x on the matmul-bound stages.
_BF16_KEYS = frozenset({"W1A8", "W2B8", "W2I8", "W1I8"})


def build_tables_device(cfg: FusedConfig):
    host = _host_tables_fused(cfg)
    return tuple(
        tuple(
            jnp.asarray(t[k], jnp.bfloat16) if k in _BF16_KEYS
            else jnp.asarray(t[k])
            for k in _TABLE_KEYS)
        for t in host)


def _dot8(W, X):
    """Exact limb-plane matmul on the MXU: bf16 x bf16 -> f32 -> int32."""
    return jnp.dot(W.astype(jnp.bfloat16), X.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(jnp.int32)


# ---------------------------------------------------------------------------
# kernel helpers (traced; run inside and outside pallas identically)
# ---------------------------------------------------------------------------


def _fold(x, p: int):
    q = jnp.round(x.astype(jnp.float32) * np.float32(1.0 / p)).astype(
        jnp.int32)
    return x - q * np.int32(p)


def _shoup(a, b, bs, p: int):
    """|a| <= p/2 + p/64, |b| <= p/2 -> a*b mod p within p/2 + 1.

    One f32 round-fold replaces the former 4-way where-correction chain:
    q is within ~2 of a*b/p, so |r| <= 2.6p < 2^19 sits deep inside the
    fold's exact zone."""
    q = jax.lax.shift_right_arithmetic(a * bs, np.int32(16))
    r = a * b - q * np.int32(p)
    return _fold(r, p)


def _limb_rows(x, nlimb: int):
    """[Rows, Cols] int32 -> [(nlimb * Rows), Cols] int8, row (i, r).

    i-major concat (row i*Rows + r): a plain buffer concat, far cheaper on
    TPU than an interleaved stack; table columns are built to match."""
    v = x
    outs = []
    for _ in range(nlimb):
        l0 = ((v + 128) & 255) - 128
        outs.append(l0.astype(jnp.int8))
        v = (v - l0) >> 8
    return jnp.concatenate(outs, axis=0)


def _horner(Y, nl: int, K: int, p: int):
    """[(nl * K), Cols] int32 limb-plane matmul output -> [K, Cols] within
    p/2 + p/64 of balanced.

    Lazy: the top plane enters UNFOLDED (|Yv| <= K_mm * 2^14 <= 2^21.6, so
    |h*256 + Yv| <= 2^29.7 fits int32 and stays inside the f32 fold's
    relaxed-drift zone — see the drift model in make_config).  Saves one
    full-plane fold per horner vs the eager chain."""
    Yv = Y.reshape(nl, K, Y.shape[-1])
    h = Yv[nl - 1]
    for j in range(nl - 2, -1, -1):
        h = _fold(h * 256 + Yv[j], p)
    return h if nl > 1 else _fold(h, p)


def _ult(a, b):
    return (a ^ _IMIN) < (b ^ _IMIN)


def _u64_add_signed(lo, hi, t):
    """(lo, hi) u64-planes += signed int32 t."""
    lo2 = lo + t
    return lo2, hi + (t >> 31) + _ult(lo2, lo).astype(jnp.int32)


def _u64_sub(lo, hi, tlo, thi):
    lo2 = lo - tlo
    return lo2, hi - thi - _ult(lo, tlo).astype(jnp.int32)


def _u64_neg(lo, hi):
    return -lo, -hi - 1 + (lo == 0).astype(jnp.int32)


def _mulacc_c16_k64(lo, hi, c, kch):
    """u64-planes += c * K, |c| <= 2^15, K given as 4 uint16 chunks."""
    k0, k1, k2, k3 = [np.int32(v) for v in kch]
    if int(k0):
        lo, hi = _u64_add_signed(lo, hi, c * k0)
    if int(k1):
        P1 = c * k1
        t = (P1 & 0xFFFF) << 16
        lo2 = lo + t
        hi = hi + _ult(lo2, lo).astype(jnp.int32) + (P1 >> 16)
        lo = lo2
    if int(k2):
        hi = hi + c * k2
    if int(k3):
        hi = hi + ((c * k3) << 16)
    return lo, hi


def _split_c16(c):
    c0 = ((c + 32768) & 65535) - 32768
    return c0, (c - c0) >> 16


def _mulacc_c_k64(lo, hi, c, kch, ksch):
    """u64-planes += c * K for |c| < 2^17 (split into two 16-bit pieces)."""
    c0, c1 = _split_c16(c)
    lo, hi = _mulacc_c16_k64(lo, hi, c0, kch)
    return _mulacc_c16_k64(lo, hi, c1, ksch)


def _low32_mul(c, kch):
    """low 32 bits of c * K (wrapping int32), |c| < 2^17.

    c = c0 + 2^16 c1; low32(c*K) = c0*k0 + (c0*k1)<<16 + (c1*k0)<<16
    with k0/k1 the 16-bit chunks of K mod 2^32 (the c1 term only sees
    K's low 16 bits: c1*K*2^16 mod 2^32 = (c1*k0)<<16)."""
    c0, c1 = _split_c16(c)
    k0, k1 = [np.int32(v) for v in kch]
    return c0 * k0 + ((c0 * k1) << 16) + ((c1 * k0) << 16)


def _lsr32(x, k: int):
    if k == 0:
        return x
    return (x >> k) & np.int32((1 << (32 - k)) - 1)


def _decompose_planes(dlo, dhi, cfg: FusedConfig):
    """ct1 planes -> digit list [L] (weight-descending), each int32.

    Bit-exact re-expression of ops/decomposition.signed_decompose on
    (lo, hi) int32 planes (ref: commons/math/decomposition/decomposer.rs).
    """
    bl, L, bits = cfg.base_log, cfg.levels, cfg.bits
    blL = bl * L
    k = bits - blL - 1  # shift for x >> (non_rep - 1)
    mask_b = np.int32((1 << bl) - 1)
    one = np.int32(1)

    if bits == 32:
        st = _lsr32(dlo, k)
        st = (st >> 1) + (st & one)
        if blL < 32:
            st = st & np.int32((1 << blL) - 1)
        slo, shi = st, None
    elif blL + 1 <= 31:
        # state fits one plane; x >> k uses hi only (k >= 33)
        st = _lsr32(dhi, k - 32)
        st = (st >> 1) + (st & one)
        st = st & np.int32((1 << blL) - 1)
        slo, shi = st, None
    else:
        if k >= 32:
            slo = _lsr32(dhi, k - 32)
            shi = jnp.zeros_like(dhi)
        else:
            slo = _lsr32(dlo, k) | (dhi << (32 - k))
            shi = _lsr32(dhi, k)
        # (state + 1) >> 1 across planes
        slo2 = slo + one
        shi = shi + _ult(slo2, slo).astype(jnp.int32)
        slo = _lsr32(slo2, 1) | (shi << 31)
        shi = _lsr32(shi, 1)
        hi_bits = blL - 32
        shi = shi & np.int32((1 << hi_bits) - 1) if hi_bits < 32 else shi

    digits = []
    for _ in range(L):
        res = slo & mask_b
        if shi is None:
            slo = _lsr32(slo, bl)
        else:
            slo = _lsr32(slo, bl) | (shi << (32 - bl))
            shi = _lsr32(shi, bl)
        carry = _lsr32(((res - one) | slo) & res, bl - 1) & one
        if shi is None:
            slo = slo + carry
        else:
            slo2 = slo + carry
            shi = shi + _ult(slo2, slo).astype(jnp.int32)
            slo = slo2
        digits.append(res - (carry << bl))
    digits.reverse()  # largest weight (level 1) first
    return digits


# ---------------------------------------------------------------------------
# traced-modulus helpers (per-prime constants are loop-carried scalars in
# the one-kernel-per-step path, so the modulus arrives as a traced value)
# ---------------------------------------------------------------------------


def _fold_t(x, p, inv):
    q = jnp.round(x.astype(jnp.float32) * inv).astype(jnp.int32)
    return x - q * p


def _shoup_t(a, b, bs, p, inv):
    """Traced-modulus _shoup; see the drift notes there."""
    q = jax.lax.shift_right_arithmetic(a * bs, np.int32(16))
    r = a * b - q * p
    return _fold_t(r, p, inv)


def _horner_t(Y, nl: int, K: int, p, inv):
    """Traced-modulus lazy horner; see _horner for the drift argument."""
    Yv = Y.reshape(nl, K, Y.shape[-1])
    h = Yv[nl - 1]
    for j in range(nl - 2, -1, -1):
        h = _fold_t(h * 256 + Yv[j], p, inv)
    return h if nl > 1 else _fold_t(h, p, inv)


def _mulacc_c16_k64_t(lo, hi, c, k0, k1, k2, k3):
    """Traced-constant variant of _mulacc_c16_k64 (no static zero-skip)."""
    lo, hi = _u64_add_signed(lo, hi, c * k0)
    P1 = c * k1
    t = (P1 & 0xFFFF) << 16
    lo2 = lo + t
    hi = hi + _ult(lo2, lo).astype(jnp.int32) + (P1 >> 16)
    lo = lo2
    hi = hi + c * k2 + ((c * k3) << 16)
    return lo, hi


def _mulacc_c_k64_t(lo, hi, c, kch, ksch):
    """Traced variant of _mulacc_c_k64: kch/ksch are length-4 chunk lists."""
    c0, c1 = _split_c16(c)
    lo, hi = _mulacc_c16_k64_t(lo, hi, c0, *kch)
    return _mulacc_c16_k64_t(lo, hi, c1, *ksch)


def _low32_mul_t(c, k0, k1):
    c0, c1 = _split_c16(c)
    return c0 * k0 + ((c0 * k1) << 16) + ((c1 * k0) << 16)


# ---------------------------------------------------------------------------
# prime groups + stacked tables for the one-kernel-per-step path
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def prime_groups(cfg: FusedConfig) -> Tuple[Tuple[int, int, Tuple[int, ...]], ...]:
    """Consecutive primes sharing (nl, nlx) -> [(nl, nlx, indices), ...].

    The kernel runs one lax.fori_loop per group so limb-plane counts stay
    static (padding every prime to 3 limbs would cost ~1.5x on the small
    primes' matmuls — measured as the dominant per-step term)."""
    groups = []
    for i in range(len(cfg.primes)):
        key = (cfg.nl[i], cfg.nlx[i])
        if groups and groups[-1][0] == key:
            groups[-1][1].append(i)
        else:
            groups.append([key, [i]])
    return tuple((nl, nlx, tuple(idx)) for (nl, nlx), idx in groups)


@functools.lru_cache(maxsize=None)
def _host_tables_stacked(cfg: FusedConfig):
    """Per-group stacked tables + packed int constants (numpy).

    Returns (tabs, consts): tabs[g] = dict of [Pg, ...] arrays; consts[g] =
    [Pg, 11] int32 rows [p, k64(4), k64s(4), k32(2)].
    """
    per_prime = _host_tables_fused(cfg)
    tabs, consts = [], []
    for nl, nlx, idx in prime_groups(cfg):
        tabs.append({
            k: np.stack([per_prime[i][k] for i in idx])
            for k in _TABLE_KEYS
        })
        rows = []
        for i in idx:
            rows.append([cfg.primes[i], *cfg.k64[i], *cfg.k64s[i],
                         *cfg.k32[i]])
        consts.append(np.asarray(rows, dtype=np.int32))
    return tuple(tabs), tuple(consts)


_STACKED_DEVICE_CACHE: dict = {}


def build_tables_stacked(cfg: FusedConfig):
    """Device arrays for the grid kernel: per-group stacked tables (DFT limb
    planes as bf16) + SMEM constant rows.

    Hand-memoized (not lru_cache): this runs at trace time inside jitted
    PBS programs, where jnp.asarray yields tracers that must not be cached
    across traces (see ntt.dft_matrices_device)."""
    if cfg in _STACKED_DEVICE_CACHE:
        return _STACKED_DEVICE_CACHE[cfg]
    tabs_np, consts_np = _host_tables_stacked(cfg)
    tabs = tuple(
        tuple(
            jnp.asarray(t[k], jnp.bfloat16) if k in _BF16_KEYS
            else jnp.asarray(t[k])
            for k in _TABLE_KEYS)
        for t in tabs_np)
    consts = tuple(jnp.asarray(c) for c in consts_np)
    if not isinstance(consts[0], jax.core.Tracer):
        _STACKED_DEVICE_CACHE[cfg] = (tabs, consts)
    return tabs, consts


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

# Profiling-only ablation switches (see profile_step_ablation.py): when a
# stage name is in ABLATE, the traced step replaces that stage with a cheap
# shape-preserving stand-in so subtractive timing can attribute per-step cost.
# Empty in production; never set outside the profiler.
ABLATE: frozenset = frozenset()


def _forward_prime(X8, tabs, idx: int, cfg: FusedConfig, Bb: int):
    """X8 [(R*ld), C*B] digit limbs -> spectrum [K2, K1*B] balanced."""
    p = cfg.primes[idx]
    nl, nlx = cfg.nl[idx], cfg.nlx[idx]
    K1, K2, C = cfg.R, cfg.C, cfg.C
    W1A8, W2B8, _, _, TC, TCsh, _, _ = tabs[idx]
    YA = _dot8(W1A8, X8)
    y = _horner(YA, nl, K1, p)                      # [K1, C*B]
    y3 = y.reshape(K1, C, Bb)
    y3 = _shoup(y3, TC[:, :, None], TCsh[:, :, None], p)
    yt = jnp.transpose(y3, (1, 0, 2)).reshape(C, K1 * Bb)
    Y8 = _limb_rows(yt, nlx)                        # [C*nlx, K1*B]
    S = _dot8(W2B8, Y8)
    return _horner(S, nl, K2, p)                    # [K2, K1*B]


def _inverse_prime(macc, tabs, idx: int, cfg: FusedConfig, Bb: int):
    """spectrum MAC output [K2, K1*B] -> c_hat coefficients [N, B]."""
    p = cfg.primes[idx]
    nl, nlx = cfg.nl[idx], cfg.nlx[idx]
    K1, K2, C, R = cfg.R, cfg.C, cfg.C, cfg.R
    _, _, W2I8, W1I8, _, _, TIC, TICsh = tabs[idx]
    S8 = _limb_rows(macc, nlx)                      # [K2*nlx, K1*B]
    U = _dot8(W2I8, S8)
    u = _horner(U, nl, C, p)                        # [C, K1*B]
    u3 = u.reshape(C, K1, Bb)
    u3 = _shoup(u3, TIC[:, :, None], TICsh[:, :, None], p)
    ut = jnp.transpose(u3, (1, 0, 2)).reshape(K1, C * Bb)
    U8 = _limb_rows(ut, nlx)                        # [K1*nlx, C*B]
    V = _dot8(W1I8, U8)
    chat = _horner(V, nl, R, p)                     # [R, C*B]
    return chat.reshape(cfg.N, Bb)


def _rot_dec_limbs(cfg: FusedConfig, acc, abit, Bb: int):
    """Rotation + u64 subtract + signed decompose + shared digit limbs.

    acc [G, M, N, Bb] int32 planes; abit [1, 1, 1, Bb] rotation amounts.
    Returns X8 [LJ, R*ld, C*Bb] int8 digit-limb rows (shared across primes).
    """
    N, R, C = cfg.N, cfg.R, cfg.C
    G, L = cfg.glwe_size, cfg.levels
    nbits = (2 * N).bit_length() - 1  # log2(2N)
    # per-(g, plane) 2D rotations: 4D roll/select chains blow up the
    # Mosaic compiler; [2N, Bb] chains compile and vectorize cleanly
    ab2 = abit.reshape(1, abit.shape[-1])         # [1, Bb]

    def _rot2d(ext):
        for t in range(nbits):
            s = 1 << t
            rolled = jnp.concatenate([ext[-s:], ext[:-s]], axis=0)
            ext = jnp.where(((ab2 >> t) & 1) == 1, rolled, ext)
        return ext

    if "rot" in ABLATE:
        # profiling stand-in: skip the barrel chains, keep a data dependency
        rot_g = [(acc[g, 0] + ab2.astype(jnp.int32),
                  (acc[g, 1] if cfg.bits == 64 else None))
                 for g in range(G)]
    else:
        rot_g = []
        for g in range(G):
            if cfg.bits == 64:
                lo, hi = acc[g, 0], acc[g, 1]         # [N, Bb]
                nlo, nhi = _u64_neg(lo, hi)
                elo = _rot2d(jnp.concatenate([lo, nlo], axis=0))
                ehi = _rot2d(jnp.concatenate([hi, nhi], axis=0))
                rot_g.append((elo[:N], ehi[:N]))
            else:
                lo = acc[g, 0]
                elo = _rot2d(jnp.concatenate([lo, -lo], axis=0))
                rot_g.append((elo[:N], None))

    if cfg.bits == 64:
        subs = [_u64_sub(rot_g[g][0], rot_g[g][1], acc[g, 0], acc[g, 1])
                for g in range(G)]
        dlo = jnp.stack([s[0] for s in subs], axis=0)   # [G, N, Bb]
        dhi = jnp.stack([s[1] for s in subs], axis=0)
    else:
        dlo = jnp.stack([rot_g[g][0] - acc[g, 0] for g in range(G)], axis=0)
        dhi = None

    # digits rows (l, j): level-major, weight-descending
    digs = _decompose_planes(dlo, dhi, cfg)       # list[L] of [G, N, Bb]
    X8s = []
    for l in range(L):
        for j in range(G):
            d = digs[l][j]                        # [N, Bb]
            X8s.append(_limb_rows(d.reshape(R, C * Bb), cfg.ld))
    return jnp.stack(X8s, axis=0)                 # [LJ, R*ld, C*Bb] int8


def _prime_block(cfg: FusedConfig, tab_ip, ip: int, X8, khi_p, klo_p,
                 Bb: int):
    """Forward NTT + MAC + inverse NTT for one prime.

    X8 [LJ, R*ld, C*Bb] int8; khi_p/klo_p [N, LJ*OM] key slice of prime ip.
    Returns chat [OM, N, Bb] int32 balanced explicit-CRT coefficients.
    """
    N, R, C = cfg.N, cfg.R, cfg.C
    G, L, M = cfg.glwe_size, cfg.levels, cfg.planes
    LJ, OM = L * G, G * M
    p = cfg.primes[ip]
    tabs = [tab_ip] * (ip + 1)  # _forward_prime indexes tabs[ip]
    # khi_p/klo_p arrive pre-transposed [N, LJ*OM] from both callers
    # (prepare_bsk_fused stores the key as [n, N, P*LJ*OM])
    khi_t = khi_p.astype(jnp.int32)
    klo_t = klo_p.astype(jnp.int32)
    spec = [
        _forward_prime(X8[lj], tabs, ip, cfg, Bb).reshape(N, Bb)
        for lj in range(LJ)
    ]
    chats = []
    for o in range(G):
        for m in range(M):
            om = o * M + m
            # see _primes_crt_math: sum partial products before folding
            hi_sum = jnp.zeros((N, Bb), jnp.int32)
            lo_sum = jnp.zeros((N, Bb), jnp.int32)
            for lj in range(LJ):
                col = lj * OM + om
                hi_sum = hi_sum + spec[lj] * khi_t[:, col:col + 1]
                lo_sum = lo_sum + spec[lj] * klo_t[:, col:col + 1]
            t1 = _fold(hi_sum, p)
            macc = _fold(t1 * 256 + lo_sum, p).reshape(C, R * Bb)
            chats.append(_inverse_prime(macc, tabs, ip, cfg, Bb))
    return jnp.stack(chats, axis=0)               # [OM, N, Bb]


def _crt_accumulate(cfg: FusedConfig, chats, acc):
    """Streaming explicit-CRT: acc += sum_p chat_p * (M/p) - alpha * M.

    chats [P, OM, N, Bb] int32; acc [G, M, N, Bb] int32 planes.
    """
    N = cfg.N
    G, M = cfg.glwe_size, cfg.planes
    P = len(cfg.primes)
    Bb = acc.shape[-1]
    inv_p = [np.float32(1.0 / p) for p in cfg.primes]

    lo_acc = [acc[o, 0] for o in range(G)]
    hi_acc = [acc[o, 1] for o in range(G)] if cfg.bits == 64 else None
    for o in range(G):
        for m in range(M):
            om = o * M + m
            af = jnp.zeros((N, Bb), jnp.float32)
            for ip in range(P):
                chat = chats[ip, om]
                af = af + chat.astype(jnp.float32) * inv_p[ip]
                if cfg.bits == 64:
                    if m == 0:
                        lo_acc[o], hi_acc[o] = _mulacc_c_k64(
                            lo_acc[o], hi_acc[o], chat,
                            cfg.k64[ip], cfg.k64s[ip])
                    else:
                        hi_acc[o] = hi_acc[o] + _low32_mul(chat, cfg.k32[ip])
                else:
                    lo_acc[o] = lo_acc[o] + _low32_mul(chat, cfg.k32[ip])
            a0 = -jnp.round(af).astype(jnp.int32)
            if cfg.bits == 64:
                if m == 0:
                    lo_acc[o], hi_acc[o] = _mulacc_c16_k64(
                        lo_acc[o], hi_acc[o], a0, cfg.km64)
                else:
                    hi_acc[o] = hi_acc[o] + _low32_mul(a0, cfg.km32)
            else:
                lo_acc[o] = lo_acc[o] + _low32_mul(a0, cfg.km32)

    if cfg.bits == 64:
        return jnp.stack(
            [jnp.stack([lo_acc[o], hi_acc[o]], axis=0) for o in range(G)],
            axis=0)
    return jnp.stack([lo_acc[o][None] for o in range(G)], axis=0)


def _step_math(cfg: FusedConfig, tabs, khi_t, klo_t, acc, abit, Bb: int):
    """One blind-rotation step on accumulator planes (pure function).

    acc:  [G, M, N, Bb] int32 planes
    abit: [1, 1, 1, Bb] int32 rotation amounts in [0, 2N)
    khi_t/klo_t: [P, N, LJ*OM] int32 transposed key slice for this step
    """
    P = len(cfg.primes)

    X8 = _rot_dec_limbs(cfg, acc, abit, Bb)
    chats = jnp.stack(
        [_prime_block(cfg, tabs[ip], ip, X8, khi_t[ip], klo_t[ip], Bb)
         for ip in range(P)], axis=0)
    return _crt_accumulate(cfg, chats, acc)


def _forward_prime_t(X8_lj, W1A8, W2B8, TC, TCsh, nl: int, nlx: int,
                     p, inv, cfg: FusedConfig, Bb: int):
    """Traced-table forward NTT: X8_lj [(R*ld), C*B] -> spectrum [N, B]."""
    K1, K2, C = cfg.R, cfg.C, cfg.C
    YA = _dot8(W1A8, X8_lj)
    y = _horner_t(YA, nl, K1, p, inv)
    y3 = y.reshape(K1, C, Bb)
    y3 = _shoup_t(y3, TC[:, :, None], TCsh[:, :, None], p, inv)
    yt = jnp.transpose(y3, (1, 0, 2)).reshape(C, K1 * Bb)
    Y8 = _limb_rows(yt, nlx)
    S = _dot8(W2B8, Y8)
    return _horner_t(S, nl, K2, p, inv).reshape(cfg.N, Bb)


def _inverse_prime_t(macc, W2I8, W1I8, TIC, TICsh, nl: int, nlx: int,
                     p, inv, cfg: FusedConfig, Bb: int):
    """Traced-table inverse NTT: MAC output [C, R*B] -> chat [N, B]."""
    K1, K2, C, R = cfg.R, cfg.C, cfg.C, cfg.R
    S8 = _limb_rows(macc, nlx)
    U = _dot8(W2I8, S8)
    u = _horner_t(U, nl, C, p, inv)
    u3 = u.reshape(C, K1, Bb)
    u3 = _shoup_t(u3, TIC[:, :, None], TICsh[:, :, None], p, inv)
    ut = jnp.transpose(u3, (1, 0, 2)).reshape(K1, C * Bb)
    U8 = _limb_rows(ut, nlx)
    V = _dot8(W1I8, U8)
    return _horner_t(V, nl, R, p, inv).reshape(cfg.N, Bb)


def _ds0(ref, i):
    """ref[i] with a traced leading index (dynamic slice + squeeze);
    static python/numpy ints index directly (the unrolled prime loops
    feed concrete indices — raw np scalars crash pl.ds on TPU)."""
    if isinstance(i, (int, np.integer)):
        return ref[int(i)]
    return ref[pl.ds(i, 1)][0]


def _step_math_onekernel(cfg: FusedConfig, tab_refs, consts_refs, kh_at,
                         kl_at, acc, abit, Bb: int):
    """One blind-rotation step with group fori-loops over primes.

    Same math as _step_math, but per-prime tables/constants are read with a
    dynamic index inside the loop so the kernel body holds ONE prime body
    per (nl, nlx) group instead of all P unrolled — the unrolled body
    OOM-kills the Mosaic compile helper (PERF_NOTES.md).  Loop carries are
    TUPLES of per-plane arrays (.at[] on a stacked array lowers to
    scatter-add, unimplemented in Mosaic) and the loop counter is an
    explicit i32 scan carry (fori_loop's is i64 under x64, and Mosaic's
    i64->i32 convert helper recurses forever)."""
    X8 = _rot_dec_limbs(cfg, acc, abit, Bb)
    return _primes_crt_math(cfg, tab_refs, consts_refs, kh_at, kl_at, X8,
                            acc, Bb)


def _primes_crt_math_wide(cfg: FusedConfig, tab_refs, consts_refs, kh_at,
                          kl_at, X8w, acc, Bb: int):
    """OM-lane-batched variant of _primes_crt_math.

    The MAC results for all OM outputs lane-concatenate into [N, OM*B] so
    the inverse NTT runs ONCE per prime (OM in lanes) instead of OM times;
    the per-om chat slices come back out as contiguous lane blocks.  Math
    identical (exact integer ops throughout); only op granularity changes.
    (A fully-wide variant that also lane-batched the forward NTT needs a
    strided sublane slice to split per-lj spectra, which Mosaic lowers to
    an unsupported gather; the 4D broadcast MAC hit an unsupported shape
    cast — both measured round 4.)
    """
    N, R, C = cfg.N, cfg.R, cfg.C
    G, L, M = cfg.glwe_size, cfg.levels, cfg.planes
    LJ, OM = L * G, G * M
    K1, K2 = R, C

    lo_s = tuple(acc[o, 0] for o in range(G))
    hi_s = (tuple(acc[o, 1] for o in range(G)) if cfg.bits == 64
            else tuple())
    af = tuple(jnp.zeros((N, Bb), jnp.float32) for _ in range(OM))

    def _tset(tup, i, v):
        return tup[:i] + (v,) + tup[i + 1:]

    offset = 0
    for g, (nl, nlx, idx) in enumerate(prime_groups(cfg)):
        (W1A8r, W2B8r, W2I8r, W1I8r,
         TCr, TCshr, TICr, TICshr) = tab_refs[g]
        cr = consts_refs[g]

        def body(gip, carry, nl=nl, nlx=nlx, offset=offset, cr=cr,
                 W1A8r=W1A8r, W2B8r=W2B8r, W2I8r=W2I8r, W1I8r=W1I8r,
                 TCr=TCr, TCshr=TCshr, TICr=TICr, TICshr=TICshr):
            lo_s, hi_s, af = carry
            p = cr[gip, 0]
            inv = np.float32(1.0) / p.astype(jnp.float32)
            W1A8 = _ds0(W1A8r, gip)
            W2B8 = _ds0(W2B8r, gip)
            W2I8 = _ds0(W2I8r, gip)
            W1I8 = _ds0(W1I8r, gip)
            TC = _ds0(TCr, gip)
            TCsh = _ds0(TCshr, gip)
            TIC = _ds0(TICr, gip)
            TICsh = _ds0(TICshr, gip)
            kh = kh_at(np.int32(offset) + gip)     # [N, LJ*OM] int32
            kl = kl_at(np.int32(offset) + gip)

            # forward NTT per lj (a lane-batched variant needs a strided
            # sublane slice to split the spectra back out, which Mosaic
            # lowers to an unsupported gather — measured round 4)
            spec = [
                _forward_prime_t(X8w[lj], W1A8, W2B8, TC, TCsh, nl, nlx,
                                 p, inv, cfg, Bb)
                for lj in range(LJ)
            ]

            # MAC per om (proven column-slice pattern), lane-concat the OM
            # results so ONE inverse NTT per prime covers all outputs
            maccs = []
            for om in range(OM):
                hi_sum = jnp.zeros((N, Bb), jnp.int32)
                lo_sum = jnp.zeros((N, Bb), jnp.int32)
                for lj in range(LJ):
                    col = lj * OM + om
                    hi_sum = hi_sum + spec[lj] * kh[:, col:col + 1]
                    lo_sum = lo_sum + spec[lj] * kl[:, col:col + 1]
                t1 = _fold_t(hi_sum, p, inv)
                maccs.append(_fold_t(t1 * 256 + lo_sum, p, inv))
            macc = jnp.concatenate(maccs, axis=1)       # [N, OM*B]

            # inverse NTT, all OM columns in lanes
            macc_w = macc.reshape(C, R * OM * Bb)
            S8 = _limb_rows(macc_w, nlx)
            U = _dot8(W2I8, S8)
            u = _horner_t(U, nl, C, p, inv)        # [C, R*OM*B]
            u3 = u.reshape(C, K1, OM * Bb)
            u3 = _shoup_t(u3, TIC[:, :, None], TICsh[:, :, None], p, inv)
            ut = jnp.transpose(u3, (1, 0, 2)).reshape(K1, C * OM * Bb)
            U8 = _limb_rows(ut, nlx)
            V = _dot8(W1I8, U8)
            chatw = _horner_t(V, nl, R, p, inv)    # [R, C*OM*B]
            chat_w = chatw.reshape(N, OM * Bb)     # cols (om, b), om-major

            for o in range(G):
                for m in range(M):
                    om = o * M + m
                    chat = chat_w[:, om * Bb:(om + 1) * Bb]
                    af = _tset(af, om,
                               af[om] + chat.astype(jnp.float32) * inv)
                    if cfg.bits == 64:
                        if m == 0:
                            lo_o, hi_o = _mulacc_c_k64_t(
                                lo_s[o], hi_s[o], chat,
                                [cr[gip, 1 + t] for t in range(4)],
                                [cr[gip, 5 + t] for t in range(4)])
                            lo_s = _tset(lo_s, o, lo_o)
                            hi_s = _tset(hi_s, o, hi_o)
                        else:
                            hi_s = _tset(hi_s, o, hi_s[o] + _low32_mul_t(
                                chat, cr[gip, 9], cr[gip, 10]))
                    else:
                        lo_s = _tset(lo_s, o, lo_s[o] + _low32_mul_t(
                            chat, cr[gip, 9], cr[gip, 10]))
            return lo_s, hi_s, af

        def scan_body(carry, _, body=body):
            gip, state = carry
            return (gip + np.int32(1), body(gip, state)), None

        (_, (lo_s, hi_s, af)), _ = jax.lax.scan(
            scan_body, (np.int32(0), (lo_s, hi_s, af)), None,
            length=len(idx))
        offset += len(idx)

    lo_fin, hi_fin = [], []
    for o in range(G):
        lo_o = lo_s[o]
        hi_o = hi_s[o] if cfg.bits == 64 else None
        for m in range(M):
            om = o * M + m
            a0 = -jnp.round(af[om]).astype(jnp.int32)
            if cfg.bits == 64:
                if m == 0:
                    lo_o, hi_o = _mulacc_c16_k64(lo_o, hi_o, a0, cfg.km64)
                else:
                    hi_o = hi_o + _low32_mul(a0, cfg.km32)
            else:
                lo_o = lo_o + _low32_mul(a0, cfg.km32)
        lo_fin.append(lo_o)
        hi_fin.append(hi_o)
    if cfg.bits == 64:
        return jnp.stack(
            [jnp.stack([lo_fin[o], hi_fin[o]], axis=0) for o in range(G)],
            axis=0)
    return jnp.stack([lo_fin[o][None] for o in range(G)], axis=0)


def fused_blind_rotate_scan1w(cfg: FusedConfig, khi, klo, ahat, acc0_planes):
    """scan1 structure with the lane-batched (wide) step math: one kernel
    per step, forward NTT batched over LJ lanes, MAC/inverse NTT batched
    over OM lanes.  Bit-identical to the other modes."""
    import sys

    n_steps, B = ahat.shape
    G, M, N = cfg.glwe_size, cfg.planes, cfg.N
    nG = len(prime_groups(cfg))
    tabs, consts = build_tables_stacked(cfg)
    interp = jax.default_backend() != "tpu"
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    n_tab = 8 * nG

    def step_kernel(*refs):
        a_ref, kh_ref, kl_ref, acc_ref = refs[:4]
        tab_refs = [tuple(refs[4 + 8 * g + j] for j in range(8))
                    for g in range(nG)]
        consts_refs = [refs[4 + n_tab + g] for g in range(nG)]
        out_ref = refs[4 + n_tab + nG]
        abit = a_ref[...].reshape(1, 1, 1, B)
        x8 = _rot_dec_limbs(cfg, acc_ref[...], abit, B)

        def kh_at(ip):
            return _ds0(kh_ref, ip).astype(jnp.int32)

        def kl_at(ip):
            return _ds0(kl_ref, ip).astype(jnp.int32)

        out_ref[...] = _primes_crt_math_wide(
            cfg, tab_refs, consts_refs, kh_at, kl_at, x8, acc_ref[...], B)

    call = pl.pallas_call(
        step_kernel,
        in_specs=[vm] * 4 + [vm] * n_tab + [sm] * nG,
        out_specs=vm,
        out_shape=jax.ShapeDtypeStruct((G, M, N, B), jnp.int32),
        compiler_params=cparams,
        interpret=interp,
    )

    tabs_flat = [t for g_tabs in tabs for t in g_tabs]

    def step(acc, xs):
        a_row, kh, kl = xs
        return call(a_row[None], kh, kl, acc, *tabs_flat, *consts), None

    out, _ = jax.lax.scan(step, acc0_planes, (ahat, khi, klo))
    return out


def _make_grid_kernel(cfg: FusedConfig, n_steps: int, Bb: int):
    nG = len(prime_groups(cfg))

    def kernel(*refs):
        ahat_ref, acc0_ref, khi_ref, klo_ref = refs[:4]
        tab_refs = [tuple(refs[4 + 8 * g + j] for j in range(8))
                    for g in range(nG)]
        consts_refs = [refs[4 + 8 * nG + g] for g in range(nG)]
        out_ref = refs[4 + 9 * nG]
        acc_ref = refs[4 + 9 * nG + 1]
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _():
            acc_ref[...] = acc0_ref[0]

        a = ahat_ref[pl.ds(step, 1), :]
        abit = a.reshape(1, 1, 1, a.shape[-1])

        def kh_at(ip):
            return khi_ref[0, pl.ds(ip, 1)][0].astype(jnp.int32)

        def kl_at(ip):
            return klo_ref[0, pl.ds(ip, 1)][0].astype(jnp.int32)

        acc_ref[...] = _step_math_onekernel(
            cfg, tab_refs, consts_refs, kh_at, kl_at, acc_ref[...], abit, Bb)

        @pl.when(step == n_steps - 1)
        def _():
            out_ref[0] = acc_ref[...]

    return kernel


def _prime_unroll() -> int:
    """Unroll factor for the in-kernel prime-group scans.  Mosaic's scan
    lowering costs ~15-20 us PER ITERATION (measured round 4 on the
    multi-bit chains; the classic pc kernel's 5 prime iterations account
    for the ~84 us/step the stage ablation could not attribute).
    Unrolling trades first-compile time (~20 min per new shape through
    the remote compiler, then persistent-cached) for ~60 us/step: 480 ->
    535 PBS/s at 2_2 B=128.  Default ON; set TFHE_TPU_PRIME_UNROLL=0 for
    the plain scans when iterating on uncached shapes."""
    import os

    return int(os.environ.get("TFHE_TPU_PRIME_UNROLL", 1))


def _primes_crt_math(cfg: FusedConfig, tab_refs, consts_refs, kh_at, kl_at,
                     X8, acc, Bb: int):
    """Per-step math AFTER rotation/decompose: the prime-group fori loops
    (forward NTT + MAC + inverse NTT + streaming CRT) + alpha recovery.
    Shared by the one-kernel grid step and the scan2 two-kernel step."""
    N, R, C = cfg.N, cfg.R, cfg.C
    G, L, M = cfg.glwe_size, cfg.levels, cfg.planes
    LJ, OM = L * G, G * M

    lo_s = tuple(acc[o, 0] for o in range(G))
    hi_s = (tuple(acc[o, 1] for o in range(G)) if cfg.bits == 64
            else tuple())
    af = tuple(jnp.zeros((N, Bb), jnp.float32) for _ in range(OM))

    def _tset(tup, i, v):
        return tup[:i] + (v,) + tup[i + 1:]

    offset = 0
    for g, (nl, nlx, idx) in enumerate(prime_groups(cfg)):
        (W1A8r, W2B8r, W2I8r, W1I8r,
         TCr, TCshr, TICr, TICshr) = tab_refs[g]
        cr = consts_refs[g]

        def body(gip, carry, nl=nl, nlx=nlx, offset=offset, cr=cr,
                 W1A8r=W1A8r, W2B8r=W2B8r, W2I8r=W2I8r, W1I8r=W1I8r,
                 TCr=TCr, TCshr=TCshr, TICr=TICr, TICshr=TICshr):
            lo_s, hi_s, af = carry
            p = cr[gip, 0]
            inv = np.float32(1.0) / p.astype(jnp.float32)
            W1A8 = _ds0(W1A8r, gip)
            W2B8 = _ds0(W2B8r, gip)
            W2I8 = _ds0(W2I8r, gip)
            W1I8 = _ds0(W1I8r, gip)
            TC = _ds0(TCr, gip)
            TCsh = _ds0(TCshr, gip)
            TIC = _ds0(TICr, gip)
            TICsh = _ds0(TICshr, gip)
            kh = kh_at(np.int32(offset) + gip)     # [N, LJ*OM] int32
            kl = kl_at(np.int32(offset) + gip)

            if "fwd" in ABLATE:
                spec = [X8[lj].astype(jnp.int32)
                        .reshape(R, cfg.ld, C * Bb)
                        .sum(axis=1, dtype=jnp.int32)
                        .reshape(N, Bb) for lj in range(LJ)]
            else:
                spec = [
                    _forward_prime_t(X8[lj], W1A8, W2B8, TC, TCsh, nl, nlx,
                                     p, inv, cfg, Bb)
                    for lj in range(LJ)
                ]
            for o in range(G):
                for m in range(M):
                    om = o * M + m
                    if "mac" in ABLATE:
                        macc = _fold_t(spec[om % LJ] + kh[:, :1] + kl[:, :1],
                                       p, inv).reshape(C, R * Bb)
                    else:
                        # sum the hi/lo partial products over lj BEFORE
                        # folding: |sum spec*khi| <= LJ*(p/2)*(p/512+128)
                        # and |t1*256 + sum spec*klo| <= (p/2)*256 +
                        # LJ*(p/2)*128 both fit int32 for every catalog
                        # prime (asserted in make_config); the single final
                        # fold yields the same balanced representative as
                        # the per-term chain (2 folds/om instead of 2LJ+1)
                        hi_sum = jnp.zeros((N, Bb), jnp.int32)
                        lo_sum = jnp.zeros((N, Bb), jnp.int32)
                        for lj in range(LJ):
                            col = lj * OM + om
                            hi_sum = hi_sum + spec[lj] * kh[:, col:col + 1]
                            lo_sum = lo_sum + spec[lj] * kl[:, col:col + 1]
                        t1 = _fold_t(hi_sum, p, inv)
                        macc = _fold_t(t1 * 256 + lo_sum,
                                       p, inv).reshape(C, R * Bb)
                    if "inv" in ABLATE:
                        chat = macc.reshape(N, Bb)
                    else:
                        chat = _inverse_prime_t(macc, W2I8, W1I8, TIC, TICsh,
                                                nl, nlx, p, inv, cfg, Bb)
                    if "crt" in ABLATE:
                        lo_s = _tset(lo_s, o, lo_s[o] + chat)
                        continue
                    af = _tset(af, om,
                               af[om] + chat.astype(jnp.float32) * inv)
                    if cfg.bits == 64:
                        if m == 0:
                            lo_o, hi_o = _mulacc_c_k64_t(
                                lo_s[o], hi_s[o], chat,
                                [cr[gip, 1 + t] for t in range(4)],
                                [cr[gip, 5 + t] for t in range(4)])
                            lo_s = _tset(lo_s, o, lo_o)
                            hi_s = _tset(hi_s, o, hi_o)
                        else:
                            hi_s = _tset(hi_s, o, hi_s[o] + _low32_mul_t(
                                chat, cr[gip, 9], cr[gip, 10]))
                    else:
                        lo_s = _tset(lo_s, o, lo_s[o] + _low32_mul_t(
                            chat, cr[gip, 9], cr[gip, 10]))
            return lo_s, hi_s, af

        def scan_body(carry, _, body=body):
            gip, state = carry
            return (gip + np.int32(1), body(gip, state)), None

        if _prime_unroll():
            state = (lo_s, hi_s, af)
            for gi in range(len(idx)):
                state = body(gi, state)   # concrete index: static slices
            lo_s, hi_s, af = state
        else:
            (_, (lo_s, hi_s, af)), _ = jax.lax.scan(
                scan_body, (np.int32(0), (lo_s, hi_s, af)), None,
                length=len(idx))
        offset += len(idx)

    if "crt" in ABLATE:
        if cfg.bits == 64:
            return jnp.stack(
                [jnp.stack([lo_s[o], hi_s[o]], axis=0) for o in range(G)],
                axis=0)
        return jnp.stack([lo_s[o][None] for o in range(G)], axis=0)
    lo_fin, hi_fin = [], []
    for o in range(G):
        lo_o = lo_s[o]
        hi_o = hi_s[o] if cfg.bits == 64 else None
        for m in range(M):
            om = o * M + m
            a0 = -jnp.round(af[om]).astype(jnp.int32)
            if cfg.bits == 64:
                if m == 0:
                    lo_o, hi_o = _mulacc_c16_k64(lo_o, hi_o, a0, cfg.km64)
                else:
                    hi_o = hi_o + _low32_mul(a0, cfg.km32)
            else:
                lo_o = lo_o + _low32_mul(a0, cfg.km32)
        lo_fin.append(lo_o)
        hi_fin.append(hi_o)
    if cfg.bits == 64:
        return jnp.stack(
            [jnp.stack([lo_fin[o], hi_fin[o]], axis=0) for o in range(G)],
            axis=0)
    return jnp.stack([lo_fin[o][None] for o in range(G)], axis=0)


def fused_blind_rotate_scan2(cfg: FusedConfig, khi, klo, ahat, acc0_planes):
    """Two kernels per lax.scan step: the known-good rot/decompose kernel,
    then ONE primes+CRT kernel (group fori-loops) that updates the
    accumulator — a fallback between scan3 (7 launches/step) and the grid
    megakernel (whose bigger body stresses the Mosaic compiler)."""
    n_steps, B = ahat.shape
    G, M, N = cfg.glwe_size, cfg.planes, cfg.N
    P, LJ, OM = len(cfg.primes), cfg.levels * cfg.glwe_size, G * M
    W = LJ * OM
    nG = len(prime_groups(cfg))
    tabs, consts = build_tables_stacked(cfg)
    interp = jax.default_backend() != "tpu"
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

    def rot_kernel(a_ref, acc_ref, x8_ref):
        abit = a_ref[...].reshape(1, 1, 1, B)
        x8_ref[...] = _rot_dec_limbs(cfg, acc_ref[...], abit, B)

    rot_call = pl.pallas_call(
        rot_kernel,
        in_specs=[vm] * 2, out_specs=vm,
        out_shape=jax.ShapeDtypeStruct(
            (LJ, cfg.R * cfg.ld, cfg.C * B), jnp.int8),
        compiler_params=cparams,
        interpret=interp,
    )

    n_tab = 8 * nG

    def pc_kernel(*refs):
        x8_ref, kh_ref, kl_ref, acc_ref = refs[:4]
        tab_refs = [tuple(refs[4 + 8 * g + j] for j in range(8))
                    for g in range(nG)]
        consts_refs = [refs[4 + n_tab + g] for g in range(nG)]
        out_ref = refs[4 + n_tab + nG]

        def kh_at(ip):
            return _ds0(kh_ref, ip).astype(jnp.int32)

        def kl_at(ip):
            return _ds0(kl_ref, ip).astype(jnp.int32)

        out_ref[...] = _primes_crt_math(
            cfg, tab_refs, consts_refs, kh_at, kl_at, x8_ref[...],
            acc_ref[...], B)

    pc_call = pl.pallas_call(
        pc_kernel,
        in_specs=[vm] * 4 + [vm] * n_tab + [sm] * nG,
        out_specs=vm,
        out_shape=jax.ShapeDtypeStruct((G, M, N, B), jnp.int32),
        compiler_params=cparams,
        interpret=interp,
    )

    tabs_flat = [t for g_tabs in tabs for t in g_tabs]

    def step(acc, xs):
        a_row, kh, kl = xs                      # kh/kl [P, N, W]
        x8 = rot_call(a_row[None], acc)
        return pc_call(x8, kh, kl, acc, *tabs_flat, *consts), None

    out, _ = jax.lax.scan(step, acc0_planes, (ahat, khi, klo))
    return out


def fused_blind_rotate_scan1(cfg: FusedConfig, khi, klo, ahat, acc0_planes):
    """ONE kernel per lax.scan step: rotation/decompose + prime-group
    fori-loops + streaming CRT in the same body.  Saves a launch and the X8
    HBM round-trip (plus one 8MB accumulator re-read) per step vs scan2.
    Distinct from the grid mode: the accumulator still round-trips HBM
    between scan steps, so the kernel body is the only difference — the
    grid variant's acc-resident body is what hangs the Mosaic compiler."""
    import sys

    n_steps, B = ahat.shape
    G, M, N = cfg.glwe_size, cfg.planes, cfg.N
    P, LJ, OM = len(cfg.primes), cfg.levels * cfg.glwe_size, G * M
    W = LJ * OM
    nG = len(prime_groups(cfg))
    tabs, consts = build_tables_stacked(cfg)
    interp = jax.default_backend() != "tpu"
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    n_tab = 8 * nG

    def step_kernel(*refs):
        a_ref, kh_ref, kl_ref, acc_ref = refs[:4]
        tab_refs = [tuple(refs[4 + 8 * g + j] for j in range(8))
                    for g in range(nG)]
        consts_refs = [refs[4 + n_tab + g] for g in range(nG)]
        out_ref = refs[4 + n_tab + nG]
        abit = a_ref[...].reshape(1, 1, 1, B)
        x8 = _rot_dec_limbs(cfg, acc_ref[...], abit, B)

        def kh_at(ip):
            return _ds0(kh_ref, ip).astype(jnp.int32)

        def kl_at(ip):
            return _ds0(kl_ref, ip).astype(jnp.int32)

        out_ref[...] = _primes_crt_math(
            cfg, tab_refs, consts_refs, kh_at, kl_at, x8, acc_ref[...], B)

    call = pl.pallas_call(
        step_kernel,
        in_specs=[vm] * 4 + [vm] * n_tab + [sm] * nG,
        out_specs=vm,
        out_shape=jax.ShapeDtypeStruct((G, M, N, B), jnp.int32),
        compiler_params=cparams,
        interpret=interp,
    )

    tabs_flat = [t for g_tabs in tabs for t in g_tabs]

    def step(acc, xs):
        a_row, kh, kl = xs                      # kh/kl [P, N, W]
        return call(a_row[None], kh, kl, acc, *tabs_flat, *consts), None

    out, _ = jax.lax.scan(step, acc0_planes, (ahat, khi, klo))
    return out


def fused_blind_rotate_grid(cfg: FusedConfig, khi, klo, ahat, acc0_planes):
    """Blind rotation as ONE pallas kernel with grid=(batch blocks, steps):
    the accumulator lives in VMEM scratch across steps, primes run in
    lax.fori_loops inside the kernel, and per-step HBM traffic is just the
    [P, N, LJ*OM] key slice stream (PERF_NOTES.md round-3 plan #1+#3)."""
    import sys

    n_steps, B = ahat.shape
    G, M, N = cfg.glwe_size, cfg.planes, cfg.N
    P, LJ, OM = len(cfg.primes), cfg.levels * cfg.glwe_size, G * M
    W = LJ * OM
    Bb = _pick_bblk(B)
    nblk = B // Bb
    tabs, consts = build_tables_stacked(cfg)
    interp = jax.default_backend() != "tpu"
    # the step jaxpr (barrel chains + per-group fori bodies) lowers through
    # deeply recursive MLIR emission; the default 1000 limit trips mid-lower
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)

    acc0_b = jnp.moveaxis(acc0_planes.reshape(G, M, N, nblk, Bb), 3, 0)
    kernel = _make_grid_kernel(cfg, n_steps, Bb)
    z = np.int32(0)
    tdim = lambda nd: (lambda b, i: (z,) * nd)
    in_specs = [
        pl.BlockSpec((n_steps, Bb), lambda b, i: (z, b),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, M, N, Bb), lambda b, i: (b, z, z, z, z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P, N, W), lambda b, i: (i, z, z, z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P, N, W), lambda b, i: (i, z, z, z),
                     memory_space=pltpu.VMEM),
    ]
    flat_ops = []
    for g_tabs in tabs:
        for t in g_tabs:
            in_specs.append(
                pl.BlockSpec(t.shape, tdim(t.ndim),
                             memory_space=pltpu.VMEM))
            flat_ops.append(t)
    for c in consts:
        in_specs.append(
            pl.BlockSpec(c.shape, tdim(c.ndim),
                         memory_space=pltpu.SMEM))
        flat_ops.append(c)
    out = pl.pallas_call(
        kernel,
        grid=(nblk, n_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, G, M, N, Bb),
                               lambda b, i: (b, z, z, z, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, G, M, N, Bb), jnp.int32),
        scratch_shapes=[pltpu.VMEM((G, M, N, Bb), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interp,
    )(ahat, acc0_b, khi, klo, *flat_ops)
    return jnp.moveaxis(out, 0, 3).reshape(G, M, N, B)


def _make_kernel(cfg: FusedConfig, n_steps: int, Bb: int):
    P = len(cfg.primes)

    def kernel(ahat_ref, acc0_ref, khi_ref, klo_ref, *rest):
        tabs_flat = rest[:8 * P]
        out_ref = rest[8 * P]
        acc_ref = rest[8 * P + 1]
        tabs = tuple(
            tuple(tabs_flat[8 * i + j][...] for j in range(8))
            for i in range(P)
        )
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _():
            acc_ref[...] = acc0_ref[0]

        a = ahat_ref[pl.ds(step, 1), :]           # [1, Bb] int32
        abit = a.reshape(1, 1, 1, a.shape[-1])
        khi_t = khi_ref[0].astype(jnp.int32)   # [P, N, LJ*OM] pre-transposed
        klo_t = klo_ref[0].astype(jnp.int32)
        acc_ref[...] = _step_math(cfg, tabs, khi_t, klo_t, acc_ref[...],
                                  abit, Bb)

        @pl.when(step == n_steps - 1)
        def _():
            out_ref[0] = acc_ref[...]

    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrapper + plane conversions
# ---------------------------------------------------------------------------


def _to_planes(x, bits: int):
    """[B, G, N] uint -> [G, M, N, B] int32 bit-pattern planes."""
    if bits == 64:
        lo = jax.lax.bitcast_convert_type(
            (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.int32)
        hi = jax.lax.bitcast_convert_type(
            (x >> jnp.uint64(32)).astype(jnp.uint32), jnp.int32)
        pl_ = jnp.stack([lo, hi], axis=1)        # [B, M, G, N]? no:
        # lo/hi are [B, G, N]; stack axis=1 -> [B, M, G, N]
        return jnp.transpose(pl_, (2, 1, 3, 0))  # [G, M, N, B]
    lo = jax.lax.bitcast_convert_type(x.astype(jnp.uint32), jnp.int32)
    return jnp.transpose(lo[:, None], (2, 1, 3, 0))  # [G, 1, N, B]


def _from_planes(planes, bits: int):
    """[G, M, N, B] int32 planes -> [B, G, N] uint."""
    if bits == 64:
        lo = jax.lax.bitcast_convert_type(planes[:, 0], jnp.uint32)
        hi = jax.lax.bitcast_convert_type(planes[:, 1], jnp.uint32)
        x = lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))
        return jnp.transpose(x, (2, 0, 1))       # [B, G, N]
    lo = jax.lax.bitcast_convert_type(planes[:, 0], jnp.uint32)
    return jnp.transpose(lo, (2, 0, 1))


def _pick_bblk(B: int) -> int:
    if B >= 128 and B % 128 == 0:
        return 128
    return B


def fused_blind_rotate_scan(cfg: FusedConfig, tables, khi, klo,
                            ahat, acc0_planes):
    """Blind rotation as a lax.scan of three Pallas kernels per step.

    The full-step body OOMs the Mosaic compiler, so each step is split at
    its natural seams into units that compile comfortably:
      1. rotate + u64 subtract + decompose + shared digit limbs -> X8
      2. per-prime forward NTT + spectrum MAC + inverse NTT -> chat_p
      3. streaming explicit-CRT accumulate into the u64 planes.
    Extra HBM traffic per step (X8 + chats + acc round-trips) is ~60MB,
    well under the per-step compute time at batch 128.
    """
    n_steps, B = ahat.shape
    G, M, N = cfg.glwe_size, cfg.planes, cfg.N
    P, LJ, OM = len(cfg.primes), cfg.levels * cfg.glwe_size, G * M
    interp = jax.default_backend() != "tpu"
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def rot_kernel(a_ref, acc_ref, x8_ref):
        abit = a_ref[...].reshape(1, 1, 1, B)
        x8_ref[...] = _rot_dec_limbs(cfg, acc_ref[...], abit, B)

    rot_call = pl.pallas_call(
        rot_kernel,
        in_specs=[vm] * 2, out_specs=vm,
        out_shape=jax.ShapeDtypeStruct(
            (LJ, cfg.R * cfg.ld, cfg.C * B), jnp.int8),
        compiler_params=cparams,
        interpret=interp,
    )

    def make_prime_call(ip):
        def prime_kernel(x8_ref, kh_ref, kl_ref, *rest):
            tab_ip = tuple(rest[:8])
            out_ref = rest[8]
            out_ref[...] = _prime_block(
                cfg, tuple(t[...] for t in tab_ip), ip, x8_ref[...],
                kh_ref[...], kl_ref[...], B)

        return pl.pallas_call(
            prime_kernel,
            in_specs=[vm] * 11, out_specs=vm,
            out_shape=jax.ShapeDtypeStruct((OM, N, B), jnp.int32),
            compiler_params=cparams,
            interpret=interp,
        )

    prime_calls = [make_prime_call(ip) for ip in range(P)]

    def crt_kernel(chats_ref, acc_ref, out_ref):
        out_ref[...] = _crt_accumulate(cfg, chats_ref[...], acc_ref[...])

    crt_call = pl.pallas_call(
        crt_kernel,
        in_specs=[vm] * 2, out_specs=vm,
        out_shape=jax.ShapeDtypeStruct((G, M, N, B), jnp.int32),
        compiler_params=cparams,
        interpret=interp,
    )

    tables_flat = tuple(tables)

    def step(acc, xs):
        a_row, kh, kl = xs                      # kh/kl [P, N, LJ*OM]
        x8 = rot_call(a_row[None], acc)
        chats = jnp.stack(
            [prime_calls[ip](x8, kh[ip], kl[ip], *tables_flat[ip])
             for ip in range(P)], axis=0)
        return crt_call(chats, acc), None

    out, _ = jax.lax.scan(step, acc0_planes, (ahat, khi, klo))
    return out


def fused_blind_rotate_planes(cfg: FusedConfig, tables, khi, klo,
                              ahat, acc0_planes):
    """Run the fused kernel.

    ahat:        [n, B] int32 mod-switched mask (values in [0, 2N])
    acc0_planes: [G, M, N, B] int32
    returns      [G, M, N, B] int32 updated accumulator planes.

    Mode (TFHE_TPU_FUSED_MODE): "grid" = one kernel with grid-over-steps,
    group fori-loops over primes, acc in VMEM scratch; "scan2" (default) =
    lax.scan with rot kernel + one primes/CRT kernel per step; "scan3" =
    lax.scan of three kernels per step; "mega" = legacy unrolled-prime
    megakernel.
    """
    import os

    # ABLATE is a profiling-only switch (profile_step_ablation.py); a trace
    # taken while it is set would bake garbage-math stand-ins into cached
    # executables, so refuse it outside an explicitly-opted-in profiler run.
    assert not ABLATE or os.environ.get("TFHE_TPU_ABLATE_OK") == "1", (
        "fused_pbs.ABLATE is set outside a profiling run "
        "(set TFHE_TPU_ABLATE_OK=1 in the profiler)")

    mode = os.environ.get("TFHE_TPU_FUSED_MODE", "scan2")
    if os.environ.get("TFHE_TPU_MEGAKERNEL", "0") == "1":  # legacy switch
        mode = "mega"
    if mode == "grid":
        return fused_blind_rotate_grid(cfg, khi, klo, ahat, acc0_planes)
    if mode == "scan1":
        return fused_blind_rotate_scan1(cfg, khi, klo, ahat, acc0_planes)
    if mode == "scan1w":
        return fused_blind_rotate_scan1w(cfg, khi, klo, ahat, acc0_planes)
    if mode == "scan2":
        return fused_blind_rotate_scan2(cfg, khi, klo, ahat, acc0_planes)
    if mode == "scan3":
        return fused_blind_rotate_scan(cfg, tables, khi, klo, ahat,
                                       acc0_planes)
    n_steps, B = ahat.shape
    G, M, N = cfg.glwe_size, cfg.planes, cfg.N
    P, LJ, OM = len(cfg.primes), cfg.levels * cfg.glwe_size, G * M
    Bb = _pick_bblk(B)
    nblk = B // Bb
    n_pad = -(-n_steps // 8) * 8
    if n_pad != n_steps:
        ahat = jnp.concatenate(
            [ahat, jnp.zeros((n_pad - n_steps, B), jnp.int32)], axis=0)

    # [G, M, N, B] -> [nblk, G, M, N, Bb]
    acc0_b = jnp.moveaxis(
        acc0_planes.reshape(G, M, N, nblk, Bb), 3, 0)

    kernel = _make_kernel(cfg, n_steps, Bb)
    grid = (nblk, n_steps)
    # index maps must return int32 everywhere: with jax_enable_x64 a python
    # literal 0 traces as i64 and Mosaic refuses the (i64, ...) index fn
    z = np.int32(0)
    tdim = lambda nd: (lambda b, i: (z,) * nd)
    in_specs = [
        pl.BlockSpec((n_pad, Bb), lambda b, i: (z, b),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, M, N, Bb), lambda b, i: (b, z, z, z, z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P, N, LJ * OM), lambda b, i: (i, z, z, z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P, N, LJ * OM), lambda b, i: (i, z, z, z),
                     memory_space=pltpu.VMEM),
    ]
    tables_flat = [t for prime_tabs in tables for t in prime_tabs]
    for t in tables_flat:
        in_specs.append(
            pl.BlockSpec(t.shape, tdim(t.ndim), memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, G, M, N, Bb),
                               lambda b, i: (b, z, z, z, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, G, M, N, Bb), jnp.int32),
        scratch_shapes=[pltpu.VMEM((G, M, N, Bb), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(ahat, acc0_b, khi, klo, *tables_flat)
    return jnp.moveaxis(out, 0, 3).reshape(G, M, N, B)


# ---------------------------------------------------------------------------
# prepared BSK (fused layout) + blind rotate entry point
# ---------------------------------------------------------------------------


@dataclass
class PreparedBskFused:
    """BSK spectra in fused-kernel order.

    khi/klo: [n, P, N, LJ*OM] int16/int8 hi/lo bytes of the balanced
    per-prime key spectra, spectrum index k2-major k1-minor along N.
    (ref: lwe_bootstrap_key_conversion.rs:21 — the standard->transform-domain
    key conversion, here to the exact CRT-NTT domain.)
    """

    khi: Any
    klo: Any
    tables: Any
    cfg: FusedConfig
    base_log: int
    levels: int
    glwe_size: int
    polynomial_size: int
    input_dim: int
    bits: int = 64


jax.tree_util.register_pytree_node(
    PreparedBskFused,
    lambda b: ((b.khi, b.klo, b.tables),
               (b.cfg, b.base_log, b.levels, b.glwe_size, b.polynomial_size,
                b.input_dim, b.bits)),
    lambda meta, data: PreparedBskFused(data[0], data[1], data[2], *meta),
)


def _spectrum_reorder(spec_flat, R: int, C: int):
    """[..., N] flat (k1*C + k2) -> [..., N] flat (k2*R + k1)."""
    lead = spec_flat.shape[:-1]
    s = spec_flat.reshape(*lead, R, C)
    return jnp.swapaxes(s, -1, -2).reshape(*lead, R * C)


@functools.partial(jax.jit, static_argnums=(1,))
def _prepare_bsk_fused_device(k, cfg: FusedConfig):
    """Device half of prepare_bsk_fused: [n, L, J, O, N] uint -> (khi, klo).

    One jitted program (instead of ~30 eager dispatches): through the remote
    TPU tunnel each eager op pays ~1 s of compile RPC on first use per
    process, which made key prep ~50 s; as a single executable it is one
    persistently-cached compile and then sub-second.
    """
    n, L, J, O, N = k.shape
    bits = cfg.bits
    R, C = cfg.R, cfg.C
    M = cfg.planes
    if bits == 64:
        planes = jnp.stack(
            [jax.lax.bitcast_convert_type(
                ((k >> jnp.uint64(s)) & jnp.uint64(0xFFFFFFFF)).astype(
                    jnp.uint32), jnp.int32)
             for s in (0, 32)], axis=-2)          # [n, L, J, O, M, N]
    else:
        planes = jax.lax.bitcast_convert_type(
            k.astype(jnp.uint32), jnp.int32)[..., None, :]
    spec_all = ntt.forward_ntt(planes, u32_bits=True)  # per ntt.PRIMES
    prime_idx = [ntt.PRIMES.index(p) for p in cfg.primes]
    spec = jnp.stack([spec_all[i] for i in prime_idx])  # [P, n, L, J, O, M, N]
    spec = _spectrum_reorder(spec, R, C)
    # [P, n, L, J, O, M, N] -> [n, P, L*J, O*M, N]
    spec = jnp.moveaxis(spec, 0, 1)
    # dims now [n, P, L, J, O, M, N]; the MAC contracts the GGSW row index
    # j against the accumulator row and outputs poly o (ref: ggsw.rs
    # update_with_fmadd) — rows (l, j) level-major, outputs (o, m); the
    # (LJ, OM) dims merge so the per-(step, prime) slice is a 2D tile
    spec = spec.reshape(n, len(cfg.primes), L * J * O * M, N)
    # pre-transpose to [n, P, N, LJ*OM]: the MAC consumes key columns as
    # [N, 1] sublane-broadcast vectors, and the lane->sublane transpose is
    # ~10us per prime per step when done in-kernel; P stays a leading dim
    # so the grid kernel can dynamic-index primes inside its fori_loop
    spec = jnp.swapaxes(spec, 2, 3)
    klo = ((spec + 128) & 255) - 128
    khi = ((spec - klo) >> 8).astype(jnp.int16)
    klo = klo.astype(jnp.int8)
    return khi, klo


def prepare_bsk_fused(bsk_standard: np.ndarray, base_log: int,
                      bits: int = 64) -> PreparedBskFused:
    """Standard-domain BSK [n, L, J, O, N] uint -> fused-kernel key."""
    n, L, J, O, N = bsk_standard.shape
    cfg = make_config(N, J, L, base_log, bits)
    khi, klo = _prepare_bsk_fused_device(jnp.asarray(bsk_standard), cfg)
    return PreparedBskFused(
        khi=khi, klo=klo, tables=build_tables_device(cfg), cfg=cfg,
        base_log=base_log, levels=L, glwe_size=J, polynomial_size=N,
        input_dim=n, bits=bits,
    )


def _blind_rotate_fused_chunk(bsk: PreparedBskFused, lut, lwe):
    """One lane-aligned batch chunk through the fused kernel."""
    from . import polymul
    from ..core.pbs import modulus_switch

    cfg = bsk.cfg
    bits, N = cfg.bits, cfg.N
    b_hat = modulus_switch(lwe[:, -1], N, bits=bits)      # [B]
    acc0 = polymul.monomial_div(lut, b_hat[:, None], N, bits=bits)
    ahat = modulus_switch(lwe[:, :-1], N, bits=bits)      # [B, n]
    ahat = jnp.transpose(ahat) & np.int32(2 * N - 1)      # [n, B]

    acc0_planes = _to_planes(acc0, bits)
    out_planes = fused_blind_rotate_planes(
        cfg, bsk.tables, bsk.khi, bsk.klo, ahat, acc0_planes)
    return _from_planes(out_planes, bits)


def _batch_chunk_max(cfg: FusedConfig) -> int:
    """Per-kernel batch ceiling, scaled to the kernel's VMEM footprint.

    The working set scales with G*M*N bytes per batch lane; B=128 is the
    measured v5e sweet spot at 2_2 shapes (64 KB/lane — B=256 in one
    kernel ran at 349 vs 421 PBS/s from VMEM spills, PERF_NOTES.md), so
    the ceiling holds the accumulator budget at 128 lanes x 64 KB and
    widens for smaller parameter sets (boolean's 8 KB/lane kernels ran
    BEST at B=1024 in one kernel, BENCH_SUITE_r04).  Larger batches run
    as a lax.map over ceiling-wide chunks: throughput scales linearly
    and the compiled program holds ONE copy of the step kernel at any
    batch (this un-wedged the batch-64 radix and batched-strings
    compiles, BENCH_SUITE_r04.json:20)."""
    import os

    env = os.environ.get("TFHE_TPU_PBS_BMAX")
    if env:
        return int(env)
    lane_bytes = cfg.glwe_size * cfg.planes * cfg.N * 4
    return 128 * max(1, min(8, 65536 // lane_bytes))


def blind_rotate_fused(bsk: PreparedBskFused, lut, lwe):
    """lut [B, G, N] or [G, N] uint, lwe [B, n+1] uint -> [B, G, N] uint.

    Bit-identical to ops/polymul_ntt-based blind_rotate (ref:
    bootstrap.rs:242-331); the heavy loop runs in the fused Pallas kernel,
    chunked over the batch axis (see _batch_chunk_max).
    """
    cfg = bsk.cfg
    bits = cfg.bits
    dt = jnp.uint64 if bits == 64 else jnp.uint32
    lwe = jnp.asarray(lwe, dt)
    B0 = lwe.shape[0]
    # the kernel's [N, B] -> [R, C*B] views need lane-aligned batches on
    # real hardware; pad by replicating row 0 and slice the result back
    align = 128 if jax.default_backend() == "tpu" else 8
    B = -(-B0 // align) * align
    if B != B0:
        lwe = jnp.concatenate(
            [lwe, jnp.broadcast_to(lwe[:1], (B - B0,) + lwe.shape[1:])])
    lut = jnp.asarray(lut, dt)
    if lut.ndim == 2:
        lut = jnp.broadcast_to(lut[None], (B,) + lut.shape)
    elif lut.shape[0] != B:
        lut = jnp.concatenate(
            [lut, jnp.broadcast_to(lut[:1], (B - B0,) + lut.shape[1:])])

    bmax = _batch_chunk_max(cfg)
    if B > bmax and B % bmax == 0:
        k = B // bmax
        lut_c = lut.reshape((k, bmax) + lut.shape[1:])
        lwe_c = lwe.reshape((k, bmax) + lwe.shape[1:])
        out = jax.lax.map(
            lambda xs: _blind_rotate_fused_chunk(bsk, xs[0], xs[1]),
            (lut_c, lwe_c))
        return out.reshape((B,) + out.shape[2:])[:B0]
    return _blind_rotate_fused_chunk(bsk, lut, lwe)[:B0]

"""Fused multi-bit blind rotation: the grouped PBS hot loop in VMEM.

Multi-bit analog of ops/fused_pbs.py (ref: core_crypto/algorithms/
lwe_multi_bit_programmable_bootstrapping.rs:295-460 blind rotation,
:18-84 prepare_multi_bit_ggsw): per group of gf secret bits the combined
GGSW  G = GGSW_0 + sum_{j>=1} GGSW_j * X^{switch(<a_S, 1>)}  replaces the
accumulator by the external product G (x) acc, in n/gf scan steps.

TPU formulation (one Pallas kernel per step):

- The 2^gf subset GGSWs are NTT-transformed ONCE at key prep (same
  khi/klo split layout as the classic fused key); no key-side transform
  ever runs on the hot path (the reference FFTs the combined GGSW every
  step and hides it with a thread pool).
- The combination happens in the spectrum domain.  The spectrum of X^d at
  stored position q is psi^(d * (2*knat[q] + 1)), so each per-lane
  monomial spectrum is a product over the bits of d of STATIC psi-power
  vectors (Shoup-multiplied select chains — no gathers, which Mosaic
  does not support).  Composite subsets factor as products of singleton
  monomials times an epsilon correction in {-1, 0, +1} that accounts for
  the modulus-switch rounding of sums vs sums of roundings
  (switch(a+b) - switch(a) - switch(b) is in {-1,0,1} for the
  round-half-up switch); epsilon is computed exactly at trace level and
  applied from two static psi^(+-(2k+1)) tables.
- The combined key folds to balanced residues, splits into 8-bit hi/lo
  pieces in-kernel, and feeds the same sum-before-fold MAC as the classic
  kernel; the inverse NTT runs once per prime with all OM outputs
  lane-batched; the streaming explicit CRT starts from ZERO planes (the
  external product REPLACES the accumulator: G encrypts a unit monomial).

All arithmetic is exact; the result is bit-identical to the jnp path in
core/multibit.py (asserted in tests/test_fused_multibit.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ntt
from .fused_pbs import (
    FusedConfig,
    make_config,
    prime_groups,
    build_tables_stacked,
    _bal,
    _decompose_planes,
    _limb_rows,
    _forward_prime_t,
    _inverse_prime_t,
    _dot8,
    _fold_t,
    _shoup_t,
    _horner_t,
    _ds0,
    _mulacc_c_k64_t,
    _low32_mul_t,
    _mulacc_c16_k64,
    _low32_mul,
    _prepare_bsk_fused_device,
    _to_planes,
    _from_planes,
)


def _mb_factor(j: int):
    """Composite subset j -> (ja, jb) with jb the lowest set bit; the
    trace-level epsilon and the kernel monomial assembly must agree on
    this factorization."""
    jb = j & (-j)
    return j ^ jb, jb


def _composites(per: int):
    """Subset indices with >= 2 members, dependency-ordered (every ja of a
    composite appears earlier or is a singleton)."""
    return sorted((j for j in range(per) if bin(j).count("1") >= 2),
                  key=lambda j: (bin(j).count("1"), j))


# ---------------------------------------------------------------------------
# monomial-spectrum tables
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _host_mon_tables(cfg: FusedConfig):
    """Per-prime-group stacked psi-power tables for in-kernel monomial
    spectra: psi2t[t][q] = psi^(2^t * (2*knat_f[q]+1) mod 2N) balanced,
    plus the epsilon vectors psi^(+-(2k+1)) — each with Shoup companions.
    knat_f is the natural DFT index at each FUSED spectrum position
    (k2-major reorder of ntt.spectrum_natural_k)."""
    N, R, C = cfg.N, cfg.R, cfg.C
    nbits = (2 * N).bit_length() - 1
    knat = ntt.spectrum_natural_k(N).reshape(R, C).T.reshape(-1)
    tk = (2 * knat.astype(np.int64) + 1) % (2 * N)
    out = []
    for nl, nlx, idx in prime_groups(cfg):
        rows = {k: [] for k in ("psi2t", "psi2tsh", "epsP", "epsPsh",
                                "epsM", "epsMsh")}
        for i in idx:
            p = cfg.primes[i]
            g = ntt._find_generator(p)
            psi = ntt._pow_mod(g, (p - 1) // (2 * N), p)
            psi_t = np.array([ntt._pow_mod(psi, t, p) for t in range(2 * N)],
                             dtype=np.int64)

            def vec(e):
                v = _bal(psi_t[(e * tk) % (2 * N)], p).astype(np.int32)
                return v, ntt.shoup_precompute_host(v, p).astype(np.int32)

            p2, p2s = zip(*[vec(1 << t) for t in range(nbits)])
            eP, ePs = vec(1)
            eM, eMs = vec(2 * N - 1)
            rows["psi2t"].append(np.stack(p2))
            rows["psi2tsh"].append(np.stack(p2s))
            rows["epsP"].append(eP)
            rows["epsPsh"].append(ePs)
            rows["epsM"].append(eM)
            rows["epsMsh"].append(eMs)
        out.append({k: np.stack(v) for k, v in rows.items()})
    return tuple(out)


_MON_KEYS = ("psi2t", "psi2tsh", "epsP", "epsPsh", "epsM", "epsMsh")
_MON_DEVICE_CACHE: dict = {}


def build_mon_tables_stacked(cfg: FusedConfig):
    if cfg in _MON_DEVICE_CACHE:
        return _MON_DEVICE_CACHE[cfg]
    host = _host_mon_tables(cfg)
    tabs = tuple(
        tuple(jnp.asarray(t[k]) for k in _MON_KEYS) for t in host)
    if not isinstance(tabs[0][0], jax.core.Tracer):
        _MON_DEVICE_CACHE[cfg] = tabs
    return tabs


_MON_ALL_DEVICE_CACHE: dict = {}


def build_mon_tables_allprime(cfg: FusedConfig):
    """Mon tables + CRT consts stacked over ALL primes (their shapes are
    uniform, unlike the NTT limb tables), so the combine kernel can grid
    over primes with plain block specs."""
    if cfg in _MON_ALL_DEVICE_CACHE:
        return _MON_ALL_DEVICE_CACHE[cfg]
    host = _host_mon_tables(cfg)
    cat = {k: np.concatenate([t[k] for t in host], axis=0)
           for k in _MON_KEYS}
    # eps vectors ride as [P, 1, N] so per-prime blocks keep their last
    # two dims equal to the array's (Pallas TPU block-shape rule)
    for k in ("epsP", "epsPsh", "epsM", "epsMsh"):
        cat[k] = cat[k][:, None, :]
    tabs = tuple(jnp.asarray(cat[k]) for k in _MON_KEYS)
    pconst = jnp.asarray(np.asarray(cfg.primes, np.int32)[:, None, None])
    if not isinstance(tabs[0], jax.core.Tracer):
        _MON_ALL_DEVICE_CACHE[cfg] = (tabs, pconst)
        return tabs, pconst
    return tabs, pconst


def _check_mb_bounds(cfg: FusedConfig, gf: int):
    """int32/fold-margin safety for the in-kernel combine (see the MAC
    bound comment in fused_pbs.make_config for the fold drift model:
    folding |X| leaves a representative within p/2 + X*2^-22.4)."""
    per = 1 << gf
    LJ = cfg.levels * cfg.glwe_size
    for p in cfg.primes:
        cap = min((p // 512) << 22, 1 << 30)
        drift = ((p // 2) * (p // 2)) >> 22  # conservative mulmod drift
        m_mag = p // 2 + drift + 4           # composite mon magnitude
        assert m_mag * m_mag < 1 << 31, "mon product overflows int32"
        mhi = (m_mag + 128) // 256 + 1
        heff = (per - 1) * mhi * (p // 2)
        leff = (per - 1) * 128 * (p // 2)
        assert heff < cap, "multi-bit combine hi sum exceeds fold bound"
        t1 = p // 2 + (heff >> 22) + 1
        lo_comb = t1 * 256 + leff + p // 2
        assert lo_comb < cap, "multi-bit combine lo sum exceeds fold bound"
        keff = p // 2 + (lo_comb >> 22) + 1
        khie = (keff + 128) // 256 + 1
        # spec drift margin matches the lazy horner (p//64, fused_pbs)
        smag = p // 2 + p // 64
        assert LJ * smag * khie < cap, "multi-bit MAC hi sum exceeds bound"
        assert smag * 256 + LJ * smag * 128 < cap


# ---------------------------------------------------------------------------
# prepared key
# ---------------------------------------------------------------------------


@dataclass
class PreparedMultiBitBskFused:
    """Subset-GGSW spectra in fused-kernel order.

    khi/klo: [n_groups, P, N, 2^gf, LJ*OM] int16/int8 hi/lo bytes of the
    balanced per-prime subset-key spectra (classic khi/klo split with the
    subset axis placed next to the columns so the kernel slices subset
    stacks without transposes; ref:
    lwe_multi_bit_bootstrap_key_generation.rs on the key contents)."""

    khi: Any
    klo: Any
    cfg: FusedConfig
    base_log: int
    levels: int
    glwe_size: int
    polynomial_size: int
    input_dim: int
    grouping_factor: int
    bits: int = 64


jax.tree_util.register_pytree_node(
    PreparedMultiBitBskFused,
    lambda b: ((b.khi, b.klo),
               (b.cfg, b.base_log, b.levels, b.glwe_size, b.polynomial_size,
                b.input_dim, b.grouping_factor, b.bits)),
    lambda meta, data: PreparedMultiBitBskFused(data[0], data[1], *meta),
)


def prepare_multi_bit_bsk_fused(mbsk: np.ndarray, base_log: int,
                                grouping_factor: int,
                                bits: int = 64) -> PreparedMultiBitBskFused:
    """Standard-domain multi-bit BSK [n_groups, 2^gf, L, J, O, N] uint ->
    fused-kernel subset spectra (one-time transform; the reference's
    per-step forward FFT never runs on the hot path)."""
    n_groups, per, L, J, O, N = mbsk.shape
    cfg = make_config(N, J, L, base_log, bits)
    _check_mb_bounds(cfg, grouping_factor)
    kh, kl = _prepare_bsk_fused_device(
        jnp.asarray(mbsk.reshape(n_groups * per, L, J, O, N)), cfg)
    P = len(cfg.primes)
    W = kh.shape[-1]
    # [ng*per, P, N, W] -> [ng, P, N, per, W]: subset axis beside the
    # columns so in-kernel subset stacks are plain slices
    kh = jnp.moveaxis(kh.reshape(n_groups, per, P, N, W), 1, 3)
    kl = jnp.moveaxis(kl.reshape(n_groups, per, P, N, W), 1, 3)
    return PreparedMultiBitBskFused(
        khi=kh,
        klo=kl,
        cfg=cfg, base_log=base_log, levels=L, glwe_size=J,
        polynomial_size=N, input_dim=n_groups * grouping_factor,
        grouping_factor=grouping_factor, bits=bits,
    )


# ---------------------------------------------------------------------------
# the per-step math
# ---------------------------------------------------------------------------


def _dec_limbs(cfg: FusedConfig, acc, Bb: int):
    """Signed decompose of the accumulator planes + shared digit limbs
    (multi-bit external product decomposes acc itself — no rotation)."""
    N, R, C = cfg.N, cfg.R, cfg.C
    G, L = cfg.glwe_size, cfg.levels
    dlo = jnp.stack([acc[g, 0] for g in range(G)], axis=0)
    dhi = (jnp.stack([acc[g, 1] for g in range(G)], axis=0)
           if cfg.bits == 64 else None)
    digs = _decompose_planes(dlo, dhi, cfg)
    X8s = []
    for l in range(L):
        for j in range(G):
            d = digs[l][j]
            X8s.append(_limb_rows(d.reshape(R, C * Bb), cfg.ld))
    return jnp.stack(X8s, axis=0)                 # [LJ, R*ld, C*Bb]


def _mb_single_chain(cfg: FusedConfig, p, inv, psi2t, psi2tsh, db,
                     Bb: int):
    """One singleton monomial spectrum psi^(d*(2k+1)) for one prime, fully
    unrolled radix-2 select+Shoup chain (a lax.scan form paid ~20us of
    loop overhead PER ITERATION on the chip — 2969us/step just for the
    combine kernel; unrolled, the whole chain is ~24 vector ops).

    psi2t/psi2tsh [nbits, N]; db [B] switched degree.  -> [N, B]."""
    N = cfg.N
    nbits = (2 * N).bit_length() - 1
    x = jnp.where((db & 1) == 1, psi2t[0][:, None], np.int32(1))
    for t in range(1, nbits):
        xm = _shoup_t(x, psi2t[t][:, None], psi2tsh[t][:, None], p, inv)
        x = jnp.where(((db >> t) & 1) == 1, xm, x)
    return x


def _mb_compose_combine(cfg: FusedConfig, gf: int, p, inv, epsP, epsPsh,
                        epsM, epsMsh, msing, kh, kl, eps_row, Bb: int):
    """Composite monomials (epsilon-corrected products of singletons) +
    the per-column key combine for ONE prime.

    msing: [gf, N, B] singleton spectra; kh/kl [N, per, W] int32 subset
    keys; eps_row [per, B] in {-1, 0, 1}.
    -> (khi [N, W, B] int16, klo [N, W, B] int8) combined-key split."""
    N = cfg.N
    G, L, M = cfg.glwe_size, cfg.levels, cfg.planes
    W = L * G * G * M
    per = 1 << gf

    mons = {}
    for i in range(gf):
        mons[1 << (gf - 1 - i)] = msing[i]
    for j in _composites(per):
        ja, jb = _mb_factor(j)
        t0 = _fold_t(mons[ja] * mons[jb], p, inv)
        ep = _shoup_t(t0, epsP[:, None], epsPsh[:, None], p, inv)
        em = _shoup_t(t0, epsM[:, None], epsMsh[:, None], p, inv)
        ej = eps_row[j]                    # [B]
        mons[j] = jnp.where(ej == 1, ep, jnp.where(ej == -1, em, t0))

    # monomial 8-bit splits stacked (one multiply-reduce per column;
    # bounds: _check_mb_bounds)
    mlo_st = jnp.stack(
        [((mons[j] + 128) & 255) - 128 for j in range(1, per)], axis=1)
    mhi_st = jnp.stack(
        [(mons[j] - (((mons[j] + 128) & 255) - 128)) >> 8
         for j in range(1, per)], axis=1)  # [N, per-1, B]
    kst = kh[:, 1:, :] * 256 + kl[:, 1:, :]
    kh0 = kh[:, 0, :]
    kl0 = kl[:, 0, :]

    khi_cols, klo_cols = [], []
    for col in range(W):
        kcol = kst[:, :, col:col + 1]      # [N, per-1, 1]
        heff = jnp.sum(mhi_st * kcol, axis=1, dtype=jnp.int32)
        leff = jnp.sum(mlo_st * kcol, axis=1, dtype=jnp.int32)
        k0 = kh0[:, col:col + 1] * 256 + kl0[:, col:col + 1]
        t1 = _fold_t(heff, p, inv)
        keff = _fold_t(t1 * 256 + leff + k0, p, inv)
        kloe = ((keff + 128) & 255) - 128
        khi_cols.append(((keff - kloe) >> 8).astype(jnp.int16))
        klo_cols.append(kloe.astype(jnp.int8))
    return (jnp.stack(khi_cols, axis=1), jnp.stack(klo_cols, axis=1))


def _mb_mons(cfg: FusedConfig, gf: int, p, inv, psi2t, psi2tsh, epsP,
             epsPsh, epsM, epsMsh, d_rows, eps_rows, Bb: int):
    """All 2^gf - 1 nontrivial monomial spectra for ONE prime, in-kernel.

    d_rows: list[gf] of [B] switched singleton degrees; eps_rows: list[per]
    of [B] epsilon rows.  Returns mons dict j -> [N, B] balanced."""
    per = 1 << gf
    mons = {}
    for i in range(gf):
        mons[1 << (gf - 1 - i)] = _mb_single_chain(
            cfg, p, inv, psi2t, psi2tsh, d_rows[i], Bb)
    for j in _composites(per):
        ja, jb = _mb_factor(j)
        t0 = _fold_t(mons[ja] * mons[jb], p, inv)
        ep = _shoup_t(t0, epsP[:, None], epsPsh[:, None], p, inv)
        em = _shoup_t(t0, epsM[:, None], epsMsh[:, None], p, inv)
        ej = eps_rows[j]
        mons[j] = jnp.where(ej == 1, ep, jnp.where(ej == -1, em, t0))
    return mons


def _mb_step_math_onekernel(cfg: FusedConfig, gf: int, tab_refs,
                            consts_refs, mon_at, kh_at, kl_at, d_rows,
                            eps_rows, acc, Bb: int):
    """Whole multi-bit step in one body: decompose + per-prime-group fori
    loops where each prime computes its monomial spectra, combines key
    columns ON THE FLY (no [N, W, B] combined-key materialization — the
    VMEM pressure that forced the round-4 three-kernel split), MACs,
    inverse-NTTs, and streams the zero-based explicit CRT."""
    N, R, C = cfg.N, cfg.R, cfg.C
    G, L, M = cfg.glwe_size, cfg.levels, cfg.planes
    LJ, OM = L * G, G * M
    per = 1 << gf

    X8 = _dec_limbs(cfg, acc, Bb)

    lo_s = tuple(jnp.zeros((N, Bb), jnp.int32) for _ in range(G))
    hi_s = (tuple(jnp.zeros((N, Bb), jnp.int32) for _ in range(G))
            if cfg.bits == 64 else tuple())
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
            ip = np.int32(offset) + gip
            psi2t, psi2tsh, ePt, ePts, eMt, eMts = mon_at(ip)
            kh = kh_at(ip)                 # [N, per, W] int32
            kl = kl_at(ip)

            mons = _mb_mons(cfg, gf, p, inv, psi2t, psi2tsh,
                            ePt, ePts, eMt, eMts, d_rows, eps_rows, Bb)
            # 8-bit monomial splits, stacked once per prime
            mlo_st = jnp.stack(
                [((mons[j] + 128) & 255) - 128 for j in range(1, per)],
                axis=1)
            mhi_st = jnp.stack(
                [(mons[j] - (((mons[j] + 128) & 255) - 128)) >> 8
                 for j in range(1, per)], axis=1)     # [N, per-1, B]

            spec = [
                _forward_prime_t(X8[lj], W1A8, W2B8, TC, TCsh, nl, nlx,
                                 p, inv, cfg, Bb)
                for lj in range(LJ)
            ]
            kst = kh[:, 1:, :] * 256 + kl[:, 1:, :]   # [N, per-1, W]
            for o in range(G):
                for m in range(M):
                    om = o * M + m
                    hi_sum = jnp.zeros((N, Bb), jnp.int32)
                    lo_sum = jnp.zeros((N, Bb), jnp.int32)
                    for lj in range(LJ):
                        col = lj * OM + om
                        # combine this key column on the fly
                        kcol = kst[:, :, col:col + 1]  # [N, per-1, 1]
                        heff = jnp.sum(mhi_st * kcol, axis=1,
                                       dtype=jnp.int32)
                        leff = jnp.sum(mlo_st * kcol, axis=1,
                                       dtype=jnp.int32)
                        k0 = (kh[:, 0, col:col + 1] * 256
                              + kl[:, 0, col:col + 1])
                        t1 = _fold_t(heff, p, inv)
                        keff = _fold_t(t1 * 256 + leff + k0, p, inv)
                        kloe = ((keff + 128) & 255) - 128
                        khie = (keff - kloe) >> 8
                        hi_sum = hi_sum + spec[lj] * khie
                        lo_sum = lo_sum + spec[lj] * kloe
                    tm = _fold_t(hi_sum, p, inv)
                    macc = _fold_t(tm * 256 + lo_sum,
                                   p, inv).reshape(C, R * Bb)
                    chat = _inverse_prime_t(macc, W2I8, W1I8, TIC, TICsh,
                                            nl, nlx, p, inv, cfg, Bb)
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


def fused_multibit_rotate_scan1(cfg: FusedConfig, gf: int, khi, klo,
                                d_sing, eps, acc0_planes):
    """ONE Pallas kernel per group step (vs the 3-kernel split): in-kernel
    monomial chains + on-the-fly column combine + MAC + inverse + CRT.
    Removes the msing/keh/kel HBM round trips (~65 MB/step) and two
    launches, and keeps no [N, W, B] combined key alive (the allocator
    pressure that forced the split).  Selected by
    TFHE_TPU_MULTIBIT_MODE=scan1."""
    import sys

    n_groups = d_sing.shape[0]
    B = d_sing.shape[-1]
    per = 1 << gf
    G, M, N = cfg.glwe_size, cfg.planes, cfg.N
    W = cfg.levels * G * G * cfg.planes
    P = len(cfg.primes)
    nG = len(prime_groups(cfg))
    tabs, consts = build_tables_stacked(cfg)
    interp = jax.default_backend() != "tpu"
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024)
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    n_tab = 8 * nG

    montabs_all, _ = build_mon_tables_allprime(cfg)
    (p2t, p2ts, ePt, ePts, eMt, eMts) = montabs_all
    mon_flat = [p2t, p2ts, ePt, ePts, eMt, eMts]
    nbits = (2 * N).bit_length() - 1

    def step_kernel(*refs):
        d_ref, e_ref, kh_ref, kl_ref, acc_ref = refs[:5]
        p2r, p2sr, ePr, ePsr, eMr, eMsr = refs[5:11]
        tab_refs = [tuple(refs[11 + 8 * g + j] for j in range(8))
                    for g in range(nG)]
        consts_refs = [refs[11 + n_tab + g] for g in range(nG)]
        out_ref = refs[11 + n_tab + nG]

        def mon_at(ip):
            return (p2r[pl.ds(ip, 1)][0], p2sr[pl.ds(ip, 1)][0],
                    ePr[pl.ds(ip, 1)][0, 0], ePsr[pl.ds(ip, 1)][0, 0],
                    eMr[pl.ds(ip, 1)][0, 0], eMsr[pl.ds(ip, 1)][0, 0])

        def kh_at(ip):
            return kh_ref[pl.ds(ip, 1)][0].astype(jnp.int32)

        def kl_at(ip):
            return kl_ref[pl.ds(ip, 1)][0].astype(jnp.int32)

        d_rows = [d_ref[i, 0] for i in range(gf)]
        eps_rows = [e_ref[j] for j in range(per)]
        out_ref[...] = _mb_step_math_onekernel(
            cfg, gf, tab_refs, consts_refs, mon_at, kh_at, kl_at,
            d_rows, eps_rows, acc_ref[...], B)

    tabs_flat = [t for g_tabs in tabs for t in g_tabs]
    call = pl.pallas_call(
        step_kernel,
        in_specs=[vm] * 5 + [vm] * 6 + [vm] * n_tab + [sm] * nG,
        out_specs=vm,
        out_shape=jax.ShapeDtypeStruct((G, M, N, B), jnp.int32),
        compiler_params=cparams,
        interpret=interp,
    )

    def step(acc, xs):
        d_row, e_row, kh, kl = xs
        return call(d_row[:, None], e_row, kh, kl, acc, *mon_flat,
                    *tabs_flat, *consts), None

    out, _ = jax.lax.scan(step, acc0_planes, (d_sing, eps, khi, klo))
    return out


def _mb_mac_math(cfg: FusedConfig, tab_refs, consts_refs, keh_at, kel_at,
                 X8, Bb: int):
    """Kernel-2 math: forward NTT, sum-before-fold MAC against the
    pre-combined key columns, narrow inverse NTT, streaming CRT from ZERO
    planes (the multi-bit external product REPLACES the accumulator).
    Identical structure to fused_pbs._primes_crt_math with a per-lane key.
    """
    N, R, C = cfg.N, cfg.R, cfg.C
    G, L, M = cfg.glwe_size, cfg.levels, cfg.planes
    LJ, OM = L * G, G * M

    lo_s = tuple(jnp.zeros((N, Bb), jnp.int32) for _ in range(G))
    hi_s = (tuple(jnp.zeros((N, Bb), jnp.int32) for _ in range(G))
            if cfg.bits == 64 else tuple())
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
            ip = np.int32(offset) + gip
            keh = keh_at(ip)                       # [N, W, B] int16 ref slice
            kel = kel_at(ip)

            spec = [
                _forward_prime_t(X8[lj], W1A8, W2B8, TC, TCsh, nl, nlx,
                                 p, inv, cfg, Bb)
                for lj in range(LJ)
            ]
            for o in range(G):
                for m in range(M):
                    om = o * M + m
                    hi_sum = jnp.zeros((N, Bb), jnp.int32)
                    lo_sum = jnp.zeros((N, Bb), jnp.int32)
                    for lj in range(LJ):
                        col = lj * OM + om
                        hi_sum = hi_sum + spec[lj] * keh[
                            :, col, :].astype(jnp.int32)
                        lo_sum = lo_sum + spec[lj] * kel[
                            :, col, :].astype(jnp.int32)
                    tm = _fold_t(hi_sum, p, inv)
                    macc = _fold_t(tm * 256 + lo_sum,
                                   p, inv).reshape(C, R * Bb)
                    chat = _inverse_prime_t(macc, W2I8, W1I8, TIC, TICsh,
                                            nl, nlx, p, inv, cfg, Bb)
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


# ---------------------------------------------------------------------------
# the scan + entry points
# ---------------------------------------------------------------------------


def fused_multibit_rotate_scan(cfg: FusedConfig, gf: int, khi, klo,
                               d_sing, eps, acc0_planes):
    """lax.scan over groups; THREE Pallas kernels per step:

      1. singles kernel, grid (P, gf): one fully-unrolled psi-power chain
         per grid step -> singleton spectra msing [P, gf, N, B] (HBM);
      2. combine kernel, grid (P,): epsilon-corrected composites + the
         per-column key combine -> combined key in the BSK int16/int8
         split encoding;
      3. MAC kernel: forward NTT + sum-before-fold MAC + inverse NTT +
         zero-based streaming CRT (one fori body per prime group).

    The split is forced by the Mosaic register allocator: spill slots
    scale with live [N, B] SSA values per kernel body, and both the
    single-kernel and two-kernel forms exceeded the 128M VMEM (210M /
    165M / 149M attempts — see PERF_NOTES).  scan-form chains compiled
    but paid ~20us loop overhead per iteration (2969us/step).

    khi/klo: [n_groups, P, N, per, W]; d_sing [n_groups, gf, B] int32;
    eps [n_groups, per, B] int32; acc0_planes [G, M, N, B] int32.
    """
    import sys

    n_groups = d_sing.shape[0]
    B = d_sing.shape[-1]
    per = 1 << gf
    G, M, N = cfg.glwe_size, cfg.planes, cfg.N
    LJ = cfg.levels * G
    W = LJ * G * cfg.planes
    P = len(cfg.primes)
    nG = len(prime_groups(cfg))
    tabs, consts = build_tables_stacked(cfg)
    interp = jax.default_backend() != "tpu"
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    # the combine/MAC bodies sit close to the 128M physical VMEM edge
    cparams = pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024)
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    n_tab = 8 * nG

    montabs_all, pconst = build_mon_tables_allprime(cfg)
    nbits = (2 * N).bit_length() - 1
    z = np.int32(0)

    def singles_kernel(d_ref, p2r, p2sr, prr, ms_ref):
        pval = prr[0, 0, 0]
        inv = np.float32(1.0) / pval.astype(jnp.float32)
        ms_ref[0, 0] = _mb_single_chain(
            cfg, pval, inv, p2r[0], p2sr[0], d_ref[0, 0], B)

    # d rides as [gf, 1, B] so each (prime, singleton) block keeps its
    # last two dims equal to the array's (Pallas TPU block-shape rule)

    singles_call = pl.pallas_call(
        singles_kernel,
        grid=(P, gf),
        in_specs=[
            pl.BlockSpec((1, 1, B), lambda i, j: (j, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbits, N), lambda i, j: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbits, N), lambda i, j: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, z, z),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N, B), lambda i, j: (i, j, z, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, gf, N, B), jnp.int32),
        compiler_params=cparams,
        interpret=interp,
    )

    def combine_kernel(e_ref, ms_ref, kh_ref, kl_ref, ePr, ePsr, eMr,
                       eMsr, prr, keh_ref, kel_ref):
        pval = prr[0, 0, 0]
        inv = np.float32(1.0) / pval.astype(jnp.float32)
        keh, kel = _mb_compose_combine(
            cfg, gf, pval, inv, ePr[0, 0], ePsr[0, 0], eMr[0, 0],
            eMsr[0, 0], ms_ref[0], kh_ref[0].astype(jnp.int32),
            kl_ref[0].astype(jnp.int32),
            [e_ref[j] for j in range(per)], B)
        keh_ref[0] = keh
        kel_ref[0] = kel

    combine_call = pl.pallas_call(
        combine_kernel,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((per, B), lambda i: (z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gf, N, B), lambda i: (i, z, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, per, W), lambda i: (i, z, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, per, W), lambda i: (i, z, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda i: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda i: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda i: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda i: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, z, z),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, N, W, B), lambda i: (i, z, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, W, B), lambda i: (i, z, z, z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((P, N, W, B), jnp.int16),
                   jax.ShapeDtypeStruct((P, N, W, B), jnp.int8)),
        compiler_params=cparams,
        interpret=interp,
    )

    def mac_kernel(*refs):
        keh_ref, kel_ref, acc_ref = refs[:3]
        tab_refs = [tuple(refs[3 + 8 * g + j] for j in range(8))
                    for g in range(nG)]
        consts_refs = [refs[3 + n_tab + g] for g in range(nG)]
        out_ref = refs[3 + n_tab + nG]
        x8 = _dec_limbs(cfg, acc_ref[...], B)

        def keh_at(ip):
            return keh_ref[pl.ds(ip, 1)][0]

        def kel_at(ip):
            return kel_ref[pl.ds(ip, 1)][0]

        out_ref[...] = _mb_mac_math(
            cfg, tab_refs, consts_refs, keh_at, kel_at, x8, B)

    tabs_flat = [t for g_tabs in tabs for t in g_tabs]
    mac_call = pl.pallas_call(
        mac_kernel,
        in_specs=[vm] * 3 + [vm] * n_tab + [sm] * nG,
        out_specs=vm,
        out_shape=jax.ShapeDtypeStruct((G, M, N, B), jnp.int32),
        compiler_params=cparams,
        interpret=interp,
    )

    (p2t, p2ts, ePt, ePts, eMt, eMts) = montabs_all

    def step(acc, xs):
        d_row, e_row, kh, kl = xs
        msing = singles_call(d_row[:, None], p2t, p2ts, pconst)
        keh, kel = combine_call(e_row, msing, kh, kl, ePt, ePts, eMt,
                                eMts, pconst)
        return mac_call(keh, kel, acc, *tabs_flat, *consts), None

    out, _ = jax.lax.scan(step, acc0_planes, (d_sing, eps, khi, klo))
    return out


def multi_bit_blind_rotate_fused(prep: PreparedMultiBitBskFused, lut, lwe):
    """lut [B, G, N] or [G, N] uint, lwe [B, n+1] uint -> [B, G, N] uint.

    Bit-identical to core/multibit.py multi_bit_blind_rotate (ref:
    lwe_multi_bit_programmable_bootstrapping.rs multi_bit_blind_rotate_
    assign); the per-group loop runs in the fused Pallas kernel."""
    from . import polymul
    from ..core.pbs import modulus_switch

    cfg = prep.cfg
    gf = prep.grouping_factor
    per = 1 << gf
    bits, N = cfg.bits, cfg.N
    dt = jnp.uint64 if bits == 64 else jnp.uint32
    lwe = jnp.asarray(lwe, dt)
    B0 = lwe.shape[0]
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

    b_hat = modulus_switch(lwe[:, -1], N, bits=bits)
    acc0 = polymul.monomial_div(lut, b_hat[:, None], N, bits=bits)

    n_groups = prep.input_dim // gf
    # switched degrees of every subset sum: sum in the torus domain FIRST
    # (wrapping), then modulus-switch — matching the reference's
    # switch(<a_S, 1>) order of operations
    mask_groups = jnp.transpose(
        lwe[:, :-1].reshape(B, n_groups, gf), (1, 2, 0))   # [ng, gf, B]
    sel = np.array(
        [[(j >> (gf - 1 - i)) & 1 for i in range(gf)] for j in range(per)],
        dtype=np.uint64)
    sums = jnp.zeros((per, n_groups, B), dt)
    for j in range(per):
        s = jnp.zeros((n_groups, B), dt)
        for i in range(gf):
            if sel[j, i]:
                s = s + mask_groups[:, i, :]
        sums = sums.at[j].set(s)
    d_all = modulus_switch(sums, N, bits=bits).astype(jnp.int32)
    d_all = (d_all & np.int32(2 * N - 1))                  # [per, ng, B]
    d_all = jnp.transpose(d_all, (1, 0, 2))                # [ng, per, B]

    sing_idx = [1 << (gf - 1 - i) for i in range(gf)]
    d_sing = d_all[:, jnp.asarray(sing_idx), :]            # [ng, gf, B]

    eps = jnp.zeros((n_groups, per, B), jnp.int32)
    for j in _composites(per):
        ja, jb = _mb_factor(j)
        e = (d_all[:, j] - d_all[:, ja] - d_all[:, jb]) % np.int32(2 * N)
        e = jnp.where(e > np.int32(N), e - np.int32(2 * N), e)
        eps = eps.at[:, j].set(e)

    import os

    acc0_planes = _to_planes(acc0, bits)
    mode = os.environ.get("TFHE_TPU_MULTIBIT_MODE", "scan3")
    rotate = (fused_multibit_rotate_scan1 if mode == "scan1"
              else fused_multibit_rotate_scan)
    out_planes = rotate(
        cfg, gf, prep.khi, prep.klo, d_sing, eps, acc0_planes)
    return _from_planes(out_planes, bits)[:B0]

"""LWE security estimate for every registered parameter set.

The reference gates parameter changes on the lattice estimator
(ref: ci/lattice_estimator.sage, .github/workflows/parameters_check.yml).
Sage and network access are unavailable here, so this implements the
standard PRIMAL uSVP core-SVP estimate directly (the model the estimator's
`usvp` entry reduces to): find the smallest BKZ block size b for which the
attack succeeds under the geometric series assumption,

    sigma * sqrt(b)  <=  delta(b)^(2b - d - 1) * Vol^(1/d),
    Vol = q^m * (2*sigma)^n        (Bai-Galbraith binary-secret scaling:
                                    secret columns rescaled from 1/2 to
                                    sigma),
    delta(b) = ((pi*b)^(1/b) * b / (2*pi*e)) ** (1 / (2*(b-1))),

optimized over the number of samples m (d = n + m + 1), then
lambda ~= 0.292 * b (classical core-SVP).  This is an APPROXIMATION of
the full estimator (no dual/hybrid attacks, no probability modelling);
the gate is therefore set at 110 bits (this model reads the reference's
128-bit-certified sets at ~112-120) — a regression guard, not a
certification.

Usage: python tools/security_check.py   (prints one line per set; exits
non-zero if any non-TEST set falls below the gate).
"""

from __future__ import annotations

import math
import sys

GATE_BITS = 110.0
CORE_SVP_C = 0.292  # classical; quantum ~0.265

# Experimental sets the reference itself ships without a 128-bit claim
# (parameters_wopbs.rs is headed "#Warning experimental"); reported but
# not gated.
KNOWN_EXPERIMENTAL = {"PARAM_4_BITS_5_BLOCKS"}


def _delta(b: float) -> float:
    return ((math.pi * b) ** (1.0 / b) * b / (2 * math.pi * math.e)) ** (
        1.0 / (2.0 * (b - 1.0)))


def usvp_blocksize(n: int, log2_q: int, rel_sigma: float) -> float:
    """Smallest successful primal-uSVP BKZ block size (GSA model)."""
    best = math.inf
    for m in range(max(n // 2, 50), 4 * n, max(n // 50, 1)):
        d = n + m + 1
        lo, hi = 50, min(2 * d, 3000)
        if not _usvp_ok(hi, d, m, n, log2_q, rel_sigma):
            continue
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if _usvp_ok(mid, d, m, n, log2_q, rel_sigma):
                hi = mid
            else:
                lo = mid
        best = min(best, hi)
    return best


def _usvp_ok(b: int, d: int, m: int, n: int, log2_q: int,
             rel_sigma: float) -> bool:
    log2_sigma = log2_q + math.log2(rel_sigma)  # absolute units
    lhs = log2_sigma + 0.5 * math.log2(b)
    log2_vol = m * log2_q + n * (log2_sigma + 1.0)  # (2*sigma)^n scaling
    rhs = (2 * b - d - 1) * math.log2(_delta(b)) + log2_vol / d
    return lhs <= rhs


def security_bits(n: int, log2_q: int, rel_std: float) -> float:
    # noise below ~2^-(bits) is clamped to the modulus grid (sigma >= 2):
    # the estimator's effective noise never drops below ~2 absolute
    rel_std = max(rel_std, 4.0 / 2.0 ** log2_q)
    b = usvp_blocksize(n, log2_q, rel_std)
    if not math.isfinite(b):
        return math.inf
    # standard BKZ cost model: ~8*d SVP-beta calls per tour
    d = 2.2 * n  # optimal d observed in the sweep is ~2n-2.5n
    return CORE_SVP_C * b + math.log2(8.0 * d)


def check_set(name: str, prm) -> list:
    rows = []
    bits = prm.torus_bits
    # LWE instance under the small key
    rows.append((f"{name}/lwe", prm.lwe_dimension,
                 security_bits(prm.lwe_dimension, bits,
                               prm.lwe_modular_std_dev)))
    # GLWE == LWE of dimension k*N under the big key
    rows.append((f"{name}/glwe", prm.glwe_dimension * prm.polynomial_size,
                 security_bits(prm.glwe_dimension * prm.polynomial_size,
                               bits, prm.glwe_modular_std_dev)))
    return rows


def main() -> int:
    from tfhe_tpu.params import ALL_PARAMETER_SETS

    failures = []
    for name, prm in sorted(ALL_PARAMETER_SETS.items()):
        if "TEST" in name:
            continue  # insecure-by-design fixtures
        gated = name not in KNOWN_EXPERIMENTAL
        for label, dim, lam in check_set(name, prm):
            ok = lam >= GATE_BITS or not gated
            status = "ok" if lam >= GATE_BITS else (
                "experimental" if not gated else "FAIL")
            if not ok:
                failures.append((label, dim, lam))
            print(f"{label:70s} n={dim:6d} lambda~{lam:7.1f}  {status}")
    if failures:
        print(f"\n{len(failures)} instances below the {GATE_BITS}-bit gate")
        return 1
    print("\nall registered non-TEST parameter sets pass the gate")
    return 0


if __name__ == "__main__":
    sys.exit(main())

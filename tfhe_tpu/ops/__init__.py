"""MXU compute kernels: decomposition, limb arithmetic, negacyclic algebra.

TPU-framework equivalent of the reference's fft_impl + SIMD layer
(ref: tfhe/src/core_crypto/fft_impl/).  Where the reference converts torus
polynomials to the complex Fourier domain (f64 FFT, with rounding noise),
this backend performs negacyclic polynomial products as *exact* integer
matrix contractions: operands are split into signed 8-bit limbs, multiplied
on the MXU with int32 accumulation, and recombined modulo 2^64 — zero
arithmetic error, strictly less noise than the reference.
"""

from . import decomposition, limbs, polymul

__all__ = ["decomposition", "limbs", "polymul"]

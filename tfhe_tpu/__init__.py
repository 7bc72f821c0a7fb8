"""tfhe_tpu — a TPU-native TFHE (fully homomorphic encryption) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of tfhe-rs v0.5.0
(+ its homomorphic string library fork).  The compute path is exact modular
integer arithmetic mapped onto the TPU MXU: negacyclic polynomial products are
performed as int8 limb-decomposed matrix contractions accumulated in int32 and
recombined mod 2^64 — no FFT, no floating-point noise (the reference's f64 FFT
introduces rounding noise; this backend is exact, which strictly enlarges the
noise budget).

Layer map (mirrors SURVEY.md §1 for the reference):
  params/    — named cryptographic parameter sets (values match the reference)
  prng/      — AES-128-CTR forkable CSPRNG + samplers  (ref: concrete-csprng)
  entities/  — ciphertext/key containers               (ref: core_crypto/entities)
  ops/       — decomposition, limb arithmetic, negacyclic polymul, blind
               rotation, keyswitch: the MXU kernels    (ref: core_crypto/fft_impl)
  core/      — encrypt/decrypt/keygen/PBS              (ref: core_crypto/algorithms)
  parallel/  — device mesh, shardings, batch collectives (new: no ref equivalent)
  boolean/   — FHE boolean gates                       (ref: tfhe/src/boolean)
  shortint/  — message+carry block arithmetic          (ref: tfhe/src/shortint)
  integer/   — radix big integers                      (ref: tfhe/src/integer)
  strings/   — encrypted ASCII strings                 (ref: examples/fhe_strings)
  api/       — high-level API: generate_keys, FheUint* (ref: high_level_api)
  utils/     — keycache, serialization
"""

import jax

# The torus is Z_{2^64}: 64-bit integer arithmetic is required everywhere.
jax.config.update("jax_enable_x64", True)

_API_NAMES = (
    "ConfigBuilder",
    "generate_keys",
    "set_server_key",
    "FheBool",
    "FheUint8",
    "FheUint16",
    "FheUint32",
    "FheUint64",
    "FheUint128",
    "FheUint256",
    "FheInt8",
    "FheInt16",
    "FheInt32",
    "FheInt64",
    "FheInt128",
    "FheInt256",
)


def __getattr__(name):
    # Lazy high-level API import keeps `import tfhe_tpu.prng` cheap and avoids
    # paying scheme-layer import costs for core-only users.
    if name in _API_NAMES:
        from . import api

        return getattr(api, name)
    raise AttributeError(f"module 'tfhe_tpu' has no attribute {name!r}")


__version__ = "0.1.0"

__all__ = [
    "ConfigBuilder",
    "generate_keys",
    "set_server_key",
    "FheBool",
    "FheUint8",
    "FheUint16",
    "FheUint32",
    "FheUint64",
    "FheUint128",
    "FheUint256",
    "FheInt8",
    "FheInt16",
    "FheInt32",
    "FheInt64",
    "FheInt128",
    "FheInt256",
]

"""Core crypto: keygen, encryption, keyswitch, programmable bootstrap.

TPU equivalent of tfhe/src/core_crypto/algorithms/ — free functions over the
entity containers, with the server-side hot paths (keyswitch contraction,
blind rotation) formulated as batched MXU contractions.
"""

from .secret import LweSecretKey, GlweSecretKey, glwe_phase, binary_ext_matrix
from .encrypt import (
    encrypt_lwe,
    decrypt_lwe,
    encrypt_glwe_assign,
    decrypt_glwe,
    trivial_lwe,
)
from .keygen import (
    generate_binary_lwe_secret_key,
    generate_binary_glwe_secret_key,
    generate_bootstrap_key,
    generate_keyswitch_key,
    prepare_bsk,
    prepare_ksk,
    PreparedBsk,
    PreparedKsk,
)
from ..ops.polymul_ntt import PreparedBskNtt, prepare_bsk_ntt
from ..ops.fused_pbs import PreparedBskFused, prepare_bsk_fused


def prepare_bsk_auto(bsk_standard, base_log, bits=64):
    """Pick the BSK representation for the current backend: the fused
    Pallas kernel layout on TPU (compiled hot loop in VMEM), the jnp
    CRT-NTT layout elsewhere (CPU tests / virtual meshes).  Both paths
    produce bit-identical blind rotations; TFHE_TPU_FUSED=0 forces jnp."""
    import os

    import jax

    use_fused = (jax.default_backend() == "tpu"
                 and os.environ.get("TFHE_TPU_FUSED", "1") != "0")
    if use_fused:
        return prepare_bsk_fused(bsk_standard, base_log, bits=bits)
    return prepare_bsk_ntt(bsk_standard, base_log, bits=bits)
from .multibit import (
    PreparedMultiBitBskNtt,
    generate_multi_bit_bootstrap_key,
    keyswitch_then_multi_bit_pbs,
    multi_bit_pbs_then_keyswitch,
    multi_bit_programmable_bootstrap,
    prepare_multi_bit_bsk_ntt,
    prepare_multi_bit_bsk_auto,
)
from .keyswitch import keyswitch
from .pbs import (
    modulus_switch,
    blind_rotate,
    sample_extract,
    programmable_bootstrap,
    keyswitch_then_pbs,
    pbs_then_keyswitch,
)
from .lut import fill_accumulator, fill_accumulator_u128, make_lut_glwe
from .u128_crypto import (decrypt_glwe_u128, decrypt_lwe_u128,
                          encrypt_glwe_preset_u128, encrypt_lwe_u128,
                          generate_bootstrap_key_u128)
from .packing_keyswitch import (
    generate_packing_keyswitch_key,
    packing_keyswitch,
)

__all__ = [
    "LweSecretKey",
    "GlweSecretKey",
    "glwe_phase",
    "binary_ext_matrix",
    "encrypt_lwe",
    "decrypt_lwe",
    "encrypt_glwe_assign",
    "decrypt_glwe",
    "trivial_lwe",
    "generate_binary_lwe_secret_key",
    "generate_binary_glwe_secret_key",
    "generate_bootstrap_key",
    "generate_keyswitch_key",
    "prepare_bsk",
    "prepare_bsk_ntt",
    "prepare_bsk_fused",
    "prepare_bsk_auto",
    "PreparedBskFused",
    "PreparedBskNtt",
    "prepare_ksk",
    "PreparedBsk",
    "PreparedKsk",
    "keyswitch",
    "generate_packing_keyswitch_key",
    "packing_keyswitch",
    "PreparedMultiBitBskNtt",
    "generate_multi_bit_bootstrap_key",
    "prepare_multi_bit_bsk_ntt",
    "prepare_multi_bit_bsk_auto",
    "multi_bit_programmable_bootstrap",
    "keyswitch_then_multi_bit_pbs",
    "multi_bit_pbs_then_keyswitch",
    "modulus_switch",
    "blind_rotate",
    "sample_extract",
    "programmable_bootstrap",
    "keyswitch_then_pbs",
    "pbs_then_keyswitch",
    "fill_accumulator",
    "fill_accumulator_u128",
    "encrypt_lwe_u128",
    "decrypt_lwe_u128",
    "encrypt_glwe_preset_u128",
    "decrypt_glwe_u128",
    "generate_bootstrap_key_u128",
    "make_lut_glwe",
]

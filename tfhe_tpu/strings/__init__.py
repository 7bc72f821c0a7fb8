"""Encrypted ASCII strings (ref: tfhe/examples/fhe_strings/)."""

from typing import Optional

from ..integer import gen_keys_radix
from ..params import (
    ClassicPBSParameters,
    PARAM_MESSAGE_2_CARRY_2_KS_PBS,
    PARAM_MESSAGE_2_CARRY_2_COMPACT_TEST,
)
from .ciphertext import FheAsciiChar, FheSplit, FheString, Padding
from .client_key import NUMBER_BLOCKS, ConversionError, StringClientKey
from .server_key import StringServerKey


def gen_keys(params: ClassicPBSParameters = PARAM_MESSAGE_2_CARRY_2_KS_PBS,
             seed: Optional[int] = None, cache_dir: Optional[str] = None):
    """(ref: fhe_strings/ciphertext.rs gen_keys)"""
    cks, sks = gen_keys_radix(params, NUMBER_BLOCKS, seed=seed,
                              cache_dir=cache_dir)
    return StringClientKey(cks), StringServerKey(sks)


def gen_keys_test(seed: Optional[int] = None):
    """Insecure fast-test keys (ref: ciphertext.rs:93 gen_keys_test)."""
    return gen_keys(PARAM_MESSAGE_2_CARRY_2_COMPACT_TEST, seed=seed)


__all__ = [
    "FheString",
    "FheSplit",
    "FheAsciiChar",
    "Padding",
    "StringClientKey",
    "StringServerKey",
    "ConversionError",
    "NUMBER_BLOCKS",
    "gen_keys",
    "gen_keys_test",
]

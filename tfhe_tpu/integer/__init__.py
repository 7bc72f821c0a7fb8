"""Radix big integers over shortint blocks (ref: tfhe/src/integer/)."""

from typing import Optional

from ..params import ClassicPBSParameters
from ..shortint import ServerKey as ShortintServerKey, gen_keys as shortint_gen_keys
from .ciphertext import BooleanBlock, RadixCiphertext
from .client_key import RadixClientKey
from .server_key import IntegerServerKey
from .signed import SignedRadixCiphertext
from .wopbs import IntegerWopbsKey, IntegerWopbsLUT
from .crt import (
    CrtCiphertext,
    CrtClientKey,
    CrtServerKey,
    gen_keys_crt,
    i_crt,
)


def gen_keys_radix(params: ClassicPBSParameters, num_blocks: int,
                   seed: Optional[int] = None,
                   cache_dir: Optional[str] = None):
    """(ref: tfhe/src/integer/mod.rs:171 gen_keys_radix; with cache_dir +
    seed the raw keys ride the shortint keycache, ref: integer/keycache.rs)
    """
    if cache_dir is not None and seed is not None:
        s_cks, s_sks = shortint_gen_keys(params, seed=seed,
                                         cache_dir=cache_dir)
        cks = RadixClientKey(params, num_blocks, _key=s_cks)
        return cks, IntegerServerKey(s_sks)
    cks = RadixClientKey(params, num_blocks, seed=seed)
    sks = IntegerServerKey(ShortintServerKey(cks.key))
    return cks, sks


__all__ = [
    "IntegerWopbsKey",
    "IntegerWopbsLUT",
    "CrtCiphertext",
    "CrtClientKey",
    "CrtServerKey",
    "gen_keys_crt",
    "i_crt",
    "RadixCiphertext",
    "SignedRadixCiphertext",
    "BooleanBlock",
    "RadixClientKey",
    "IntegerServerKey",
    "gen_keys_radix",
]

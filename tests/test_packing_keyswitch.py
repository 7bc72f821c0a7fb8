"""LWE-list -> GLWE packing keyswitch round trip.

(ref: algorithms/lwe_packing_keyswitch.rs doc test: keyswitch a list of
LWE ciphertexts and pack message k at coefficient k.)
"""

import numpy as np

from tfhe_tpu import core
from tfhe_tpu.prng.generators import (EncryptionRandomGenerator,
                                      SecretRandomGenerator)
from tfhe_tpu.prng.stream import Seeder


def test_pack_lwe_list_into_glwe():
    bits = 64
    n_in, k, N = 24, 1, 64
    bl, L = 12, 3
    msg_mod = 16
    delta = (1 << 63) // msg_mod
    sgen = SecretRandomGenerator(11)
    lwe_sk = core.generate_binary_lwe_secret_key(n_in, sgen)
    glwe_sk = core.generate_binary_glwe_secret_key(k, N, sgen)
    egen = EncryptionRandomGenerator(5, Seeder(5))

    pksk = core.generate_packing_keyswitch_key(
        lwe_sk, glwe_sk, bl, L, 9.1e-13, egen)

    rng = np.random.default_rng(0)
    B = 8
    msgs = rng.integers(0, msg_mod, B)
    cts = np.asarray(core.encrypt_lwe(
        lwe_sk, msgs.astype(np.uint64) * np.uint64(delta), 9.1e-13, egen))

    glwe = np.asarray(core.packing_keyswitch(pksk, bl, cts))
    # decrypt the GLWE and read coefficients 0..B-1
    decoded = np.asarray(core.decrypt_glwe(glwe_sk, glwe[None]))[0]
    vals = ((decoded.astype(np.uint64) + np.uint64(delta // 2))
            >> np.uint64(63 - 4)) % np.uint64(msg_mod)
    assert np.array_equal(vals[:B], msgs)
    # single-ciphertext variant: message lands at X^0
    g1 = np.asarray(core.packing_keyswitch(pksk, bl, cts[0]))
    d1 = np.asarray(core.decrypt_glwe(glwe_sk, g1[None]))[0]
    v1 = int((int(d1[0]) + delta // 2) >> (63 - 4)) % msg_mod
    assert v1 == msgs[0]

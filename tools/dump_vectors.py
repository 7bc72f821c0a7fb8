"""Dump golden vectors from THIS framework in the reference fixture schema.

Two uses:
1. `python tools/dump_vectors.py selfgen` writes
   `tests/golden/selfgen.json` — a self-generated fixture that locks the
   current PRNG/keygen/encryption byte behavior (regression guard).
2. Compare mode is implicit: tests/test_golden.py loads every
   `tests/golden/*.json` (including a `reference.json` produced by
   `tools/dump_vectors.rs` inside the reference tree) and checks this
   framework reproduces each vector bit-exactly.

Schema documented in tools/dump_vectors.rs.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def _hex(b) -> str:
    return bytes(np.asarray(b, dtype=np.uint8)).hex()


def dump_stream(seed: int) -> dict:
    from tfhe_tpu.prng.stream import AesCtrStream

    gen = AesCtrStream(seed)
    first = gen.next_bytes(64)
    gen2 = AesCtrStream(seed)
    children = gen2.try_fork(4, 8)
    child_bytes = [_hex(c.next_bytes(8)) for c in children]
    parent_next = gen2.next_bytes(16)
    return {
        "seed": str(seed),
        "first_bytes": _hex(first),
        "forks": [{
            "n_children": 4,
            "bytes_per_child": 8,
            "child_bytes": child_bytes,
            "parent_next": _hex(parent_next),
        }],
    }


def dump_secret_key(seed: int, n: int) -> dict:
    from tfhe_tpu.prng.generators import SecretRandomGenerator

    gen = SecretRandomGenerator(seed)
    bits = gen.random_binary(n).astype(np.uint8)
    return {"seed": str(seed), "lwe_dimension": n, "bits": _hex(bits)}


def dump_lwe_encryption(sk_seed: int, enc_seed: int, n: int, pt: int,
                        std_dev: float) -> dict:
    from tfhe_tpu import core
    from tfhe_tpu.prng.generators import (EncryptionRandomGenerator,
                                          SecretRandomGenerator)
    from tfhe_tpu.prng.stream import Seeder

    sk = core.generate_binary_lwe_secret_key(n, SecretRandomGenerator(sk_seed))
    enc = EncryptionRandomGenerator(enc_seed, Seeder(enc_seed))
    ct = np.asarray(core.encrypt_lwe(sk, np.asarray([pt], np.uint64),
                                     std_dev, enc))[0]
    return {
        "secret_seed": str(sk_seed), "enc_seed": str(enc_seed),
        "lwe_dimension": n, "plaintext": str(pt), "std_dev": std_dev,
        "ct": [str(int(w)) for w in ct],
    }


def build(kind: str) -> dict:
    seeds = [0, 1, 0x0123456789ABCDEFFEDCBA9876543210]
    return {
        "kind": kind,
        "streams": [dump_stream(s) for s in seeds],
        "secret_keys": [dump_secret_key(s, 32) for s in (7, 8)],
        "lwe_encryptions": [
            dump_lwe_encryption(7, 99, 16, 3 << 59, 1.9e-5),
            dump_lwe_encryption(8, 100, 24, 11 << 58, 7.07e-6),
        ],
    }


if __name__ == "__main__":
    kind = sys.argv[1] if len(sys.argv) > 1 else "selfgen"
    out = build(kind)
    path = os.path.join(os.path.dirname(__file__), os.pardir, "tests",
                        "golden", f"{kind}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)

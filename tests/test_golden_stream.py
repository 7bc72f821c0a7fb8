"""Cross-implementation stream vectors: library vs reference semantics.

The frozen vectors in tests/golden/reference_stream_kats.json were derived
by tests/oracle_stream.py — an INDEPENDENT from-scratch AES (anchored on
the FIPS-197 appendix-C KAT before every run) implementing the reference's
documented stream construction verbatim (ref citations in the JSON and in
oracle_stream.py).  Any divergence in tfhe_tpu's PRNG chain — key byte
order, counter layout, table start index, fork partitioning, or the
gaussian rejection loop's byte consumption — fails these tests.
"""

import json
import os

import numpy as np

from oracle_stream import OracleStream, aes128_encrypt
from tfhe_tpu.prng.sampling import gaussian_pairs
from tfhe_tpu.prng.stream import AesCtrStream

SEED = 0x000102030405060708090A0B0C0D0E0F

with open(os.path.join(os.path.dirname(__file__), "golden",
                       "reference_stream_kats.json")) as f:
    KATS = json.load(f)


def test_oracle_aes_fips_anchor():
    """The oracle itself must reproduce FIPS-197 C.1 before it counts."""
    ct = aes128_encrypt(bytes(range(16)),
                        bytes.fromhex("00112233445566778899aabbccddeeff"))
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_stream_bytes_match_reference_semantics():
    s = AesCtrStream(SEED)
    got = bytes(s.next_bytes(48)).hex()
    assert got == KATS["stream_first_48"]
    # and the oracle agrees with its own frozen output (derivation is
    # deterministic — guards accidental edits of the JSON)
    assert OracleStream(SEED).next_bytes(48).hex() == KATS["stream_first_48"]


def test_fork_partitioning_matches_reference_semantics():
    s = AesCtrStream(SEED)
    kids = s.try_fork(3, 16)
    want = KATS["fork_3x16"]
    for k, w in zip(kids, want["children"]):
        assert bytes(k.next_bytes(16)).hex() == w
    assert bytes(s.next_bytes(8)).hex() == want["parent_after"]

    s2 = AesCtrStream(SEED)
    kids2 = s2.try_fork(3, 16)
    sub = kids2[1].try_fork(2, 4)
    got = [bytes(c.next_bytes(4)).hex() for c in sub]
    assert got == want["nested_child1_fork"]


def test_gaussian_sampling_matches_reference_semantics():
    s = AesCtrStream(SEED)
    got = gaussian_pairs(s, 3, 2.0 ** -25)
    want = KATS["gaussian_std_2m25"]
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(want["samples"]))
    # byte consumption must match the reference's one-record-at-a-time
    # rejection loop exactly (keygen reproducibility depends on it)
    assert s.current - 1 == want["bytes_consumed"]

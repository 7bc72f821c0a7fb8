"""CSPRNG tests (ref test strategy: SURVEY.md §4.11 — per-implementation
generator tests + known-answer vectors)."""

import numpy as np
import pytest

from tfhe_tpu.prng.aes import Aes128, key_expansion, encrypt_blocks_numpy
from tfhe_tpu.prng import AesCtrStream, Seeder
from tfhe_tpu.prng.sampling import gaussian_pairs, uniform_binary, uniform_torus


def test_aes_fips197_vector():
    key = bytes(range(16))
    pt = np.frombuffer(
        bytes.fromhex("00112233445566778899aabbccddeeff"), dtype=np.uint8
    ).reshape(1, 16).copy()
    ct = encrypt_blocks_numpy(key_expansion(key), pt)
    assert ct.tobytes().hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_native_matches_numpy():
    a = Aes128(0x0123456789ABCDEF0123456789ABCDEF)
    native = a.ctr_blocks(5, 10)
    a._native = None
    soft = a.ctr_blocks(5, 10)
    assert np.array_equal(native, soft)


def test_stream_split_invariance():
    s1 = AesCtrStream(42)
    b1 = s1.next_bytes(37).copy()
    s2 = AesCtrStream(42)
    b2 = np.concatenate([s2.next_bytes(10), s2.next_bytes(27)])
    assert np.array_equal(b1, b2)


def test_fork_partitions_stream():
    parent = AesCtrStream(42)
    ref = AesCtrStream(42)
    kids = parent.try_fork(3, 100)
    whole = ref.next_bytes(300)
    for i, kid in enumerate(kids):
        assert np.array_equal(kid.next_bytes(100), whole[i * 100:(i + 1) * 100])
    # parent continues after the forked range
    assert np.array_equal(parent.next_bytes(16), ref.next_bytes(16))


def test_fork_exhaustion_raises():
    s = AesCtrStream(1)
    kids = s.try_fork(1, 8)
    kids[0].next_bytes(8)
    with pytest.raises(Exception):
        kids[0].next_bytes(1)


def test_gaussian_moments():
    st = AesCtrStream(7)
    v = gaussian_pairs(st, 20000, std=1.0)
    assert abs(v.mean()) < 0.02
    # same relative tolerance the reference's noise tests use (1/16)
    assert abs(v.std() - 1.0) < 1.0 / 16.0


def test_gaussian_batched_equals_sequential():
    a, b = AesCtrStream(9), AesCtrStream(9)
    va = gaussian_pairs(a, 50, std=1.0)
    vb = np.concatenate([gaussian_pairs(b, 1, std=1.0) for _ in range(50)])
    assert np.array_equal(va, vb)
    assert a.current == b.current


def test_uniform_sampling_shapes():
    st = AesCtrStream(3)
    assert uniform_torus(st, 10, bits=64).dtype == np.uint64
    assert uniform_torus(st, 10, bits=32).dtype == np.uint32
    bits = uniform_binary(st, 1000)
    assert set(np.unique(bits)) <= {0, 1}
    assert 300 < bits.sum() < 700


def test_seeder_deterministic():
    s1, s2 = Seeder(99), Seeder(99)
    assert [s1.seed() for _ in range(4)] == [s2.seed() for _ in range(4)]

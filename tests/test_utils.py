"""Keycache and profiling utility tests (ref: tfhe/src/keycache/mod.rs
tests + criterion JSON schema of ci/benchmark_parser.py)."""

import json

import numpy as np

from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST as P
from tfhe_tpu.utils import KeyCache, OpTimer


def test_keycache_roundtrip(tmp_path):
    cache = KeyCache(str(tmp_path))
    cks, sks = cache.get_shortint_keys(P, seed=11)
    # a second cache instance reloads from disk, not regeneration
    cache2 = KeyCache(str(tmp_path))
    cks2, sks2 = cache2.get_shortint_keys(P, seed=11)
    np.testing.assert_array_equal(cks.lwe_sk.bits_array,
                                  cks2.lwe_sk.bits_array)
    np.testing.assert_array_equal(np.asarray(sks.raw_bsk),
                                  np.asarray(sks2.raw_bsk))
    # cached server key still computes
    ct = cks.encrypt_batch([1, 2])
    lut = sks2.generate_lookup_table(lambda x: (x + 1) % 4)
    out = sks2.apply_lookup_table_batch(ct, lut)
    np.testing.assert_array_equal(cks2.decrypt_batch(out), [2, 3])


def test_keycache_memory_tier(tmp_path):
    cache = KeyCache(str(tmp_path))
    calls = []
    obj1 = cache.get("x", lambda: (calls.append(1), P)[1])
    obj2 = cache.get("x", lambda: (calls.append(1), P)[1])
    assert obj1 == obj2 == P
    assert len(calls) == 1


def test_op_timer():
    t = OpTimer()
    with t.measure("op_a"):
        sum(range(1000))
    with t.measure("op_a"):
        sum(range(1000))
    recs = t.records()
    assert len(recs) == 1 and recs[0]["samples"] == 2
    json.loads(t.dump_json())

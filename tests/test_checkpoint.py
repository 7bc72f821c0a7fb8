"""Checkpoint/resume + failure-injection tests for long FHE jobs
(the multi-host recovery subsystem, SURVEY.md section 5)."""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.parallel import CheckpointManager, ResumableBatchRunner
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_TEST as P
from tfhe_tpu.shortint.ciphertext import ShortintBatch


@pytest.fixture(scope="module")
def keys():
    return shortint.gen_keys(P, seed=909)


def _wrap(p):
    def wrap(arr):
        return ShortintBatch(
            data=arr, degrees=np.full(arr.shape[0], 3, dtype=np.int64),
            message_modulus=p.message_modulus, carry_modulus=p.carry_modulus)

    return wrap


def _unwrap(obj):
    return np.asarray(obj.data)


def test_checkpoint_manager_roundtrip(tmp_path, keys):
    cks, _ = keys
    mgr = CheckpointManager(str(tmp_path))
    batch = cks.encrypt_batch([1, 2, 3])
    mgr.save(0, {"chunk": batch})
    mgr.save(1, {"chunk": batch})
    assert mgr.latest_step() == 1
    loaded = mgr.load(0)["chunk"]
    np.testing.assert_array_equal(np.asarray(loaded.data),
                                  np.asarray(batch.data))


def test_resumable_run_no_failure(tmp_path, keys):
    cks, sks = keys
    msgs = np.arange(16, dtype=np.uint64) % 4
    ct = cks.encrypt_batch(msgs)
    lut = sks.generate_lookup_table(lambda x: (x + 1) % 4)

    def fn(chunk):
        b = ShortintBatch(
            data=chunk, degrees=np.full(chunk.shape[0], 3, dtype=np.int64),
            message_modulus=P.message_modulus,
            carry_modulus=P.carry_modulus)
        return np.asarray(sks.apply_lookup_table_batch(b, lut).data)

    runner = ResumableBatchRunner(CheckpointManager(str(tmp_path)), 4)
    out = runner.run(fn, np.asarray(ct.data), _wrap(P), _unwrap)
    dec = cks.decrypt_batch(out)
    np.testing.assert_array_equal(dec, (msgs + 1) % 4)


def test_resume_after_crash(tmp_path, keys):
    """Crash mid-job, restart, resume from the checkpoint: completed
    chunks are not recomputed and the final result is identical."""
    cks, sks = keys
    msgs = np.arange(16, dtype=np.uint64) % 4
    ct = cks.encrypt_batch(msgs)
    lut = sks.generate_lookup_table(lambda x: (3 * x) % 4)
    calls = []

    def make_fn(crash_at):
        def fn(chunk):
            calls.append(1)
            if crash_at is not None and len(calls) == crash_at:
                raise RuntimeError("injected slice preemption")
            b = ShortintBatch(
                data=chunk,
                degrees=np.full(chunk.shape[0], 3, dtype=np.int64),
                message_modulus=P.message_modulus,
                carry_modulus=P.carry_modulus)
            return np.asarray(sks.apply_lookup_table_batch(b, lut).data)

        return fn

    mgr = CheckpointManager(str(tmp_path))
    runner = ResumableBatchRunner(mgr, 4, max_retries=0)
    with pytest.raises(RuntimeError):
        runner.run(make_fn(3), np.asarray(ct.data), _wrap(P), _unwrap)
    done_before_crash = len(calls)
    assert mgr.latest_step() == 1  # chunks 0 and 1 completed

    # "restart": a fresh runner resumes where the old one died
    calls.clear()
    runner2 = ResumableBatchRunner(mgr, 4, max_retries=0)
    out = runner2.run(make_fn(None), np.asarray(ct.data), _wrap(P), _unwrap)
    assert len(calls) == 2  # only the 2 remaining chunks ran
    np.testing.assert_array_equal(cks.decrypt_batch(out), (3 * msgs) % 4)
    del done_before_crash


def test_retry_transient_failure(tmp_path, keys):
    cks, sks = keys
    msgs = np.array([0, 1, 2, 3], dtype=np.uint64)
    ct = cks.encrypt_batch(msgs)
    lut = sks.generate_lookup_table(lambda x: x)
    attempts = []

    def fn(chunk):
        attempts.append(1)
        if len(attempts) == 1:
            raise RuntimeError("transient")
        b = ShortintBatch(
            data=chunk, degrees=np.full(chunk.shape[0], 3, dtype=np.int64),
            message_modulus=P.message_modulus,
            carry_modulus=P.carry_modulus)
        return np.asarray(sks.apply_lookup_table_batch(b, lut).data)

    runner = ResumableBatchRunner(CheckpointManager(str(tmp_path)), 4,
                                  max_retries=2, backoff_s=0.01)
    out = runner.run(fn, np.asarray(ct.data), _wrap(P), _unwrap)
    assert len(attempts) == 2
    np.testing.assert_array_equal(cks.decrypt_batch(out), msgs)

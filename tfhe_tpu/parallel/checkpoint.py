"""Checkpoint/resume and failure handling for long-running FHE jobs.

The reference has no distributed runtime, so its nearest analogue is
serde-serializable keys + the keycache (ref: tfhe/src/keycache/mod.rs,
entities/seeded_* compression).  A TPU deployment needs more: a pod job
that bootstraps millions of ciphertexts must survive slice preemption and
host restarts.  This subsystem provides:

- CheckpointManager: atomic on-disk snapshots of any serializable objects
  (keys, ciphertext batches) with monotonically numbered steps and
  last-good discovery — the "checkpoint reload" half of recovery;
- ResumableBatchRunner: chunked execution of a batched FHE function with
  a checkpoint after every chunk, automatic retry with exponential
  backoff on device failure, and exact resume (completed chunks are never
  recomputed, so results are bit-identical to an uninterrupted run —
  guaranteed by the exact NTT backend's determinism).

Multi-host: every host runs the same chunk schedule (data-parallel over
the mesh); `host_tag` isolates per-host checkpoint streams so a restarted
slice reloads only its own shard.
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from ..utils.serialization import safe_deserialize, safe_serialize


class CheckpointManager:
    def __init__(self, directory: str, host_tag: str = "host0"):
        self.directory = directory
        self.host_tag = host_tag
        os.makedirs(directory, exist_ok=True)

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"{self.host_tag}_step{step:08d}")

    def save(self, step: int, objects: Dict[str, Any]) -> None:
        """Atomic: writes into a temp dir, then renames (a crash mid-save
        leaves no half-visible checkpoint)."""
        final = self._step_dir(step)
        tmp = final + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        manifest = {"step": step, "keys": sorted(objects), "ts": time.time()}
        for name, obj in objects.items():
            with open(os.path.join(tmp, f"{name}.bin"), "wb") as f:
                f.write(safe_serialize(obj))
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        if os.path.exists(final):
            # never overwrite a completed checkpoint
            for fn in os.listdir(tmp):
                os.remove(os.path.join(tmp, fn))
            os.rmdir(tmp)
            return
        os.rename(tmp, final)

    def latest_step(self) -> Optional[int]:
        pat = re.compile(rf"{re.escape(self.host_tag)}_step(\d+)$")
        steps = []
        for name in os.listdir(self.directory):
            m = pat.match(name)
            if m and os.path.exists(os.path.join(self.directory, name,
                                                 "manifest.json")):
                steps.append(int(m.group(1)))
        return max(steps) if steps else None

    def load(self, step: int) -> Dict[str, Any]:
        d = self._step_dir(step)
        with open(os.path.join(d, "manifest.json")) as f:
            manifest = json.load(f)
        out = {}
        for name in manifest["keys"]:
            with open(os.path.join(d, f"{name}.bin"), "rb") as f:
                out[name] = safe_deserialize(f.read())
        return out

    def load_latest(self) -> Tuple[Optional[int], Dict[str, Any]]:
        step = self.latest_step()
        if step is None:
            return None, {}
        return step, self.load(step)


class DeviceFailure(RuntimeError):
    pass


def default_health_check() -> None:
    """Probe the backend; raises on a dead device/slice
    (the restart hook point for jax.distributed re-initialization)."""
    import jax

    devs = jax.devices()
    if not devs:
        raise DeviceFailure("no devices visible")
    # tiny round-trip computation
    np.asarray(jax.numpy.zeros((1,)) + 1)


class ResumableBatchRunner:
    """Run `fn(chunk_array) -> result_array` over a large batch in chunks,
    checkpointing each completed chunk and resuming exactly after failures.
    """

    def __init__(self, ckpt: CheckpointManager, chunk_size: int,
                 max_retries: int = 3, backoff_s: float = 0.1,
                 health_check: Callable[[], None] = default_health_check):
        self.ckpt = ckpt
        self.chunk_size = chunk_size
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.health_check = health_check

    def run(self, fn: Callable[[np.ndarray], Any], data: np.ndarray,
            wrap: Callable[[np.ndarray], Any],
            unwrap: Callable[[Any], np.ndarray]) -> np.ndarray:
        """`wrap`/`unwrap` convert chunk results to/from a serializable
        object (e.g. a ShortintBatch)."""
        n = data.shape[0]
        n_chunks = -(-n // self.chunk_size)
        start_step, state = self.ckpt.load_latest()
        done = (start_step + 1) if start_step is not None else 0
        results: List[np.ndarray] = [
            unwrap(self.ckpt.load(i)["chunk"]) for i in range(done)
        ]
        for i in range(done, n_chunks):
            lo, hi = i * self.chunk_size, min((i + 1) * self.chunk_size, n)
            chunk = data[lo:hi]
            attempt = 0
            while True:
                try:
                    self.health_check()
                    out = np.asarray(fn(chunk))
                    break
                except Exception:
                    attempt += 1
                    if attempt > self.max_retries:
                        raise
                    time.sleep(self.backoff_s * (2 ** (attempt - 1)))
            self.ckpt.save(i, {"chunk": wrap(out)})
            results.append(out)
        return np.concatenate(results, axis=0)

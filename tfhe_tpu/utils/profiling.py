"""Profiling and observability hooks.

The reference exposes hot-kernel frames to external profilers via a
`__profiling` cargo feature and measures everything with criterion benches
(ref: tfhe/Cargo.toml:127, fft64/crypto/ggsw.rs:476/600/615 inline(never)
attrs; ci/benchmark_parser.py schema).  The TPU equivalents:

- `trace(logdir)`: wraps jax.profiler.trace so a block of FHE ops lands in
  a TensorBoard/XProf trace with named steps;
- `annotate(name)`: TraceAnnotation for kernel-level attribution;
- `OpTimer`: lightweight wall-clock histogram per labelled op, emitting
  the same JSON record shape as ci/benchmark_parser.py (name, value,
  unit) so existing dashboards ingest it.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, List


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """JAX profiler trace around a block (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (ref: the __profiling frame markers)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class OpTimer:
    """Wall-clock accounting per labelled operation."""

    def __init__(self):
        self._samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def measure(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples[name].append(time.perf_counter() - t0)

    def records(self) -> List[dict]:
        """criterion/benchmark_parser-style records
        (ref: ci/benchmark_parser.py:40-60)."""
        out = []
        for name, samples in sorted(self._samples.items()):
            mean = sum(samples) / len(samples)
            out.append({
                "name": name,
                "value": mean * 1e3,
                "unit": "ms",
                "samples": len(samples),
                "min_ms": min(samples) * 1e3,
                "max_ms": max(samples) * 1e3,
                "ops_per_sec": (1.0 / mean) if mean > 0 else None,
            })
        return out

    def dump_json(self) -> str:
        return "\n".join(json.dumps(r) for r in self.records())

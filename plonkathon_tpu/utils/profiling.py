"""Lightweight tracing/profiling helpers (SURVEY §5.1 counterpart).

The reference's only instrumentation is print statements and a mock-adder op
counter (curve.py:137-149).  Here:

* `annotate(label)` — context manager emitting an XLA/TPU profiler trace
  annotation (visible in `jax.profiler` traces) and recording wall time.
* `capture(dir)` — context manager around `jax.profiler.trace` for full
  device traces viewable in TensorBoard/XProf.
* `Timings` — a tiny named-section wall-clock registry used by the prover's
  profile mode.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Timings:
    def __init__(self):
        self.sections = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.sections[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {"seconds": round(secs, 6), "calls": self.counts[name]}
            for name, secs in sorted(self.sections.items())
        }


@contextlib.contextmanager
def annotate(label: str):
    """Trace annotation that shows up in device profiles."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(label):
        yield


@contextlib.contextmanager
def capture(log_dir: str):
    """Capture a full device trace into `log_dir` (TensorBoard format)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

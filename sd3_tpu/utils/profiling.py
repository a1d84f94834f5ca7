"""Profiling utilities.

The reference has no tracing/profiling at all (SURVEY.md §5.1). Here:
- `trace(dir)`: context manager around jax.profiler (xplane traces viewable
  in TensorBoard/XProf/Perfetto);
- `annotate(name)`: TraceAnnotation for named regions inside a step;
- `StepTimer`: host-side step timing with percentile summary and optional
  JSONL sink.
"""

from __future__ import annotations

import contextlib
import json
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, sink_path: str | None = None):
        self.times: list[float] = []
        self._t0 = None
        self._sink = open(sink_path, "a") if sink_path else None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if self._sink:
            self._sink.write(json.dumps({"step_time": dt}) + "\n")
            self._sink.flush()

    def summary(self) -> dict:
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {"mean": float(a.mean()), "p50": float(np.percentile(a, 50)),
                "p90": float(np.percentile(a, 90)),
                "p99": float(np.percentile(a, 99)), "n": len(a)}

"""Tracing / profiling hooks (SURVEY.md §5.1 — new first-class surface;
the reference has no in-repo tracer).

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace;
* :func:`annotate` — named region annotation visible in the trace;
* :class:`StepTimer` — rolling wall-clock step statistics for quick
  throughput readouts without a full trace.
"""

import contextlib
import time
from collections import deque
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (use as context manager)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, window: int = 50, batch_size: Optional[int] = None):
        self.window = window
        self.batch_size = batch_size
        self.times = deque(maxlen=window)
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        times = sorted(self.times)
        mean = sum(times) / len(times)
        out = {
            "step_time_mean_s": mean,
            "step_time_p50_s": times[len(times) // 2],
            "step_time_p90_s": times[int(len(times) * 0.9)],
            "steps_per_sec": 1.0 / mean,
        }
        if self.batch_size:
            out["images_per_sec"] = self.batch_size / mean
        return out

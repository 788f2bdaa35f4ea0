"""Profiling/tracing utilities.

The reference had no built-in profiling (SURVEY.md §5.1 — print-based
progress + a line_profiler import in a test).  Here: a step timer that
reports steady-state throughput, and jax.profiler trace capture around any
callable for the TPU profile viewer.
"""
import contextlib
import time

import jax


class StepTimer:
    """Rolling per-step wall-time + throughput meter."""

    def __init__(self, warmup=2):
        self.warmup = warmup
        self.times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def steady_times(self):
        return self.times[self.warmup:]

    def mean_step_time(self):
        t = self.steady_times
        return sum(t) / len(t) if t else float("nan")

    def throughput(self, items_per_step):
        mt = self.mean_step_time()
        return items_per_step / mt if mt and mt == mt else 0.0

    def report(self, items_per_step=None):
        out = {
            "steps": len(self.times),
            "mean_step_ms": self.mean_step_time() * 1e3,
        }
        if items_per_step:
            out["items_per_sec"] = self.throughput(items_per_step)
        return out


@contextlib.contextmanager
def trace(log_dir="/tmp/deepards_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named trace span for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)

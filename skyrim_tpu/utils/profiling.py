"""Tracing/profiling hooks — the observability gap the reference leaves
open (SURVEY.md §5: ad-hoc wall timing only).

- ``trace(dir)``: jax.profiler trace context (view in TensorBoard /
  xprof)
- ``annotate(name)``: named region inside a trace
- ``StepTimer``: per-step wall-time stats for rollout loops, with the
  scalar-fetch forcing required on async/tunneled backends
"""

from __future__ import annotations

import contextlib
import statistics
import time

import jax

from skyrim_tpu.utils.logging import logger


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/skyrim_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named region context (shows up in xprof timelines)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Collects per-step wall times; forces execution via scalar fetch."""

    def __init__(self, name: str = "step"):
        self.name = name
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def force(self, array) -> float:
        """Block on a device value by fetching a scalar reduction."""
        import jax.numpy as jnp

        return float(jnp.mean(array))

    @property
    def stats(self) -> dict:
        if not self.times:
            return {}
        return {
            "n": len(self.times),
            "mean_s": statistics.fmean(self.times),
            "min_s": min(self.times),
            "max_s": max(self.times),
        }

    def log(self):
        s = self.stats
        if s:
            logger.info(
                "%s: n=%d mean=%.3fs min=%.3fs max=%.3fs",
                self.name, s["n"], s["mean_s"], s["min_s"], s["max_s"],
            )

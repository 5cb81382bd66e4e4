"""Timing and tracing helpers — the observability the reference lacks.

SURVEY.md section 5: the reference's only instrumentation is ``time.time``
prints.  Here: a solve-rate timer with percentile stats (the solves/s and
real-time-budget metrics from BASELINE.md) and a thin wrapper over the JAX
profiler for TPU traces viewable in XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np
import jax


@dataclass
class SolveTimer:
    """Collects per-solve wall times (seconds)."""

    times: List[float] = field(default_factory=list)

    @contextlib.contextmanager
    def measure(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.times.append(time.perf_counter() - t0)

    def record(self, seconds: float) -> None:
        self.times.append(seconds)

    def stats(self) -> dict:
        t = np.asarray(self.times)
        if t.size == 0:
            return {}
        return {
            "n": int(t.size),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
            "p99_ms": float(np.percentile(t, 99) * 1e3),
            "solves_per_s": float(1.0 / t.mean()),
            # BASELINE.md real-time budget: solve < 10 ms for 100 Hz control.
            "meets_100hz_budget": bool(np.percentile(t, 99) < 0.010),
        }


def time_fn(fn: Callable, *args, iters: int = 50, warmup: int = 3) -> dict:
    """Steady-state timing of a jitted callable (blocks on every result)."""
    timer = SolveTimer()
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        timer.record(time.perf_counter() - t0)
    return timer.stats()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/qmm_trace"):
    """JAX profiler trace context (open in XProf / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()

"""Profiling/timing utilities."""

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.utils import profiling


def test_solve_timer_stats():
    t = profiling.SolveTimer()
    for v in [0.001, 0.002, 0.003, 0.004]:
        t.record(v)
    s = t.stats()
    assert s["n"] == 4
    assert abs(s["mean_ms"] - 2.5) < 1e-6
    assert s["solves_per_s"] == 400.0
    assert s["meets_100hz_budget"] is True
    t.record(0.05)
    assert t.stats()["meets_100hz_budget"] is False


def test_time_fn_runs():
    f = jax.jit(lambda x: x * 2 + 1)
    s = profiling.time_fn(f, jnp.arange(128.0), iters=5, warmup=2)
    assert s["n"] == 5
    assert s["mean_ms"] > 0


def test_measure_context():
    t = profiling.SolveTimer()
    x = jnp.arange(16.0)
    with t.measure(result_to_block=x):
        y = x + 1
    assert len(t.times) == 1

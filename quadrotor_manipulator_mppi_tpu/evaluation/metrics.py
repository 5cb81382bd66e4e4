"""Flight-quality metrics — rotors_evaluation parity, over in-framework logs.

The reference's only automated harness analyzes recorded rosbags:
``/root/reference/src/rotors_simulator/rotors_evaluation/src/hovering_eval.py:22-60``
(windowed RMS position error with pass thresholds 0.2 m / 0.2 rad/s, settling
time into a radius), ``waypoints_eval.py`` (per-waypoint response), and
``disturbance_eval.py`` (recovery).  Here the same metrics are pure functions
over trajectory arrays produced by ``sim/closed_loop`` scans — no bags, no
message parsing, directly jittable and batchable over scenario axes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array

# hovering_eval.py:26-27 pass thresholds.
HOVER_POS_RMS_THRESHOLD = 0.2       # [m]
HOVER_ANG_RATE_THRESHOLD = 0.2      # [rad/s]


class HoverMetrics(NamedTuple):
    pos_rms: Array        # windowed RMS position error [m]
    ang_rate_rms: Array   # windowed RMS angular rate [rad/s]
    settling_time: Array  # first time the error stays inside the radius [s]
    passed: Array         # bool vs the reference thresholds


def rms(x: Array, axis=None) -> Array:
    return jnp.sqrt(jnp.mean(x * x, axis=axis))


def position_rms_error(pos: Array, target: Array) -> Array:
    """RMS of |p_t - p*| over the trajectory's time axis (pos: [..., T, 3])."""
    return jnp.sqrt(jnp.mean(jnp.sum((pos - target) ** 2, axis=-1), axis=-1))


def settling_time(
    pos: Array, target: Array, dt: float, radius: float = 0.1
) -> Array:
    """Earliest time after which the position error never leaves ``radius``
    (hovering_eval's settling notion).  Returns T*dt if never settled."""
    err = jnp.linalg.norm(pos - target, axis=-1)  # [..., T]
    outside = err > radius
    # Last index that is outside; settled from the next step on.
    t_idx = jnp.arange(err.shape[-1])
    last_outside = jnp.max(jnp.where(outside, t_idx, -1), axis=-1)
    return (last_outside + 1).astype(pos.dtype) * dt


def hover_metrics(
    pos: Array,
    ang_rate: Array,
    target: Array,
    dt: float,
    window_start_frac: float = 0.5,
) -> HoverMetrics:
    """Evaluate a hover log (pos/ang_rate: [T, 3]) over the trailing window
    (the reference evaluates a window after takeoff settles)."""
    t0 = int(pos.shape[-2] * window_start_frac)
    pos_w = pos[..., t0:, :]
    rate_w = ang_rate[..., t0:, :]
    pos_rms = position_rms_error(pos_w, target)
    rate_rms = rms(jnp.linalg.norm(rate_w, axis=-1), axis=-1)
    st = settling_time(pos, target, dt)
    passed = (pos_rms <= HOVER_POS_RMS_THRESHOLD) & (
        rate_rms <= HOVER_ANG_RATE_THRESHOLD
    )
    return HoverMetrics(
        pos_rms=pos_rms, ang_rate_rms=rate_rms, settling_time=st, passed=passed
    )


def waypoint_response(
    pos: Array, waypoint: Array, dt: float, radius: float = 0.1
) -> Array:
    """Time to first enter the waypoint radius (waypoints_eval parity);
    returns T*dt if never reached."""
    err = jnp.linalg.norm(pos - waypoint, axis=-1)
    inside = err <= radius
    t_idx = jnp.arange(err.shape[-1])
    big = err.shape[-1]
    first = jnp.min(jnp.where(inside, t_idx, big), axis=-1)
    return first.astype(pos.dtype) * dt


def tracking_rmse(actual: Array, reference: Array, axis=-2) -> Array:
    """Generic trajectory-tracking RMSE (the BASELINE.md parity metric)."""
    return jnp.sqrt(jnp.mean(jnp.sum((actual - reference) ** 2, axis=-1), axis=-1))


def reach_convergence(err, gate: float = 0.005, hold_ticks: int = 50):
    """Debounced reach convergence: the first step from which ``err < gate``
    holds ``hold_ticks`` CONSECUTIVE steps — the reference's own convergence
    pattern (``kinova.py:154-157`` requires its home gate held 50 ticks
    before switching phases; a single grazing dip does not count as
    converged).  Returns ``(converged_step, held_fraction_after)`` with
    ``(-1, 0.0)`` when the episode never converges.

    Complements the raw first-dip metric (``mppi.py:117`` applied per
    step): report both — the raw number shows when the gate is first
    touched, this one when it is actually HELD.
    """
    r = np.asarray(err) < gate
    run = 0
    for i, hit in enumerate(r):
        run = run + 1 if hit else 0
        if run >= hold_ticks:
            conv = i - hold_ticks + 1
            return conv, float(r[conv:].mean())
    return -1, 0.0


def episode_quality(l1_cmd, l1_meas, tail_n, gate=0.005):
    """Single-episode reach-quality metrics (benchmarks/exp_parity.py) applied to
    one episode: first step the reference reach gate (``mppi.py:117``,
    L1 of the commanded EE < 5 mm) is met, the debounced CONVERGENCE step
    (gate held 50 consecutive ticks — the reference's own convergence
    pattern, ``kinova.py:154-157``) with the held fraction after it, and
    tail stats of both the commanded and the MEASURED EE error."""
    l1_cmd = np.asarray(l1_cmd)
    l1_meas = np.asarray(l1_meas)
    tail = slice(-tail_n, None)
    reached = l1_cmd < gate
    first = int(np.argmax(reached)) if reached.any() else -1
    held = float(reached[first:].mean()) if first >= 0 else 0.0
    conv, held_conv = reach_convergence(l1_cmd, gate)
    return {
        "reach_gate_first_step": first,
        "held_fraction_after_reach": round(held, 3),
        "converged_step": conv,
        "held_fraction_after_converge": round(held_conv, 3),
        "l1_cmd_tail_mean_mm": round(float(l1_cmd[tail].mean()) * 1000, 2),
        "l1_cmd_tail_max_mm": round(float(l1_cmd[tail].max()) * 1000, 2),
        "l1_meas_tail_mean_mm": round(float(l1_meas[tail].mean()) * 1000, 2),
        "l1_meas_tail_max_mm": round(float(l1_meas[tail].max()) * 1000, 2),
    }

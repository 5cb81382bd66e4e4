"""Smooth reference-trajectory generators (cubic time scaling).

Behavioral parity with the reference's ``trajManager``
(``/root/reference/src/mav_mppi/scripts/trajectory/trajManager.py:10-113``):
cubic polynomial interpolation with zero boundary velocities, in joint space
and on SE(3) via the so(3) log/exp maps (the reference uses ``pin.log3/exp3``;
here ``utils/rotations`` axis-angle maps).  Written as pure functions of time
so whole reference trajectories evaluate vectorized under jit, instead of the
reference's per-tick scalar Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rotations as rot
from .pose import Pose

Array = jax.Array


def cubic_timing(t: Array, t_start, duration) -> Array:
    """Cubic ease 0->1 with zero end slopes, clamped outside [t_start, t_end]."""
    s = jnp.clip((t - t_start) / duration, 0.0, 1.0)
    return 3.0 * s**2 - 2.0 * s**3


def joint_trajectory(t: Array, t_start, duration, q_init: Array, q_target: Array) -> Array:
    """Position setpoint at time(s) ``t``; broadcasts over leading dims of t."""
    alpha = cubic_timing(t, t_start, duration)
    return q_init + alpha[..., None] * (q_target - q_init)


def joint_trajectory_velocity(
    t: Array, t_start, duration, q_init: Array, q_target: Array
) -> Array:
    s = jnp.clip((t - t_start) / duration, 0.0, 1.0)
    dalpha = (6.0 * s - 6.0 * s**2) / duration
    return dalpha[..., None] * (q_target - q_init)


def se3_trajectory(t: Array, t_start, duration, init: Pose, target: Pose) -> Pose:
    """Cubic interpolation in (translation, so(3) log) coordinates — the same
    6D-log interpolation scheme as the reference's ``SE3Traj.computeNext``."""
    alpha = cubic_timing(t, t_start, duration)
    pos = init.position + alpha[..., None] * (target.position - init.position)
    w0 = rot.quat_to_axis_angle(init.quat)
    w1 = rot.quat_to_axis_angle(target.quat)
    w = w0 + alpha[..., None] * (w1 - w0)
    return Pose(position=pos, quat=rot.quat_from_axis_angle(w))


def read_waypoint_file(path: str):
    """Parse a RotorS waypoint file: one `wait_time x y z yaw_deg` line per
    waypoint, whitespace separated (the format of
    ``rotors_gazebo/src/waypoint_publisher_file.cpp:48-66`` /
    ``resource/example_waypoints.txt``).  Returns numpy arrays
    ``(wait_times [s], positions (N, 3) [m], yaws (N,) [rad])``; incomplete
    trailing lines are dropped, as upstream ("Only read complete
    waypoints").
    """
    import numpy as _np

    waits, positions, yaws = [], [], []
    with open(path) as f:
        tokens = f.read().split()
    for i in range(0, len(tokens) - len(tokens) % 5, 5):
        t, x, y, z, yaw_deg = (float(v) for v in tokens[i:i + 5])
        waits.append(t)
        positions.append((x, y, z))
        yaws.append(_np.deg2rad(yaw_deg))
    return (
        _np.asarray(waits, _np.float64),
        _np.asarray(positions, _np.float64),
        _np.asarray(yaws, _np.float64),
    )


# ---------------------------------------------------------------------------
# Polynomial trajectories — the mav_planning_msgs capability
# (PolynomialSegment/PolynomialTrajectory: per-axis polynomial segments with
# durations, sampled for position/velocity/acceleration references).
# ---------------------------------------------------------------------------


def cubic_spline_coeffs(times, points):
    """Natural cubic spline through waypoints: C2 polynomial segments.

    ``times`` (N,) strictly increasing knot times, ``points`` (N, D).
    Returns ``(breaks (N,), coeffs (N-1, 4, D))`` with segment i valid on
    [t_i, t_{i+1}] and p(t) = sum_k coeffs[i, k] * (t - t_i)^k — the
    polynomial-segment representation of mav_planning_msgs
    (PolynomialSegment: coefficient array + segment time), built host-side
    with the classic tridiagonal second-derivative solve.
    """
    import numpy as _np

    t = _np.asarray(times, _np.float64)
    p = _np.asarray(points, _np.float64)
    if p.ndim == 1:
        p = p[:, None]
    n = len(t)
    if n < 2:
        raise ValueError("need at least two waypoints")
    h = _np.diff(t)                                   # (N-1,)
    if _np.any(h <= 0):
        raise ValueError(
            "knot times must be strictly increasing (a zero wait_time is "
            "fine for step setpoints but not for a polynomial trajectory)"
        )
    # Solve for knot second derivatives M (natural: M_0 = M_{N-1} = 0).
    m = _np.zeros((n, p.shape[1]))
    if n > 2:
        a = _np.zeros((n - 2, n - 2))
        rhs = _np.zeros((n - 2, p.shape[1]))
        for i in range(1, n - 1):
            j = i - 1
            a[j, j] = 2.0 * (h[i - 1] + h[i])
            if j > 0:
                a[j, j - 1] = h[i - 1]
            if j < n - 3:
                a[j, j + 1] = h[i]
            rhs[j] = 6.0 * (
                (p[i + 1] - p[i]) / h[i] - (p[i] - p[i - 1]) / h[i - 1]
            )
        m[1:-1] = _np.linalg.solve(a, rhs)
    coeffs = _np.zeros((n - 1, 4, p.shape[1]))
    for i in range(n - 1):
        coeffs[i, 0] = p[i]
        coeffs[i, 1] = (
            (p[i + 1] - p[i]) / h[i] - h[i] * (2.0 * m[i] + m[i + 1]) / 6.0
        )
        coeffs[i, 2] = m[i] / 2.0
        coeffs[i, 3] = (m[i + 1] - m[i]) / (6.0 * h[i])
    return t, coeffs


def polynomial_sample(breaks, coeffs, t, derivative: int = 0):
    """Sample a polynomial-segment trajectory at time(s) ``t``.

    ``breaks`` (N,), ``coeffs`` (N-1, K, D) in the
    :func:`cubic_spline_coeffs` layout (any polynomial order K).  Works
    under jit (searchsorted + Horner); ``t`` clamps to the trajectory
    span, so sampling past the end holds the terminal state.
    """
    breaks = jnp.asarray(breaks)
    coeffs = jnp.asarray(coeffs)
    t = jnp.clip(jnp.asarray(t), breaks[0], breaks[-1])
    seg = jnp.clip(
        jnp.searchsorted(breaks, t, side="right") - 1, 0, coeffs.shape[0] - 1
    )
    tau = t - breaks[seg]
    k = coeffs.shape[1]
    c = coeffs[seg]                                  # (..., K, D)
    # derivative-d coefficients: c_k * k!/(k-d)! on tau^(k-d)
    out = jnp.zeros_like(c[..., 0, :])
    for j in range(k - 1, derivative - 1, -1):
        fact = 1.0
        for d in range(derivative):
            fact *= (j - d)
        out = out * tau[..., None] + fact * c[..., j, :]
    return out


def gerono_reference(t: Array, amp: float, omega: float, z0: float,
                     t_ramp: float = 1.5):
    """Figure-eight (Gerono lemniscate) reference with a smooth time-warp
    entry: x = A sin(w tau), y = (A/2) sin(2w tau) at altitude ``z0``,
    where tau = t^2/(t + t_ramp) starts at rest (tau(0) = tau'(0) = 0, so
    the path is dynamically feasible from standstill) and approaches unit
    rate.  Returns exact ``(pos, vel, acc)`` references for full
    feed-forward tracking — the fast-curved-path regime the reference stack
    never exercises (its controllers only see step setpoints,
    ``controller.cpp:667-673``)."""
    tau = t * t / (t + t_ramp)
    dtau = (t * t + 2 * t * t_ramp) / (t + t_ramp) ** 2
    ddtau = 2 * t_ramp * t_ramp / (t + t_ramp) ** 3
    s, c = jnp.sin(omega * tau), jnp.cos(omega * tau)
    s2, c2 = jnp.sin(2 * omega * tau), jnp.cos(2 * omega * tau)
    zero = jnp.zeros_like(t)
    pos = jnp.stack([amp * s, 0.5 * amp * s2, z0 + zero], -1)
    vel = jnp.stack(
        [amp * omega * c * dtau, amp * omega * c2 * dtau, zero], -1
    )
    acc = jnp.stack(
        [
            -amp * omega**2 * s * dtau**2 + amp * omega * c * ddtau,
            -2 * amp * omega**2 * s2 * dtau**2 + amp * omega * c2 * ddtau,
            zero,
        ],
        -1,
    )
    return pos, vel, acc


def waypoint_splines(waits, positions, yaws):
    """C2 cubic splines through a RotorS waypoint schedule: knot times are
    the cumulative wait windows, position rides a natural cubic through the
    waypoints (first knot duplicated so flight starts at the first
    waypoint), and yaw rides its own spline over the UNWRAPPED yaw sequence
    (smooth yaw with rate feed-forward — the discrete mode's simultaneous
    large-step envelope problem never arises on a continuous reference).
    Returns ``(breaks, pos_coeffs, yaw_coeffs)`` for
    :func:`polynomial_sample`."""
    import numpy as np

    knots = np.concatenate([[0.0], np.cumsum(waits)])
    kpts = np.concatenate([positions[:1], positions], axis=0)
    breaks, coeffs = cubic_spline_coeffs(knots, kpts)
    yk = np.unwrap(np.concatenate([[0.0], yaws]))
    _, ycoeffs = cubic_spline_coeffs(knots, yk[:, None])
    return breaks, coeffs, ycoeffs

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

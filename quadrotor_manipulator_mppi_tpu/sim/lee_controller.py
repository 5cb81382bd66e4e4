"""Lee geometric SE(3) position controller — the RotorS standard path.

Behavioral port of
``/root/reference/src/rotors_simulator/rotors_control/src/library/lee_position_controller.cpp``
(T. Lee et al., "Control of complex maneuvers for a quadrotor UAV using
geometric methods on SE(3)"), the controller behind the stack's
hover/waypoint examples (SURVEY.md section 3.5):

* desired acceleration from position/velocity error scaled by 1/m minus
  gravity minus the feed-forward (``:96-110``),
* desired attitude from (b1_des(yaw), b3_des = -a/|a|) (``:117-135``),
* attitude error e_R = 0.5 vee(Rd^T R - R^T Rd), rate error, inertia-
  normalized gains (``:138-155``),
* thrust = -m a . R e3, allocation via pinv with the inertia block
  (``:73-83``).

Gains are per-axis vectors (RotorS tunes per vehicle); defaults follow the
RotorS firefly yaml scaled to the HarrierD7 mass/inertia.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.multirotor import GRAVITY, MultirotorParams
from ..utils import rotations as rot
from ..utils import se3

Array = jax.Array


@dataclass(frozen=True)
class LeeGains:
    """Per-axis gains (position, velocity, attitude, angular rate).

    Defaults are the RotorS firefly tuning
    (``rotors_gazebo/resource/lee_controller_firefly.yaml``: 6/4.7/3/0.52)
    rescaled to the HarrierD7's mass (x14.7/1.57) and inertia
    (x diag(1.57, 3.93, 2.59)/firefly) — the controller normalizes gains by
    mass/inertia internally, so tuning transfers by scaling.  Settles a
    1 m step in ~2 s with ~zero overshoot on the in-framework plant.

    Yaw: the naive firefly scaling gives an underdamped ~1 rad/s yaw loop
    (zeta ~ 0.36, ~10 s ringdown) whose residual oscillation couples into
    the tilt axes and can destabilize a position step commanded mid-swing;
    the z gains here place the yaw loop at omega_n ~ 3 rad/s, critically
    damped (45 deg step settles in ~2 s with a ~0.4 m transient position
    coupling that decays immediately).  NOTE the controller family's
    envelope on this plant: position steps commanding > ~40 deg of tilt
    (e.g. a 2.8 m diagonal step) saturate rotors through the asymmetric
    lag and diverge at any gain setting — shape the reference instead
    (clamped carrot + yaw slew, as `run.py waypoint-file` does).
    """

    position: tuple = (56.3, 56.3, 56.3)
    velocity: tuple = (44.1, 44.1, 44.1)
    attitude: tuple = (135.5, 257.0, 23.0)
    angular_rate: tuple = (23.5, 44.5, 15.5)


class LeeSetpoint:
    """Trajectory point: position, velocity, acceleration feed-forward, yaw."""

    def __init__(self, position, velocity=None, acceleration=None, yaw=0.0,
                 yaw_rate=0.0, dtype=jnp.float32):
        self.position = jnp.asarray(position, dtype)
        self.velocity = (
            jnp.zeros(3, dtype) if velocity is None else jnp.asarray(velocity, dtype)
        )
        self.acceleration = (
            jnp.zeros(3, dtype)
            if acceleration is None
            else jnp.asarray(acceleration, dtype)
        )
        self.yaw = jnp.asarray(yaw, dtype)
        self.yaw_rate = jnp.asarray(yaw_rate, dtype)


def lee_control(
    gains: LeeGains,
    vehicle: MultirotorParams,
    sp: LeeSetpoint,
    pos: Array,
    vel_world: Array,
    quat: Array,
    omega_body: Array,
    extra_mass: float = 0.0,
) -> Array:
    """Returns U = [thrust, tau_x, tau_y, tau_z] (body frame).

    Inertia-normalized attitude gains as in the reference (:36-41); the
    gyroscopic ``omega x (omega)`` simplification of the reference's last
    line (:152-154, gains absorb the inertia) is kept.
    """
    dtype = pos.dtype
    m = vehicle.mass + extra_mass
    inertia = jnp.asarray(vehicle.inertia, dtype)
    kp = jnp.asarray(gains.position, dtype)
    kv = jnp.asarray(gains.velocity, dtype)
    kr = jnp.asarray(gains.attitude, dtype) / inertia
    kw = jnp.asarray(gains.angular_rate, dtype) / inertia

    r = rot.quat_to_matrix(quat)

    # Desired acceleration (reference sign convention: error = state - cmd,
    # acceleration points "down the error").
    pos_err = pos - sp.position
    vel_err = vel_world - sp.velocity
    e3 = jnp.asarray([0.0, 0.0, 1.0], dtype)
    accel = (pos_err * kp + vel_err * kv) / m - GRAVITY * e3 - sp.acceleration

    # Desired attitude.
    b1_des = jnp.stack([jnp.cos(sp.yaw), jnp.sin(sp.yaw), jnp.zeros_like(sp.yaw)])
    b3_des = -accel / jnp.linalg.norm(accel).clip(1e-6)
    b2_des = jnp.cross(b3_des, b1_des)
    b2_des = b2_des / jnp.linalg.norm(b2_des).clip(1e-6)
    r_des = jnp.stack([jnp.cross(b2_des, b3_des), b2_des, b3_des], axis=-1)

    # Attitude + rate errors.
    err_mat = 0.5 * (r_des.T @ r - r.T @ r_des)
    angle_err = se3.unskew(err_mat)
    rate_des = jnp.stack(
        [jnp.zeros_like(sp.yaw_rate), jnp.zeros_like(sp.yaw_rate), sp.yaw_rate]
    )
    rate_err = omega_body - r_des.T @ r @ rate_des

    ang_acc = -angle_err * kr - rate_err * kw
    torque = inertia * ang_acc + jnp.cross(omega_body, inertia * omega_body)

    thrust = -m * jnp.dot(accel, r[:, 2])
    return jnp.concatenate([thrust[None], torque])

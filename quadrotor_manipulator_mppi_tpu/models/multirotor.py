"""HarrierD7 octorotor rigid-body dynamics — the in-framework plant.

Replaces the Gazebo/RotorS physics pipeline for closed-loop evaluation and
doubles as the MPPI internal model for whole-body control.  Physics and
constants transcribed from the reference:

* vehicle constants — mass 14.7 kg (+5.54 kg with arm base offset handled by
  the coupled model), inertia diag(1.57, 3.93, 2.59), 8 rotors, k_f=4.63e-4,
  k_m=0.0173, arm lengths 0.534/0.574 m, omega_max=650 rad/s
  (``/root/reference/src/aerial_manipulation/urdf/harrierD7.xacro:29-49``,
  ``src/controller.cpp:488-490,632-657``);
* rotor model — asymmetric first-order speed lag (tau_up=0.0125,
  tau_down=0.025), thrust k_f*omega^2 along rotor axis, aero drag
  -|omega|*C_d*v_perp, yaw drag torque -dir*T*k_m, rolling moment
  (``rotors_gazebo_plugins/src/gazebo_motor_model.cpp:407-484``,
  ``common.h`` FirstOrderFilter);
* rotor geometry encoded by the same allocation signs as the reference's
  4x8 control-allocation matrix (``controller.cpp:632-657``).

State uses a world-frame position/velocity + body-frame quaternion/rates
layout with quaternion integration (the reference plant integrates inside
ODE; its commented-out MPPI rollout model used euler angles,
``drone_mppi.py:57-83``).  Everything is a pure function over pytrees:
``step`` vmaps over MPPI samples and scans over sim time unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import rotations as rot

Array = jax.Array

GRAVITY = 9.81


@dataclass(frozen=True)
class MultirotorParams:
    mass: float = 14.7
    inertia: tuple = (1.57, 3.93, 2.59)
    n_rotors: int = 8
    motor_constant: float = 4.63e-4      # k_f [N s^2]
    moment_constant: float = 0.0173      # k_m [m]
    xlen: float = 0.534
    ylen: float = 0.574
    max_rotor_speed: float = 650.0
    time_constant_up: float = 0.0125
    time_constant_down: float = 0.025
    rotor_drag_coefficient: float = 8.06428e-5
    rolling_moment_coefficient: float = 1e-6
    # Ground plane height (plant-only; the landing state machine cuts motors
    # below 0.5 m, controller.cpp:271-278, and Gazebo's ground catches the
    # vehicle — this is the free-flight-model analog of that contact).
    ground_z: float = 0.0
    # Allocation sign rows (roll, pitch, yaw) per rotor — controller.cpp:639-652.
    roll_signs: tuple = (-1, 1, 1, -1, -1, 1, 1, -1)
    pitch_signs: tuple = (-1, -1, 1, 1, -1, -1, 1, 1)
    yaw_signs: tuple = (1, -1, 1, -1, -1, 1, -1, 1)
    # Alternative rotor geometry (the RotorS stock-vehicle convention,
    # rotors_gazebo/resource/*.yaml): per-rotor (angle, arm_length,
    # force_constant, moment_constant, direction).  When set, the
    # allocation matrix follows rotors_control/common.h:79-97 instead of
    # the Harrier sign rows, and n_rotors/sign rows are ignored.
    rotor_config: tuple = ()

    def allocation_matrix(self) -> np.ndarray:
        """(4, R) mapping rotor speed^2 -> [tau_roll, tau_pitch, tau_yaw, T]."""
        if self.rotor_config:
            cols = []
            for angle, arm, kf, km, direction in self.rotor_config:
                cols.append([
                    np.sin(angle) * arm * kf,     # common.h:86
                    -np.cos(angle) * arm * kf,    # common.h:89
                    -direction * kf * km,         # common.h:92
                    kf,                           # common.h:95
                ])
            return np.asarray(cols, np.float64).T
        f, m = self.motor_constant, self.moment_constant
        rows = [
            np.asarray(self.roll_signs, np.float64) * self.ylen * f,
            np.asarray(self.pitch_signs, np.float64) * self.xlen * f,
            np.asarray(self.yaw_signs, np.float64) * f * m,
            np.full(self.n_rotors, f),
        ]
        return np.stack(rows)

    def allocation_pinv(self) -> np.ndarray:
        """(R, 4) right pseudo-inverse A^T (A A^T)^-1 — controller.cpp:655."""
        a = self.allocation_matrix()
        return a.T @ np.linalg.inv(a @ a.T)

    def hover_rotor_speed(self, extra_mass: float = 0.0) -> float:
        thrust = (self.mass + extra_mass) * GRAVITY
        kf_total = (
            sum(r[2] for r in self.rotor_config)
            if self.rotor_config
            else self.n_rotors * self.motor_constant
        )
        return float(np.sqrt(thrust / kf_total))


@dataclass(frozen=True)
class GroundContactParams:
    """Penalty-based ground contact at the landing-gear feet.

    Replaces the inelastic clamp with physical contact forces (the Gazebo
    side resolves gear-ground collision through ODE contacts; the reference
    land logic relies on it after cutting motors below 0.5 m,
    ``controller.cpp:271-278``).  Each foot is a spring-damper normal force
    plus regularized Coulomb friction, applied at the foot's body-frame
    offset so touchdown also produces righting torques.

    Defaults: 4 feet under the arms; stiffness gives ~2.5 mm static
    penetration for the 20 kg vehicle and a contact frequency (~63 rad/s)
    comfortably resolved by the 1 kHz physics step.
    """

    stiffness: float = 2.0e4        # [N/m] per foot
    damping: float = 400.0          # [N s/m] per foot
    friction_mu: float = 0.8
    friction_vel_eps: float = 0.05  # [m/s] Coulomb regularization
    gear_height: float = 0.35       # [m] foot below base, gear extended
    belly_height: float = 0.10      # [m] contact offset, gear retracted
    # Foot x, y offsets (body frame) — under the rotor arms.
    foot_xy: tuple = ((0.4, 0.43), (0.4, -0.43), (-0.4, 0.43), (-0.4, -0.43))


def ground_contact_wrench(
    contact: GroundContactParams,
    pos: Array,
    r: Array,
    vel: Array,
    omega: Array,
    gear_ext,
    ground_z: float,
) -> tuple[Array, Array]:
    """World-frame contact force and BODY-frame torque from all feet.

    ``r`` is the body->world rotation; ``gear_ext`` in [0, 1] interpolates
    the foot height between belly (retracted) and gear (extended).
    """
    dtype = pos.dtype
    height = contact.belly_height + (
        contact.gear_height - contact.belly_height
    ) * jnp.asarray(gear_ext, dtype)
    xy = jnp.asarray(contact.foot_xy, dtype)                      # (F, 2)
    feet_b = jnp.concatenate(
        [xy, -height * jnp.ones(xy.shape[:-1] + (1,), dtype)], axis=-1
    )                                                             # (F, 3)
    feet_w = pos[..., None, :] + jnp.einsum("...ij,fj->...fi", r, feet_b)
    # Foot velocity: v + omega x r (omega body -> world).
    omega_w = jnp.einsum("...ij,...j->...i", r, omega)
    feet_v = vel[..., None, :] + jnp.cross(
        jnp.broadcast_to(omega_w[..., None, :], feet_w.shape),
        feet_w - pos[..., None, :],
    )
    pen = jnp.maximum(ground_z - feet_w[..., 2], 0.0)             # (F,)
    active = pen > 0.0
    fn = jnp.maximum(
        contact.stiffness * pen - contact.damping * feet_v[..., 2], 0.0
    ) * active
    vt = feet_v[..., :2]
    ft = -contact.friction_mu * fn[..., None] * vt / (
        jnp.linalg.norm(vt, axis=-1, keepdims=True) + contact.friction_vel_eps
    )
    f_w = jnp.concatenate([ft, fn[..., None]], axis=-1)           # (F, 3)
    force_w = jnp.sum(f_w, axis=-2)
    # Torque about the COM, expressed in the body frame.
    tau_w = jnp.sum(jnp.cross(feet_w - pos[..., None, :], f_w), axis=-2)
    torque_b = jnp.einsum("...ji,...j->...i", r, tau_w)
    return force_w, torque_b


def payload_point_mass_effects(
    mass: float, r_body: Array
) -> tuple[Array, Array]:
    """Rigidly grasped point payload at body-frame offset ``r_body``:
    returns (gravity-torque coefficient, diagonal inertia increment).

    The torque about the base COM in the body frame is
    ``r_body x (m R^T g_world)`` — computed by the caller with the live
    attitude; here we return ``m * r_body`` (the moment arm premultiplied)
    and the parallel-axis diagonal inertia delta ``m (|r|^2 - r_i^2)``.
    The reference models grasped payloads as pure added mass
    (controller.cpp:159-161); carrying the moment and inertia transfer is
    the physically complete version of the same rigid-attach assumption.
    """
    mr_arm = mass * r_body
    r2 = jnp.sum(r_body * r_body, axis=-1, keepdims=True)
    di = mass * (r2 - r_body * r_body)
    return mr_arm, di


class MultirotorState(NamedTuple):
    pos: Array          # (…, 3) world position
    quat: Array         # (…, 4) wxyz body->world
    vel: Array          # (…, 3) world linear velocity
    omega: Array        # (…, 3) body angular velocity
    rotor_speed: Array  # (…, R) actual rotor speeds (first-order-lagged)


def init_state(
    params: MultirotorParams, pos=(0.0, 0.0, 0.0), batch_shape=(), dtype=jnp.float32
) -> MultirotorState:
    return MultirotorState(
        pos=jnp.broadcast_to(jnp.asarray(pos, dtype), batch_shape + (3,)),
        quat=jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0], dtype), batch_shape + (4,)),
        vel=jnp.zeros(batch_shape + (3,), dtype),
        omega=jnp.zeros(batch_shape + (3,), dtype),
        rotor_speed=jnp.zeros(batch_shape + (params.n_rotors,), dtype),
    )


def wrench_from_rotors(
    params: MultirotorParams, rotor_speed: Array, vel_body_perp: Array
) -> tuple[Array, Array]:
    """Body-frame (force, torque) from rotor speeds.

    ``vel_body_perp`` is the body-frame airspeed component perpendicular to
    the (common, +z) rotor axis, used for rotor drag and rolling moment
    (gazebo_motor_model.cpp:440-473).
    """
    dtype = rotor_speed.dtype
    w2 = rotor_speed * rotor_speed
    alloc = jnp.asarray(params.allocation_matrix(), dtype)
    tau_thrust = jnp.einsum("ir,...r->...i", alloc, w2)  # (..., 4)
    abs_w_sum = jnp.sum(jnp.abs(rotor_speed), axis=-1, keepdims=True)
    drag = -params.rotor_drag_coefficient * abs_w_sum * vel_body_perp
    rolling = -params.rolling_moment_coefficient * abs_w_sum * vel_body_perp
    force = drag + jnp.concatenate(
        [jnp.zeros_like(tau_thrust[..., :2]), tau_thrust[..., 3:4]], axis=-1
    )
    torque = tau_thrust[..., :3] + rolling
    return force, torque


def rotor_lag(
    params: MultirotorParams, rotor_speed: Array, rotor_cmd: Array, dt: float
) -> Array:
    """Asymmetric first-order rotor-speed filter (RotorS FirstOrderFilter:
    tau picked per-rotor by whether the command is above or below the state)."""
    cmd = jnp.clip(rotor_cmd, 0.0, params.max_rotor_speed)
    tau = jnp.where(
        cmd > rotor_speed, params.time_constant_up, params.time_constant_down
    )
    alpha = jnp.exp(-dt / tau)
    return alpha * rotor_speed + (1.0 - alpha) * cmd


def step(
    params: MultirotorParams,
    state: MultirotorState,
    rotor_cmd: Array,
    dt: float,
    extra_mass: float = 0.0,
    external_wrench_body: Optional[tuple] = None,
    wind_world: Optional[Array] = None,
    contact: Optional[GroundContactParams] = None,
    gear_ext=1.0,
    extra_inertia: Optional[Array] = None,
) -> MultirotorState:
    """One semi-implicit Euler physics step (batched over leading dims).

    ``extra_mass`` models a rigidly attached payload/arm lump (the plant adds
    5.54 kg when the manipulator spawns — controller.cpp:159-161);
    ``external_wrench_body`` lets the whole-body model couple in arm reaction
    forces; ``wind_world`` feeds the rotor-drag airspeed (wind plugin analog);
    ``extra_inertia`` is a diagonal body-inertia increment (grasped payload,
    :func:`payload_point_mass_effects`).

    Ground contact: with ``contact`` set, per-foot penalty forces
    (:func:`ground_contact_wrench`, gear extension ``gear_ext``) — touchdown
    dynamics emerge from the springs.  With ``contact=None``, the legacy
    inelastic clamp (kept for rollout-model callers that only need "don't
    fall through the floor").
    """
    dtype = state.pos.dtype
    m = params.mass + extra_mass
    inertia = jnp.asarray(params.inertia, dtype)
    if extra_inertia is not None:
        inertia = inertia + extra_inertia

    rotor_speed = rotor_lag(params, rotor_speed=state.rotor_speed,
                            rotor_cmd=rotor_cmd, dt=dt)

    r = rot.quat_to_matrix(state.quat)  # body -> world
    airspeed_world = state.vel if wind_world is None else state.vel - wind_world
    v_body = jnp.einsum("...ji,...j->...i", r, airspeed_world)
    v_perp = v_body.at[..., 2].set(0.0)

    force_b, torque_b = wrench_from_rotors(params, rotor_speed, v_perp)
    if external_wrench_body is not None:
        force_b = force_b + external_wrench_body[0]
        torque_b = torque_b + external_wrench_body[1]

    # Translational dynamics in world frame.
    acc = jnp.einsum("...ij,...j->...i", r, force_b) / m
    acc = acc - jnp.asarray([0.0, 0.0, GRAVITY], dtype)

    if contact is not None:
        cf_w, ct_b = ground_contact_wrench(
            contact, state.pos, r, state.vel, state.omega, gear_ext,
            params.ground_z,
        )
        acc = acc + cf_w / m
        torque_b = torque_b + ct_b

    # Rotational dynamics in body frame (diagonal inertia).
    iw = inertia * state.omega
    omega_dot = (torque_b - jnp.cross(state.omega, iw)) / inertia

    vel = state.vel + acc * dt
    pos = state.pos + vel * dt
    omega = state.omega + omega_dot * dt

    if contact is None:
        # Inelastic ground contact: clamp to the plane, kill downward
        # velocity and spin (the free-flight fallback).
        on_ground = pos[..., 2] <= params.ground_z
        pos = pos.at[..., 2].set(jnp.maximum(pos[..., 2], params.ground_z))
        grounded_vel = jnp.stack(
            [jnp.zeros_like(vel[..., 0]), jnp.zeros_like(vel[..., 1]),
             jnp.maximum(vel[..., 2], 0.0)], axis=-1
        )
        vel = jnp.where(on_ground[..., None], grounded_vel, vel)
        omega = jnp.where(on_ground[..., None], 0.0, omega)

    dq = rot.quat_from_axis_angle(omega * dt)
    quat = rot.quat_normalize(rot.quat_multiply(state.quat, dq))

    return MultirotorState(
        pos=pos, quat=quat, vel=vel, omega=omega, rotor_speed=rotor_speed
    )


# ---------------------------------------------------------------------------
# Reduced 12-state euler-angle model for MPPI rollouts
# ---------------------------------------------------------------------------

class Multirotor12State(NamedTuple):
    """Reduced state for sampled rollouts: euler ZYX-as-(roll, pitch, yaw)
    attitude, matching the reference's (commented) whole-quadrotor rollout
    model (``drone_mppi.py:57-83``): inputs are [thrust, tau_xyz]."""

    pos: Array    # (…, 3)
    rpy: Array    # (…, 3)
    vel: Array    # (…, 3) world
    omega: Array  # (…, 3) body


def euler_rate_matrix(rpy: Array) -> Array:
    """Body rates -> euler-angle rates: eta_dot = J(eta) omega."""
    phi, theta = rpy[..., 0], rpy[..., 1]
    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    ttheta = jnp.tan(theta)
    ctheta = jnp.cos(theta)
    o = jnp.zeros_like(phi)
    i = jnp.ones_like(phi)
    m = jnp.stack(
        [
            i, sphi * ttheta, cphi * ttheta,
            o, cphi, -sphi,
            o, sphi / ctheta, cphi / ctheta,
        ],
        axis=-1,
    )
    return m.reshape(rpy.shape[:-1] + (3, 3))


def step12(
    params: MultirotorParams,
    state: Multirotor12State,
    u: Array,
    dt: float,
    extra_mass: float = 0.0,
    drag_kd: float = 0.0,
    rate_damping: float = 0.0,
) -> Multirotor12State:
    """Explicit-Euler reduced step with wrench input u = [T, tau_x, tau_y, tau_z].

    Follows the reference's intended rollout dynamics (drone_mppi.py:57-83):
    omega <- omega + dt I^-1 tau; eta <- eta + dt J(eta) omega (angles wrapped
    to [-pi, pi]); v <- v + dt (g + R f / m - k_d v); p <- p + dt v.

    ``rate_damping`` adds the wrench-mode stabilizer tau -= kd I omega
    (omega <- (1 - dt kd) omega + dt I^-1 tau) — the same first-order
    body-rate feedback the plant applies in that mode
    (``sim/whole_body_loop``), so the rollout models the damped loop.
    """
    dtype = state.pos.dtype
    m = params.mass + extra_mass
    inertia = jnp.asarray(params.inertia, dtype)

    omega = (1.0 - dt * rate_damping) * state.omega + dt * (u[..., 1:4] / inertia)
    j = euler_rate_matrix(state.rpy)
    rpy = state.rpy + dt * jnp.einsum("...ij,...j->...i", j, omega)
    rpy = jnp.arctan2(jnp.sin(rpy), jnp.cos(rpy))

    angles = jnp.stack([rpy[..., 2], rpy[..., 1], rpy[..., 0]], axis=-1)
    r = rot.euler_to_matrix(angles, "ZYX")
    thrust_b = jnp.concatenate(
        [jnp.zeros_like(u[..., :2]), u[..., 0:1]], axis=-1
    )
    acc = (
        jnp.einsum("...ij,...j->...i", r, thrust_b) / m
        - jnp.asarray([0.0, 0.0, GRAVITY], dtype)
        - drag_kd * state.vel
    )
    vel = state.vel + dt * acc
    pos = state.pos + dt * vel
    return Multirotor12State(pos=pos, rpy=rpy, vel=vel, omega=omega)

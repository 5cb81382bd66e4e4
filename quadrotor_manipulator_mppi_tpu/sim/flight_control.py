"""Inner-loop flight controllers for the octorotor plant.

Behavioral ports (not translations) of the reference's plant-side C++
controllers, re-stated as pure functions over explicit controller-state
pytrees so a whole episode jits:

* :func:`pid_step` — the PID position + PD attitude law of
  ``/root/reference/src/aerial_manipulation/src/controller2.cpp:500-556``
  (the variant the reference keeps for MPPI experiments);
* :func:`backstepping_step` — the adaptive backstepping law of
  ``controller.cpp:443-584`` (Chaikalis et al., ICUAS 2020): online adaptive
  mass estimates m_hat per axis, attitude backstepping with adaptive nx/ny
  disturbance terms, gyroscopic cross terms, and an arm gravity-torque
  feed-forward (supplied by the caller from ``rigid_body.rnea`` — replacing
  the ~40-line symbolic expressions at ``controller.cpp:587-610``);
* :func:`allocate` — rotor-speed allocation via the precomputed pseudo-inverse
  (``controller.cpp:632-657``: clamp negative squared speeds, sqrt).

Gains default to ``config/pid_gains.yaml`` (loaded by ``controller.cpp:102-120``).
Both laws share the roll/pitch-from-(ux, uy) extraction trick
(``controller.cpp:524-531``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.multirotor import GRAVITY, MultirotorParams

Array = jax.Array


@dataclass(frozen=True)
class FlightGains:
    """Defaults = config/pid_gains.yaml."""

    kp_x: float = 3.0
    kp_y: float = 3.0
    kp_z: float = 1.4
    kd_x: float = 0.7
    kd_y: float = 0.7
    kd_z: float = 3.0
    ki_x: float = 0.2
    ki_y: float = 0.2
    ki_z: float = 0.3
    kp_roll: float = 10.0
    kp_pitch: float = 10.0
    kp_yaw: float = 1.0
    kd_roll: float = 26.0
    kd_pitch: float = 26.0
    kd_yaw: float = 2.0


# The reference's literal attitude gains (Kp=10, Kd=26) put the attitude
# loop's slow pole at Kp/Kd ~ 0.39 rad/s — *slower* than the ~1.7 rad/s
# position loop, so on an ideal rigid body the cascade is unstable (Gazebo's
# ODE solver damping and the rotor velocity-slowdown hack mask this in the
# reference).  SIM_TUNED_GAINS keeps the same control structure with the
# attitude loop sped up and mild extra lateral/vertical damping; use it with
# the in-framework plant.  FlightGains() stays at the reference values for
# behavioral parity.
SIM_TUNED_GAINS = FlightGains(
    kp_roll=100.0, kp_pitch=100.0, kd_roll=25.0, kd_pitch=25.0,
    kd_x=1.5, kd_y=1.5, kp_z=6.0, kd_z=5.0, ki_z=1.0,
)

# Aggressive-trajectory preset (ROADMAP "adaptive-backstepping gains under
# aggressive maneuvers").  The reference's envelope is hover/waypoint
# (controller.cpp:443-584 only ever sees step setpoints); fast curved
# trajectories (figure-eight, peak speed ~1.6 m/s, lateral accel
# ~1.6 m/s^2 at the 6 s lap) needed three things, found by sweeping on the
# full rotor-lag plant (tuning log in the round-3 history):
#   1. the SAFEGUARDS (tilt_clip / m_hat_range / n_hat_clip / int_clip
#      kwargs of backstepping_step): without them ANY gain set flips the
#      vehicle at trajectory entry (one-tick near-vertical tilt command,
#      then adaptive/integrator wind-up through saturation);
#   2. reference-acceleration feed-forward (``acc_ff``) — removes most of
#      the phase lag (0.23 -> 0.16 RMS at reference gains);
#   3. a mild lateral retune: kp 3 -> 3.5, kd 0.7 -> 1.0.  The law's
#      stability cliff is sharp — kp >= 4 or kd >= 1.5 diverges even WITH
#      the safeguards (the -kp^2 e lateral term and the m_hat adaptation
#      interact) — so this preset stays just inside the cliff.
# Measured (run.py figure-eight, post-transient laps): RMS 0.118 m @ 6 s
# lap, 0.052 m @ 8 s, 0.19 m @ 5 s; max tilt 0.36 rad.
AGGRESSIVE_GAINS = FlightGains(
    kp_x=3.5, kp_y=3.5, kd_x=1.0, kd_y=1.0,
)


def aggressive_safeguards(vehicle: MultirotorParams) -> dict:
    """The backstepping safeguard kwargs validated with AGGRESSIVE_GAINS."""
    return dict(
        tilt_clip=0.45,
        m_hat_range=(0.5 * vehicle.mass, 2.0 * vehicle.mass),
        n_hat_clip=20.0,
        int_clip=1.0,
    )


class FlightCtrlState(NamedTuple):
    """Cross-tick controller state (the C++ member variables)."""

    int_err: Array   # (3,) trapezoidal position-error integrals
    prev_err: Array  # (3,) previous position errors (for the trapezoid rule)
    m_hat: Array     # (3,) adaptive mass estimates (backstepping only)
    n_hat: Array     # (2,) adaptive nx, ny attitude terms (backstepping only)


def init_ctrl_state(mass_guess: float, dtype=jnp.float32) -> FlightCtrlState:
    """The reference initializes m_hat to the known mass and adapts from
    there (controller.cpp sets mass 14.7/20.24 at load, :159-161)."""
    return FlightCtrlState(
        int_err=jnp.zeros(3, dtype),
        prev_err=jnp.zeros(3, dtype),
        m_hat=jnp.full((3,), mass_guess, dtype),
        n_hat=jnp.zeros(2, dtype),
    )


class FlightSetpoint(NamedTuple):
    pos: Array       # (3,) desired x, y, z
    vel: Array       # (3,) desired velocity feed-forward
    yaw: Array       # () desired yaw
    yaw_rate: Array  # () desired yaw rate


def hover_setpoint(pos, dtype=jnp.float32) -> FlightSetpoint:
    return FlightSetpoint(
        pos=jnp.asarray(pos, dtype),
        vel=jnp.zeros(3, dtype),
        yaw=jnp.zeros((), dtype),
        yaw_rate=jnp.zeros((), dtype),
    )


def _desired_tilt(ux: Array, uy: Array, yaw_des: Array) -> Tuple[Array, Array]:
    """(ux, uy) -> (roll_des, pitch_des) — controller.cpp:524-531."""
    alpha, beta = jnp.cos(yaw_des), jnp.sin(yaw_des)
    v1 = alpha * ux + beta * uy
    v2 = beta * ux - alpha * uy
    sphi = jnp.clip(v2, -1.0, 1.0)
    cphi = jnp.sqrt(1.0 - sphi * sphi)
    roll_des = jnp.arctan2(sphi, cphi)
    v1 = v1 / jnp.cos(roll_des)
    stheta = jnp.clip(v1, -1.0, 1.0)
    ctheta = jnp.sqrt(1.0 - stheta * stheta)
    pitch_des = jnp.arctan2(stheta, ctheta)
    return roll_des, pitch_des


def _trapezoid(err: Array, prev_err: Array, integ: Array, dt: float) -> Array:
    """The reference's ``integral()`` accumulator: 0.5*(e + e_prev)*dt."""
    return integ + 0.5 * (err + prev_err) * dt


def pid_step(
    gains: FlightGains,
    vehicle: MultirotorParams,
    ctrl: FlightCtrlState,
    sp: FlightSetpoint,
    pos: Array,
    vel_world: Array,
    rpy: Array,
    omega_body: Array,
    dt: float,
    mass: Optional[float] = None,
    tau_g: Optional[Array] = None,
    yaw_mom: Optional[Array] = None,
) -> Tuple[Array, FlightCtrlState]:
    """PID/PD flight law -> (U [T, tau_x, tau_y, tau_z], new ctrl state).

    Mirrors controller2.cpp:506-556 with a fixed (known) mass instead of the
    adaptive estimate; ``tau_g`` is the optional arm gravity torque
    feed-forward, ``yaw_mom`` the arm yaw reaction (controller.cpp:536-539).
    """
    dtype = pos.dtype
    m = jnp.asarray(vehicle.mass if mass is None else mass, dtype)
    ixx, iyy, izz = vehicle.inertia
    xlen, ylen = vehicle.xlen, vehicle.ylen

    err = sp.pos - pos
    integ = _trapezoid(err, ctrl.prev_err, ctrl.int_err, dt)

    phi, theta, psi = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    p, q, r = omega_body[..., 0], omega_body[..., 1], omega_body[..., 2]

    u1 = (
        m
        * (GRAVITY + gains.kp_z * err[..., 2] - gains.kd_z * vel_world[..., 2]
           + gains.ki_z * integ[..., 2])
        / (jnp.cos(phi) * jnp.cos(theta))
    )
    ux = m / u1 * (gains.kp_x * err[..., 0] - gains.kd_x * vel_world[..., 0]
                   + gains.ki_x * integ[..., 0])
    uy = m / u1 * (gains.kp_y * err[..., 1] - gains.kd_y * vel_world[..., 1]
                   + gains.ki_y * integ[..., 1])

    roll_des, pitch_des = _desired_tilt(ux, uy, sp.yaw)

    tau_g = jnp.zeros(3, dtype) if tau_g is None else tau_g
    z_mom = jnp.zeros((), dtype) if yaw_mom is None else yaw_mom

    u2 = (ixx / xlen) * (
        gains.kp_roll * (roll_des - phi) + gains.kd_roll * (0.0 - p)
    ) + (1.0 / xlen) * ((izz - iyy) * q * r) - tau_g[..., 0]
    u3 = (iyy / ylen) * (
        gains.kp_pitch * (pitch_des - theta) + gains.kd_pitch * (0.0 - q)
    ) + (1.0 / ylen) * ((ixx - izz) * p * r) - tau_g[..., 1]
    u4 = izz * (
        gains.kp_yaw * (sp.yaw - psi) - gains.kd_yaw * r
    ) + (iyy - ixx) * p * q - tau_g[..., 2] + z_mom

    new_ctrl = FlightCtrlState(
        int_err=integ, prev_err=err, m_hat=ctrl.m_hat, n_hat=ctrl.n_hat
    )
    return jnp.stack([u1, u2, u3, u4], axis=-1), new_ctrl


def backstepping_step(
    gains: FlightGains,
    vehicle: MultirotorParams,
    ctrl: FlightCtrlState,
    sp: FlightSetpoint,
    pos: Array,
    vel_world: Array,
    rpy: Array,
    omega_body: Array,
    dt: float,
    tau_g: Optional[Array] = None,
    yaw_mom: Optional[Array] = None,
    tilt_clip: Optional[float] = None,
    m_hat_range: Optional[Tuple[float, float]] = None,
    n_hat_clip: Optional[float] = None,
    int_clip: Optional[float] = None,
    acc_ff: Optional[Array] = None,
) -> Tuple[Array, FlightCtrlState]:
    """Adaptive backstepping flight law (controller.cpp:443-584) ->
    (U [T, tau_x, tau_y, tau_z], new ctrl state).

    Adaptation: m_hat_z integrates cz1*e6*(...), m_hat_x/y likewise
    (cx1=cy1=2, cz1=3 — :497-514); nx/ny integrate gamma*z2/z4 (gamma=3 —
    :545-556).  The torque outputs keep the reference's (I/len) scaling and
    gyroscopic cross terms; its arm feed-forward enters roll/pitch as
    -len_ratio*tau_g terms (:547,555) and yaw directly (:560).

    The three optional safeguards extend the law beyond the reference's
    hover/waypoint envelope (all default OFF = reference behavior; the
    aggressive-maneuver scenario turns them on — see AGGRESSIVE_GAINS):

    * ``tilt_clip`` [rad] — clip the commanded tilt extracted from
      (ux, uy): a large velocity feed-forward error at trajectory entry
      otherwise commands near-vertical tilt in one tick;
    * ``m_hat_range`` — projection bounds on the adaptive mass estimates
      (standard sigma-mod/projection practice: unbounded integration winds
      up through actuator saturation and never recovers);
    * ``n_hat_clip`` — symmetric bound on the adaptive nx/ny terms;
    * ``int_clip`` [m*s] — anti-windup clamp on the position-error
      integrals: during a large transient the unbounded trapezoid
      integral's -ki*kp*integral term eventually dominates the lateral
      channel with the WRONG SIGN and locks the tilt away from the target
      (observed: a 6 s figure-eight entry winds pint past the point of no
      return while m_hat rails at its bound).

    ``acc_ff`` (3,) adds world-frame reference-acceleration feed-forward
    (differential-flatness style): laterally it enters the commanded-tilt
    channel as a/g, vertically the thrust channel — the standard
    trajectory-tracking extension the step-setpoint reference never needed.
    """
    dtype = pos.dtype
    ixx, iyy, izz = vehicle.inertia
    xlen, ylen = vehicle.xlen, vehicle.ylen
    tau_g = jnp.zeros(3, dtype) if tau_g is None else tau_g
    z_mom = jnp.zeros((), dtype) if yaw_mom is None else yaw_mom

    phi, theta, psi = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    p, q, r = omega_body[..., 0], omega_body[..., 1], omega_body[..., 2]

    err = sp.pos - pos
    integ = _trapezoid(err, ctrl.prev_err, ctrl.int_err, dt)
    if int_clip is not None:
        integ = jnp.clip(integ, -int_clip, int_clip)

    # --- altitude with adaptive mass (controller.cpp:495-501) ---
    e5 = err[..., 2]
    p5 = integ[..., 2]
    e6 = gains.kp_z * e5 + sp.vel[..., 2] + gains.ki_z * p5 - vel_world[..., 2]
    az = (
        GRAVITY + gains.ki_z * e5
        + gains.kp_z * (-gains.kp_z * e5 - gains.ki_z * p5 + e6)
        + e5 + gains.kd_z * e6
    )
    if acc_ff is not None:
        az = az + acc_ff[..., 2]
    mz_hat = ctrl.m_hat[2] + 3.0 * e6 * az * dt
    if m_hat_range is not None:
        mz_hat = jnp.clip(mz_hat, m_hat_range[0], m_hat_range[1])
    u1 = (mz_hat / (jnp.cos(phi) * jnp.cos(theta))) * az

    # --- x/y with adaptive mass (controller.cpp:503-518) ---
    def lateral(e, pint, vd, v, kp, ki, kd, m_prev, aff):
        e2 = vd + kp * e + ki * pint - v
        a = ki * e - kp * kp * e - ki * kp * pint + kp * e2 + e + kd * e2 + aff
        m_new = m_prev + 2.0 * e2 * a * dt
        if m_hat_range is not None:
            m_new = jnp.clip(m_new, m_hat_range[0], m_hat_range[1])
        return (m_new / u1) * a, m_new

    aff = jnp.zeros(3, dtype) if acc_ff is None else acc_ff
    ux, mx_hat = lateral(
        err[..., 0], integ[..., 0], sp.vel[..., 0], vel_world[..., 0],
        gains.kp_x, gains.ki_x, gains.kd_x, ctrl.m_hat[0], aff[..., 0],
    )
    uy, my_hat = lateral(
        err[..., 1], integ[..., 1], sp.vel[..., 1], vel_world[..., 1],
        gains.kp_y, gains.ki_y, gains.kd_y, ctrl.m_hat[1], aff[..., 1],
    )

    if tilt_clip is not None:
        lim = float(np.sin(tilt_clip))
        ux = jnp.clip(ux, -lim, lim)
        uy = jnp.clip(uy, -lim, lim)
    roll_des, pitch_des = _desired_tilt(ux, uy, sp.yaw)

    # --- attitude backstepping with adaptive nx/ny (controller.cpp:541-560) ---
    z1 = phi - roll_des
    z2 = p - (0.0 - gains.kp_roll * z1)
    nx = ctrl.n_hat[0] + 3.0 * z2 * dt
    if n_hat_clip is not None:
        nx = jnp.clip(nx, -n_hat_clip, n_hat_clip)
    u2 = (ixx / ylen) * (
        -gains.kp_roll * (z2 - gains.kp_roll * z1) - z1 - gains.kd_roll * z2
        - nx - xlen * tau_g[..., 0] / ixx
    ) + (1.0 / ylen) * ((izz - iyy) * q * r)

    z3 = theta - pitch_des
    z4 = q - (0.0 - gains.kp_pitch * z3)
    ny = ctrl.n_hat[1] + 3.0 * z4 * dt
    if n_hat_clip is not None:
        ny = jnp.clip(ny, -n_hat_clip, n_hat_clip)
    u3 = (iyy / xlen) * (
        -gains.kp_pitch * (z4 - gains.kd_pitch * z3) - z3 - gains.kd_pitch * z4
        - ny - ylen * tau_g[..., 1] / iyy
    ) + (1.0 / xlen) * ((ixx - izz) * p * r)

    z5 = psi - sp.yaw
    z6 = r - (sp.yaw_rate - gains.kp_yaw * z5)
    u4 = izz * (
        -gains.kp_yaw * (z6 - gains.kd_yaw * z5) - z5 - gains.kd_yaw * z6
        - tau_g[..., 2] / izz + z_mom / izz
    ) + (iyy - ixx) * p * q

    new_ctrl = FlightCtrlState(
        int_err=integ,
        prev_err=err,
        m_hat=jnp.stack([mx_hat, my_hat, mz_hat]),
        n_hat=jnp.stack([nx, ny]),
    )
    return jnp.stack([u1, u2, u3, u4], axis=-1), new_ctrl


def roll_pitch_yawrate_thrust_step(
    vehicle: MultirotorParams,
    roll_des: Array,
    pitch_des: Array,
    yaw_rate_des: Array,
    thrust: Array,
    rpy: Array,
    omega_body: Array,
    kp_rp: float = 100.0,
    kd_rp: float = 18.0,
    kd_yaw_rate: float = 10.0,
) -> Array:
    """Attitude-command controller -> U = [T, tau] (body frame).

    Behavioral port of RotorS' roll_pitch_yawrate_thrust controller
    (``rotors_control/src/library/roll_pitch_yawrate_thrust_controller.cpp``),
    the joystick-flight path (``rotors_joy_interface``): track commanded
    roll/pitch angles and yaw *rate* with inertia-normalized PD, pass thrust
    through.  Stateless — suitable for direct teleop mapping.
    """
    inertia = jnp.asarray(vehicle.inertia, rpy.dtype)
    tau_r = inertia[0] * (
        kp_rp * (roll_des - rpy[..., 0]) - kd_rp * omega_body[..., 0]
    )
    tau_p = inertia[1] * (
        kp_rp * (pitch_des - rpy[..., 1]) - kd_rp * omega_body[..., 1]
    )
    tau_y = inertia[2] * kd_yaw_rate * (yaw_rate_des - omega_body[..., 2])
    return jnp.stack([thrust, tau_r, tau_p, tau_y], axis=-1)


def allocate(vehicle: MultirotorParams, u: Array) -> Array:
    """[T, tau_x, tau_y, tau_z] -> 8 rotor speed commands.

    The reference orders the allocation vector [tau, T] (controller.cpp:572-578)
    and clamps negative squared speeds to zero before sqrt (:656-657).
    """
    pinv = jnp.asarray(vehicle.allocation_pinv(), u.dtype)
    tau_t = jnp.concatenate([u[..., 1:4], u[..., 0:1]], axis=-1)
    w2 = jnp.einsum("ri,...i->...r", pinv, tau_t)
    return jnp.sqrt(jnp.maximum(w2, 0.0))

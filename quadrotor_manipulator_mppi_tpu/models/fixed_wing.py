"""Fixed-wing aerodynamics: the RotorS ``gazebo_fw_dynamics_plugin`` and
``liftdrag_plugin`` as batched JAX plant/rollout models.

Two layers, mirroring the reference's two aerodynamic models:

* :func:`fw_forces_moments` — the full polynomial-coefficient airframe model
  of ``gazebo_fw_dynamics_plugin.cpp:136-282`` (Techpod defaults from
  ``fw_parameters.h:29-96`` / ``resource/fixed_wing/techpod.yaml``): angle of
  attack / sideslip from body airspeed, wind-frame force and moment
  polynomials in (alpha, beta, deflections, non-dimensional rates), quadratic
  throttle thrust, wind->body rotation.  Everything is elementwise VPU math,
  batched over arbitrary leading dims, so the same function serves the plant
  and K x H MPPI rollouts.
* :func:`liftdrag_wrench` — the per-surface stall-aware lift/drag element of
  ``liftdrag_plugin/liftdrag_plugin.cpp:160-320`` (airflow decomposition in
  the lift-drag plane, piecewise-linear post-stall cl/cd, sweep correction,
  control-joint cl increment) for modelling individual surfaces/blades.

The reference plugin computes only forces and hands integration to
Gazebo/ODE; here :func:`step` closes the loop with the same semi-implicit
Euler rigid-body integrator the multirotor plant uses, with the Techpod's
full inertia tensor (``techpod.xacro:88-90`` has a non-zero ixz product, so
the rotational update solves the 3x3 system rather than assuming a diagonal).

Frame note: the reference's body frame is North-West-Up; aerodynamics are
evaluated in North-East-Down and flipped back (the u,v,w / p,q,r sign flips
of ``gazebo_fw_dynamics_plugin.cpp:144-154`` and the force/moment flips of
``:274-277``).  We keep the same NWU body frame (x forward, y left, z up) so
states compose with the rest of the framework.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..utils import rotations as rot

Array = jnp.ndarray

GRAVITY = 9.81
AIR_DENSITY = 1.2041          # kAirDensity, gazebo_fw_dynamics_plugin.h
MIN_AIRSPEED = 0.1            # kMinAirSpeedThresh


@dataclasses.dataclass(frozen=True)
class FwAeroParams:
    """Aerodynamic coefficient polynomials (Techpod, fw_parameters.h:35-83)."""

    alpha_max: float = 0.27
    alpha_min: float = -0.27
    # drag: [1, alpha, alpha^2] etc.
    c_drag_alpha: tuple = (0.1360, -0.6737, 5.4546)
    c_drag_beta: tuple = (0.0195, 0.0, -0.3842)
    c_drag_delta_ail: tuple = (0.0195, 1.4205e-4, 7.5037e-6)
    c_drag_delta_flp: tuple = (0.0195, 2.7395e-4, 1.23e-5)
    c_side_force_beta: tuple = (0.0, -0.3073)
    c_lift_alpha: tuple = (0.2127, 10.8060, -46.8324, 60.6017)
    c_lift_delta_ail: tuple = (0.3304, 0.0048)
    c_lift_delta_flp: tuple = (0.3304, 0.0073)
    c_roll_moment_beta: tuple = (0.0, -0.0154)
    c_roll_moment_p: tuple = (0.0, -0.1647)
    c_roll_moment_r: tuple = (0.0, 0.0117)
    c_roll_moment_delta_ail: tuple = (0.0, 0.0570)
    c_roll_moment_delta_flp: tuple = (0.0, 0.001)
    c_pitch_moment_alpha: tuple = (0.0435, -2.9690)
    c_pitch_moment_q: tuple = (-0.1173, -106.1541)
    c_pitch_moment_delta_elv: tuple = (-0.1173, -6.1308)
    c_yaw_moment_beta: tuple = (0.0, 0.0430)
    c_yaw_moment_r: tuple = (0.0, -0.0827)
    c_yaw_moment_delta_rud: tuple = (0.0, 0.06)
    c_thrust: tuple = (0.0, 14.7217, 0.0)


@dataclasses.dataclass(frozen=True)
class FwVehicleParams:
    """Airframe geometry + rigid-body properties (techpod.yaml / techpod.xacro).

    Mass is the assembled vehicle (fuselage 2.05 + 4 surfaces + propeller at
    0.1 kg each, techpod.xacro:27-33); inertia is the fuselage body tensor
    (techpod.xacro:88-90) with its ixz product of inertia.
    """

    wing_span: float = 2.59
    wing_surface: float = 0.47
    chord_length: float = 0.18
    thrust_inclination: float = 0.0
    mass: float = 2.65
    inertia_diag: tuple = (0.16632, 0.3899, 0.5243)
    inertia_ixz: float = 0.0755
    # symmetric +-20 deg (techpod.yaml: +-0.349066 rad) for every surface
    deflection_limit: float = 0.349066
    ground_z: float = 0.0

    def inertia_matrix(self) -> np.ndarray:
        ixx, iyy, izz = self.inertia_diag
        ixz = self.inertia_ixz
        return np.array(
            [[ixx, 0.0, ixz], [0.0, iyy, 0.0], [ixz, 0.0, izz]], np.float64
        )

    def inertia_inverse(self) -> np.ndarray:
        return np.linalg.inv(self.inertia_matrix())


class FwControls(NamedTuple):
    """Normalized [-1, 1] surface commands + [0, 1] throttle.

    ``NormalizedInputToAngle`` (gazebo_fw_dynamics_plugin.cpp:284-288) maps
    each normalized input onto the surface's deflection range; with the
    Techpod's symmetric limits that is simply ``input * deflection_limit``.
    """

    aileron_left: Array
    aileron_right: Array
    elevator: Array
    flap: Array
    rudder: Array
    throttle: Array


def controls_from_actuators(normalized: Array) -> FwControls:
    """Unpack the 6-channel normalized actuator array using the Techpod
    channel map (fw_parameters.h:91-96: ail_r=0, elev=1, flap=2, rudder=3,
    ail_l=4, throttle=5)."""
    return FwControls(
        aileron_left=normalized[..., 4],
        aileron_right=normalized[..., 0],
        elevator=normalized[..., 1],
        flap=normalized[..., 2],
        rudder=normalized[..., 3],
        throttle=normalized[..., 5],
    )


def _poly(coeffs: tuple, x: Array) -> Array:
    """dot(coeffs, [1, x, x^2, ...]) with coeffs[0] as the constant term."""
    acc = jnp.zeros_like(x) + coeffs[0]
    xp = x
    for c in coeffs[1:]:
        acc = acc + c * xp
        xp = xp * x
    return acc


def _poly0(coeffs: tuple, x: Array) -> Array:
    """Same but dropping the constant term (reference dots with [0, x, ...])."""
    return _poly((0.0,) + tuple(coeffs[1:]), x)


def fw_forces_moments(
    aero: FwAeroParams,
    veh: FwVehicleParams,
    v_air_body: Array,
    omega_body: Array,
    controls: FwControls,
) -> tuple[Array, Array]:
    """Body-frame (force, moment) of the polynomial airframe model.

    ``v_air_body`` is the body-frame airspeed (vehicle velocity minus wind,
    rotated into the body frame), ``omega_body`` the body angular velocity,
    both in the NWU body frame.  Follows
    ``gazebo_fw_dynamics_plugin.cpp:136-282`` term by term.
    """
    dtype = v_air_body.dtype
    defl = veh.deflection_limit
    d_ail_l = controls.aileron_left * defl
    d_ail_r = controls.aileron_right * defl
    d_elev = controls.elevator * defl
    d_flap = controls.flap * defl
    d_rud = controls.rudder * defl
    throttle = controls.throttle

    # NWU -> NED component flips (:144-154)
    u = v_air_body[..., 0]
    v = -v_air_body[..., 1]
    w = -v_air_body[..., 2]
    p = omega_body[..., 0]
    q = -omega_body[..., 1]
    r = -omega_body[..., 2]

    speed = jnp.linalg.norm(v_air_body, axis=-1)
    slow = speed < MIN_AIRSPEED
    beta = jnp.where(
        slow, 0.0, jnp.arcsin(jnp.clip(v / jnp.maximum(speed, 1e-6), -1.0, 1.0))
    )
    alpha = jnp.where(
        u < MIN_AIRSPEED, 0.0, jnp.arctan2(w, jnp.maximum(u, 1e-6))
    )
    alpha = jnp.clip(alpha, aero.alpha_min, aero.alpha_max)

    q_bar_s = 0.5 * AIR_DENSITY * speed * speed * veh.wing_surface

    ail_sum = d_ail_l + d_ail_r
    ail_diff = d_ail_l - d_ail_r
    flap_sum = 2.0 * d_flap
    flap_diff = jnp.zeros_like(flap_sum)

    drag = q_bar_s * (
        _poly(aero.c_drag_alpha, alpha)
        + _poly0(aero.c_drag_beta, beta)
        + _poly0(aero.c_drag_delta_ail, ail_sum)
        + _poly0(aero.c_drag_delta_flp, flap_sum)
    )
    side = q_bar_s * _poly0(aero.c_side_force_beta, beta)
    lift = q_bar_s * (
        _poly(aero.c_lift_alpha, alpha)
        + _poly0(aero.c_lift_delta_ail, ail_sum)
        + _poly0(aero.c_lift_delta_flp, flap_sum)
    )
    forces_wind = jnp.stack([-drag, side, -lift], axis=-1)

    # Non-dimensional rates (:206-211)
    safe_v = jnp.maximum(speed, MIN_AIRSPEED)
    p_hat = jnp.where(slow, 0.0, p * veh.wing_span / (2.0 * safe_v))
    q_hat = jnp.where(slow, 0.0, q * veh.chord_length / (2.0 * safe_v))
    r_hat = jnp.where(slow, 0.0, r * veh.wing_span / (2.0 * safe_v))

    roll_m = q_bar_s * veh.wing_span * (
        _poly0(aero.c_roll_moment_beta, beta)
        + _poly0(aero.c_roll_moment_p, p_hat)
        + _poly0(aero.c_roll_moment_r, r_hat)
        + _poly0(aero.c_roll_moment_delta_ail, ail_diff)
        + _poly0(aero.c_roll_moment_delta_flp, flap_diff)
    )
    pitch_m = q_bar_s * veh.chord_length * (
        _poly(aero.c_pitch_moment_alpha, alpha)
        + _poly0(aero.c_pitch_moment_q, q_hat)
        + _poly0(aero.c_pitch_moment_delta_elv, d_elev)
    )
    yaw_m = q_bar_s * veh.wing_span * (
        _poly0(aero.c_yaw_moment_beta, beta)
        + _poly0(aero.c_yaw_moment_r, r_hat)
        + _poly0(aero.c_yaw_moment_delta_rud, d_rud)
    )
    moments_wind = jnp.stack([roll_m, pitch_m, yaw_m], axis=-1)

    thrust = _poly(aero.c_thrust, throttle)
    incl = veh.thrust_inclination
    force_thrust_b = thrust[..., None] * jnp.asarray(
        [math.cos(incl), 0.0, math.sin(incl)], dtype
    )

    # Wind -> body rotation (transpose of R_Wind_B, :255-266)
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    cb, sb = jnp.cos(beta), jnp.sin(beta)
    zeros = jnp.zeros_like(ca)
    r_wind_b = jnp.stack(
        [
            jnp.stack([ca * cb, sb, sa * cb], axis=-1),
            jnp.stack([-sb * ca, cb, -sa * sb], axis=-1),
            jnp.stack([-sa, zeros, ca], axis=-1),
        ],
        axis=-2,
    )
    forces_ned = (
        jnp.einsum("...ji,...j->...i", r_wind_b, forces_wind) + force_thrust_b
    )
    moments_ned = jnp.einsum("...ji,...j->...i", r_wind_b, moments_wind)

    # NED -> NWU flips (:274-277)
    flip = jnp.asarray([1.0, -1.0, -1.0], dtype)
    return forces_ned * flip, moments_ned * flip


class FixedWingState(NamedTuple):
    pos: Array    # (..., 3) world position
    quat: Array   # (..., 4) wxyz body->world
    vel: Array    # (..., 3) world linear velocity
    omega: Array  # (..., 3) body angular velocity


def init_state(
    pos=(0.0, 0.0, 100.0),
    vel=(0.0, 0.0, 0.0),
    batch_shape=(),
    dtype=jnp.float32,
) -> FixedWingState:
    return FixedWingState(
        pos=jnp.broadcast_to(jnp.asarray(pos, dtype), batch_shape + (3,)),
        quat=jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0], dtype), batch_shape + (4,)),
        vel=jnp.broadcast_to(jnp.asarray(vel, dtype), batch_shape + (3,)),
        omega=jnp.zeros(batch_shape + (3,), dtype),
    )


def step(
    aero: FwAeroParams,
    veh: FwVehicleParams,
    state: FixedWingState,
    controls: FwControls,
    dt: float,
    wind_world: Optional[Array] = None,
) -> FixedWingState:
    """Semi-implicit Euler step of the fixed-wing rigid body (batched).

    The reference plugin applies :func:`fw_forces_moments` to the Gazebo link
    each tick; this closes the integration the same way the multirotor plant
    does, but with the Techpod's full (non-diagonal) inertia tensor.
    """
    dtype = state.pos.dtype
    r = rot.quat_to_matrix(state.quat)
    airspeed_world = state.vel if wind_world is None else state.vel - wind_world
    v_air_b = jnp.einsum("...ji,...j->...i", r, airspeed_world)

    force_b, moment_b = fw_forces_moments(aero, veh, v_air_b, state.omega, controls)

    acc = jnp.einsum("...ij,...j->...i", r, force_b) / veh.mass
    acc = acc - jnp.asarray([0.0, 0.0, GRAVITY], dtype)

    inertia = jnp.asarray(veh.inertia_matrix(), dtype)
    inertia_inv = jnp.asarray(veh.inertia_inverse(), dtype)
    iw = jnp.einsum("ij,...j->...i", inertia, state.omega)
    omega_dot = jnp.einsum(
        "ij,...j->...i", inertia_inv, moment_b - jnp.cross(state.omega, iw)
    )

    vel = state.vel + acc * dt
    pos = state.pos + vel * dt
    omega = state.omega + omega_dot * dt
    dq = rot.quat_from_axis_angle(omega * dt)
    quat = rot.quat_normalize(rot.quat_multiply(state.quat, dq))
    return FixedWingState(pos=pos, quat=quat, vel=vel, omega=omega)


# ---------------------------------------------------------------------------
# Per-surface lift/drag element (liftdrag_plugin)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LiftDragParams:
    """One aerodynamic surface (liftdrag_plugin.cpp:54-157 SDF params)."""

    cla: float = 1.0            # lift-curve slope dCl/dalpha
    cda: float = 0.01           # drag-curve slope
    cma: float = 0.01           # moment-curve slope
    alpha_stall: float = 0.5 * math.pi
    cla_stall: float = 0.0      # post-stall slopes
    cda_stall: float = 1.0
    cma_stall: float = 0.0
    alpha0: float = 0.0         # zero-lift angle of attack offset
    area: float = 1.0
    air_density: float = 1.2041
    forward: tuple = (1.0, 0.0, 0.0)   # link-frame -drag direction
    upward: tuple = (0.0, 0.0, 1.0)    # link-frame +lift direction
    cp: tuple = (0.0, 0.0, 0.0)        # center of pressure, link frame
    radial_symmetry: bool = False
    control_joint_rad_to_cl: float = 0.0


def liftdrag_wrench(
    params: LiftDragParams,
    rot_body_world: Array,
    vel_world_at_cp: Array,
    control_angle: Array = 0.0,
) -> tuple[Array, Array]:
    """World-frame (force, torque-about-link-origin) of one lift/drag surface.

    Follows ``liftdrag_plugin.cpp:160-320``: decompose the inflow in the
    lift-drag plane, alpha from the angle between lift direction and the
    link's upward vector, piecewise-linear stall model for cl/cd/cm with
    sweep correction, optional control-joint cl increment.  ``torque`` is
    the cp-offset moment ``cp x force`` (in world frame via the link
    rotation) plus the cm pitching moment about the spanwise axis.
    """
    dtype = vel_world_at_cp.dtype
    vel = vel_world_at_cp
    speed = jnp.linalg.norm(vel, axis=-1)
    vel_i = vel / jnp.maximum(speed, 1e-9)[..., None]

    forward_i = jnp.einsum(
        "...ij,j->...i", rot_body_world, jnp.asarray(params.forward, dtype)
    )
    if params.radial_symmetry:
        tmp = jnp.cross(forward_i, vel_i)
        upward_i = jnp.cross(forward_i, tmp)
        upward_i = upward_i / jnp.maximum(
            jnp.linalg.norm(upward_i, axis=-1), 1e-9
        )[..., None]
    else:
        upward_i = jnp.einsum(
            "...ij,j->...i", rot_body_world, jnp.asarray(params.upward, dtype)
        )
    spanwise_i = jnp.cross(forward_i, upward_i)
    spanwise_i = spanwise_i / jnp.maximum(
        jnp.linalg.norm(spanwise_i, axis=-1), 1e-9
    )[..., None]

    sin_sweep = jnp.clip(
        jnp.sum(spanwise_i * vel_i, axis=-1), -1.0, 1.0
    )
    cos_sweep2 = 1.0 - sin_sweep * sin_sweep  # reference's "cosSweepAngle"

    # The reference's velInLDPlane (:223) subtracts the spanwise component
    # ALONG THE VELOCITY DIRECTION: vel - (vel . spanwise) * vel_hat — NOT
    # the textbook projection vel - (vel . spanwise) * spanwise (which
    # would remove it along the spanwise axis).  Upstream Gazebo quirk,
    # reproduced bug-for-bug like the depth-noise quirks; the two agree
    # whenever sweep is zero (no spanwise inflow), the normal regime.
    vel_ld = vel - jnp.sum(vel * spanwise_i, axis=-1, keepdims=True) * vel_i

    drag_dir = -vel_ld / jnp.maximum(
        jnp.linalg.norm(vel_ld, axis=-1), 1e-9
    )[..., None]
    lift_i = jnp.cross(spanwise_i, vel_ld)
    lift_i = lift_i / jnp.maximum(
        jnp.linalg.norm(lift_i, axis=-1), 1e-9
    )[..., None]

    cos_alpha = jnp.clip(jnp.sum(lift_i * upward_i, axis=-1), -1.0, 1.0)
    sign = jnp.where(jnp.sum(lift_i * forward_i, axis=-1) >= 0.0, 1.0, -1.0)
    alpha = params.alpha0 + sign * jnp.arccos(cos_alpha)
    # normalize to +-pi/2 (:254-257)
    alpha = jnp.where(alpha > 0.5 * math.pi, alpha - math.pi, alpha)
    alpha = jnp.where(alpha < -0.5 * math.pi, alpha + math.pi, alpha)

    speed_ld = jnp.linalg.norm(vel_ld, axis=-1)
    q_dyn = 0.5 * params.air_density * speed_ld * speed_ld

    a_s = params.alpha_stall
    cl_pre = params.cla * alpha * cos_sweep2
    cl_post_hi = jnp.maximum(
        0.0, (params.cla * a_s + params.cla_stall * (alpha - a_s)) * cos_sweep2
    )
    cl_post_lo = jnp.minimum(
        0.0, (-params.cla * a_s + params.cla_stall * (alpha + a_s)) * cos_sweep2
    )
    cl = jnp.where(alpha > a_s, cl_post_hi,
                   jnp.where(alpha < -a_s, cl_post_lo, cl_pre))
    cl = cl + params.control_joint_rad_to_cl * control_angle

    cd_pre = params.cda * alpha * cos_sweep2
    cd_post_hi = (params.cda * a_s + params.cda_stall * (alpha - a_s)) * cos_sweep2
    cd_post_lo = (-params.cda * a_s + params.cda_stall * (alpha + a_s)) * cos_sweep2
    cd = jnp.where(alpha > a_s, cd_post_hi,
                   jnp.where(alpha < -a_s, cd_post_lo, cd_pre))
    cd = jnp.abs(cd)

    cm_pre = params.cma * alpha * cos_sweep2
    cm_post_hi = jnp.maximum(
        0.0, (params.cma * a_s + params.cma_stall * (alpha - a_s)) * cos_sweep2
    )
    cm_post_lo = jnp.minimum(
        0.0, (-params.cma * a_s + params.cma_stall * (alpha + a_s)) * cos_sweep2
    )
    cm = jnp.where(alpha > a_s, cm_post_hi,
                   jnp.where(alpha < -a_s, cm_post_lo, cm_pre))

    qa = (q_dyn * params.area)[..., None]
    lift = cl[..., None] * qa * lift_i
    drag = cd[..., None] * qa * drag_dir
    moment = cm[..., None] * qa * spanwise_i

    force = lift + drag
    # negligible inflow produces no wrench (:171-172)
    active = (speed > 0.01)[..., None]
    force = jnp.where(active, force, 0.0)
    cp_world = jnp.einsum(
        "...ij,j->...i", rot_body_world, jnp.asarray(params.cp, dtype)
    )
    torque = jnp.cross(cp_world, force) + jnp.where(active, moment, 0.0)
    return force, torque


def aero_params_from_yaml(path: str) -> FwAeroParams:
    """Load aerodynamic coefficients from a RotorS fixed-wing YAML
    (``resource/fixed_wing/aero_params_techpod.yaml`` format — flat keys
    matching the FwAeroParams field names, vectors as lists; the
    ``fw_parameters.h:180-212`` LoadAeroParamsYAML reader).  Unknown keys
    are ignored, absent keys keep the Techpod defaults."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    fields = {f.name for f in dataclasses.fields(FwAeroParams)}
    kwargs = {}
    for k, v in data.items():
        if k in fields:
            kwargs[k] = tuple(v) if isinstance(v, (list, tuple)) else float(v)
    return FwAeroParams(**kwargs)


def vehicle_params_from_yaml(path: str) -> FwVehicleParams:
    """Load airframe geometry from a RotorS fixed-wing vehicle YAML
    (``resource/fixed_wing/techpod.yaml`` format).  Control-surface
    sub-maps carry per-surface deflection limits; this model uses one
    symmetric limit, taken from the first surface entry found
    (the Techpod's are all +-20 deg).  Mass/inertia are not part of the
    reference YAML (Gazebo's link carries them) and keep the defaults."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    kwargs = {}
    for k in ("wing_span", "wing_surface", "chord_length",
              "thrust_inclination"):
        if k in data:
            kwargs[k] = float(data[k])
    for surface in ("aileron_left", "aileron_right", "elevator", "flap",
                    "rudder"):
        sub = data.get(surface)
        if isinstance(sub, dict) and "deflection_max" in sub:
            kwargs["deflection_limit"] = abs(float(sub["deflection_max"]))
            break
    return FwVehicleParams(**kwargs)

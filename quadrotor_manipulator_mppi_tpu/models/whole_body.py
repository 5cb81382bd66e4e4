"""Whole-body quadrotor + 7-DoF-arm coupled model for MPPI rollouts.

The reference declares whole-body MPPI as future work (``README.md:30-34``);
its per-subsystem solvers treat the base as fixed during an arm solve and the
arm as absent during a drone solve.  This module supplies the coupled rollout
the TPU build ships as its flagship config (BASELINE.json config 3):

* base — 12-state multirotor rigid body driven by sampled wrench actions
  (:func:`~.multirotor.step12`, physics constants from the reference plant);
* arm — joint accelerations sampled directly (the reference arm MPPI's action
  space, ``mppi.py:122-140``), double-integrated kinematically;
* coupling — quasi-static arm reaction on the base: the gravity wrench of the
  arm in the base frame (what the reference's flight controller feeds forward
  from its symbolic model, ``controller.cpp:587-610``) plus the payload mass
  shift, applied to the base dynamics each step;
* end-effector — batched FK of base pose x arm q over the whole (K, H) block.

Rollout structure is TPU-deliberate: the *sequential* part (base attitude
integration) runs as a ``lax.scan`` over H carrying only the 12-dim base
state batched over K; everything wide (joint integration via cumsum, FK,
costs) happens afterwards on the full (K, H) block where the VPU stays
saturated (SURVEY.md section 5 long-context note).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import integrators
from ..utils import rotations as rot
from ..utils import se3  # noqa: F401  (kept for API compat)
from ..utils.pose import Pose
from . import chain as chain_mod
from . import kinova
from .chain import ChainSpec
from .multirotor import Multirotor12State, MultirotorParams, step12
from .rigid_body import InertialParams, SpatialVel, rnea

Array = jax.Array

N_BASE_ACTIONS = 4  # [thrust, tau_x, tau_y, tau_z]


@dataclass(frozen=True)
class WholeBodyParams:
    vehicle: MultirotorParams = MultirotorParams()
    arm_tip: str = "link_7"
    arm_mass_lump: float = 5.54   # plant adds this with the arm (controller.cpp:159-161)
    couple_arm_gravity: bool = True
    drag_kd: float = 0.0
    # Action-space mode:
    #   "wrench"   — MPPI samples [thrust, tau_xyz, qddot x7] directly
    #                (pure direct whole-body control; fragile against plant
    #                mismatch in closed loop — research mode);
    #   "attitude" — MPPI samples [thrust, roll/pitch/yaw setpoints,
    #                qddot x7]; a PD attitude loop (gains below, mirrored on
    #                the plant side) closes attitude inside the rollout.
    #                The PD-closed attitude dynamics are LINEAR, so the
    #                rollout realizes them with precomputed (H, H)
    #                convolution matrices — still fully parallel-in-time.
    #   "position" — MPPI samples [base position-setpoint offsets xyz,
    #                yaw setpoint, qddot x7]; the plant's backstepping inner
    #                loop closes the position loop (the reference's drone
    #                architecture, extended with the arm), and the rollout
    #                models the closed position loop as the identified
    #                2nd-order linear response below — again precomputed
    #                convolution matrices, fully parallel-in-time.  The most
    #                robust mode for long-horizon closed-loop flight.
    control_mode: str = "attitude"
    att_kp_rp: float = 100.0   # roll/pitch PD (omega_n ~ 10 rad/s)
    att_kd_rp: float = 18.0
    att_kp_yaw: float = 20.0
    att_kd_yaw: float = 9.0
    # Identified closed-loop position dynamics of the backstepping inner loop
    # on the full plant (step-response fit, arm lump attached: x/y t90~2.5 s
    # -> omega_n 1.3, zeta 0.8; z t90~0.9 s -> omega_n 3, zeta 0.9).
    pos_kp_xy: float = 1.7
    pos_kd_xy: float = 2.1
    pos_kp_z: float = 9.0
    pos_kd_z: float = 5.4
    # Parallel-in-time rollout (quaternion associative scan) vs sequential
    # euler-angle lax.scan.  Same physics to first order; the parallel path
    # turns the horizon axis into log-depth prefix ops (see rollout_parallel).
    time_parallel: bool = True
    # First-order actuator-lag time constant modeled in the rollout (the
    # plant's rotors filter commands with tau_up/down = 0.0125/0.025,
    # gazebo_motor_model.cpp; 0 disables).  Applied as a precomputed
    # discrete-convolution matrix along H — parallel-in-time friendly.
    rotor_lag_tau: float = 0.02
    # Wrench-mode stabilizer [1/s]: the plant applies tau -= kd I omega as
    # a 1 kHz body-rate feedback UNDER the MPPI torque, and the rollout
    # models the same damped dynamics (the omega cumsum becomes the
    # _drag_decay_operator recurrence — still parallel-in-time).  Without
    # it, 100 Hz-held torques through the asymmetric rotor lag cannot
    # stabilize attitude against model mismatch and the closed loop
    # wanders (ROADMAP "wrench (research): fragile").  0 = the original
    # pure direct-wrench behavior.
    rate_damping: float = 0.0

    def chain(self) -> ChainSpec:
        return kinova.chain(self.arm_tip)

    def inertials(self) -> InertialParams:
        return kinova.inertials()


class WholeBodyState(NamedTuple):
    base: Multirotor12State
    q: Array      # (…, 7)
    qdot: Array   # (…, 7)


class BaseTraj(NamedTuple):
    """Base trajectory over (K, H): world position/velocity, body->world
    quaternion (wxyz), body rates.  Quaternion (not matrix) so the whole
    rollout->cost pipeline stays free of batched 3x3 matmuls."""

    pos: Array    # (K, H, 3)
    quat: Array   # (K, H, 4)
    vel: Array    # (K, H, 3)
    omega: Array  # (K, H, 3)

    def tilt_squared(self) -> Array:
        """sin^2 of the body-z tilt components: R[0,2]^2 + R[1,2]^2 computed
        directly from the quaternion (== roll^2 + pitch^2 to first order)."""
        w, x, y, z = jnp.moveaxis(self.quat, -1, 0)
        r02 = 2.0 * (x * z + w * y)
        r12 = 2.0 * (y * z - w * x)
        return r02 * r02 + r12 * r12


def base_rotation(base: Multirotor12State) -> Array:
    """Body->world rotation from the reduced state's rpy."""
    angles = jnp.stack(
        [base.rpy[..., 2], base.rpy[..., 1], base.rpy[..., 0]], axis=-1
    )
    return rot.euler_to_matrix(angles, "ZYX")


def arm_gravity_wrench(
    spec: ChainSpec,
    inertials: InertialParams,
    q: Array,
    base_rot: Array,
) -> Tuple[Array, Array]:
    """Static arm reaction (force, torque) on the base, base frame.

    RNEA with zero joint motion returns the wrench the arm root exerts on its
    mount — the in-framework replacement for the reference's closed-form
    symbolic gravity wrench (controller.cpp:595-596).
    """
    zeros = jnp.zeros_like(q)
    _, wrench = rnea(spec, inertials, q, zeros, zeros, base_rot=base_rot)
    # rnea returns the wrench the mount must *apply* to hold the arm; the
    # reaction on the base is its negative.
    return -wrench.lin, -wrench.ang


def arm_gravity_torque_fast(
    spec: ChainSpec,
    inertials: InertialParams,
    q: Array,
    base_rot: Array,
) -> Array:
    """Gravity *moment* of the arm about the base origin, base frame —
    tau = sum_i m_i (c_i x g_b) with COM positions from the matmul-free
    quaternion chain.  Statically equivalent to the torque component of
    :func:`arm_gravity_wrench` (tested) at a fraction of the cost; used in
    the rollout hot path where only the moment matters (the weight itself is
    carried by the base mass lump).
    """
    dtype = q.dtype
    coms = chain_mod.link_positions_posquat(spec, q, inertials.com)  # [..., J, 3]
    # Gravity in the base frame: g_b = R^T (0, 0, -g).
    g_b = -9.81 * jnp.swapaxes(base_rot, -1, -2)[..., :, 2]
    masses = jnp.asarray(inertials.mass, dtype)
    weighted = jnp.einsum("...ji,j->...i", jnp.cross(coms, g_b[..., None, :]), masses)
    return weighted


def _base_rollout_scan(
    params: WholeBodyParams, state: WholeBodyState, base_u: Array, dt: float, k: int
) -> BaseTraj:
    """Sequential reference-style base rollout: lax.scan of euler-angle
    ``step12`` over the horizon (the reference's commented rollout scheme,
    ``drone_mppi.py:57-83``)."""
    base0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (k,) + x.shape), state.base
    )

    def step_fn(b, u_t):
        nxt = step12(
            params.vehicle, b, u_t, dt,
            extra_mass=params.arm_mass_lump, drag_kd=params.drag_kd,
            rate_damping=params.rate_damping,
        )
        return nxt, nxt

    _, traj = jax.lax.scan(step_fn, base0, jnp.moveaxis(base_u, 1, 0))
    traj = jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), traj)
    return BaseTraj(
        pos=traj.pos,
        quat=rot.matrix_to_quat(base_rotation(traj)),
        vel=traj.vel,
        omega=traj.omega,
    )


def _base_rollout_parallel(
    params: WholeBodyParams, state: WholeBodyState, base_u: Array, dt: float, k: int
) -> BaseTraj:
    """Parallel-in-time base rollout — the TPU-native path.

    The sequential dependence of a wrench-driven rigid body factorizes into
    prefix operations (SURVEY.md section 2.4 "horizon parallelism", taken
    beyond the reference's cumsum-only kinematics):

      omega_t   = omega_0 + cumsum(I^-1 tau dt)          (gyroscopic term
                  dropped, as in the reference's model and step12)
      R_t       = R_0 * prod_{s<=t} exp(omega_s dt)      -> quaternion
                  associative_scan (log-depth, fully batched)
      vel_t     = vel_0 + cumsum((R_t f_t)/m - g) dt
      pos_t     = pos_0 + cumsum(vel_t) dt

    Matches ``step12``'s semi-implicit update order (new omega -> new
    attitude -> acc -> new vel -> new pos) with quaternion instead of
    euler-rate attitude integration — first-order equivalent, and closer to
    the full plant (``multirotor.step``), which also integrates quaternions.
    drag_kd > 0 makes vel an affine recurrence, realized as one more
    precomputed (H, H) operator (:func:`_drag_decay_operator`) — still fully
    parallel-in-time.
    """
    dtype = base_u.dtype
    vehicle = params.vehicle
    m = vehicle.mass + params.arm_mass_lump
    inertia = jnp.asarray(vehicle.inertia, dtype)

    # Body rates: plain cumsum, or the damped recurrence
    # omega' = (1 - dt kd) omega + dt tau/I when rate_damping > 0 (the
    # wrench-mode stabilizer) — same decay-operator machinery as drag.
    omega = _drag_velocity(
        params.rate_damping, dt, state.base.omega, base_u[..., 1:4] / inertia
    )
    dq = rot.quat_from_axis_angle(omega * dt)                   # (K, H, 4)
    prefix = jax.lax.associative_scan(rot.quat_multiply, dq, axis=-2)
    q0 = rot.matrix_to_quat(base_rotation(state.base))          # (4,)
    quat = rot.quat_multiply(q0, prefix)

    # World thrust direction = body z column of R(quat), elementwise.
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    z_world = jnp.stack(
        [2.0 * (x * z + w * y), 2.0 * (y * z - w * x), 1.0 - 2.0 * (x * x + y * y)],
        axis=-1,
    )
    acc = z_world * base_u[..., 0:1] / m - jnp.asarray([0.0, 0.0, 9.81], dtype)
    vel = _drag_velocity(params.drag_kd, dt, state.base.vel, acc)
    pos = state.base.pos + jnp.cumsum(vel * dt, axis=-2)
    return BaseTraj(pos=pos, quat=quat, vel=vel, omega=omega)


@functools.lru_cache(maxsize=None)
def _drag_decay_operator(h: int, alpha: float) -> Tuple[np.ndarray, np.ndarray]:
    """Linear-drag velocity recurrence as a parallel-in-time operator.

    v_{t+1} = alpha v_t + dt a_t (alpha = 1 - dt k_d, matching ``step12``'s
    explicit-Euler drag `- drag_kd * vel`) unrolls to
    v_t = alpha^{t+1} v_0 + sum_{s<=t} alpha^{t-s} dt a_s — one (H, H)
    lower-triangular MXU matmul over the acceleration sequence plus a decay
    profile on the initial velocity.  alpha=1 degenerates to the plain
    cumsum.  Returns ``(D (H, H), hom (H,))``.
    """
    d = np.zeros((h, h))
    for t in range(h):
        d[t, : t + 1] = alpha ** np.arange(t, -1, -1)
    hom = alpha ** np.arange(1, h + 1)
    return d, hom


def _drag_velocity(
    drag_kd: float, dt: float, vel0: Array, acc: Array
) -> Array:
    """Velocity trajectory under linear drag from the (K, H, 3) acceleration
    sequence (thrust/m - g, drag excluded); plain cumsum when drag is off."""
    if not drag_kd:
        return vel0 + jnp.cumsum(acc * dt, axis=-2)
    d, hom = _drag_decay_operator(acc.shape[-2], 1.0 - dt * drag_kd)
    dtype = acc.dtype
    return (
        jnp.einsum("ts,...si->...ti", jnp.asarray(d, dtype), acc * dt)
        + jnp.asarray(hom, dtype)[:, None] * vel0
    )


def _rotor_lag_matrix(h: int, dt: float, tau: float) -> np.ndarray:
    """(H, H) lower-triangular convolution realizing the discrete first-order
    lag y_t = alpha y_{t-1} + (1-alpha) u_t with y_0 primed at u_0 (the plant
    holds the current wrench when a solve starts)."""
    alpha = float(np.exp(-dt / tau))
    f = np.zeros((h, h))
    for t in range(h):
        for s in range(t + 1):
            f[t, s] = (1.0 - alpha) * alpha ** (t - s)
        f[t, 0] += alpha ** (t + 1)  # initial-condition weight folded onto u_0
    return f


@functools.lru_cache(maxsize=None)
def _attitude_response_matrices(h: int, dt: float, kp: float, kd: float):
    """Discrete closed-loop attitude response under the PD law
    omega' = omega + dt (kp (u - phi) - kd omega); phi' = phi + dt omega'.

    Linear system x' = A x + B u with x = (phi, omega).  Returns
    (g_phi (H, H), g_omega (H, H), hom (H, 2, 2)): the input-convolution
    matrices for the phi and omega trajectories and the homogeneous
    propagator of the initial state (phi_t row 0, omega_t row 1).
    """
    a = np.array([[1.0 - dt * dt * kp, dt * (1.0 - dt * kd)],
                  [-dt * kp, 1.0 - dt * kd]])
    b = np.array([dt * dt * kp, dt * kp])
    g_phi = np.zeros((h, h))
    g_omega = np.zeros((h, h))
    hom = np.zeros((h, 2, 2))
    a_pow = np.eye(2)
    # x_t = A^{t+1} x_0 + sum_{s<=t} A^{t-s} B u_s
    pows = [np.eye(2)]
    for _ in range(h):
        pows.append(a @ pows[-1])
    for t in range(h):
        hom[t] = pows[t + 1]
        for s in range(t + 1):
            ab = pows[t - s] @ b
            g_phi[t, s] = ab[0]
            g_omega[t, s] = ab[1]
    return g_phi, g_omega, hom


def _quat_from_rpy(rpy: Array) -> Array:
    """Elementwise euler (roll, pitch, yaw) -> wxyz quaternion
    (qz(yaw) x qy(pitch) x qx(roll)) — no matrices, VPU-only."""
    half = 0.5 * rpy
    cr, sr = jnp.cos(half[..., 0]), jnp.sin(half[..., 0])
    cp, sp = jnp.cos(half[..., 1]), jnp.sin(half[..., 1])
    cy, sy = jnp.cos(half[..., 2]), jnp.sin(half[..., 2])
    return jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        axis=-1,
    )


def _base_rollout_attitude(
    params: WholeBodyParams, state: WholeBodyState, base_u: Array, dt: float, k: int
) -> BaseTraj:
    """Attitude-setpoint rollout: base_u = (K, H, 4) = [thrust, rpy_des].

    The PD-closed attitude loop is linear per axis, so the whole attitude
    trajectory is two (H, H) matmuls + the homogeneous initial-state term;
    velocities/positions follow as cumsums.  Fully parallel-in-time.
    """
    dtype = base_u.dtype
    h = base_u.shape[1]
    m = params.vehicle.mass + params.arm_mass_lump

    g_rp, go_rp, hom_rp = _attitude_response_matrices(
        h, dt, params.att_kp_rp, params.att_kd_rp
    )
    g_y, go_y, hom_y = _attitude_response_matrices(
        h, dt, params.att_kp_yaw, params.att_kd_yaw
    )

    rpy0 = state.base.rpy          # (3,)
    om0 = state.base.omega         # (3,) treated as euler rates (small tilt)
    rpy_des = base_u[..., 1:4]     # (K, H, 3)

    def axis_traj(g, go, hom, i):
        u = rpy_des[..., i]                         # (K, H)
        gphi = jnp.asarray(g, dtype)
        gom = jnp.asarray(go, dtype)
        homj = jnp.asarray(hom, dtype)              # (H, 2, 2)
        x0 = jnp.stack([rpy0[i], om0[i]])           # (2,)
        hom_traj = jnp.einsum("hij,j->hi", homj, x0)  # (H, 2)
        phi = jnp.einsum("ts,ks->kt", gphi, u) + hom_traj[:, 0]
        om = jnp.einsum("ts,ks->kt", gom, u) + hom_traj[:, 1]
        return phi, om

    roll, om_r = axis_traj(g_rp, go_rp, hom_rp, 0)
    pitch, om_p = axis_traj(g_rp, go_rp, hom_rp, 1)
    yaw, om_yw = axis_traj(g_y, go_y, hom_y, 2)
    rpy = jnp.stack([roll, pitch, yaw], axis=-1)
    omega = jnp.stack([om_r, om_p, om_yw], axis=-1)

    quat = _quat_from_rpy(rpy)
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    z_world = jnp.stack(
        [2.0 * (x * z + w * y), 2.0 * (y * z - w * x), 1.0 - 2.0 * (x * x + y * y)],
        axis=-1,
    )
    acc = z_world * base_u[..., 0:1] / m - jnp.asarray([0.0, 0.0, 9.81], dtype)
    vel = _drag_velocity(params.drag_kd, dt, state.base.vel, acc)
    pos = state.base.pos + jnp.cumsum(vel * dt, axis=-2)
    return BaseTraj(pos=pos, quat=quat, vel=vel, omega=omega)


def _base_rollout_position(
    params: WholeBodyParams, state: WholeBodyState, base_u: Array, dt: float, k: int
) -> BaseTraj:
    """Position-setpoint rollout: base_u = (K, H, 4) = [xyz offsets, yaw_des].

    Each axis of the backstepping-closed position loop behaves as the
    identified linear 2nd-order system, so the position/velocity trajectories
    are (H, H) convolution matrices applied to the setpoint sequences.  The
    implied attitude (small-angle tilt from commanded lateral acceleration)
    feeds the FK and the tilt cost.
    """
    dtype = base_u.dtype
    h = base_u.shape[1]
    g_xy = _attitude_response_matrices(h, dt, params.pos_kp_xy, params.pos_kd_xy)
    g_z = _attitude_response_matrices(h, dt, params.pos_kp_z, params.pos_kd_z)

    pos0 = state.base.pos
    vel0 = state.base.vel
    setpoints = pos0 + base_u[..., 0:3]   # absolute position setpoints

    def axis_traj(mats, i, kp, kd):
        g_phi, g_om, hom = mats
        u = setpoints[..., i]
        x0 = jnp.stack([pos0[i], vel0[i]])
        hom_traj = jnp.einsum("hij,j->hi", jnp.asarray(hom, dtype), x0)
        p = jnp.einsum("ts,ks->kt", jnp.asarray(g_phi, dtype), u) + hom_traj[:, 0]
        v = jnp.einsum("ts,ks->kt", jnp.asarray(g_om, dtype), u) + hom_traj[:, 1]
        a = kp * (u - p) - kd * v
        return p, v, a

    px, vx, ax = axis_traj(g_xy, 0, params.pos_kp_xy, params.pos_kd_xy)
    py, vy, ay = axis_traj(g_xy, 1, params.pos_kp_xy, params.pos_kd_xy)
    pz, vz, az = axis_traj(g_z, 2, params.pos_kp_z, params.pos_kd_z)
    pos = jnp.stack([px, py, pz], axis=-1)
    vel = jnp.stack([vx, vy, vz], axis=-1)

    # Small-angle implied attitude: pitch ~ ax/g, roll ~ -ay/g, yaw tracked
    # quickly (treated as immediate).
    inv_g = 1.0 / 9.81
    rpy = jnp.stack(
        [-ay * inv_g, ax * inv_g, base_u[..., 3]], axis=-1
    )
    quat = _quat_from_rpy(rpy)
    omega = jnp.concatenate(
        [jnp.zeros_like(rpy[..., :1, :]), jnp.diff(rpy, axis=-2) / dt], axis=-2
    )
    return BaseTraj(pos=pos, quat=quat, vel=vel, omega=omega)


def rollout(
    params: WholeBodyParams,
    state: WholeBodyState,
    actions: Array,
    dt: float,
) -> Tuple["Pose", Array, Array, BaseTraj]:
    """Roll K sampled action sequences from one initial state.

    actions: (K, H, 4 + J) = [thrust, tau_xyz, qddot_1..J].
    Returns (ee Pose (pos+quat over (K, H)), q (K, H, J), qdot (K, H, J),
    BaseTraj).
    """
    spec = params.chain()
    inertials = params.inertials()
    k, h = actions.shape[0], actions.shape[1]

    base_u = actions[..., :N_BASE_ACTIONS]        # (K, H, 4)
    arm_u = actions[..., N_BASE_ACTIONS:]          # (K, H, J)

    # Arm joints: wide kinematic double integration (reference arm scheme).
    # The RAW trajectory q goes to the cost stack (the joint-limit terms
    # need the violation signal); the FK below consumes the limit-CLAMPED
    # trajectory — real joints stop at their stops, so samples pressing
    # into a limit produce valid boundary poses instead of fictitious
    # beyond-limit poses (without this, plans that graze a limit FK to
    # unreachable space and MPPI stalls pinned against the stop).
    q, qdot = integrators.double_integrate(arm_u, state.q, state.qdot, dt)
    q_fk = jnp.clip(
        q, jnp.asarray(spec.lower, q.dtype), jnp.asarray(spec.upper, q.dtype)
    )

    if params.control_mode == "position":
        # Setpoint offsets are not actuator commands — no lag filter; the
        # identified closed-loop response already includes all inner-loop
        # lags.  Arm gravity is rejected by the inner loop.
        base_traj = _base_rollout_position(params, state, base_u, dt, k)
        ee_pos, ee_quat = chain_mod.forward_kinematics_posquat(
            spec, q_fk, base_pos=base_traj.pos, base_quat=base_traj.quat
        )
        return Pose(position=ee_pos, quat=ee_quat), q, qdot, base_traj

    if params.control_mode == "attitude":
        # Thrust passes through the actuator lag; attitude setpoints are
        # tracked by the (modeled) plant-side PD, and the arm gravity moment
        # is a disturbance that PD rejects — no torque coupling needed.
        if params.rotor_lag_tau > 0.0:
            f = jnp.asarray(
                _rotor_lag_matrix(h, dt, params.rotor_lag_tau), base_u.dtype
            )
            base_u = jnp.concatenate(
                [jnp.einsum("ts,ks->kt", f, base_u[..., 0])[..., None],
                 base_u[..., 1:4]],
                axis=-1,
            )
        base_traj = _base_rollout_attitude(params, state, base_u, dt, k)
        ee_pos, ee_quat = chain_mod.forward_kinematics_posquat(
            spec, q_fk, base_pos=base_traj.pos, base_quat=base_traj.quat
        )
        return Pose(position=ee_pos, quat=ee_quat), q, qdot, base_traj

    # Actuator lag applies to the commanded wrench only — before the arm
    # gravity moment (not actuator-mediated) couples in.
    if params.rotor_lag_tau > 0.0:
        f = jnp.asarray(
            _rotor_lag_matrix(h, dt, params.rotor_lag_tau), base_u.dtype
        )
        base_u = jnp.einsum("ts,ksa->kta", f, base_u)

    if params.couple_arm_gravity:
        # Quasi-static coupling: the arm is rigidly attached, so its *weight*
        # is already carried by the base's arm_mass_lump; what the lump model
        # misses is the configuration-dependent *moment* of that weight about
        # the base origin.  Inject only the torque component of the arm's
        # gravity wrench (the reference's flight controller feeds forward the
        # same tau_g quantity, controller.cpp:541-560).  The wrench uses the
        # initial attitude (refreshing per step would put an RNEA inside the
        # rollout recurrence; the error is second-order in tilt).
        r0 = base_rotation(state.base)
        tau_b = arm_gravity_torque_fast(spec, inertials, q_fk, r0)
        base_u = jnp.concatenate(
            [base_u[..., 0:1], base_u[..., 1:4] + tau_b], axis=-1
        )

    base_fn = _base_rollout_parallel if params.time_parallel else _base_rollout_scan
    base_traj = base_fn(params, state, base_u, dt, k)

    # End-effector poses over the whole (K, H) block in one batched,
    # matmul-free quaternion FK pass.
    ee_pos, ee_quat = chain_mod.forward_kinematics_posquat(
        spec, q_fk, base_pos=base_traj.pos, base_quat=base_traj.quat
    )
    return Pose(position=ee_pos, quat=ee_quat), q, qdot, base_traj


def hover_nominal_action(
    params: WholeBodyParams, n_horizon: int, dtype=jnp.float32
) -> Array:
    """Warm-start nominal: gravity-balancing thrust, zero torques/accels.

    Starting ``u_prev`` at hover instead of zero is the whole-body analog of
    the reference's zero-init warm start for acceleration sampling."""
    total_mass = params.vehicle.mass + params.arm_mass_lump
    u0 = np.zeros(N_BASE_ACTIONS + kinova.N_JOINTS)
    u0[0] = total_mass * 9.81
    return jnp.broadcast_to(jnp.asarray(u0, dtype), (n_horizon, u0.shape[0]))

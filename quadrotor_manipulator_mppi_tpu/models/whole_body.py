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

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import integrators
from ..utils import rotations as rot
from ..utils import se3
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

    def chain(self) -> ChainSpec:
        return kinova.chain(self.arm_tip)

    def inertials(self) -> InertialParams:
        return kinova.inertials()


class WholeBodyState(NamedTuple):
    base: Multirotor12State
    q: Array      # (…, 7)
    qdot: Array   # (…, 7)


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


def rollout(
    params: WholeBodyParams,
    state: WholeBodyState,
    actions: Array,
    dt: float,
) -> Tuple[se3.Transform, Array, Array, "Multirotor12State"]:
    """Roll K sampled action sequences from one initial state.

    actions: (K, H, 4 + J) = [thrust, tau_xyz, qddot_1..J].
    Returns (ee_poses (K, H), q (K, H, J), qdot (K, H, J), base trajectory
    (leaves (K, H, ...))).
    """
    spec = params.chain()
    inertials = params.inertials()
    k, h = actions.shape[0], actions.shape[1]

    base_u = actions[..., :N_BASE_ACTIONS]        # (K, H, 4)
    arm_u = actions[..., N_BASE_ACTIONS:]          # (K, H, J)

    # Arm joints: wide kinematic double integration (reference arm scheme).
    q, qdot = integrators.double_integrate(arm_u, state.q, state.qdot, dt)

    # Base: sequential scan over the horizon, batched over K.
    base0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (k,) + x.shape), state.base
    )

    if params.couple_arm_gravity:
        # Quasi-static coupling: the arm is rigidly attached, so its *weight*
        # is already carried by the base's arm_mass_lump; what the lump model
        # misses is the configuration-dependent *moment* of that weight about
        # the base origin.  Inject only the torque component of the arm's
        # gravity wrench (the reference's flight controller feeds forward the
        # same tau_g quantity, controller.cpp:541-560).  The wrench uses the
        # initial attitude (refreshing per step would put an RNEA inside the
        # scan; the error is second-order in tilt).
        r0 = base_rotation(state.base)
        _, tau_b = arm_gravity_wrench(
            spec, inertials, q.reshape(k * h, -1), jnp.broadcast_to(r0, (k * h, 3, 3))
        )
        tau_b = tau_b.reshape(k, h, 3)
        base_u = jnp.concatenate(
            [base_u[..., 0:1], base_u[..., 1:4] + tau_b], axis=-1
        )

    def step_fn(b, u_t):
        nxt = step12(
            params.vehicle, b, u_t, dt,
            extra_mass=params.arm_mass_lump, drag_kd=params.drag_kd,
        )
        return nxt, nxt

    _, base_traj = jax.lax.scan(
        step_fn, base0, jnp.moveaxis(base_u, 1, 0)
    )  # leaves (H, K, ...)
    base_traj = jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), base_traj)

    # End-effector poses over the whole (K, H) block in one batched FK.
    base_tf = se3.Transform(rot=base_rotation(base_traj), trans=base_traj.pos)
    ee = chain_mod.forward_kinematics(spec, q, base=base_tf)
    return ee, q, qdot, base_traj


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

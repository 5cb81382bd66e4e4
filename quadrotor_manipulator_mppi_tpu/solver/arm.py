"""Arm (Kinova j2s7s300) MPPI preset — reference ``mppi_solver/mppi.py`` parity.

Task: joint-acceleration-sampled MPPI driving the end effector to a target
pose, with the arm hanging from the (possibly moving) drone base.  Pipeline
per reference ``compute_control_input`` (``mppi.py:122-169``):
K=100 x H=32 x A=7 acceleration noise -> kinematic double integration ->
batched FK -> pose stage+terminal cost -> softmin -> SavGol(9, 2) -> update;
outputs the next (qdes, vdes) setpoint integrated from the updated
acceleration (``mppi.py:156-158``, including its use of the *previous*
solve's first acceleration in the position update — kept for parity).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import chain as chain_mod
from ..models import kinova
from ..ops import costs as costs_mod
from ..ops import integrators, sampling
from ..utils.pose import Pose
from .mppi import MPPIConfig, MPPIState, init_state, make_step

Array = jax.Array


class ArmObs(NamedTuple):
    """Per-solve inputs (device arrays; the reference's update_joint applies
    the same split of the 14-dim state vector, ``mppi.py:196-200``)."""

    q: Array           # (7,) arm joint positions
    qdot: Array        # (7,) arm joint velocities
    base_pose: Pose    # floating-base world pose
    target: Pose       # end-effector target world pose


class ArmOutput(NamedTuple):
    qdes: Array        # (7,) next position setpoint
    vdes: Array        # (7,) next velocity setpoint
    u_seq: Array       # (H, 7) updated acceleration plan
    ee_target_err: Array  # L1 position error of the commanded pose (reach metric)


@dataclass(frozen=True)
class ArmMPPIParams:
    mppi: MPPIConfig = field(default_factory=MPPIConfig)
    cost: costs_mod.ArmCostParams = field(default_factory=costs_mod.ArmCostParams)
    tip: str = "link_7"
    reach_threshold: float = 0.005   # mppi.py:117


def default_target(dtype=jnp.float32) -> Pose:
    """The reference's hardcoded demo target (``mppi.py:71-73``), with its
    xyzw-stored quaternion interpreted as the ROS layout it is."""
    return Pose.from_xyzw(
        jnp.asarray([0.1029, 0.4055, 1.6498], dtype),
        jnp.asarray([-0.5, -0.5, 0.5, -0.5], dtype),
    )


def make_arm_solver(
    params: ArmMPPIParams = ArmMPPIParams(),
    axis_name: Optional[str] = None,
    n_local_samples: Optional[int] = None,
):
    """Returns (step, init) where step(state, obs) -> (ArmOutput, state)."""
    spec = kinova.chain(params.tip)
    cfg = params.mppi
    cp = params.cost
    sigma_inv_np = np.linalg.inv(
        np.asarray(sampling.sigma_matrix(cfg.sigma, cfg.n_action), np.float64)
    )
    q_center = jnp.asarray(kinova.Q_CENTER, jnp.float32)
    q_lower = jnp.asarray(spec.lower, jnp.float32)
    q_upper = jnp.asarray(spec.upper, jnp.float32)

    def rollout(v: Array, obs: ArmObs):
        q_samples, v_samples = integrators.double_integrate(v, obs.q, obs.qdot, cfg.dt)
        ee_pos, ee_quat = chain_mod.forward_kinematics_posquat(
            spec, q_samples,
            base_pos=obs.base_pose.position, base_quat=obs.base_pose.quat,
        )
        return q_samples, v_samples, ee_pos, ee_quat

    def cost(aux, v: Array, u_prev: Array, obs: ArmObs) -> Array:
        q_samples, v_samples, ee_pos, ee_quat = aux
        s = costs_mod.pose_stage_cost_pq(
            ee_pos, ee_quat, obs.target.position, obs.target.quat,
            cp.stage_pose_weight, cp.stage_orientation_weight, cp.ori_mode,
        )
        s = s + costs_mod.pose_terminal_cost_pq(
            ee_pos, ee_quat, obs.target.position, obs.target.quat,
            cp.terminal_pose_weight, cp.terminal_orientation_weight, cp.ori_mode,
        )
        if cp.covar_weight:
            s = s + costs_mod.covariance_cost(
                u_prev, v, jnp.asarray(sigma_inv_np, v.dtype),
                cp.covar_weight, cfg.lam, cp.alpha,
            )
        if cp.action_weight:
            s = s + costs_mod.action_cost(v, cp.action_weight, cp.gamma)
        if cp.centering_weight:
            s = s + costs_mod.centering_cost(
                q_samples, q_center, cp.centering_weight, cp.gamma
            )
        if cp.joint_limit_weight:
            s = s + cp.joint_limit_weight * costs_mod.joint_limit_cost(
                q_samples, q_lower, q_upper, cp.gamma
            )
        return s

    inner = make_step(cfg, rollout, cost, axis_name, n_local_samples)

    def step(state: MPPIState, obs: ArmObs) -> Tuple[ArmOutput, MPPIState]:
        # The reference reads the previous plan's first acceleration before
        # updating (mppi.py:125) and uses it in the qdes integration
        # (mppi.py:158) — kept bit-for-bit.
        qddot_prev = state.u_prev[0]
        u_seq, new_state = inner(state, obs)
        u0 = u_seq[0]
        vdes = obs.qdot + u0 * cfg.dt
        qdes = obs.q + qddot_prev * cfg.dt + 0.5 * u0 * cfg.dt * cfg.dt
        ee_cmd = chain_mod.forward_kinematics(
            spec, qdes, base=obs.base_pose.to_transform()
        )
        err = jnp.sum(jnp.abs(ee_cmd.trans - obs.target.position))
        return ArmOutput(qdes=qdes, vdes=vdes, u_seq=u_seq, ee_target_err=err), new_state

    def init(key: Array) -> MPPIState:
        return init_state(cfg, key)

    return step, init


def reached(output: ArmOutput, params: ArmMPPIParams = ArmMPPIParams()) -> Array:
    """Reference reach check (``mppi.py:95-120``): L1 position error of the
    commanded EE pose below 5 mm."""
    return output.ee_target_err < params.reach_threshold

"""Arm control node equivalent: the reference's ``kinova.py`` loop, jitted.

Behavioral port of ``/root/reference/src/mav_mppi/scripts/kinova.py:119-191``:
a 100 Hz two-phase torque controller for the (base-fixed) Kinova arm —

* **phase 1**: cubic joint trajectory to the home posture with computed-torque
  PD ``tau = M (1000 e - 100 qdot) + g`` over 1.5 s (``kinova.py:140-153``);
  hand over to MPPI once ``|q - q_home| < 0.01`` holds for 50 ticks
  (``:154-158``);
* **phase 2**: MPPI position setpoints tracked with the inertia-weighted PD
  ``tau = M (400 (qdes - q) - 40 qdot) + g`` (``:184``).

M(q) and g/nle come from ``models/rigid_body`` (the Pinocchio replacement);
the plant is the arm's own forward dynamics integrated semi-implicitly at the
physics rate.  The whole episode is a single ``lax.scan`` with the phase
logic as arithmetic masking (no data-dependent Python control flow).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import kinova
from ..models import rigid_body as rb
from ..solver import arm as arm_solver
from ..solver.mppi import MPPIState
from ..utils import trajectory
from ..utils.pose import Pose

Array = jax.Array


@dataclass(frozen=True)
class ArmLoopConfig:
    control_dt: float = 0.01      # 100 Hz (kinova.py:101)
    substeps: int = 10            # 1 kHz plant integration
    home_duration: float = 1.5    # kinova.py:140
    home_kp: float = 1000.0       # kinova.py:152
    home_kd: float = 100.0
    track_kp: float = 400.0       # kinova.py:184
    track_kd: float = 40.0
    converge_tol: float = 0.01    # kinova.py:154
    converge_ticks: int = 50
    torque_limit_scale: float = 1.0  # 1.0 = enforce URDF effort limits


class ArmLoopState(NamedTuple):
    q: Array            # (7,) plant joint positions
    qdot: Array         # (7,)
    t: Array            # () sim time
    phase2: Array       # () bool: MPPI engaged
    hold_count: Array   # () int32 convergence counter
    q_start: Array      # (7,) phase-1 trajectory start
    t_start: Array      # () phase-1 start time
    solver: MPPIState


def init_arm_loop(
    solver_state: MPPIState, q0=None, dtype=jnp.float32
) -> ArmLoopState:
    q = jnp.zeros(7, dtype) if q0 is None else jnp.asarray(q0, dtype)
    return ArmLoopState(
        q=q,
        qdot=jnp.zeros(7, dtype),
        t=jnp.zeros((), dtype),
        phase2=jnp.zeros((), jnp.bool_),
        hold_count=jnp.zeros((), jnp.int32),
        q_start=q,
        t_start=jnp.zeros((), dtype),
        solver=solver_state,
    )


def make_arm_episode(
    cfg: ArmLoopConfig = ArmLoopConfig(),
    params: arm_solver.ArmMPPIParams = arm_solver.ArmMPPIParams(),
    base_pose: Pose = None,
    target: Pose = None,
    n_control_steps: int = 500,
):
    """Build run(state) -> (final, logs) with logs = (q, ee_err, torque)."""
    spec = kinova.chain(params.tip)
    inertials = kinova.inertials()
    solver_step, _ = arm_solver.make_arm_solver(params)
    q_home = jnp.asarray(kinova.Q_HOME, jnp.float32)
    effort = jnp.asarray(spec.effort, jnp.float32) * cfg.torque_limit_scale
    base_pose = base_pose if base_pose is not None else Pose(
        position=jnp.asarray([0.0, 0.0, 2.1]), quat=jnp.asarray([1.0, 0, 0, 0])
    )
    target = target if target is not None else arm_solver.default_target()
    base_rot = base_pose.rotation_matrix

    def plant_substep(carry, _):
        q, qdot, tau = carry
        qdd = rb.forward_dynamics(spec, inertials, q, qdot, tau, base_rot=base_rot)
        dt = cfg.control_dt / cfg.substeps
        qdot = qdot + qdd * dt
        q = q + qdot * dt
        return (q, qdot, tau), None

    def control_step(state: ArmLoopState, _):
        m = rb.mass_matrix(spec, inertials, state.q)
        nle = rb.nonlinear_effects(
            spec, inertials, state.q, state.qdot, base_rot=base_rot
        )

        # Phase 1: cubic home trajectory + computed-torque PD.
        qdes1 = trajectory.joint_trajectory(
            state.t, state.t_start, cfg.home_duration, state.q_start, q_home
        )
        ades = cfg.home_kp * (qdes1 - state.q) - cfg.home_kd * state.qdot
        tau1 = m @ ades + nle

        # Phase 2: MPPI setpoint + inertia-weighted PD.
        obs = arm_solver.ArmObs(
            q=state.q, qdot=state.qdot, base_pose=base_pose, target=target
        )
        out, solver = solver_step(state.solver, obs)
        ades2 = cfg.track_kp * (out.qdes - state.q) - cfg.track_kd * state.qdot
        tau2 = m @ ades2 + nle

        phase2 = state.phase2
        tau = jnp.where(phase2, tau2, tau1)
        tau = jnp.clip(tau, -effort, effort)
        # Only advance the solver warm start once MPPI is engaged.
        solver = jax.tree.map(
            lambda new, old: jnp.where(phase2, new, old), solver, state.solver
        )

        (q, qdot, _), _ = jax.lax.scan(
            plant_substep, (state.q, state.qdot, tau), None, length=cfg.substeps
        )

        # Convergence gate (kinova.py:154-158).
        near = jnp.linalg.norm(q_home - q) < cfg.converge_tol
        hold = jnp.where(near, state.hold_count + 1, 0)
        phase2 = phase2 | (hold > cfg.converge_ticks)

        nxt = ArmLoopState(
            q=q,
            qdot=qdot,
            t=state.t + cfg.control_dt,
            phase2=phase2,
            hold_count=hold,
            q_start=state.q_start,
            t_start=state.t_start,
            solver=solver,
        )
        return nxt, (q, out.ee_target_err, tau)

    def run(state: ArmLoopState):
        return jax.lax.scan(control_step, state, None, length=n_control_steps)

    return run

"""Quadrotor-only MPPI over the 12-state multirotor (BASELINE.json config 1).

The upgrade path of the reference's point-mass drone MPPI: its author left a
commented-out full rotational-dynamics rollout in place
(``drone_mppi.py:57-83``) — this preset is that capability built properly:
attitude-mode actions [thrust, roll/pitch/yaw setpoints] (or direct wrench)
rolled through the reduced rigid-body model, with hover/waypoint position
costs (reference stage x100 / terminal x20 squared-error weights) plus
attitude/velocity regularization.  No arm — the rollout reuses the
whole-body base-rollout machinery with a zero-mass stub arm state.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.multirotor import Multirotor12State, MultirotorParams
from ..models.whole_body import (
    WholeBodyParams,
    WholeBodyState,
    _base_rollout_attitude,
    _base_rollout_parallel,
    _rotor_lag_matrix,
)
from ..ops import costs as costs_mod
from .mppi import MPPIConfig, MPPIState, init_state, make_step

Array = jax.Array

N_ACTIONS = 4  # [thrust, roll_des, pitch_des, yaw_des] (attitude mode)


def default_sigma() -> np.ndarray:
    return np.asarray([30.0, 0.15, 0.15, 0.1])


def hover_nominal(vehicle: MultirotorParams) -> np.ndarray:
    return np.asarray([vehicle.mass * 9.81, 0.0, 0.0, 0.0])


@dataclass(frozen=True)
class MultirotorCostParams:
    stage_weight: float = 100.0     # drone_mppi.py:93
    terminal_weight: float = 20.0   # drone_mppi.py:105
    attitude_weight: float = 200.0
    omega_weight: float = 5.0
    vel_weight: float = 10.0


@dataclass(frozen=True)
class MultirotorMPPIParams:
    mppi: MPPIConfig = field(
        default_factory=lambda: MPPIConfig(
            n_samples=1024,
            n_horizon=30,
            n_action=N_ACTIONS,
            dt=0.01,
            lam=0.1,
            sigma=default_sigma(),
            savgol_window=9,
            u_min=np.asarray([0.0, -0.35, -0.35, -0.6]),
            u_max=np.asarray([300.0, 0.35, 0.35, 0.6]),
            warm_start_decay=0.9,
            nominal_action=hover_nominal(MultirotorParams()),
        )
    )
    model: WholeBodyParams = field(
        default_factory=lambda: WholeBodyParams(
            arm_mass_lump=0.0, couple_arm_gravity=False
        )
    )
    cost: MultirotorCostParams = field(default_factory=MultirotorCostParams)


class MultirotorObs(NamedTuple):
    state: Multirotor12State
    target: Array  # (3,) position


class MultirotorOutput(NamedTuple):
    action: Array  # (4,)
    u_seq: Array   # (H, 4)


def make_multirotor_solver(
    params: MultirotorMPPIParams = MultirotorMPPIParams(),
    axis_name: Optional[str] = None,
    n_local_samples: Optional[int] = None,
):
    cfg = params.mppi
    cp = params.cost
    mp = params.model
    zero_q = jnp.zeros(1)

    def rollout_fn(v: Array, obs: MultirotorObs):
        state = WholeBodyState(base=obs.state, q=zero_q, qdot=zero_q)
        base_u = v
        if mp.rotor_lag_tau > 0.0:
            f = jnp.asarray(
                _rotor_lag_matrix(cfg.n_horizon, cfg.dt, mp.rotor_lag_tau),
                v.dtype,
            )
            base_u = jnp.concatenate(
                [jnp.einsum("ts,ks->kt", f, base_u[..., 0])[..., None],
                 base_u[..., 1:]],
                axis=-1,
            )
        if mp.control_mode == "attitude":
            return _base_rollout_attitude(mp, state, base_u, cfg.dt, v.shape[0])
        return _base_rollout_parallel(mp, state, base_u, cfg.dt, v.shape[0])

    def cost_fn(base, v: Array, u_prev: Array, obs: MultirotorObs) -> Array:
        s = costs_mod.position_stage_cost(base.pos, obs.target, cp.stage_weight)
        s = s + costs_mod.position_terminal_cost(
            base.pos, obs.target, cp.terminal_weight
        )
        if cp.attitude_weight:
            s = s + cp.attitude_weight * jnp.mean(base.tilt_squared(), axis=-1)
        if cp.omega_weight:
            s = s + cp.omega_weight * jnp.mean(
                jnp.sum(base.omega * base.omega, axis=-1), axis=-1
            )
        if cp.vel_weight:
            s = s + cp.vel_weight * jnp.mean(
                jnp.sum(base.vel * base.vel, axis=-1), axis=-1
            )
        return s

    inner = make_step(cfg, rollout_fn, cost_fn, axis_name, n_local_samples)

    def step(state: MPPIState, obs: MultirotorObs) -> Tuple[MultirotorOutput, MPPIState]:
        u_seq, new_state = inner(state, obs)
        return MultirotorOutput(action=u_seq[0], u_seq=u_seq), new_state

    def init(key: Array, dtype=jnp.float32) -> MPPIState:
        nominal = jnp.asarray(hover_nominal(mp.vehicle), dtype)
        from .mppi import _diag_sigma

        return MPPIState(
            u_prev=jnp.broadcast_to(nominal, (cfg.n_horizon, N_ACTIONS)),
            key=key,
            sigma=_diag_sigma(cfg, dtype),
        )

    return step, init

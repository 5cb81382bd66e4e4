"""Drone point-mass MPPI preset — reference ``mppi_solver/drone_mppi.py`` parity.

Task: sample xyz accelerations for a point-mass model and emit the next
position/velocity setpoint, which the inner-loop flight controller tracks
(the reference publishes it on ``/harrierD7/drone_pose``, consumed by the
plant plugin — ``drone.py:239-241`` -> ``controller.cpp:667-673``).
Hyperparameters per ``drone_mppi.py:16-35``: K=1000, H=32, A=3, dt=0.01,
sigma=30*I, lambda=0.1, SavGol(5, 2); stage cost 100x squared error, terminal
20x (``:87-107``); the +-10 clamp is defined but disabled (``:132-138,163``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import costs as costs_mod
from ..ops import integrators
from .mppi import MPPIConfig, MPPIState, init_state, make_step

Array = jax.Array

# The reference's hardcoded waypoint (drone_mppi.py:141).
DEFAULT_TARGET = (1.0, 2.0, 3.4)


class DroneObs(NamedTuple):
    x: Array       # (3,) position
    v: Array       # (3,) velocity
    target: Array  # (3,) goal position


class DroneOutput(NamedTuple):
    xdes: Array    # (3,) next position setpoint
    vdes: Array    # (3,) next velocity setpoint
    u_seq: Array   # (H, 3) updated acceleration plan


@dataclass(frozen=True)
class DroneMPPIParams:
    mppi: MPPIConfig = field(
        default_factory=lambda: MPPIConfig(
            n_samples=1000,
            n_horizon=32,
            n_action=3,
            dt=0.01,
            lam=0.1,
            sigma=30.0,
            savgol_window=5,
            savgol_polyorder=2,
        )
    )
    stage_weight: float = 100.0
    terminal_weight: float = 20.0


def make_drone_solver(
    params: DroneMPPIParams = DroneMPPIParams(),
    axis_name: Optional[str] = None,
    n_local_samples: Optional[int] = None,
):
    """Returns (step, init) where step(state, obs) -> (DroneOutput, state)."""
    cfg = params.mppi

    def rollout(v: Array, obs: DroneObs):
        traj, _ = integrators.double_integrate(v, obs.x, obs.v, cfg.dt)
        return traj

    def cost(traj, v: Array, u_prev: Array, obs: DroneObs) -> Array:
        s = costs_mod.position_stage_cost(traj, obs.target, params.stage_weight)
        return s + costs_mod.position_terminal_cost(
            traj, obs.target, params.terminal_weight
        )

    inner = make_step(cfg, rollout, cost, axis_name, n_local_samples)

    def step(state: MPPIState, obs: DroneObs) -> Tuple[DroneOutput, MPPIState]:
        u_seq, new_state = inner(state, obs)
        u0 = u_seq[0]
        vdes = obs.v + cfg.dt * u0
        xdes = obs.x + obs.v * cfg.dt + 0.5 * u0 * cfg.dt * cfg.dt
        return DroneOutput(xdes=xdes, vdes=vdes, u_seq=u_seq), new_state

    def init(key: Array) -> MPPIState:
        return init_state(cfg, key)

    return step, init

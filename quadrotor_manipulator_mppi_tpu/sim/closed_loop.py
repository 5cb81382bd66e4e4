"""Closed-loop simulation harness — the Gazebo replacement for CI/benchmarks.

The reference's closed loop spans three processes (gzserver physics at
1 kHz, the C++ plant controller inside it, and the Python MPPI node at
100 Hz) glued by ROS topics (SURVEY.md sections 3.2-3.4).  Here the whole
episode is one ``lax.scan``: each outer iteration runs one MPPI solve and
then ``substeps`` inner physics+flight-controller ticks (default 10 -> the
same 100 Hz / 1 kHz split as ``worlds/basic.world:20-36`` +
``kinova.py:101``), entirely on device, so episodes jit, vmap over scenario
batches, and benchmark trivially.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import multirotor
from ..models.multirotor import MultirotorParams, MultirotorState
from ..utils import rotations as rot
from . import flight_control as fc

Array = jax.Array


@dataclass(frozen=True)
class LoopConfig:
    physics_dt: float = 0.001    # basic.world: 1 kHz
    substeps: int = 10           # -> 100 Hz control (kinova.py:101)
    controller: str = "pid"      # "pid" | "backstepping"
    extra_mass: float = 0.0


class LoopState(NamedTuple):
    plant: MultirotorState
    ctrl: fc.FlightCtrlState
    solver: Any        # MPPI solver state pytree
    setpoint: fc.FlightSetpoint


def rpy_of(state: MultirotorState) -> Array:
    """Plant attitude as (roll, pitch, yaw) — the layout both reference
    controllers consume (controller.cpp:465-467)."""
    ang = rot.matrix_to_euler(rot.quat_to_matrix(state.quat), "ZYX")
    return jnp.stack([ang[..., 2], ang[..., 1], ang[..., 0]], axis=-1)


def make_episode(
    cfg: LoopConfig,
    vehicle: MultirotorParams,
    gains: fc.FlightGains,
    solver_step: Callable[[Any, Any], Tuple[Any, Any]],
    make_obs: Callable[[MultirotorState], Any],
    setpoint_of: Callable[[Any, MultirotorState], fc.FlightSetpoint],
    n_control_steps: int,
):
    """Build a jittable episode runner.

    ``solver_step(solver_state, obs) -> (output, solver_state)`` is any MPPI
    preset step; ``make_obs`` maps plant state to the solver's observation;
    ``setpoint_of(output, plant)`` converts the solver output into the
    inner-loop setpoint (e.g. the drone preset's (xdes, vdes) — the topic
    ``/harrierD7/drone_pose`` contract, drone.py:239-241).

    Returns ``run(loop_state) -> (final_state, trajectory)`` where trajectory
    stacks (pos, rpy, vel) at control rate.
    """
    ctrl_fn = fc.pid_step if cfg.controller == "pid" else fc.backstepping_step

    def physics_tick(carry, _):
        plant, ctrl, sp = carry
        u, ctrl = ctrl_fn(
            gains, vehicle, ctrl, sp,
            pos=plant.pos,
            vel_world=plant.vel,
            rpy=rpy_of(plant),
            omega_body=plant.omega,
            dt=cfg.physics_dt,
        )
        rotor_cmd = fc.allocate(vehicle, u)
        plant = multirotor.step(
            vehicle, plant, rotor_cmd, cfg.physics_dt, extra_mass=cfg.extra_mass
        )
        return (plant, ctrl, sp), None

    def control_step(state: LoopState, _):
        obs = make_obs(state.plant)
        out, solver = solver_step(state.solver, obs)
        sp = setpoint_of(out, state.plant)
        (plant, ctrl, _), _ = jax.lax.scan(
            physics_tick, (state.plant, state.ctrl, sp), None, length=cfg.substeps
        )
        nxt = LoopState(plant=plant, ctrl=ctrl, solver=solver, setpoint=sp)
        log = (plant.pos, rpy_of(plant), plant.vel)
        return nxt, log

    def run(state: LoopState):
        return jax.lax.scan(control_step, state, None, length=n_control_steps)

    return run


def init_loop_state(
    cfg: LoopConfig,
    vehicle: MultirotorParams,
    solver_state: Any,
    pos=(0.0, 0.0, 0.1),
    dtype=jnp.float32,
) -> LoopState:
    plant = multirotor.init_state(vehicle, pos=pos, dtype=dtype)
    # Start rotors at hover speed so episodes begin near equilibrium.
    hover = vehicle.hover_rotor_speed(cfg.extra_mass)
    plant = plant._replace(
        rotor_speed=jnp.full((vehicle.n_rotors,), hover, dtype)
    )
    return LoopState(
        plant=plant,
        ctrl=fc.init_ctrl_state(vehicle.mass + cfg.extra_mass, dtype),
        solver=solver_state,
        setpoint=fc.hover_setpoint(pos, dtype),
    )

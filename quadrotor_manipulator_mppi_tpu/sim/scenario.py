"""Mission state machine: takeoff -> gear -> task -> land, jittable.

Behavioral port of the plant plugin's operational logic
(``/root/reference/src/aerial_manipulation/src/controller.cpp``):

* arming once the arm reaches home (``:245-253``),
* takeoff-complete detection at z > 1.95 with |zdot| < 3e-2, then landing-gear
  retraction (``:469-474``),
* the Land command: descend, extend gear, cut motors below z < 0.5
  (``:271-278,429-434``),
* gripper open/close as a first-order aperture with a rigid payload attach
  (the pick_weight scenario's graspable mass; the reference models payload
  rigidly via added mass, ``controller.cpp:159-161``).

The reference drives transitions from keyboard teleop topics
(``uav_teleop_node.cpp``); here the mission script is data (a phase sequence)
and the transitions are guard conditions evaluated inside the jitted loop —
the host-side teleop/CLI can still override by editing the mission state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import flight_control as fc

Array = jax.Array

# Mission phases.
IDLE = 0
TAKEOFF = 1
CRUISE = 2      # gear retracted, task control enabled
LANDING = 3
LANDED = 4

# Reference thresholds (controller.cpp).
TAKEOFF_Z = 1.95          # :470
TAKEOFF_ZDOT = 3e-2       # :470
MOTOR_CUT_Z = 0.5         # :271-278
GEAR_RATE = 2.0           # gear deploy fraction per second (sim choice)
GRIPPER_RATE = 4.0


@dataclass(frozen=True)
class MissionConfig:
    hover_target: tuple = (0.0, 0.0, 2.1)  # launch file z_desired
    land_descent_rate: float = 0.4          # m/s commanded descent
    payload_mass: float = 0.5               # pick_weight graspable mass


class MissionState(NamedTuple):
    phase: Array          # () int32
    gear: Array           # () in [0, 1]: 1 = extended
    gripper: Array        # () in [0, 1]: 1 = closed
    gripper_cmd: Array    # () target aperture
    payload_attached: Array  # () bool
    land_cmd: Array       # () bool — externally set Land request
    land_z: Array         # () current commanded altitude while landing


def init_mission(dtype=jnp.float32) -> MissionState:
    return MissionState(
        phase=jnp.asarray(TAKEOFF, jnp.int32),
        gear=jnp.ones((), dtype),
        gripper=jnp.zeros((), dtype),
        gripper_cmd=jnp.zeros((), dtype),
        payload_attached=jnp.zeros((), jnp.bool_),
        land_cmd=jnp.zeros((), jnp.bool_),
        land_z=jnp.asarray(2.1, dtype),
    )


def mission_step(
    cfg: MissionConfig,
    state: MissionState,
    pos: Array,
    vel: Array,
    dt: float,
) -> Tuple[MissionState, fc.FlightSetpoint, Array]:
    """Advance the mission machine one control tick.

    Returns (new_state, flight setpoint, motors_on flag).  Pure arithmetic
    masking — no data-dependent control flow, scan/vmap safe.
    """
    dtype = pos.dtype
    z, zdot = pos[..., 2], vel[..., 2]
    phase = state.phase

    # --- transitions -------------------------------------------------------
    takeoff_done = (phase == TAKEOFF) & (z > TAKEOFF_Z) & (jnp.abs(zdot) < TAKEOFF_ZDOT)
    phase = jnp.where(takeoff_done, CRUISE, phase)
    start_land = state.land_cmd & ((phase == CRUISE) | (phase == TAKEOFF))
    phase = jnp.where(start_land, LANDING, phase)
    touched_down = (phase == LANDING) & (z < MOTOR_CUT_Z)
    phase = jnp.where(touched_down, LANDED, phase)

    # --- gear: retracted in cruise, extended otherwise (controller.cpp
    # retracts after takeoff, re-extends for landing) ------------------------
    gear_target = jnp.where(phase == CRUISE, 0.0, 1.0).astype(dtype)
    gear = state.gear + jnp.clip(gear_target - state.gear, -GEAR_RATE * dt, GEAR_RATE * dt)

    # --- gripper first-order aperture + payload attach ----------------------
    gripper = state.gripper + jnp.clip(
        state.gripper_cmd - state.gripper, -GRIPPER_RATE * dt, GRIPPER_RATE * dt
    )
    payload = state.payload_attached | (gripper > 0.95)

    # --- setpoint -----------------------------------------------------------
    hover = jnp.asarray(cfg.hover_target, dtype)
    land_z = jnp.where(
        phase == LANDING,
        jnp.maximum(state.land_z - cfg.land_descent_rate * dt, 0.0),
        z,
    ).astype(dtype)
    sp_pos = jnp.where(
        phase == LANDING,
        jnp.stack([pos[..., 0], pos[..., 1], land_z], axis=-1),
        hover,
    )
    setpoint = fc.FlightSetpoint(
        pos=sp_pos,
        vel=jnp.zeros(3, dtype),
        yaw=jnp.zeros((), dtype),
        yaw_rate=jnp.zeros((), dtype),
    )
    motors_on = phase != LANDED

    return (
        MissionState(
            phase=phase,
            gear=gear,
            gripper=gripper,
            gripper_cmd=state.gripper_cmd,
            payload_attached=payload,
            land_cmd=state.land_cmd,
            land_z=land_z,
        ),
        setpoint,
        motors_on,
    )


def payload_mass(cfg: MissionConfig, state: MissionState, dtype=jnp.float32) -> Array:
    """Extra plant mass while the payload is grasped."""
    return jnp.where(state.payload_attached, cfg.payload_mass, 0.0).astype(dtype)

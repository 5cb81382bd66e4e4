"""Point-mass double-integrator plant (the drone MPPI's internal model).

Parity with the reference's drone rollout (``drone_mppi.py:46-55``) and the
kinematic sampler (``standard_normal_noise.py:32-50``) — the batched
closed-form version lives in ``ops/integrators.double_integrate``; this
module provides the single-step form for closed-loop plant scans.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class PointMassState(NamedTuple):
    pos: Array
    vel: Array


def step(state: PointMassState, accel: Array, dt: float) -> PointMassState:
    """Same update order as the reference: p += v dt + a dt^2/2 with the
    *previous* velocity, then v += a dt."""
    pos = state.pos + state.vel * dt + 0.5 * accel * dt * dt
    vel = state.vel + accel * dt
    return PointMassState(pos=pos, vel=vel)

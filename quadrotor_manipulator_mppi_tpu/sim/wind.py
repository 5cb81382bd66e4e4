"""Wind and gust disturbance model.

Functional port of the RotorS wind plugin's force model
(``/root/reference/src/rotors_simulator/rotors_gazebo_plugins/src/gazebo_wind_plugin.cpp``
with defaults in ``gazebo_wind_plugin.h:44-58``): a constant mean wind
velocity plus periodic gusts with their own direction and a ramp envelope,
and an optional Ornstein-Uhlenbeck turbulence term (the plugin's random
field analog, here a simple colored-noise process).

Used as the disturbance-injection mechanism for robustness experiments
(SURVEY.md section 5: the wind plugin is the reference's fault-injection
analog) — feed :func:`wind_velocity` into ``multirotor.step``'s
``wind_world`` input or add :func:`wind_force` to the external wrench.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclass(frozen=True)
class WindParams:
    mean_velocity: tuple = (0.0, 0.0, 0.0)       # [m/s] world frame
    gust_velocity: tuple = (0.0, 0.0, 0.0)       # peak gust [m/s]
    gust_start: float = 10.0                     # [s] (plugin default)
    gust_duration: float = 0.0                   # [s]
    gust_period: float = 1e9                     # [s] between gusts
    turbulence_sigma: float = 0.0                # OU stationary std [m/s]
    turbulence_tau: float = 1.0                  # OU correlation time [s]


class WindState(NamedTuple):
    turbulence: Array  # (3,) OU state


def init_wind(dtype=jnp.float32) -> WindState:
    return WindState(turbulence=jnp.zeros(3, dtype))


def wind_velocity(
    params: WindParams, state: WindState, t: Array, key: Array, dt: float
) -> Tuple[Array, WindState]:
    """Wind velocity at time ``t`` (world frame) and the advanced state."""
    dtype = state.turbulence.dtype
    mean = jnp.asarray(params.mean_velocity, dtype)
    gust = jnp.asarray(params.gust_velocity, dtype)

    # Periodic gust window with a sine ramp envelope.
    phase = jnp.mod(t - params.gust_start, params.gust_period)
    in_gust = (t >= params.gust_start) & (phase < params.gust_duration)
    envelope = jnp.where(
        in_gust,
        jnp.sin(jnp.pi * phase / jnp.maximum(params.gust_duration, 1e-6)),
        0.0,
    ).astype(dtype)

    # Ornstein-Uhlenbeck turbulence (exact discretization).
    if params.turbulence_sigma > 0.0:
        alpha = jnp.exp(-dt / params.turbulence_tau)
        noise_std = params.turbulence_sigma * jnp.sqrt(1.0 - alpha * alpha)
        turb = alpha * state.turbulence + noise_std * jax.random.normal(
            key, (3,), dtype
        )
    else:
        turb = state.turbulence
    return mean + envelope * gust + turb, WindState(turbulence=turb)

"""Sensor models: ADIS16448 IMU noise and noisy/delayed odometry.

Functional ports of the RotorS sensor plugins:

* IMU — white measurement noise (density / sqrt(dt)) plus a first-order
  Gauss-Markov bias random walk with the *exact* discrete covariance
  (Maybeck 4-114) and a turn-on bias, per
  ``/root/reference/src/rotors_simulator/rotors_gazebo_plugins/src/gazebo_imu_plugin.cpp:213-260``
  with the ADIS defaults of ``gazebo_imu_plugin.h:40-57``;
* odometry — per-field gaussian noise and a fixed-step measurement delay
  (``gazebo_odometry_plugin.h:81-139``'s noise models + delay queue, realized
  here as a rolling device-side buffer).

Both keep their evolving state (biases, delay ring) in explicit pytrees so a
whole noisy episode stays inside one jitted scan.  With zero noise parameters
they collapse to the reference's ground-truth fixtures
(``mav_generic_odometry_sensor.gazebo:27-56``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array

_PI = float(np.pi)


@dataclass(frozen=True)
class ImuParams:
    """ADIS16448 defaults (gazebo_imu_plugin.h:40-57)."""

    gyro_noise_density: float = 2.0 * 35.0 / 3600.0 / 180.0 * _PI
    gyro_random_walk: float = 2.0 * 4.0 / 3600.0 / 180.0 * _PI
    gyro_bias_corr_time: float = 1.0e3
    gyro_turn_on_bias_sigma: float = 0.5 / 180.0 * _PI
    accel_noise_density: float = 2.0 * 2.0e-3
    accel_random_walk: float = 2.0 * 3.0e-3
    accel_bias_corr_time: float = 300.0
    accel_turn_on_bias_sigma: float = 20.0e-3 * 9.8


class ImuState(NamedTuple):
    gyro_bias: Array      # (3,)
    accel_bias: Array     # (3,)
    gyro_turn_on: Array   # (3,) constant per episode
    accel_turn_on: Array  # (3,)


def init_imu(params: ImuParams, key: Array, dtype=jnp.float32) -> ImuState:
    kg, ka = jax.random.split(key)
    return ImuState(
        gyro_bias=jnp.zeros(3, dtype),
        accel_bias=jnp.zeros(3, dtype),
        gyro_turn_on=params.gyro_turn_on_bias_sigma
        * jax.random.normal(kg, (3,), dtype),
        accel_turn_on=params.accel_turn_on_bias_sigma
        * jax.random.normal(ka, (3,), dtype),
    )


def imu_measure(
    params: ImuParams,
    state: ImuState,
    key: Array,
    true_accel: Array,
    true_gyro: Array,
    dt: float,
) -> Tuple[Array, Array, ImuState]:
    """Returns (accel_meas, gyro_meas, new_state) — gazebo_imu_plugin AddNoise."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dtype = true_accel.dtype

    def gm_step(bias, sigma_b, tau, k):
        sigma_d = jnp.sqrt(
            -(sigma_b**2) * tau / 2.0 * (jnp.exp(-2.0 * dt / tau) - 1.0)
        )
        phi = jnp.exp(-dt / tau)
        return phi * bias + sigma_d * jax.random.normal(k, (3,), dtype)

    gyro_bias = gm_step(
        state.gyro_bias, params.gyro_random_walk, params.gyro_bias_corr_time, k1
    )
    accel_bias = gm_step(
        state.accel_bias, params.accel_random_walk, params.accel_bias_corr_time, k2
    )
    sigma_g_d = params.gyro_noise_density / jnp.sqrt(dt)
    sigma_a_d = params.accel_noise_density / jnp.sqrt(dt)
    gyro = (
        true_gyro + gyro_bias + state.gyro_turn_on
        + sigma_g_d * jax.random.normal(k3, (3,), dtype)
    )
    accel = (
        true_accel + accel_bias + state.accel_turn_on
        + sigma_a_d * jax.random.normal(k4, (3,), dtype)
    )
    return accel, gyro, state._replace(gyro_bias=gyro_bias, accel_bias=accel_bias)


@dataclass(frozen=True)
class GpsParams:
    """Flat-earth GPS model (RotorS gazebo_gps_plugin analog): horizontal /
    vertical gaussian noise at a reduced rate."""

    horizontal_noise: float = 0.0
    vertical_noise: float = 0.0
    decimation: int = 10  # sensor ticks per GPS fix (e.g. 1 kHz -> 100 Hz)


def gps_measure(params: GpsParams, key: Array, pos: Array) -> Array:
    kh, kv = jax.random.split(key)
    dtype = pos.dtype
    noise = jnp.concatenate([
        params.horizontal_noise * jax.random.normal(kh, (2,), dtype),
        params.vertical_noise * jax.random.normal(kv, (1,), dtype),
    ])
    return pos + noise


@dataclass(frozen=True)
class BarometerParams:
    """Pressure-altitude model (gazebo_pressure_plugin analog): ISA pressure
    with gaussian noise, reported as both pressure and derived altitude."""

    noise_std_pa: float = 0.0
    p0: float = 101325.0  # sea-level pressure [Pa]
    scale_height: float = 8434.0  # [m] isothermal approx


def barometer_measure(params: BarometerParams, key: Array, alt: Array):
    dtype = alt.dtype
    p_true = params.p0 * jnp.exp(-alt / params.scale_height)
    p = p_true + params.noise_std_pa * jax.random.normal(key, (), dtype)
    alt_meas = -params.scale_height * jnp.log(p / params.p0)
    return p, alt_meas


@dataclass(frozen=True)
class MagnetometerParams:
    """Body-frame magnetic field (gazebo_magnetometer_plugin analog):
    a fixed world-frame reference field rotated into the body + noise."""

    ref_field: tuple = (0.21523, 0.0, 0.42741)  # gauss, NED-ish default
    noise_std: float = 0.0


def magnetometer_measure(
    params: MagnetometerParams, key: Array, body_rot: Array
) -> Array:
    dtype = body_rot.dtype
    h_world = jnp.asarray(params.ref_field, dtype)
    h_body = jnp.einsum("...ji,j->...i", body_rot, h_world)
    return h_body + params.noise_std * jax.random.normal(key, (3,), dtype)


@dataclass(frozen=True)
class OdometryParams:
    """Zero defaults = the ground-truth fixture configuration."""

    pos_noise: float = 0.0
    vel_noise: float = 0.0
    att_noise: float = 0.0      # applied to rpy-equivalent small angles
    rate_noise: float = 0.0
    delay_steps: int = 0        # measurement delay in sensor ticks


class OdometryState(NamedTuple):
    """Ring buffer of delayed measurements (pos, vel, rpy, omega)."""

    buffer: Tuple[Array, Array, Array, Array]  # each (D+1, 3)
    head: Array                                # () int32 ring index


def init_odometry(
    params: OdometryParams, pos: Array, dtype=jnp.float32
) -> OdometryState:
    d = params.delay_steps + 1
    zeros = jnp.zeros((d, 3), dtype)
    buf_pos = jnp.broadcast_to(pos, (d, 3)).astype(dtype)
    return OdometryState(
        buffer=(buf_pos, zeros, zeros, zeros), head=jnp.zeros((), jnp.int32)
    )


def odometry_measure(
    params: OdometryParams,
    state: OdometryState,
    key: Array,
    pos: Array,
    vel: Array,
    rpy: Array,
    omega: Array,
) -> Tuple[Tuple[Array, Array, Array, Array], OdometryState]:
    """Push the true state, pop the delayed one, add per-field noise."""
    d = params.delay_steps + 1
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dtype = pos.dtype

    def noisy(x, sigma, k):
        if sigma == 0.0:
            return x
        return x + sigma * jax.random.normal(k, x.shape, dtype)

    bufs = state.buffer
    head = state.head
    new_bufs = tuple(
        b.at[head].set(v) for b, v in zip(bufs, (pos, vel, rpy, omega))
    )
    tail = (head + 1) % d  # oldest entry = delayed measurement
    meas = (
        noisy(new_bufs[0][tail], params.pos_noise, k1),
        noisy(new_bufs[1][tail], params.vel_noise, k2),
        noisy(new_bufs[2][tail], params.att_noise, k3),
        noisy(new_bufs[3][tail], params.rate_noise, k4),
    )
    return meas, OdometryState(buffer=new_bufs, head=tail)


# ---------------------------------------------------------------------------
# Lidar (planar range scanner) — gazebo_lidar_plugin-class sensor.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LidarParams:
    """Planar multi-beam range scanner against the analytic scene (ground
    plane + sphere obstacles), the in-framework equivalent of the vendored
    RotorS lidar plugin (``rotors_gazebo_plugins/src/external`` — a Gazebo
    ray sensor wrapper; here rays intersect the same primitives the solver's
    obstacle costs use)."""

    n_beams: int = 16
    fov: float = 2.0 * np.pi      # full scan [rad]
    max_range: float = 30.0
    noise: float = 0.01           # [m]
    pitch: float = 0.0            # beam elevation from body xy-plane [rad]


def lidar_directions(params: LidarParams, dtype=jnp.float32) -> Array:
    """(n_beams, 3) unit beam directions in the BODY frame — exposed so
    consumers (e.g. occupancy mapping) can turn ranges into endpoints:
    ``endpoint = pos + (rot @ dir) * range``."""
    az = jnp.linspace(0.0, params.fov, params.n_beams, endpoint=False).astype(dtype)
    cp, sp = np.cos(params.pitch), np.sin(params.pitch)
    return jnp.stack(
        [cp * jnp.cos(az), cp * jnp.sin(az), jnp.full_like(az, sp)], axis=-1
    )


def lidar_measure(
    params: LidarParams,
    key: Array,
    pos: Array,
    rot: Array,                   # (3, 3) body -> world
    ground_z: float = 0.0,
    sphere_centers: Optional[Array] = None,   # (N, 3)
    sphere_radii: Optional[Array] = None,     # (N,)
) -> Array:
    """(n_beams,) ranges — min over scene primitives, noisy, clamped."""
    dtype = pos.dtype
    dirs_b = lidar_directions(params, dtype)
    dirs_w = jnp.einsum("ij,bj->bi", rot, dirs_b)               # (B, 3)

    rng = jnp.full((params.n_beams,), params.max_range, dtype)

    # Ground plane z = ground_z: t = (ground_z - z0) / dz for dz < 0.
    dz = dirs_w[:, 2]
    t_ground = (ground_z - pos[2]) / jnp.where(jnp.abs(dz) < 1e-9, -1e-9, dz)
    rng = jnp.minimum(rng, jnp.where(t_ground > 0.0, t_ground, params.max_range))

    if sphere_centers is not None and sphere_radii is not None:
        oc = pos[None, None, :] - sphere_centers[None, :, :]    # (1, N, 3)
        d = dirs_w[:, None, :]                                  # (B, 1, 3)
        b = jnp.sum(d * oc, axis=-1)                            # (B, N)
        c = jnp.sum(oc * oc, axis=-1) - sphere_radii[None, :] ** 2
        disc = b * b - c
        t_hit = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        valid = (disc > 0.0) & (t_hit > 0.0)
        t_sph = jnp.where(valid, t_hit, params.max_range)
        rng = jnp.minimum(rng, jnp.min(t_sph, axis=-1))

    if params.noise > 0.0:
        rng = rng + params.noise * jax.random.normal(key, rng.shape, dtype)
    return jnp.clip(rng, 0.0, params.max_range)


# ---------------------------------------------------------------------------
# Optical flow (PX4Flow-class) — downward camera flow rates.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class OpticalFlowParams:
    """Downward-looking flow sensor: angular flow rates from translational
    velocity over ground height plus rotational self-motion — the standard
    PX4Flow measurement model (the RotorS optical-flow plugin's external
    OpticalFlow library computes the same quantity from rendered frames)."""

    noise: float = 0.01           # [rad/s]
    min_height: float = 0.3       # below this the flow saturates/invalid
    max_flow: float = 4.5         # [rad/s] sensor saturation


def optical_flow_measure(
    params: OpticalFlowParams,
    key: Array,
    vel_body: Array,              # (3,) body-frame velocity
    omega_body: Array,            # (3,) body rates
    height: Array,                # () height above ground
) -> Array:
    """(2,) flow rates about the camera x/y axes [rad/s]."""
    dtype = vel_body.dtype
    h = jnp.maximum(height, params.min_height)
    flow = jnp.stack(
        [vel_body[0] / h - omega_body[1], vel_body[1] / h + omega_body[0]]
    ).astype(dtype)
    flow = flow + params.noise * jax.random.normal(key, (2,), dtype)
    return jnp.clip(flow, -params.max_flow, params.max_flow)

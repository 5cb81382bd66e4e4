"""Wind and gust disturbance model.

Functional port of the RotorS wind plugin's force model
(``/root/reference/src/rotors_simulator/rotors_gazebo_plugins/src/gazebo_wind_plugin.cpp``
with defaults in ``gazebo_wind_plugin.h:44-58``): a constant mean wind
velocity plus periodic gusts with their own direction and a ramp envelope,
and an optional Ornstein-Uhlenbeck turbulence term (the plugin's random
field analog, here a simple colored-noise process), plus the plugin's
**custom static wind-field grid** with trilinear interpolation
(``gazebo_wind_plugin.h:144-190``, ``.cpp:178-283``): a regular x/y grid
with terrain-following, non-uniformly spaced vertical levels per column.

Used as the disturbance-injection mechanism for robustness experiments
(SURVEY.md section 5: the wind plugin is the reference's fault-injection
analog) — feed :func:`wind_velocity` / :func:`wind_field_velocity` into
``multirotor.step``'s ``wind_world`` input or add the equivalent force to
the external wrench.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import numpy as np
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


# ---------------------------------------------------------------------------
# Custom static wind field (spatially-varying, trilinearly interpolated).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class WindField:
    """Static wind-field grid, the reference plugin's ``useCustomStaticWindField``
    (``gazebo_wind_plugin.h:144-155``): a regular (min_x + i*res_x,
    min_y + j*res_y) horizontal grid whose vertical levels follow the
    terrain — each (x, y) column spans [bottom_z, top_z] with ``nz``
    levels placed at ``vertical_spacing_factors`` (monotone 0..1).

    Arrays are kept as NumPy (trace-time constants baked into the jitted
    sampler); shapes: factors (nz,), bottom_z/top_z (ny, nx),
    u/v/w (nz, ny, nx) — the reference's flat ``x + y*n_x + z*n_x*n_y``
    layout reshaped.
    """

    min_x: float
    min_y: float
    res_x: float
    res_y: float
    vertical_spacing_factors: np.ndarray  # (nz,)
    bottom_z: np.ndarray                  # (ny, nx)
    top_z: np.ndarray                     # (ny, nx)
    u: np.ndarray                         # (nz, ny, nx)
    v: np.ndarray
    w: np.ndarray

    @property
    def shape(self):
        return self.u.shape  # (nz, ny, nx)


def read_wind_field(path: str) -> WindField:
    """Load the reference plugin's text format (``ReadCustomWindField``,
    ``gazebo_wind_plugin.cpp:330-400``): ``name:`` tokens followed by
    whitespace-separated values."""
    fields: dict = {}
    with open(path) as f:
        tokens = f.read().split()
    i = 0
    while i < len(tokens):
        name = tokens[i].rstrip(":")
        i += 1
        vals = []
        while i < len(tokens) and not tokens[i].endswith(":"):
            vals.append(float(tokens[i]))
            i += 1
        fields[name] = vals
    nx, ny = int(fields["n_x"][0]), int(fields["n_y"][0])
    nz = len(fields["vertical_spacing_factors"])
    return WindField(
        min_x=fields["min_x"][0],
        min_y=fields["min_y"][0],
        res_x=fields["res_x"][0],
        res_y=fields["res_y"][0],
        vertical_spacing_factors=np.asarray(
            fields["vertical_spacing_factors"], np.float32
        ),
        bottom_z=np.asarray(fields["bottom_z"], np.float32).reshape(ny, nx),
        top_z=np.asarray(fields["top_z"], np.float32).reshape(ny, nx),
        u=np.asarray(fields["u"], np.float32).reshape(nz, ny, nx),
        v=np.asarray(fields["v"], np.float32).reshape(nz, ny, nx),
        w=np.asarray(fields["w"], np.float32).reshape(nz, ny, nx),
    )


def uniform_grid_field(
    wind_fn, *, x=(-10.0, 10.0, 11), y=(-10.0, 10.0, 11), z=(0.0, 20.0, 9)
) -> WindField:
    """Build a :class:`WindField` by sampling ``wind_fn(px, py, pz) ->
    (u, v, w)`` (NumPy-vectorized) on a uniform box grid — the synthetic
    analog of the reference's file-generated fields."""
    xs = np.linspace(*x[:2], x[2])
    ys = np.linspace(*y[:2], y[2])
    zf = np.linspace(0.0, 1.0, z[2])
    zs = z[0] + zf * (z[1] - z[0])
    pz, py_, px = np.meshgrid(zs, ys, xs, indexing="ij")
    u, v, w = wind_fn(px, py_, pz)
    ny, nx = y[2], x[2]
    return WindField(
        min_x=float(xs[0]), min_y=float(ys[0]),
        res_x=float(xs[1] - xs[0]), res_y=float(ys[1] - ys[0]),
        vertical_spacing_factors=zf.astype(np.float32),
        bottom_z=np.full((ny, nx), z[0], np.float32),
        top_z=np.full((ny, nx), z[1], np.float32),
        u=np.broadcast_to(u, pz.shape).astype(np.float32),
        v=np.broadcast_to(v, pz.shape).astype(np.float32),
        w=np.broadcast_to(w, pz.shape).astype(np.float32),
    )


def wind_field_velocity(field: WindField, pos: Array) -> Array:
    """Trilinearly interpolated wind velocity at world position ``pos``.

    Mirrors the plugin's sampling (``gazebo_wind_plugin.cpp:178-283``):
    z-interpolation first within each of the 4 surrounding terrain-following
    columns (at that column's own level heights), then bilinear in x, y.
    Deviation from the reference: positions outside the grid clamp to the
    boundary value instead of extrapolating/indexing out of range (the C++
    reads out of bounds below ``min_x`` — UB it never hits because its
    worlds keep the aircraft inside).  Fully traceable; vmap over ``pos``
    for batched queries.
    """
    nz, ny, nx = field.shape
    dtype = pos.dtype
    factors = jnp.asarray(field.vertical_spacing_factors, dtype)
    bottom = jnp.asarray(field.bottom_z, dtype)
    top = jnp.asarray(field.top_z, dtype)
    uvw = jnp.stack(
        [jnp.asarray(field.u, dtype), jnp.asarray(field.v, dtype),
         jnp.asarray(field.w, dtype)], axis=-1
    )  # (nz, ny, nx, 3)

    fx = (pos[0] - field.min_x) / field.res_x
    fy = (pos[1] - field.min_y) / field.res_y
    x_inf = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nx - 2)
    y_inf = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ny - 2)
    tx = jnp.clip(fx - x_inf, 0.0, 1.0)
    ty = jnp.clip(fy - y_inf, 0.0, 1.0)

    def column(ix, iy):
        """z-interpolated wind of one terrain-following column."""
        bz = bottom[iy, ix]
        tz = top[iy, ix]
        zf = jnp.clip((pos[2] - bz) / (tz - bz), 0.0, 1.0)
        j = jnp.clip(
            jnp.searchsorted(factors, zf, side="right") - 1, 0, nz - 2
        )
        z0 = bz + factors[j] * (tz - bz)
        z1 = bz + factors[j + 1] * (tz - bz)
        wz = jnp.clip((pos[2] - z0) / (z1 - z0), 0.0, 1.0)
        lo = uvw[j, iy, ix]
        hi = uvw[j + 1, iy, ix]
        return lo + (hi - lo) * wz

    c00 = column(x_inf, y_inf)
    c10 = column(x_inf + 1, y_inf)
    c01 = column(x_inf, y_inf + 1)
    c11 = column(x_inf + 1, y_inf + 1)
    row0 = c00 + (c10 - c00) * tx
    row1 = c01 + (c11 - c01) * tx
    return row0 + (row1 - row0) * ty


def wind_velocity_at(
    params: WindParams,
    field: Optional[WindField],
    state: WindState,
    t: Array,
    pos: Array,
    key: Array,
    dt: float,
) -> Tuple[Array, WindState]:
    """Total wind at time ``t`` and position ``pos``: the temporal model
    (mean + gust + turbulence) plus the static field contribution."""
    vel, new_state = wind_velocity(params, state, t, key, dt)
    if field is not None:
        vel = vel + wind_field_velocity(field, pos)
    return vel, new_state

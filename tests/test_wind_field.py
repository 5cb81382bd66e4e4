"""Static wind-field grid with trilinear interpolation
(reference: gazebo_wind_plugin.h:144-190, gazebo_wind_plugin.cpp:178-283)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.sim import wind as wind_mod


def linear_fn(px, py, pz):
    """An affine field — trilinear interpolation must reproduce it exactly."""
    return 0.5 + 0.2 * px - 0.1 * py, 1.0 + 0.3 * pz, -0.4 * px + 0.05 * pz


def test_trilinear_reproduces_affine_field_exactly(rng):
    field = wind_mod.uniform_grid_field(
        linear_fn, x=(-4.0, 4.0, 5), y=(-3.0, 3.0, 4), z=(0.0, 10.0, 6)
    )
    pts = rng.uniform([-3.9, -2.9, 0.1], [3.9, 2.9, 9.9], size=(64, 3))
    got = jax.vmap(
        lambda p: wind_mod.wind_field_velocity(field, p)
    )(jnp.asarray(pts, jnp.float32))
    want = np.stack(linear_fn(pts[:, 0], pts[:, 1], pts[:, 2]), axis=-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_grid_vertices_sampled_exactly():
    field = wind_mod.uniform_grid_field(
        lambda px, py, pz: (np.sin(px) * py, pz * 0.1, px + py + pz),
        x=(-2.0, 2.0, 5), y=(-2.0, 2.0, 5), z=(0.0, 4.0, 5),
    )
    for ix, iy, iz in [(0, 0, 0), (2, 3, 1), (4, 4, 4)]:
        p = jnp.asarray(
            [field.min_x + ix * field.res_x, field.min_y + iy * field.res_y,
             float(field.vertical_spacing_factors[iz]) * 4.0],
            jnp.float32,
        )
        got = np.asarray(wind_mod.wind_field_velocity(field, p))
        want = [field.u[iz, iy, ix], field.v[iz, iy, ix], field.w[iz, iy, ix]]
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_outside_grid_clamps_to_boundary():
    field = wind_mod.uniform_grid_field(
        linear_fn, x=(-4.0, 4.0, 5), y=(-3.0, 3.0, 4), z=(0.0, 10.0, 6)
    )
    inside = wind_mod.wind_field_velocity(field, jnp.asarray([4.0, 3.0, 10.0]))
    outside = wind_mod.wind_field_velocity(field, jnp.asarray([40.0, 30.0, 100.0]))
    np.testing.assert_allclose(np.asarray(outside), np.asarray(inside), atol=1e-5)


def test_terrain_following_columns():
    """Columns with different bottom/top: the z-levels follow the terrain,
    so the same world z samples different level brackets per column."""
    nz, ny, nx = 3, 2, 2
    field = wind_mod.WindField(
        min_x=0.0, min_y=0.0, res_x=1.0, res_y=1.0,
        vertical_spacing_factors=np.asarray([0.0, 0.5, 1.0], np.float32),
        bottom_z=np.asarray([[0.0, 10.0], [0.0, 10.0]], np.float32),
        top_z=np.asarray([[20.0, 30.0], [20.0, 30.0]], np.float32),
        u=np.arange(nz * ny * nx, dtype=np.float32).reshape(nz, ny, nx),
        v=np.zeros((nz, ny, nx), np.float32),
        w=np.zeros((nz, ny, nx), np.float32),
    )
    # At x=0 (column spans 0..20): z=10 is exactly the middle level (idx 1).
    got = wind_mod.wind_field_velocity(field, jnp.asarray([0.0, 0.0, 10.0]))
    np.testing.assert_allclose(float(got[0]), field.u[1, 0, 0], atol=1e-5)
    # At x=1 (column spans 10..30): z=10 is the bottom level (idx 0).
    got = wind_mod.wind_field_velocity(field, jnp.asarray([1.0, 0.0, 10.0]))
    np.testing.assert_allclose(float(got[0]), field.u[0, 0, 1], atol=1e-5)


def test_read_reference_text_format(tmp_path):
    """Round-trip the reference plugin's text file format
    (ReadCustomWindField, gazebo_wind_plugin.cpp:330-400)."""
    txt = """min_x: -1.0
min_y: -2.0
n_x: 2
n_y: 2
res_x: 2.0
res_y: 4.0
vertical_spacing_factors: 0.0 1.0
bottom_z: 0.0 0.0 0.0 0.0
top_z: 10.0 10.0 10.0 10.0
u: 1.0 2.0 3.0 4.0 5.0 6.0 7.0 8.0
v: 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0
w: 0.5 0.5 0.5 0.5 0.5 0.5 0.5 0.5
"""
    path = tmp_path / "field.txt"
    path.write_text(txt)
    field = wind_mod.read_wind_field(str(path))
    assert field.shape == (2, 2, 2)
    assert field.min_x == -1.0 and field.res_y == 4.0
    # Vertex (ix=1, iy=0, iz=0) in the reference's x + y*nx + z*nx*ny layout.
    assert field.u[0, 0, 1] == 2.0
    got = wind_mod.wind_field_velocity(field, jnp.asarray([1.0, -2.0, 0.0]))
    np.testing.assert_allclose(np.asarray(got), [2.0, 0.0, 0.5], atol=1e-5)


def test_wind_velocity_at_combines_field_and_gust():
    field = wind_mod.uniform_grid_field(
        lambda px, py, pz: (np.full_like(px, 2.0), np.zeros_like(px), np.zeros_like(px)),
        x=(-4.0, 4.0, 3), y=(-4.0, 4.0, 3), z=(0.0, 10.0, 3),
    )
    wp = wind_mod.WindParams(mean_velocity=(1.0, 0.0, 0.0))
    ws = wind_mod.init_wind()
    v, _ = wind_mod.wind_velocity_at(
        wp, field, ws, jnp.asarray(0.0), jnp.asarray([0.0, 0.0, 2.0]),
        jax.random.key(0), 0.01,
    )
    np.testing.assert_allclose(np.asarray(v), [3.0, 0.0, 0.0], atol=1e-5)

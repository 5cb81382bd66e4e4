"""Depth camera (gazebo_noisydepth_plugin parity) + occupancy mapping
(gazebo_octomap_plugin analog) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotor_manipulator_mppi_tpu.sim import depth_camera as dc
from quadrotor_manipulator_mppi_tpu.sim import occupancy as occ

# optical -> world rotation for a camera looking straight DOWN:
# optical +z (axis) -> world -z, optical +x (right) -> world +x,
# optical +y (down in image) -> world +y keeps det=+1? x cross y = z:
# (1,0,0) x (0,1,0) = (0,0,1) but we need axis -z => flip y.
R_DOWN = jnp.asarray(
    [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]]
).T  # columns are the world directions of optical x, y, z


def test_down_camera_sees_flat_ground():
    p = dc.DepthCameraParams(width=32, height=24)
    pos = jnp.asarray([0.0, 0.0, 2.0])
    depth = dc.depth_render(p, pos, R_DOWN, ground_z=0.0)
    # z-depth of a plane perpendicular to the axis is constant == height
    np.testing.assert_allclose(np.asarray(depth), 2.0, rtol=1e-5)


def test_sphere_silhouette_and_depth():
    p = dc.DepthCameraParams(width=33, height=25, max_depth=50.0)
    pos = jnp.asarray([0.0, 0.0, 10.0])
    center = jnp.asarray([[0.0, 0.0, 5.0]])
    radius = jnp.asarray([1.0])
    depth = dc.depth_render(
        p, pos, R_DOWN, ground_z=-100.0, sphere_centers=center,
        sphere_radii=radius, background=50.0,
    )
    d = np.asarray(depth)
    cy, cx = p.height // 2, p.width // 2
    # center pixel hits the sphere head-on: 10 - 5 - 1 = 4
    np.testing.assert_allclose(d[cy, cx], 4.0, atol=1e-3)
    # corners miss the sphere and land on the far ground plane (z-depth 110)
    np.testing.assert_allclose(d[0, 0], 110.0, rtol=1e-5)
    # silhouette is centered: symmetric hits
    hits = np.isfinite(d) & (d < 100.0)
    assert hits.sum() > 4
    np.testing.assert_array_equal(hits, hits[::-1, :])
    np.testing.assert_array_equal(hits, hits[:, ::-1])


def test_kinect_noise_statistics_and_badpoints():
    """Reference quirk parity: the Nguyen sigma expression multiplies the
    unit normal directly (depth_noise_model.cpp:66-69)."""
    p = dc.DepthCameraParams(width=200, height=200)
    depth = jnp.full((200, 200), 1.0)
    noisy = dc.kinect_depth_noise(p, jax.random.PRNGKey(0), depth)
    err = np.asarray(noisy) - 1.0
    expect = 0.0012 + 0.0019 * (1.0 - 0.4) ** 2
    assert abs(err.std() - expect) < 0.1 * expect
    # out-of-range -> NaN bad points
    bad = dc.kinect_depth_noise(
        p, jax.random.PRNGKey(0), jnp.full((4, 4), 0.1)
    )
    assert np.all(np.isnan(np.asarray(bad)))


def test_pmd_noise_statistics():
    p = dc.DepthCameraParams(width=200, height=200)
    depth = jnp.full((200, 200), 5.0)
    noisy = dc.pmd_depth_noise(p, jax.random.PRNGKey(1), depth)
    err = np.asarray(noisy) - 5.0
    assert abs(err.std() - 0.05) < 0.005


def test_d435_noise_statistics():
    """D435: RMS = (z mm)^2 subpix/(f b 1e6), then squared once more and
    clipped at max_stdev (depth_noise_model.cpp:31-47)."""
    p = dc.DepthCameraParams(width=64, height=64, h_fov=float(np.pi / 2))
    f = 0.5 * 64 / np.tan(np.pi / 4)
    mult = 0.1 / (f * 0.05 * 1e6)
    rms = (1.0 * 1000.0) ** 2 * mult
    expect = rms * rms
    depth = jnp.full((200, 200), 1.0)
    noisy = dc.d435_depth_noise(p, jax.random.PRNGKey(2), depth)
    err = np.asarray(noisy) - 1.0
    assert abs(err.std() - expect) < 0.15 * expect
    # far depth saturates at max_stdev
    far = jnp.full((200, 200), 30.0)
    noisy_far = dc.d435_depth_noise(p, jax.random.PRNGKey(3), far)
    err_far = np.asarray(noisy_far) - 30.0
    assert abs(err_far.std() - 3.0) < 0.45


def test_noise_model_registry():
    p = dc.DepthCameraParams()
    d = jnp.full((4, 4), 2.0)
    for name in ("Kinect", "pmd", "D435"):
        out = dc.noisy_depth(p, jax.random.PRNGKey(0), d, model=name)
        assert out.shape == d.shape


def test_backprojection_roundtrip():
    p = dc.DepthCameraParams(width=16, height=12, max_depth=50.0)
    pos = jnp.asarray([0.5, -0.25, 3.0])
    depth = dc.depth_render(p, pos, R_DOWN, ground_z=0.0)
    pts, valid = dc.depth_to_points(p, depth, pos, R_DOWN)
    assert bool(jnp.all(valid))
    # all points lie on the ground plane
    np.testing.assert_allclose(np.asarray(pts[:, 2]), 0.0, atol=1e-4)


# ---------------------------------------------------------------------------
# Occupancy grid
# ---------------------------------------------------------------------------

PARAMS = occ.OccupancyParams(
    origin=(-2.0, -2.0, -0.5), resolution=0.25, shape=(16, 16, 16),
    n_free_samples=16, max_range=8.0,
)


def _scan_into_grid(grid, cam_pos, sphere=None):
    p = dc.DepthCameraParams(width=24, height=18, max_depth=40.0)
    kw = {}
    if sphere is not None:
        kw = dict(sphere_centers=sphere[0], sphere_radii=sphere[1])
    depth = dc.depth_render(p, cam_pos, R_DOWN, ground_z=0.0, **kw)
    pts, valid = dc.depth_to_points(p, depth, cam_pos, R_DOWN)
    return occ.insert_rays(PARAMS, grid, cam_pos, pts, valid)


def test_ground_becomes_occupied_and_path_free():
    grid = occ.init_grid(PARAMS)
    cam = jnp.asarray([0.0, 0.0, 2.0])
    for _ in range(3):
        grid = _scan_into_grid(grid, cam)
    # the voxel containing the ground-surface endpoints: occupied
    # (endpoints at z=0.0 land in the [0, 0.25) voxel layer)
    p_ground = float(occ.query(PARAMS, grid, jnp.asarray([0.0, 0.0, 0.05])))
    assert p_ground > 0.6
    # voxels along the ray path: carved free
    p_mid = float(occ.query(PARAMS, grid, jnp.asarray([0.0, 0.0, 1.0])))
    assert p_mid < 0.3
    # out-of-bounds: unknown
    p_oob = float(occ.query(PARAMS, grid, jnp.asarray([50.0, 0.0, 0.0])))
    assert p_oob == 0.5


def test_sphere_obstacle_mapped():
    grid = occ.init_grid(PARAMS)
    cam = jnp.asarray([0.0, 0.0, 3.0])
    sphere = (jnp.asarray([[0.5, 0.5, 1.0]]), jnp.asarray([0.4]))
    for _ in range(3):
        grid = _scan_into_grid(grid, cam, sphere=sphere)
    # top of the sphere is occupied
    p_top = float(occ.query(PARAMS, grid, jnp.asarray([0.5, 0.5, 1.35])))
    assert p_top > 0.6
    # space above the sphere is free
    p_above = float(occ.query(PARAMS, grid, jnp.asarray([0.5, 0.5, 2.2])))
    assert p_above < 0.3
    # occupied_centers exports solver obstacles near the sphere/ground
    centers, radii = occ.occupied_centers(PARAMS, grid, max_n=32)
    live = np.asarray(radii) > 0.0
    assert live.sum() > 0
    assert np.all(np.asarray(radii)[live] > 0.2)


def test_max_range_only_carves():
    params = occ.OccupancyParams(
        origin=(-1.0, -1.0, -1.0), resolution=0.25, shape=(8, 8, 8),
        n_free_samples=8, max_range=0.5,
    )
    grid = occ.init_grid(params)
    origin = jnp.asarray([0.0, 0.0, 0.0])
    # endpoint inside bounds but beyond max_range
    end = jnp.asarray([[0.9, 0.0, 0.0]])
    grid = occ.insert_rays(params, grid, origin, end, jnp.asarray([True]))
    p_end = float(occ.query(params, grid, end[0]))
    assert p_end <= 0.5  # no hit registered
    p_near = float(occ.query(params, grid, jnp.asarray([0.2, 0.0, 0.0])))
    assert p_near < 0.5  # carved free


def test_log_odds_clamping():
    params = occ.OccupancyParams(
        origin=(-1.0, -1.0, -1.0), resolution=0.5, shape=(4, 4, 4),
        n_free_samples=4, max_range=5.0,
    )
    grid = occ.init_grid(params)
    origin = jnp.asarray([-0.9, 0.0, 0.0])
    end = jnp.asarray([[0.8, 0.0, 0.0]])
    for _ in range(50):
        grid = occ.insert_rays(params, grid, origin, end, jnp.asarray([True]))
    lo = np.asarray(grid.log_odds)
    assert lo.max() <= occ.LOG_ODDS_MAX + 1e-5
    assert lo.min() >= occ.LOG_ODDS_MIN - 1e-5


def test_save_load_roundtrip(tmp_path):
    grid = occ.init_grid(PARAMS)
    cam = jnp.asarray([0.0, 0.0, 2.0])
    grid = _scan_into_grid(grid, cam)
    path = str(tmp_path / "map.npz")
    occ.save_npz(path, PARAMS, grid)
    params2, grid2 = occ.load_npz(path)
    assert params2.shape == PARAMS.shape
    np.testing.assert_allclose(
        np.asarray(grid2.log_odds), np.asarray(grid.log_odds)
    )


def test_mapped_solver_avoids_dynamic_obstacles():
    """solver/mapped: obstacles arriving via the OBSERVATION (not trace-time
    constants) must bend the plan.  Same solver state, same key: with a
    blocking sphere the emitted plan's closest approach to the obstacle
    is larger than without."""
    import dataclasses

    import jax
    from quadrotor_manipulator_mppi_tpu.ops import integrators
    from quadrotor_manipulator_mppi_tpu.solver import mapped as ms

    base = ms.MappedMPPIParams()
    params = dataclasses.replace(
        base, mppi=dataclasses.replace(base.mppi, n_samples=512)
    )
    step, init = ms.make_mapped_solver(params)
    x = jnp.zeros(3).at[2].set(2.0)
    target = jnp.asarray([6.0, 0.0, 2.0])
    center = jnp.asarray([[3.0, 0.0, 2.0]])

    def plan_clearance(radii):
        sol = init(jax.random.PRNGKey(0))
        obs = ms.MappedObs(
            x=x, v=jnp.zeros(3), target=target,
            obst_centers=center, obst_radii=radii,
        )
        # a few warm-up solves so the plan converges
        for _ in range(15):
            out, sol = step(sol, obs)
        traj, _ = integrators.double_integrate(
            out.u_seq[None], x, jnp.zeros(3), params.mppi.dt
        )
        d = jnp.linalg.norm(traj[0] - center[0], axis=-1)
        return float(d.min())

    free = plan_clearance(jnp.asarray([0.0]))
    blocked = plan_clearance(jnp.asarray([1.2]))
    assert blocked > free
    assert blocked > 1.0  # stays out of the inflated sphere


def test_mapped_solver_inert_slots_do_not_repel():
    """Radius-0 export slots must not influence the plan even though their
    centers are arbitrary voxels (the margin is folded into live radii by
    the caller, never into inert ones)."""
    import dataclasses

    import jax
    from quadrotor_manipulator_mppi_tpu.solver import mapped as ms

    base = ms.MappedMPPIParams()
    params = dataclasses.replace(
        base, mppi=dataclasses.replace(base.mppi, n_samples=256)
    )
    step, init = ms.make_mapped_solver(params)
    x = jnp.zeros(3).at[2].set(2.0)
    target = jnp.asarray([4.0, 0.0, 2.0])

    def u_with(centers, radii):
        sol = init(jax.random.PRNGKey(1))
        obs = ms.MappedObs(x=x, v=jnp.zeros(3), target=target,
                           obst_centers=centers, obst_radii=radii)
        out, _ = step(sol, obs)
        return np.asarray(out.u_seq)

    # slots parked ON the straight-line path with radius 0
    on_path = jnp.asarray([[2.0, 0.0, 2.0], [1.0, 0.0, 2.0]])
    u_inert = u_with(on_path, jnp.zeros(2))
    u_empty = u_with(jnp.zeros((2, 3)), jnp.zeros(2))
    np.testing.assert_allclose(u_inert, u_empty, atol=1e-6)

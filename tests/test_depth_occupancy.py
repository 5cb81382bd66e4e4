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


def test_distance_field_chamfer():
    """ESDF relaxation: 0 at occupied voxels, L1-chamfer growth with the
    voxel resolution, clamped at max_dist, conservative (>= Euclidean)."""
    params = occ.OccupancyParams(
        origin=(0.0, 0.0, 0.0), resolution=0.5, shape=(12, 12, 6),
        n_free_samples=4, max_range=10.0,
    )
    grid = occ.init_grid(params)
    # occupy one voxel at index (6, 6, 3) by direct log-odds poke
    lo = grid.log_odds.at[6, 6, 3].set(occ.LOG_ODDS_MAX)
    grid = occ.OccupancyGrid(log_odds=lo)
    d = occ.distance_field(params, grid, max_dist=2.0)
    assert float(d[6, 6, 3]) == 0.0
    np.testing.assert_allclose(float(d[7, 6, 3]), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(d[6, 8, 3]), 1.0, atol=1e-6)
    # diagonal neighbor: chamfer L1 = 1.0 >= Euclid 0.707 (conservative)
    np.testing.assert_allclose(float(d[7, 7, 3]), 1.0, atol=1e-6)
    # far corner clamps
    assert float(d[0, 0, 0]) == 2.0
    # world-space query: center of the occupied voxel
    q = occ.query_distance(
        params, d, jnp.asarray([3.25, 3.25, 1.75]), max_dist=2.0
    )
    assert float(q) == 0.0
    # out of bounds -> max_dist
    q_oob = occ.query_distance(
        params, d, jnp.asarray([100.0, 0.0, 0.0]), max_dist=2.0
    )
    assert float(q_oob) == 2.0


def test_distance_field_from_scanned_scene():
    """End-to-end: scan a sphere into the grid, the ESDF is small near the
    mapped surface and large in carved free space."""
    grid = occ.init_grid(PARAMS)
    cam = jnp.asarray([0.0, 0.0, 3.0])
    sphere = (jnp.asarray([[0.5, 0.5, 1.0]]), jnp.asarray([0.4]))
    for _ in range(3):
        grid = _scan_into_grid(grid, cam, sphere=sphere)
    d = occ.distance_field(PARAMS, grid, max_dist=1.5)
    near = float(occ.query_distance(
        PARAMS, d, jnp.asarray([0.5, 0.5, 1.55]), max_dist=1.5))
    far = float(occ.query_distance(
        PARAMS, d, jnp.asarray([0.5, 0.5, 2.6]), max_dist=1.5))
    assert near < 0.6
    assert far > 1.0


def test_mapped_solver_esdf_cost_bends_plans():
    """ESDF mode: a distance field with a low-clearance blob on the straight
    path must push the plan around it."""
    import dataclasses

    import jax
    from quadrotor_manipulator_mppi_tpu.ops import integrators
    from quadrotor_manipulator_mppi_tpu.solver import mapped as ms

    op = occ.OccupancyParams(
        origin=(-1.0, -3.0, 0.0), resolution=0.25, shape=(32, 24, 12),
        n_free_samples=8, max_range=10.0,
    )
    base = ms.MappedMPPIParams(use_esdf=True, esdf_params=op)
    params = dataclasses.replace(
        base, mppi=dataclasses.replace(base.mppi, n_samples=512)
    )
    step, init = ms.make_mapped_solver(params)
    # cruising start so the horizon actually traverses the blob location
    x = jnp.asarray([0.0, 0.0, 1.5])
    v0 = jnp.asarray([2.5, 0.0, 0.0])
    target = jnp.asarray([6.0, 0.0, 1.5])
    center = jnp.asarray([3.0, 0.0, 1.5])

    def plan_min_dist(grid):
        d = occ.distance_field(op, grid, max_dist=params.esdf_max_dist)
        sol = init(jax.random.PRNGKey(0))
        obs = ms.MappedObs(
            x=x, v=v0, target=target,
            obst_centers=jnp.zeros((1, 3)), obst_radii=jnp.zeros(1),
            dist_field=d,
        )
        for _ in range(25):
            out, sol = step(sol, obs)
        traj, _ = integrators.double_integrate(
            out.u_seq[None], x, v0, params.mppi.dt
        )
        return float(jnp.linalg.norm(traj[0] - center, axis=-1).min())

    free = plan_min_dist(occ.init_grid(op))
    blob = occ.init_grid(op)
    ijk, _ = occ._voxel_index(op, center)
    # a 3x3x3 occupied blob (a single voxel's ESDF well is narrower than
    # the MPPI plan's own noise floor)
    i, j, k = int(ijk[0]), int(ijk[1]), int(ijk[2])
    lo = blob.log_odds.at[i - 1:i + 2, j - 1:j + 2, k - 1:k + 2].set(
        occ.LOG_ODDS_MAX
    )
    blocked = plan_min_dist(occ.OccupancyGrid(log_odds=lo))
    # the unobstructed plan passes near the blob (MPPI plans carry an
    # O(sigma) noise floor, so "near" not "through")
    assert free < 0.55
    assert blocked > free + 0.15
    assert blocked > params.esdf_margin * 0.6

"""Auxiliary sensor models (GPS / barometer / magnetometer)."""

import numpy as np

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.sim import sensors
from quadrotor_manipulator_mppi_tpu.utils import rotations as rot


def test_gps_noise_statistics():
    p = sensors.GpsParams(horizontal_noise=0.5, vertical_noise=1.0)
    pos = jnp.asarray([10.0, -5.0, 100.0])
    keys = jax.random.split(jax.random.key(0), 2000)
    fixes = np.asarray(jax.vmap(lambda k: sensors.gps_measure(p, k, pos))(keys))
    np.testing.assert_allclose(fixes.mean(axis=0), np.asarray(pos), atol=0.1)
    assert abs(fixes[:, 0].std() - 0.5) < 0.05
    assert abs(fixes[:, 2].std() - 1.0) < 0.1


def test_barometer_altitude_roundtrip():
    p = sensors.BarometerParams()
    for alt in [0.0, 2.1, 100.0]:
        pres, alt_meas = sensors.barometer_measure(
            p, jax.random.key(0), jnp.asarray(alt)
        )
        np.testing.assert_allclose(float(alt_meas), alt, atol=1e-3)
        assert float(pres) <= p.p0 + 1e-6


def test_magnetometer_rotates_reference_field():
    p = sensors.MagnetometerParams()
    # 90-degree yaw: world x-field appears along body -y? body x axis points
    # to world y, so h_body = R^T h_world.
    from scipy.spatial.transform import Rotation as R

    r = jnp.asarray(R.from_euler("z", np.pi / 2).as_matrix(), jnp.float32)
    h = np.asarray(sensors.magnetometer_measure(p, jax.random.key(0), r))
    want = R.from_euler("z", np.pi / 2).as_matrix().T @ np.asarray(p.ref_field)
    np.testing.assert_allclose(h, want, atol=1e-6)


def test_lidar_ranges_ground_and_sphere():
    """Beams pointing down hit the ground at the right range; a sphere in
    front of a beam shortens it; free beams read max range."""
    from quadrotor_manipulator_mppi_tpu.sim import sensors

    p = sensors.LidarParams(n_beams=4, noise=0.0, pitch=-np.pi / 4)
    pos = jnp.asarray([0.0, 0.0, 2.0])
    rot = jnp.eye(3)
    # 45-degree downward beams from 2 m -> ground at 2*sqrt(2).
    rng = sensors.lidar_measure(p, jax.random.key(0), pos, rot)
    np.testing.assert_allclose(np.asarray(rng), 2.0 * np.sqrt(2.0), rtol=1e-5)

    # Horizontal beams: only the +x one hits the sphere at 3 - 0.5 = 2.5 m.
    p2 = sensors.LidarParams(n_beams=4, noise=0.0, pitch=0.0)
    rng2 = sensors.lidar_measure(
        p2, jax.random.key(0), pos, rot,
        sphere_centers=jnp.asarray([[3.0, 0.0, 2.0]]),
        sphere_radii=jnp.asarray([0.5]),
    )
    rng2 = np.asarray(rng2)
    np.testing.assert_allclose(rng2[0], 2.5, rtol=1e-5)   # +x beam
    np.testing.assert_allclose(rng2[1:], p2.max_range, rtol=1e-6)


def test_lidar_rotated_body():
    """Yawing the body rotates which beam sees the obstacle."""
    from quadrotor_manipulator_mppi_tpu.sim import sensors
    from quadrotor_manipulator_mppi_tpu.utils import rotations as rot_mod

    p = sensors.LidarParams(n_beams=4, noise=0.0)
    rot = rot_mod.euler_to_matrix(jnp.asarray([np.pi / 2, 0.0, 0.0]), "ZYX")
    rng = sensors.lidar_measure(
        p, jax.random.key(0), jnp.asarray([0.0, 0.0, 2.0]), rot,
        sphere_centers=jnp.asarray([[0.0, 3.0, 2.0]]),
        sphere_radii=jnp.asarray([0.5]),
    )
    # Body +x now points at world +y: beam 0 sees the sphere.
    np.testing.assert_allclose(np.asarray(rng)[0], 2.5, rtol=1e-5)


def test_optical_flow_model():
    from quadrotor_manipulator_mppi_tpu.sim import sensors

    p = sensors.OpticalFlowParams(noise=0.0)
    flow = sensors.optical_flow_measure(
        p, jax.random.key(0),
        vel_body=jnp.asarray([1.0, -0.5, 0.0]),
        omega_body=jnp.asarray([0.1, 0.2, 0.0]),
        height=jnp.asarray(2.0),
    )
    # v_x/h - omega_y, v_y/h + omega_x
    np.testing.assert_allclose(np.asarray(flow), [0.3, -0.15], atol=1e-6)
    # Saturation below min height.
    flow2 = sensors.optical_flow_measure(
        p, jax.random.key(0),
        vel_body=jnp.asarray([10.0, 0.0, 0.0]),
        omega_body=jnp.zeros(3),
        height=jnp.asarray(0.01),
    )
    assert float(flow2[0]) == p.max_flow

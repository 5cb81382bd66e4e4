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

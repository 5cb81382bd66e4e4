"""Sensor models and evaluation metrics."""

import numpy as np

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.evaluation import metrics
from quadrotor_manipulator_mppi_tpu.sim import sensors
from quadrotor_manipulator_mppi_tpu.utils import trajectory
from quadrotor_manipulator_mppi_tpu.utils.pose import Pose


def test_imu_zero_noise_is_passthrough():
    p = sensors.ImuParams(
        gyro_noise_density=0.0, gyro_random_walk=0.0,
        gyro_turn_on_bias_sigma=0.0, accel_noise_density=0.0,
        accel_random_walk=0.0, accel_turn_on_bias_sigma=0.0,
    )
    st = sensors.init_imu(p, jax.random.key(0))
    accel = jnp.asarray([0.1, -0.2, 9.8])
    gyro = jnp.asarray([0.01, 0.0, -0.02])
    a, g, _ = sensors.imu_measure(p, st, jax.random.key(1), accel, gyro, 0.001)
    np.testing.assert_allclose(np.asarray(a), np.asarray(accel), atol=1e-7)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gyro), atol=1e-7)


def test_imu_noise_statistics():
    """White-noise std matches density/sqrt(dt) within sampling error."""
    p = sensors.ImuParams(
        gyro_random_walk=0.0, gyro_turn_on_bias_sigma=0.0,
        accel_random_walk=0.0, accel_turn_on_bias_sigma=0.0,
    )
    st = sensors.init_imu(p, jax.random.key(0))
    dt = 0.001
    keys = jax.random.split(jax.random.key(2), 2000)
    accel = jnp.zeros(3)

    def one(k):
        a, g, _ = sensors.imu_measure(p, st, k, accel, jnp.zeros(3), dt)
        return a, g

    a_s, g_s = jax.vmap(one)(keys)
    sigma_a = p.accel_noise_density / np.sqrt(dt)
    sigma_g = p.gyro_noise_density / np.sqrt(dt)
    np.testing.assert_allclose(np.std(np.asarray(a_s)), sigma_a, rtol=0.1)
    np.testing.assert_allclose(np.std(np.asarray(g_s)), sigma_g, rtol=0.1)


def test_imu_bias_random_walk_accumulates():
    p = sensors.ImuParams()
    st = sensors.init_imu(p, jax.random.key(0))
    for i in range(50):
        _, _, st = sensors.imu_measure(
            p, st, jax.random.key(i + 10), jnp.zeros(3), jnp.zeros(3), 0.01
        )
    assert float(jnp.linalg.norm(st.accel_bias)) > 0.0


def test_odometry_delay_queue():
    p = sensors.OdometryParams(delay_steps=3)
    st = sensors.init_odometry(p, jnp.zeros(3))
    outs = []
    for t in range(8):
        truth = jnp.full((3,), float(t))
        meas, st = sensors.odometry_measure(
            p, st, jax.random.key(t), truth, truth, truth, truth
        )
        outs.append(float(meas[0][0]))
    # With a 3-step delay the measurement at tick t is the truth at t-3.
    assert outs[:4] == [0.0, 0.0, 0.0, 0.0]
    np.testing.assert_allclose(outs[4:], [1.0, 2.0, 3.0, 4.0])


def test_odometry_zero_delay_passthrough():
    p = sensors.OdometryParams()
    st = sensors.init_odometry(p, jnp.zeros(3))
    truth = jnp.asarray([1.0, 2.0, 3.0])
    meas, st = sensors.odometry_measure(
        p, st, jax.random.key(0), truth, truth, truth, truth
    )
    np.testing.assert_allclose(np.asarray(meas[0]), np.asarray(truth))


def test_settling_time_and_hover_metrics():
    t = np.arange(400) * 0.01
    pos = np.zeros((400, 3))
    pos[:, 2] = 2.0 - np.exp(-3 * t)  # settles toward 2.0
    target = jnp.asarray([0.0, 0.0, 2.0])
    st = metrics.settling_time(jnp.asarray(pos), target, dt=0.01, radius=0.1)
    # |err| < 0.1 from exp(-3t) < 0.1 -> t > 0.767
    assert 0.6 < float(st) < 0.9
    m = metrics.hover_metrics(
        jnp.asarray(pos), jnp.zeros((400, 3)), target, dt=0.01
    )
    assert bool(m.passed)


def test_waypoint_response_time():
    pos = np.zeros((100, 3))
    pos[60:, 0] = 1.0
    t = metrics.waypoint_response(
        jnp.asarray(pos), jnp.asarray([1.0, 0.0, 0.0]), dt=0.01, radius=0.1
    )
    np.testing.assert_allclose(float(t), 0.6)


def test_cubic_trajectory_boundary_conditions():
    q0 = jnp.asarray([0.0, 1.0])
    q1 = jnp.asarray([2.0, -1.0])
    t = jnp.asarray([0.0, 2.5, 5.0, 7.0])
    q = trajectory.joint_trajectory(t, 0.0, 5.0, q0, q1)
    np.testing.assert_allclose(np.asarray(q[0]), np.asarray(q0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(q[2]), np.asarray(q1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(q[3]), np.asarray(q1), atol=1e-6)  # clamped
    mid = np.asarray(q[1])
    np.testing.assert_allclose(mid, (np.asarray(q0) + np.asarray(q1)) / 2, atol=1e-6)
    v = trajectory.joint_trajectory_velocity(t, 0.0, 5.0, q0, q1)
    np.testing.assert_allclose(np.asarray(v[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v[2]), 0.0, atol=1e-6)


def test_se3_trajectory_endpoints(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    init = Pose.identity()
    target = Pose(position=jnp.asarray([1.0, 2.0, 3.0]), quat=jnp.asarray(q, jnp.float32))
    p0 = trajectory.se3_trajectory(jnp.asarray(0.0), 0.0, 2.0, init, target)
    p1 = trajectory.se3_trajectory(jnp.asarray(2.0), 0.0, 2.0, init, target)
    np.testing.assert_allclose(np.asarray(p0.position), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1.position), [1, 2, 3], atol=1e-5)
    dot = abs(float(jnp.sum(p1.quat * target.quat)))
    assert dot > 0.9999

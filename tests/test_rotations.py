"""Rotation library vs scipy.spatial.transform (independent oracle)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.utils import rotations as rot


def random_quats(rng, n=64):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_matrix_matches_scipy(rng):
    q = random_quats(rng)
    got = np.asarray(rot.quat_to_matrix(jnp.asarray(q, jnp.float32)))
    # scipy uses xyzw
    want = R.from_quat(np.roll(q, -1, axis=-1)).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_matrix_to_quat_roundtrip(rng):
    q = random_quats(rng)
    q = np.where(q[:, :1] < 0, -q, q)  # canonical w >= 0
    m = R.from_quat(np.roll(q, -1, axis=-1)).as_matrix()
    got = np.asarray(rot.matrix_to_quat(jnp.asarray(m)))
    np.testing.assert_allclose(got, q, atol=1e-5)


def test_matrix_to_quat_degenerate_cases():
    # 180-degree rotations hit each Shepperd branch.
    for axis in np.eye(3):
        m = R.from_rotvec(np.pi * axis).as_matrix()
        q = np.asarray(rot.matrix_to_quat(jnp.asarray(m)))
        m2 = np.asarray(rot.quat_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(m2, m, atol=1e-5)


@pytest.mark.parametrize("conv", ["XYZ", "XZY", "YXZ", "YZX", "ZXY", "ZYX"])
def test_euler_conversions_all_conventions(rng, conv):
    angles = rng.uniform(-1.2, 1.2, size=(32, 3))
    m = np.asarray(rot.euler_to_matrix(jnp.asarray(angles), conv))
    # scipy intrinsic (capital) convention matches R_c0 @ R_c1 @ R_c2.
    want = R.from_euler(conv, angles).as_matrix()
    np.testing.assert_allclose(m, want, atol=1e-6)
    back = np.asarray(rot.matrix_to_euler(jnp.asarray(m), conv))
    np.testing.assert_allclose(back, angles, atol=1e-5)


def test_quat_multiply_and_rotate(rng):
    qa, qb = random_quats(rng, 16), random_quats(rng, 16)
    got = np.asarray(rot.quat_multiply(jnp.asarray(qa), jnp.asarray(qb)))
    want_r = R.from_quat(np.roll(qa, -1, -1)) * R.from_quat(np.roll(qb, -1, -1))
    want = np.roll(want_r.as_quat(), 1, -1)
    # sign ambiguity
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-6)

    v = rng.normal(size=(16, 3))
    got_v = np.asarray(rot.quat_rotate(jnp.asarray(qa), jnp.asarray(v)))
    want_v = R.from_quat(np.roll(qa, -1, -1)).apply(v)
    np.testing.assert_allclose(got_v, want_v, atol=1e-6)


def test_axis_angle_roundtrip(rng):
    w = rng.normal(size=(32, 3))
    m = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(w)))
    want = R.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(m, want, atol=1e-6)
    back = np.asarray(rot.matrix_to_axis_angle(jnp.asarray(m)))
    want_back = R.from_matrix(want).as_rotvec()
    np.testing.assert_allclose(back, want_back, atol=1e-5)


def test_small_angle_axis_angle_stability():
    w = jnp.asarray([[1e-9, 0, 0], [0.0, 0.0, 0.0]])
    q = rot.quat_from_axis_angle(w)
    assert np.all(np.isfinite(np.asarray(q)))
    back = np.asarray(rot.quat_to_axis_angle(q))
    np.testing.assert_allclose(back, np.asarray(w), atol=1e-8)


def test_rotation_6d_roundtrip(rng):
    q = random_quats(rng, 8)
    m = np.asarray(rot.quat_to_matrix(jnp.asarray(q)))
    d6 = rot.matrix_to_rotation_6d(jnp.asarray(m))
    m2 = np.asarray(rot.rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(m2, m, atol=1e-6)


def test_xyzw_wxyz_helpers():
    q_xyzw = jnp.asarray([0.1, 0.2, 0.3, 0.9])
    q = rot.quat_from_xyzw(q_xyzw)
    np.testing.assert_allclose(np.asarray(q), [0.9, 0.1, 0.2, 0.3])
    np.testing.assert_allclose(np.asarray(rot.quat_to_xyzw(q)), np.asarray(q_xyzw))

"""FK chain vs an independent homogeneous-matrix oracle built directly from
the URDF numbers, plus URDF-loader equivalence against the hardcoded Kinova
spec (both must describe the same robot)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.models import chain as chain_mod
from quadrotor_manipulator_mppi_tpu.models import kinova, urdf
from quadrotor_manipulator_mppi_tpu.utils import se3
from quadrotor_manipulator_mppi_tpu.utils.pose import Pose

URDF_PATH = "/root/reference/src/aerial_manipulation/urdf/aerial_manipulator_gpu.urdf"


def fk_oracle(q, base=None):
    """4x4 chain composition from the raw URDF joint table (float64)."""

    def tf(xyz, rpy):
        m = np.eye(4)
        m[:3, :3] = R.from_euler("ZYX", [rpy[2], rpy[1], rpy[0]]).as_matrix()
        m[:3, 3] = xyz
        return m

    def rz(a):
        m = np.eye(4)
        m[:3, :3] = R.from_euler("Z", a).as_matrix()
        return m

    pi = np.pi
    t = np.eye(4) if base is None else base
    t = t @ tf([0, 0, 0], [pi, 0, 0])  # world -> link_base mount
    origins = [
        ([0, 0, 0.15675], [0, pi, 0]),
        ([0, 0.0016, -0.11875], [-pi / 2, 0, pi]),
        ([0, -0.205, 0], [-pi / 2, 0, 0]),
        ([0, 0, -0.205], [pi / 2, 0, pi]),
        ([0, 0.2073, -0.0114], [-pi / 2, 0, pi]),
        ([0, 0, -0.10375], [pi / 2, 0, pi]),
        ([0, 0.10375, 0], [-pi / 2, 0, pi]),
    ]
    for j, (xyz, rpy) in enumerate(origins):
        t = t @ tf(xyz, rpy) @ rz(q[j])
    return t


@pytest.fixture(scope="module")
def spec():
    return kinova.chain()


def test_fk_matches_oracle(spec, rng):
    for _ in range(5):
        q = rng.uniform(-2, 2, size=7)
        got = chain_mod.forward_kinematics(spec, jnp.asarray(q, jnp.float32))
        want = fk_oracle(q)
        np.testing.assert_allclose(np.asarray(got.trans), want[:3, 3], atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.rot), want[:3, :3], atol=1e-5)


def test_fk_with_base_pose(spec, rng):
    q = rng.uniform(-2, 2, size=7)
    pos = np.array([0.5, -1.0, 2.1])
    quat_xyzw = R.from_euler("ZYX", [0.3, 0.1, -0.2]).as_quat()
    base = Pose.from_xyzw(jnp.asarray(pos, jnp.float32), jnp.asarray(quat_xyzw, jnp.float32))
    got = chain_mod.forward_kinematics(
        spec, jnp.asarray(q, jnp.float32), base=base.to_transform()
    )
    base44 = np.eye(4)
    base44[:3, :3] = R.from_quat(quat_xyzw).as_matrix()
    base44[:3, 3] = pos
    want = fk_oracle(q, base44)
    np.testing.assert_allclose(np.asarray(got.trans), want[:3, 3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.rot), want[:3, :3], atol=1e-5)


def test_fk_batched_shapes(spec, rng):
    q = jnp.asarray(rng.uniform(-2, 2, size=(10, 5, 7)), jnp.float32)
    ee = chain_mod.forward_kinematics(spec, q)
    assert ee.trans.shape == (10, 5, 3)
    assert ee.rot.shape == (10, 5, 3, 3)
    # batched == loop
    one = chain_mod.forward_kinematics(spec, q[3, 2])
    np.testing.assert_allclose(np.asarray(ee.trans[3, 2]), np.asarray(one.trans), atol=1e-6)


def test_fk_jits(spec, rng):
    q = jnp.asarray(rng.uniform(-2, 2, size=(8, 7)), jnp.float32)
    fk = jax.jit(lambda q: chain_mod.forward_kinematics(spec, q).trans)
    np.testing.assert_allclose(
        np.asarray(fk(q)),
        np.asarray(chain_mod.forward_kinematics(spec, q).trans),
        atol=1e-6,
    )


def test_posquat_fk_matches_matrix_fk(spec, rng):
    """The matmul-free quaternion FK equals the matrix-chain FK."""
    from quadrotor_manipulator_mppi_tpu.utils import rotations as rotlib

    q = jnp.asarray(rng.uniform(-2, 2, size=(6, 4, 7)), jnp.float32)
    pos_q, quat_q = chain_mod.forward_kinematics_posquat(spec, q)
    ee = chain_mod.forward_kinematics(spec, q)
    np.testing.assert_allclose(np.asarray(pos_q), np.asarray(ee.trans), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rotlib.quat_to_matrix(quat_q)), np.asarray(ee.rot), atol=1e-5
    )
    # With a base pose.
    base_pos = jnp.asarray([0.3, -0.2, 2.1])
    base_quat = rotlib.quat_normalize(jnp.asarray([0.9, 0.1, -0.2, 0.3]))
    pos_b, quat_b = chain_mod.forward_kinematics_posquat(
        spec, q, base_pos=base_pos, base_quat=base_quat
    )
    base_tf = se3.Transform(rot=rotlib.quat_to_matrix(base_quat), trans=base_pos)
    ee_b = chain_mod.forward_kinematics(spec, q, base=base_tf)
    np.testing.assert_allclose(np.asarray(pos_b), np.asarray(ee_b.trans), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rotlib.quat_to_matrix(quat_b)), np.asarray(ee_b.rot), atol=1e-5
    )


def test_posquat_fk_end_effector_tip(rng):
    """Tip transform (fixed EE frame) handled in the quaternion path."""
    from quadrotor_manipulator_mppi_tpu.utils import rotations as rotlib

    hard = kinova.chain(tip="end_effector")
    q = jnp.asarray(rng.uniform(-2, 2, size=(5, 7)), jnp.float32)
    pos_q, quat_q = chain_mod.forward_kinematics_posquat(hard, q)
    ee = chain_mod.forward_kinematics(hard, q)
    np.testing.assert_allclose(np.asarray(pos_q), np.asarray(ee.trans), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rotlib.quat_to_matrix(quat_q)), np.asarray(ee.rot), atol=1e-5
    )


def test_urdf_loader_matches_hardcoded_spec(spec):
    loaded = urdf.Urdf.from_file(URDF_PATH).build_chain("world", "j2s7s300_link_7")
    np.testing.assert_allclose(loaded.origin_rot[1:], spec.origin_rot[1:], atol=1e-12)
    np.testing.assert_allclose(loaded.origin_trans, spec.origin_trans, atol=1e-12)
    # joint 0 includes the folded world mount in both
    np.testing.assert_allclose(loaded.origin_rot[0], spec.origin_rot[0], atol=1e-12)
    np.testing.assert_allclose(loaded.axis, spec.axis, atol=1e-12)
    np.testing.assert_allclose(loaded.lower, spec.lower, atol=1e-12)
    np.testing.assert_allclose(loaded.upper, spec.upper, atol=1e-12)
    q = np.linspace(-1, 1, 7)
    a = chain_mod.forward_kinematics(loaded, jnp.asarray(q, jnp.float32))
    b = chain_mod.forward_kinematics(spec, jnp.asarray(q, jnp.float32))
    np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans), atol=1e-6)


def test_urdf_end_effector_tip(spec):
    loaded = urdf.Urdf.from_file(URDF_PATH).build_chain("world", "j2s7s300_end_effector")
    hard = kinova.chain(tip="end_effector")
    q = np.full(7, 0.7)
    a = chain_mod.forward_kinematics(loaded, jnp.asarray(q, jnp.float32))
    b = chain_mod.forward_kinematics(hard, jnp.asarray(q, jnp.float32))
    np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.rot), np.asarray(b.rot), atol=1e-6)


def test_urdf_inertials_match_hardcoded():
    u = urdf.Urdf.from_file(URDF_PATH)
    loaded = u.build_inertials("world", "j2s7s300_link_7")
    hard = kinova.inertials()
    np.testing.assert_allclose(loaded.mass, hard.mass, atol=1e-12)
    np.testing.assert_allclose(loaded.com, hard.com, atol=1e-12)
    np.testing.assert_allclose(loaded.inertia, hard.inertia, atol=1e-12)


def test_transform_compose_inverse(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = se3.from_xyz_quat(jnp.asarray(rng.normal(size=3), jnp.float32), jnp.asarray(q, jnp.float32))
    ident = t.compose(t.inverse())
    np.testing.assert_allclose(np.asarray(ident.rot), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ident.trans), np.zeros(3), atol=1e-6)

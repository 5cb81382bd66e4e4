"""Rigid-body dynamics (the Pinocchio replacement) vs independent oracles.

The mass matrix is checked against a finite-difference kinetic-energy
quadratic form and the gravity torque against a finite-difference potential
gradient — both oracles built only from NumPy FK (verified separately in
test_kinematics), so no shared code paths with the RNEA under test.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.models import kinova
from quadrotor_manipulator_mppi_tpu.models import rigid_body as rb

G = 9.81


@pytest.fixture(scope="module")
def model():
    return kinova.chain(), kinova.inertials()


# --- NumPy FK for link frames (origin composition, float64) -----------------

def link_frames_np(spec, q):
    """World pose of each joint child frame: list of (R, p)."""
    rot = np.eye(3)
    pos = np.zeros(3)
    frames = []
    for j in range(spec.n_joints):
        o_r, o_t = spec.origin_rot[j], spec.origin_trans[j]
        a = spec.axis[j]
        jr = R.from_rotvec(a * q[j]).as_matrix()
        pos = pos + rot @ o_t
        rot = rot @ o_r @ jr
        frames.append((rot.copy(), pos.copy()))
    return frames


def potential_energy_np(spec, params, q):
    v = 0.0
    for j, (rot, pos) in enumerate(link_frames_np(spec, q)):
        com_w = pos + rot @ params.com[j]
        v += params.mass[j] * G * com_w[2]
    return v


def kinetic_energy_np(spec, params, q, qd, eps=1e-6):
    """KE via numerical frame velocities at q along direction qd."""
    f0 = link_frames_np(spec, q)
    f1 = link_frames_np(spec, q + eps * qd)
    ke = 0.0
    for j in range(spec.n_joints):
        r0, p0 = f0[j]
        r1, p1 = f1[j]
        omega_mat = (r1 - r0) / eps @ r0.T
        omega = np.array([omega_mat[2, 1], omega_mat[0, 2], omega_mat[1, 0]])
        com0 = p0 + r0 @ params.com[j]
        com1 = p1 + r1 @ params.com[j]
        v_com = (com1 - com0) / eps
        # inertia about COM in world coords
        iw = r0 @ params.inertia[j] @ r0.T
        ke += 0.5 * params.mass[j] * v_com @ v_com + 0.5 * omega @ iw @ omega
    return ke


def mass_matrix_np(spec, params, q):
    n = spec.n_joints
    m = np.zeros((n, n))
    eye = np.eye(n)
    for i in range(n):
        for j in range(i, n):
            ke_ij = kinetic_energy_np(spec, params, q, eye[i] + eye[j])
            ke_i = kinetic_energy_np(spec, params, q, eye[i])
            ke_j = kinetic_energy_np(spec, params, q, eye[j])
            m[i, j] = m[j, i] = ke_ij - ke_i - ke_j
    return m


def test_gravity_torque_matches_potential_gradient(model, rng):
    spec, params = model
    q = rng.uniform(-1.5, 1.5, size=7)
    got = np.asarray(rb.gravity_torque(spec, params, jnp.asarray(q, jnp.float32)))
    eps = 1e-5
    want = np.zeros(7)
    for i in range(7):
        dq = np.zeros(7)
        dq[i] = eps
        want[i] = (
            potential_energy_np(spec, params, q + dq)
            - potential_energy_np(spec, params, q - dq)
        ) / (2 * eps)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_mass_matrix_matches_energy_oracle(model, rng):
    spec, params = model
    q = rng.uniform(-1.5, 1.5, size=7)
    got = np.asarray(rb.mass_matrix(spec, params, jnp.asarray(q, jnp.float32)))
    want = mass_matrix_np(spec, params, q)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
    # symmetric positive definite
    np.testing.assert_allclose(got, got.T, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(got) > 0)


def test_rnea_forward_dynamics_roundtrip(model, rng):
    spec, params = model
    q = jnp.asarray(rng.uniform(-1.5, 1.5, size=7), jnp.float32)
    qd = jnp.asarray(rng.normal(size=7) * 0.5, jnp.float32)
    tau = jnp.asarray(rng.normal(size=7), jnp.float32)
    qdd = rb.forward_dynamics(spec, params, q, qd, tau)
    tau_back, _ = rb.rnea(spec, params, q, qd, qdd)
    np.testing.assert_allclose(np.asarray(tau_back), np.asarray(tau), rtol=1e-3, atol=1e-3)


def test_nle_consistency(model, rng):
    """rnea(q, qd, qdd) == M qdd + nle."""
    spec, params = model
    q = jnp.asarray(rng.uniform(-1.5, 1.5, size=7), jnp.float32)
    qd = jnp.asarray(rng.normal(size=7), jnp.float32)
    qdd = jnp.asarray(rng.normal(size=7), jnp.float32)
    tau, _ = rb.rnea(spec, params, q, qd, qdd)
    m = rb.mass_matrix(spec, params, q)
    nle = rb.nonlinear_effects(spec, params, q, qd)
    np.testing.assert_allclose(
        np.asarray(tau), np.asarray(m @ qdd + nle), rtol=1e-3, atol=1e-3
    )


def test_rnea_batched(model, rng):
    spec, params = model
    q = jnp.asarray(rng.uniform(-1, 1, size=(5, 7)), jnp.float32)
    qd = jnp.zeros((5, 7))
    g_batch = rb.gravity_torque(spec, params, q)
    assert g_batch.shape == (5, 7)
    one = rb.gravity_torque(spec, params, q[2])
    np.testing.assert_allclose(np.asarray(g_batch[2]), np.asarray(one), atol=1e-5)


def test_base_reaction_wrench_static(model):
    """Hanging arm at rest: mount reaction force equals total weight along
    base z (base frame = world here), independent of configuration."""
    spec, params = model
    total_w = float(np.sum(params.mass)) * G
    for q in [np.zeros(7), kinova.Q_HOME, np.linspace(-1, 1, 7)]:
        qj = jnp.asarray(q, jnp.float32)
        z = jnp.zeros(7)
        _, wrench = rb.rnea(spec, params, qj, z, z)
        f = np.asarray(wrench.lin)
        np.testing.assert_allclose(np.linalg.norm(f), total_w, rtol=1e-4)


def test_base_rotation_tilts_gravity(model):
    spec, params = model
    q = jnp.asarray(kinova.Q_HOME, jnp.float32)
    # 90-degree roll: gravity now acts along base -y instead of -z.
    base_rot = jnp.asarray(
        R.from_euler("x", np.pi / 2).as_matrix(), jnp.float32
    )
    g_tilted = rb.gravity_torque(spec, params, q, base_rot=base_rot)
    g_upright = rb.gravity_torque(spec, params, q)
    assert not np.allclose(np.asarray(g_tilted), np.asarray(g_upright), atol=1e-3)


def test_frozen_arm_coeffs_exact_at_frozen_q():
    """At the configuration the coefficients were extracted from, the
    (gravity-linear + velocity-quadratic) decomposition of the RNEA
    dynamics is EXACT: nle, forward dynamics, the base gravity moment and
    the mass matrix all match the direct per-call evaluation."""
    import numpy as np
    import jax.numpy as jnp

    from quadrotor_manipulator_mppi_tpu.models import kinova, rigid_body as rb
    from quadrotor_manipulator_mppi_tpu.models.whole_body import (
        arm_gravity_torque_fast,
    )
    from quadrotor_manipulator_mppi_tpu.utils import rotations as rot

    spec, inertials = kinova.chain("link_7"), kinova.inertials()
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-1.2, 1.2, 7), jnp.float32)
    qd = jnp.asarray(rng.uniform(-2, 2, 7), jnp.float32)
    tau = jnp.asarray(rng.uniform(-5, 5, 7), jnp.float32)
    quat = jnp.asarray(rng.uniform(-1, 1, 4), jnp.float32)
    quat = quat / jnp.linalg.norm(quat)
    base_rot = rot.quat_to_matrix(quat)

    co = rb.frozen_arm_coeffs(spec, inertials, q)
    a0 = rb.gravity_accel(base_rot, jnp.float32)

    nle_ref = rb.nonlinear_effects(spec, inertials, q, qd, base_rot=base_rot)
    assert float(jnp.max(jnp.abs(rb.frozen_nle(co, a0, qd) - nle_ref))) < 1e-4

    qdd_ref = rb.forward_dynamics(spec, inertials, q, qd, tau, base_rot=base_rot)
    qdd_f = rb.frozen_forward_dynamics(co, a0, qd, tau)
    scale = float(jnp.max(jnp.abs(qdd_ref))) + 1.0
    assert float(jnp.max(jnp.abs(qdd_f - qdd_ref))) / scale < 1e-5

    tg_ref = arm_gravity_torque_fast(spec, inertials, q, base_rot)
    tg_f = rb.frozen_gravity_torque_on_base(co, a0)
    assert float(jnp.max(jnp.abs(tg_f - tg_ref))) < 1e-4

    m_ref = rb.mass_matrix(spec, inertials, q)
    assert float(jnp.max(jnp.abs(co.mass - m_ref))) < 1e-5

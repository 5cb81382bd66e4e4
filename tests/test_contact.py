"""Penalty ground contact at the landing-gear feet + payload transfer
(reference: Gazebo/ODE resolves gear-ground collision; land logic
controller.cpp:271-278 relies on it after the motor cut)."""

import numpy as np

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.models import multirotor as mr
from quadrotor_manipulator_mppi_tpu.utils import rotations as rot

VEH = mr.MultirotorParams()
CONTACT = mr.GroundContactParams()


def drop(state0, n=3000, gear_ext=1.0):
    def tick(s, _):
        s = mr.step(
            VEH, s, jnp.zeros(8), 0.001, contact=CONTACT, gear_ext=gear_ext
        )
        return s, None

    run = jax.jit(lambda s: jax.lax.scan(tick, s, None, length=n)[0])
    return run(state0)


def test_drop_settles_on_gear_springs():
    """Free fall from 0.6 m with motors off: the vehicle lands on the gear
    springs and settles upright at gear height minus the static penetration
    mg / (4 k) ~ 1.8 mm."""
    s = drop(mr.init_state(VEH, pos=(0.0, 0.0, 0.6)))
    rest = CONTACT.gear_height - VEH.mass * 9.81 / (4 * CONTACT.stiffness)
    assert abs(float(s.pos[2]) - rest) < 0.01, f"rest z {float(s.pos[2]):.4f}"
    assert float(jnp.linalg.norm(s.vel)) < 0.02
    assert float(jnp.linalg.norm(s.omega)) < 0.05
    r = rot.quat_to_matrix(s.quat)
    assert float(r[2, 2]) > 0.999  # upright


def test_tilted_touchdown_self_rights():
    """A 0.15 rad tilted drop: the first foot to touch produces a righting
    torque (contact forces act at the foot offsets, not the COM)."""
    q0 = rot.matrix_to_quat(
        rot.euler_to_matrix(jnp.asarray([0.0, 0.0, 0.15]), "ZYX")
    )
    s0 = mr.init_state(VEH, pos=(0.0, 0.0, 0.5))._replace(quat=q0)
    s = drop(s0, n=5000)
    r = rot.quat_to_matrix(s.quat)
    assert float(r[2, 2]) > 0.995, "did not right itself"
    assert float(jnp.linalg.norm(s.vel)) < 0.05


def test_friction_stops_lateral_slide():
    s0 = mr.init_state(VEH, pos=(0.0, 0.0, CONTACT.gear_height))._replace(
        vel=jnp.asarray([1.0, 0.0, 0.0])
    )
    s = drop(s0, n=4000)
    assert float(jnp.abs(s.vel[0])) < 0.02, f"still sliding: {float(s.vel[0]):.3f}"
    # Slid a finite distance, then Coulomb friction pinned it.
    assert 0.01 < float(s.pos[0]) < 2.0


def test_belly_contact_when_gear_retracted():
    s = drop(mr.init_state(VEH, pos=(0.0, 0.0, 0.4)), gear_ext=0.0)
    rest = CONTACT.belly_height - VEH.mass * 9.81 / (4 * CONTACT.stiffness)
    assert abs(float(s.pos[2]) - rest) < 0.01


def test_payload_point_mass_effects():
    m, r_b = 0.5, jnp.asarray([0.2, 0.0, -0.4])
    mr_arm, di = mr.payload_point_mass_effects(m, r_b)
    np.testing.assert_allclose(np.asarray(mr_arm), [0.1, 0.0, -0.2], atol=1e-6)
    # Parallel-axis diagonal: m * (|r|^2 - r_i^2).
    r2 = 0.2**2 + 0.4**2
    np.testing.assert_allclose(
        np.asarray(di), [m * (r2 - 0.04), m * r2, m * (r2 - 0.16)], atol=1e-6
    )


def test_contact_free_flight_unaffected():
    """Above the ground the contact path adds exactly nothing."""
    s0 = mr.init_state(VEH, pos=(0.0, 0.0, 2.0))
    s0 = s0._replace(rotor_speed=jnp.full((8,), VEH.hover_rotor_speed()))
    cmd = jnp.full((8,), VEH.hover_rotor_speed())
    a = mr.step(VEH, s0, cmd, 0.001, contact=CONTACT)
    b = mr.step(VEH, s0, cmd, 0.001)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-7)

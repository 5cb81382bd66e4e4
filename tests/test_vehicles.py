"""Stock MAV vehicle library (rotors_description / resource-yaml analog)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.models import multirotor as mr
from quadrotor_manipulator_mppi_tpu.models import vehicles
from quadrotor_manipulator_mppi_tpu.sim import closed_loop as cl
from quadrotor_manipulator_mppi_tpu.sim import flight_control as fc
from quadrotor_manipulator_mppi_tpu.sim import lee_controller as lee


def test_registry():
    assert set(vehicles.names()) == {
        "harrier", "firefly", "hummingbird", "pelican", "iris", "neo11",
        "ardrone",
    }
    with pytest.raises(KeyError, match="unknown vehicle"):
        vehicles.get("techpod")


def test_hummingbird_allocation_matches_rotors_formula():
    """Plus-quad allocation per rotors_control/common.h:79-97: rotor 0 at
    angle 0 contributes no roll, -l*kf pitch, +kf*km yaw (direction -1)."""
    veh = vehicles.hummingbird()
    a = veh.allocation_matrix()
    kf, km, l = 8.54858e-6, 1.6e-2, 0.17
    np.testing.assert_allclose(a[:, 0], [0.0, -l * kf, kf * km, kf], atol=1e-12)
    # Rotor 1 at +pi/2, direction +1: +l*kf roll, ~0 pitch, -kf*km yaw.
    np.testing.assert_allclose(a[:, 1], [l * kf, 0.0, -kf * km, kf], atol=1e-12)
    # Full-rank wrench authority.
    assert np.linalg.matrix_rank(a) == 4
    # pinv is an exact right inverse.
    np.testing.assert_allclose(a @ veh.allocation_pinv(), np.eye(4), atol=1e-9)


@pytest.mark.parametrize("name", vehicles.names())
def test_hover_equilibrium_every_vehicle(name):
    """At TRIM rotor speeds every preset balances gravity: 0.2 s of physics
    moves the vehicle less than a millimeter.  Trim comes from the
    allocation pseudo-inverse (equal speeds are NOT trim for the asymmetric
    iris layout — its arms differ front/rear)."""
    veh = vehicles.get(name)
    w2 = veh.allocation_pinv() @ np.array([0.0, 0.0, 0.0, veh.mass * mr.GRAVITY])
    trim = jnp.asarray(np.sqrt(np.maximum(w2, 0.0)), jnp.float32)
    s = mr.init_state(veh, pos=(0.0, 0.0, 2.0))
    s = s._replace(rotor_speed=trim)
    cmd = trim

    def tick(st, _):
        return mr.step(veh, st, cmd, 0.001), None

    s, _ = jax.jit(lambda s0: jax.lax.scan(tick, s0, None, length=200))(s)
    np.testing.assert_allclose(np.asarray(s.pos), [0.0, 0.0, 2.0], atol=1e-3)
    assert float(jnp.linalg.norm(s.omega)) < 1e-3


@pytest.mark.parametrize("name", ["firefly", "iris", "hummingbird"])
def test_lee_hover_stock_vehicle(name):
    """The reference's canonical demo (mav_hovering_example: firefly + Lee
    controller) on the stock presets: settle to the hover target."""
    veh = vehicles.get(name)
    gains = vehicles.lee_gains(name)
    sp = lee.LeeSetpoint([0.0, 0.0, 2.0])
    s = mr.init_state(veh, pos=(0.3, -0.2, 1.5))
    s = s._replace(rotor_speed=jnp.full((veh.n_rotors,), veh.hover_rotor_speed()))

    def tick(st, _):
        u = lee.lee_control(gains, veh, sp, pos=st.pos, vel_world=st.vel,
                            quat=st.quat, omega_body=st.omega)
        st = mr.step(veh, st, fc.allocate(veh, u), 0.001)
        return st, st.pos

    _, pos = jax.jit(lambda s0: jax.lax.scan(tick, s0, None, length=5000))(s)
    err = np.linalg.norm(np.asarray(pos) - [0.0, 0.0, 2.0], axis=-1)
    assert err[-1] < 0.03, f"{name}: final err {err[-1]:.3f}"
    assert err[-500:].max() < 0.05, f"{name}: not settled"

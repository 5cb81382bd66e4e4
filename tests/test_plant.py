"""Multirotor plant + inner-loop flight controller tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.models import multirotor as mr
from quadrotor_manipulator_mppi_tpu.sim import flight_control as fc
from quadrotor_manipulator_mppi_tpu.sim import closed_loop as cl

VEH = mr.MultirotorParams()
GAINS = fc.FlightGains()


def test_allocation_roundtrip():
    """allocate() then the rotor wrench reproduces the commanded [T, tau]."""
    u = jnp.asarray([150.0, 0.5, -0.3, 0.2])
    w = fc.allocate(VEH, u)
    assert w.shape == (8,)
    alloc = jnp.asarray(VEH.allocation_matrix(), jnp.float32)
    tau_t = alloc @ (w * w)
    np.testing.assert_allclose(
        np.asarray(tau_t), np.asarray(jnp.concatenate([u[1:4], u[0:1]])),
        rtol=1e-4, atol=1e-4,
    )


def test_hover_rotor_speed_balances_gravity():
    w_h = VEH.hover_rotor_speed()
    thrust = VEH.n_rotors * VEH.motor_constant * w_h**2
    np.testing.assert_allclose(thrust, VEH.mass * 9.81, rtol=1e-6)
    assert w_h < VEH.max_rotor_speed


def test_rotor_lag_asymmetric():
    s0 = jnp.full((8,), 100.0)
    up = mr.rotor_lag(VEH, s0, jnp.full((8,), 200.0), 0.01)
    down = mr.rotor_lag(VEH, s0, jnp.full((8,), 0.0), 0.01)
    # tau_up (0.0125) < tau_down (0.025): spin-up moves further per step.
    assert float(up[0] - 100.0) > float(100.0 - down[0])


def test_plant_hover_equilibrium():
    """At exact hover rotor speed the plant drifts negligibly over 1 s."""
    state = mr.init_state(VEH, pos=(0.0, 0.0, 2.0))
    w_h = VEH.hover_rotor_speed()
    state = state._replace(rotor_speed=jnp.full((8,), w_h))
    cmd = jnp.full((8,), w_h)

    def body(s, _):
        return mr.step(VEH, s, cmd, 0.001), None

    final, _ = jax.lax.scan(body, state, None, length=1000)
    np.testing.assert_allclose(np.asarray(final.pos), [0, 0, 2.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(final.vel), 0.0, atol=1e-3)


@pytest.mark.parametrize("law", ["pid", "backstepping"])
def test_flight_controller_tracks_setpoint(law):
    """Inner loop alone flies the plant from 2.0 m to (0.5, -0.3, 2.5).

    The adaptive backstepping law (the reference's primary controller) is
    stable with the reference's own yaml gains; the PID variant needs the
    sim-tuned set (see SIM_TUNED_GAINS rationale)."""
    sp = fc.hover_setpoint([0.5, -0.3, 2.5])
    state = mr.init_state(VEH, pos=(0.0, 0.0, 2.0))
    state = state._replace(rotor_speed=jnp.full((8,), VEH.hover_rotor_speed()))
    ctrl = fc.init_ctrl_state(VEH.mass)
    ctrl_fn = fc.pid_step if law == "pid" else fc.backstepping_step
    gains = fc.SIM_TUNED_GAINS if law == "pid" else fc.FlightGains()

    def tick(carry, _):
        plant, c = carry
        u, c = ctrl_fn(
            gains, VEH, c, sp,
            pos=plant.pos, vel_world=plant.vel,
            rpy=cl.rpy_of(plant), omega_body=plant.omega, dt=0.001,
        )
        plant = mr.step(VEH, plant, fc.allocate(VEH, u), 0.001)
        return (plant, c), plant.pos

    run = jax.jit(lambda c0: jax.lax.scan(tick, c0, None, length=8000))
    (final, _), pos_log = run((state, ctrl))
    err = np.linalg.norm(np.asarray(final.pos) - np.asarray(sp.pos))
    assert err < 0.1, f"{law}: final error {err:.3f}, pos {np.asarray(final.pos)}"
    assert np.all(np.isfinite(np.asarray(pos_log)))


def test_roll_pitch_yawrate_thrust_controller():
    """Attitude-command law: plant tracks commanded roll while hovering."""
    state = mr.init_state(VEH, pos=(0.0, 0.0, 2.0))
    state = state._replace(rotor_speed=jnp.full((8,), VEH.hover_rotor_speed()))
    thrust = jnp.asarray(VEH.mass * 9.81 / np.cos(0.1))

    def tick(plant, _):
        rpy = cl.rpy_of(plant)
        u = fc.roll_pitch_yawrate_thrust_step(
            VEH, roll_des=jnp.asarray(0.1), pitch_des=jnp.asarray(0.0),
            yaw_rate_des=jnp.asarray(0.0), thrust=thrust,
            rpy=rpy, omega_body=plant.omega,
        )
        plant = mr.step(VEH, plant, fc.allocate(VEH, u), 0.001)
        return plant, rpy

    run = jax.jit(lambda p: jax.lax.scan(tick, p, None, length=2000))
    final, rpy_log = run(state)
    roll_end = float(np.asarray(rpy_log)[-1, 0])
    assert abs(roll_end - 0.1) < 0.02, f"roll {roll_end:.3f}"


def test_step12_consistent_with_full_plant_hover():
    """Reduced 12-state model and full model agree on a short hover segment
    driven by a pure gravity-balancing wrench."""
    m = VEH.mass
    u = jnp.asarray([m * 9.81, 0.0, 0.0, 0.0])
    s12 = mr.Multirotor12State(
        pos=jnp.asarray([0.0, 0.0, 2.0]),
        rpy=jnp.zeros(3),
        vel=jnp.zeros(3),
        omega=jnp.zeros(3),
    )
    for _ in range(100):
        s12 = mr.step12(VEH, s12, u, 0.001)
    np.testing.assert_allclose(np.asarray(s12.pos), [0, 0, 2.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(s12.rpy), 0.0, atol=1e-6)

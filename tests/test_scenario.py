"""Mission state machine: takeoff -> cruise -> land, driven by the real plant."""

import numpy as np

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.models import multirotor as mr
from quadrotor_manipulator_mppi_tpu.sim import closed_loop as cl
from quadrotor_manipulator_mppi_tpu.sim import flight_control as fc
from quadrotor_manipulator_mppi_tpu.sim import scenario

VEH = mr.MultirotorParams()


def test_full_mission_episode():
    cfg = scenario.MissionConfig()
    gains = fc.FlightGains()

    mission0 = scenario.init_mission()
    plant0 = mr.init_state(VEH, pos=(0.0, 0.0, 0.1))
    ctrl0 = fc.init_ctrl_state(VEH.mass)

    def tick(carry, t):
        plant, ctrl, mission = carry
        # Issue the Land command at t = 12 s.
        mission = mission._replace(land_cmd=mission.land_cmd | (t > 12000))
        mission, sp, motors_on = scenario.mission_step(
            cfg, mission, plant.pos, plant.vel, 0.001
        )
        u, ctrl = fc.backstepping_step(
            gains, VEH, ctrl, sp,
            pos=plant.pos, vel_world=plant.vel,
            rpy=cl.rpy_of(plant), omega_body=plant.omega, dt=0.001,
        )
        rotor_cmd = fc.allocate(VEH, u) * motors_on
        plant = mr.step(VEH, plant, rotor_cmd, 0.001)
        return (plant, ctrl, mission), (plant.pos[2], mission.phase, mission.gear)

    run = jax.jit(
        lambda c0: jax.lax.scan(tick, c0, jnp.arange(20000))
    )
    (plant, _, mission), (z_log, phase_log, gear_log) = run(
        (plant0, ctrl0, mission0)
    )
    z = np.asarray(z_log)
    phases = np.asarray(phase_log)
    gear = np.asarray(gear_log)

    # Took off and cruised near 2.1 m.
    assert scenario.CRUISE in phases
    cruise_idx = np.where(phases == scenario.CRUISE)[0]
    assert z[cruise_idx].max() > 1.95
    # Gear retracted during cruise, re-extended for landing.
    assert gear[cruise_idx[-1]] < 0.1
    # Landed: phase LANDED reached, altitude low, motors cut.
    assert int(mission.phase) == scenario.LANDED
    assert z[-1] < 0.6
    assert float(np.asarray(plant.rotor_speed).max()) < 1.0


def test_gripper_payload_attach():
    cfg = scenario.MissionConfig()
    m = scenario.init_mission()._replace(gripper_cmd=jnp.ones(()))
    pos = jnp.asarray([0.0, 0.0, 2.1])
    vel = jnp.zeros(3)
    for _ in range(40):
        m, _, _ = scenario.mission_step(cfg, m, pos, vel, 0.01)
    assert bool(m.payload_attached)
    assert float(scenario.payload_mass(cfg, m)) == cfg.payload_mass

"""Closed-loop integration: MPPI setpoints -> inner loop -> plant.

Mirrors the reference's drone flow (SURVEY.md section 3.4): the drone MPPI
emits (xdes, vdes) setpoints which the plant-side flight controller tracks —
here entirely inside one jitted scan, evaluated with the rotors_evaluation
parity metrics.
"""

import numpy as np

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.evaluation import metrics
from quadrotor_manipulator_mppi_tpu.models import multirotor as mr
from quadrotor_manipulator_mppi_tpu.sim import closed_loop as cl
from quadrotor_manipulator_mppi_tpu.sim import flight_control as fc
from quadrotor_manipulator_mppi_tpu.solver import drone as drone_solver
from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig

VEH = mr.MultirotorParams()


def test_drone_mppi_drives_plant_to_waypoint():
    target = jnp.asarray([1.0, 2.0, 3.4])  # the reference waypoint
    params = drone_solver.DroneMPPIParams(
        mppi=MPPIConfig(
            n_samples=256, n_horizon=32, n_action=3,
            dt=0.01, lam=0.1, sigma=30.0, savgol_window=5,
        )
    )
    step, init = drone_solver.make_drone_solver(params)
    cfg = cl.LoopConfig(controller="backstepping")

    run = cl.make_episode(
        cfg,
        VEH,
        fc.FlightGains(),
        solver_step=step,
        make_obs=lambda plant: drone_solver.DroneObs(
            x=plant.pos, v=plant.vel, target=target
        ),
        # The reference topic /harrierD7/drone_pose carries position only
        # (drone.py:239-241 -> controller.cpp:667-673); feeding vdes as
        # velocity feed-forward would make the inner loop chase the commanded
        # velocity instead of correcting position.
        setpoint_of=lambda out, plant: fc.hover_setpoint(out.xdes),
        n_control_steps=2000,  # 20 s at 100 Hz (inner loop bandwidth ~1 rad/s)
    )
    state0 = cl.init_loop_state(cfg, VEH, init(jax.random.key(0)), pos=(0.0, 0.0, 2.0))
    final, (pos, rpy, vel) = jax.jit(run)(state0)

    pos = np.asarray(pos)
    assert np.all(np.isfinite(pos))
    err = np.linalg.norm(pos - np.asarray(target), axis=-1)
    # Reached the waypoint region and stayed in the neighborhood.  The
    # reference architecture (noisy point-mass MPPI emitting position-only
    # setpoints one dt ahead, tracked by a ~1 rad/s inner loop) gives loose
    # tracking by construction.
    assert err.min() < 0.8, f"min err {err.min():.3f}"
    assert err[1000:].mean() < 1.5, f"late mean err {err[1000:].mean():.3f}"


def test_hover_metrics_on_inner_loop():
    """Pure inner-loop hover passes the reference's hovering_eval thresholds."""
    cfg = cl.LoopConfig(controller="backstepping")
    target = jnp.asarray([0.0, 0.0, 2.0])

    def null_solver(state, obs):
        return None, state

    run = cl.make_episode(
        cfg,
        VEH,
        fc.FlightGains(),
        solver_step=null_solver,
        make_obs=lambda plant: None,
        setpoint_of=lambda out, plant: fc.hover_setpoint(target),
        n_control_steps=400,
    )
    state0 = cl.init_loop_state(cfg, VEH, None, pos=(0.0, 0.0, 2.0))
    _, (pos, rpy, vel) = jax.jit(run)(state0)

    m = metrics.hover_metrics(
        jnp.asarray(pos), jnp.zeros_like(jnp.asarray(pos)), target, dt=0.01
    )
    assert bool(m.passed), f"pos_rms {float(m.pos_rms):.3f}"
    assert float(m.pos_rms) < 0.05

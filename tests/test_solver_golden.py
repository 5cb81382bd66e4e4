"""Golden tests: JAX solvers vs the NumPy oracle with injected noise
(SURVEY.md section 4 strategy (b)), plus reach behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.models import chain as chain_mod
from quadrotor_manipulator_mppi_tpu.models import kinova
from quadrotor_manipulator_mppi_tpu.ops import costs, integrators, weights
from quadrotor_manipulator_mppi_tpu.solver import arm as arm_solver
from quadrotor_manipulator_mppi_tpu.solver import drone as drone_solver
from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIState
from quadrotor_manipulator_mppi_tpu.utils.pose import Pose

import oracle


def test_double_integrate_matches_oracle(rng):
    accel = rng.normal(size=(16, 32, 7))
    q0 = rng.normal(size=7)
    v0 = rng.normal(size=7)
    q, v = integrators.double_integrate(jnp.asarray(accel), jnp.asarray(q0), jnp.asarray(v0), 0.01)
    q_w, v_w = oracle.double_integrate(accel, q0, v0, 0.01)
    np.testing.assert_allclose(np.asarray(q), q_w, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), v_w, atol=1e-6)


def test_softmin_weights_matches_oracle(rng):
    s = rng.uniform(0, 100, size=256)
    got = np.asarray(weights.softmin_weights(jnp.asarray(s), 0.1))
    want = oracle.softmin_weights(s, 0.1)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-5


def test_drone_solve_matches_oracle_with_injected_noise(rng):
    """Full drone MPPI update vs oracle, bit-level noise injection."""
    k, h, a = 64, 32, 3
    noise = rng.normal(size=(k, h, a)) * 30.0
    u_prev = rng.normal(size=(h, a))
    x0, v0 = np.array([0.0, 0.0, 1.0]), np.array([0.1, -0.2, 0.0])
    target = np.array(drone_solver.DEFAULT_TARGET)

    # JAX path with the same math, noise injected by monkeypatching sampling.
    v = jnp.asarray(u_prev)[None] + jnp.asarray(noise)
    traj, _ = integrators.double_integrate(v, jnp.asarray(x0), jnp.asarray(v0), 0.01)
    s = costs.position_stage_cost(traj, jnp.asarray(target), 100.0)
    s = s + costs.position_terminal_cost(traj, jnp.asarray(target), 20.0)
    w = weights.softmin_weights(s, 0.1)
    du = weights.weighted_noise_average(w, jnp.asarray(noise))
    from quadrotor_manipulator_mppi_tpu.utils import savgol

    du = savgol.smooth(du, 5, 2)
    u = jnp.asarray(u_prev) + du

    u_want, xdes_want, vdes_want = oracle.drone_mppi_update(
        u_prev, noise, x0, v0, target
    )
    np.testing.assert_allclose(np.asarray(u), u_want, rtol=1e-4, atol=1e-5)

    u0 = np.asarray(u)[0]
    np.testing.assert_allclose(v0 + 0.01 * u0, vdes_want, atol=1e-5)
    np.testing.assert_allclose(x0 + v0 * 0.01 + 0.5 * u0 * 1e-4, xdes_want, atol=1e-6)


def test_arm_cost_matches_oracle(rng):
    """Pose stage+terminal cost on real FK trajectories vs oracle."""
    spec = kinova.chain()
    k, h = 8, 8
    q = rng.uniform(-1.5, 1.5, size=(k, h, 7))
    ee = chain_mod.forward_kinematics(spec, jnp.asarray(q, jnp.float32))
    target = arm_solver.default_target()
    got = costs.pose_stage_cost(
        ee.trans, ee.rot, target.position, target.rotation_matrix, 50.0, 30.0
    ) + costs.pose_terminal_cost(
        ee.trans, ee.rot, target.position, target.rotation_matrix, 40.0, 30.0
    )
    want = oracle.pose_costs(
        np.asarray(ee.trans, np.float64),
        np.asarray(ee.rot, np.float64),
        np.asarray(target.position),
        np.asarray(target.rotation_matrix),
        50.0, 30.0, 40.0, 30.0,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_arm_solve_matches_oracle_end_to_end(rng):
    """Full arm MPPI update (sampling -> double integration -> FK -> pose
    costs -> softmin -> SavGol -> warm start -> qdes/vdes) vs the NumPy
    oracle with injected noise — the 'bit-comparable control trajectories'
    parity check at reduced K/H."""
    from scipy.spatial.transform import Rotation as R

    from quadrotor_manipulator_mppi_tpu.models import chain as chain_mod
    from quadrotor_manipulator_mppi_tpu.ops import weights as w_ops
    from quadrotor_manipulator_mppi_tpu.utils import savgol as savgol_mod

    spec = kinova.chain()
    k, h, a = 16, 16, 7
    noise = rng.normal(size=(k, h, a)) * 0.1
    u_prev = rng.normal(size=(h, a)) * 0.05
    q0 = np.asarray(kinova.Q_HOME)
    qdot0 = rng.normal(size=a) * 0.1
    base_pos = np.array([0.0, 0.0, 2.1])
    target = arm_solver.default_target()
    target_pos = np.asarray(target.position) + 0.0
    target_rot = np.asarray(target.rotation_matrix)

    # JAX pipeline with the same injected noise (mirrors make_arm_solver's
    # internals minus the PRNG draw).
    v = jnp.asarray(u_prev, jnp.float32)[None] + jnp.asarray(noise, jnp.float32)
    q_s, _ = integrators.double_integrate(
        v, jnp.asarray(q0, jnp.float32), jnp.asarray(qdot0, jnp.float32), 0.01
    )
    ee_pos, ee_quat = chain_mod.forward_kinematics_posquat(
        spec, q_s,
        base_pos=jnp.asarray(base_pos, jnp.float32),
        base_quat=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
    )
    s = costs.pose_stage_cost_pq(
        ee_pos, ee_quat, jnp.asarray(target_pos, jnp.float32),
        target.quat, 50.0, 30.0, "euler_zyx",
    ) + costs.pose_terminal_cost_pq(
        ee_pos, ee_quat, jnp.asarray(target_pos, jnp.float32),
        target.quat, 40.0, 30.0, "euler_zyx",
    )
    w = w_ops.softmin_weights(s, 0.1)
    du = savgol_mod.smooth(
        w_ops.weighted_noise_average(w, jnp.asarray(noise, jnp.float32)), 9, 2
    )
    u_jax = np.asarray(jnp.asarray(u_prev, jnp.float32) + du)

    # NumPy oracle with its own float64 FK built from the raw URDF table.
    from test_kinematics import fk_oracle

    def fk_fn(q):
        base44 = np.eye(4)
        base44[:3, 3] = base_pos
        return fk_oracle(q, base44)

    u_oracle, qdes_o, vdes_o = oracle.arm_mppi_update(
        u_prev, noise, q0, qdot0, fk_fn, target_pos, target_rot
    )
    np.testing.assert_allclose(u_jax, u_oracle, rtol=5e-3, atol=5e-4)


def test_drone_closed_loop_reaches_target():
    """Jitted drone solver + point-mass plant reaches [1, 2, 3.4] (the
    reference's hardcoded waypoint) from rest — the SURVEY.md minimum
    end-to-end slice.  The reference controller has no action/velocity
    penalty and sigma=30, so after reaching it station-keeps loosely around
    the target; assert reach + bounded wander, not tight convergence."""
    from quadrotor_manipulator_mppi_tpu.models.point_mass import (
        PointMassState,
        step as pm_step,
    )

    step, init = drone_solver.make_drone_solver()
    target = jnp.asarray(drone_solver.DEFAULT_TARGET)
    dt = 0.01

    def body(carry, _):
        st, solver = carry
        out, solver = step(
            solver, drone_solver.DroneObs(x=st.pos, v=st.vel, target=target)
        )
        st = pm_step(st, out.u_seq[0], dt)
        return (st, solver), jnp.linalg.norm(st.pos - target)

    run = jax.jit(
        lambda c0: jax.lax.scan(body, c0, None, length=800)[1]
    )
    errs = np.asarray(
        run((PointMassState(jnp.zeros(3), jnp.zeros(3)), init(jax.random.key(0))))
    )
    assert errs.min() < 0.15, f"never reached: min err {errs.min():.3f}"
    assert errs[300:].mean() < 0.6, f"diverged: late mean {errs[300:].mean():.3f}"


def test_arm_solver_runs_and_improves():
    """Arm MPPI from home posture decreases EE error toward the reference
    demo target over solves (full convergence is exercised in closed-loop
    sim tests; here we check the solver makes monotonic-ish progress)."""
    params = arm_solver.ArmMPPIParams()
    step, init = arm_solver.make_arm_solver(params)
    # The reference runs this solver with the drone hovering at ~2.1 m
    # (launch/aerial_manipulator.launch hover target) and the arm hanging
    # inverted below it; its world-frame demo target (mppi.py:71-73) is only
    # reachable from there.
    base = Pose(position=jnp.asarray([0.0, 0.0, 2.1]), quat=jnp.asarray([1.0, 0, 0, 0]))
    target = arm_solver.default_target()

    def body(carry, _):
        q, qdot, state = carry
        obs = arm_solver.ArmObs(q=q, qdot=qdot, base_pose=base, target=target)
        out, state = step(state, obs)
        return (out.qdes, out.vdes, state), out.ee_target_err  # ideal tracking

    run = jax.jit(lambda c0: jax.lax.scan(body, c0, None, length=150)[1])
    errs = np.asarray(
        run((jnp.asarray(kinova.Q_HOME, jnp.float32), jnp.zeros(7), init(jax.random.key(1))))
    )
    # K=100/sigma=0.1 with no action cost reaches, then wanders near the
    # target (the reference solver shares this behavior by construction).
    assert errs.min() < 0.15, f"never approached: min {errs.min():.3f}"
    assert errs[-1] < errs[0], f"diverged: {errs[0]:.3f} -> {errs[-1]:.3f}"


def test_adaptive_sigma_tracks_accepted_noise():
    """CVIS-style covariance adaptation: sigma stays within its clip bounds,
    moves away from the initial value, and the solver still converges."""
    import dataclasses

    from quadrotor_manipulator_mppi_tpu.models.point_mass import (
        PointMassState,
        step as pm_step,
    )

    base = drone_solver.DroneMPPIParams()
    params = dataclasses.replace(
        base,
        mppi=dataclasses.replace(
            base.mppi, n_samples=256, adaptive_sigma=True, adapt_beta=0.2
        ),
    )
    step, init = drone_solver.make_drone_solver(params)
    target = jnp.asarray(drone_solver.DEFAULT_TARGET)

    def body(carry, _):
        st, solver = carry
        out, solver = step(
            solver, drone_solver.DroneObs(x=st.pos, v=st.vel, target=target)
        )
        st = pm_step(st, out.u_seq[0], 0.01)
        return (st, solver), (jnp.linalg.norm(st.pos - target), solver.sigma)

    run = jax.jit(lambda c0: jax.lax.scan(body, c0, None, length=300)[1])
    errs, sigmas = run(
        (PointMassState(jnp.zeros(3), jnp.zeros(3)), init(jax.random.key(0)))
    )
    errs, sigmas = np.asarray(errs), np.asarray(sigmas)
    assert np.all(np.isfinite(sigmas))
    assert np.all(sigmas >= 0.3 * 30.0 - 1e-3)
    assert np.all(sigmas <= 3.0 * 30.0 + 1e-3)
    assert abs(sigmas[-1] - 30.0).max() > 0.5, "sigma never adapted"
    assert errs.min() < 0.3


def test_solver_state_is_deterministic():
    step, init = drone_solver.make_drone_solver()
    step = jax.jit(step)
    obs = drone_solver.DroneObs(
        x=jnp.zeros(3), v=jnp.zeros(3), target=jnp.asarray([1.0, 2.0, 3.4])
    )
    o1, _ = step(init(jax.random.key(7)), obs)
    o2, _ = step(init(jax.random.key(7)), obs)
    np.testing.assert_array_equal(np.asarray(o1.u_seq), np.asarray(o2.u_seq))

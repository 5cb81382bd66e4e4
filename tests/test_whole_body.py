"""Whole-body coupled model and solver tests."""

import numpy as np

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.models import kinova
from quadrotor_manipulator_mppi_tpu.models import whole_body as wbm
from quadrotor_manipulator_mppi_tpu.models.multirotor import Multirotor12State
from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs
from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig


def small_params(k=32, h=10):
    return wbs.WholeBodyMPPIParams(
        mppi=MPPIConfig(
            n_samples=k, n_horizon=h, n_action=wbs.N_ACTIONS,
            dt=0.01, lam=0.1, sigma=wbs.default_sigma(), savgol_window=5,
        )
    )


def test_rollout_shapes_and_finiteness():
    params = small_params()
    obs = wbs.default_obs()
    k, h = 32, 10
    actions = jnp.broadcast_to(
        wbm.hover_nominal_action(params.model, h), (k, h, wbs.N_ACTIONS)
    )
    ee, q, qdot, base = wbm.rollout(params.model, obs.state, actions, 0.01)
    assert ee.position.shape == (k, h, 3)
    assert ee.quat.shape == (k, h, 4)
    assert q.shape == (k, h, 7)
    assert base.pos.shape == (k, h, 3)
    for leaf in (ee.position, ee.quat, q, qdot, base.pos, base.quat, base.vel):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_parallel_rollout_matches_scan_rollout():
    """The associative-scan rollout equals the sequential euler-angle scan to
    first order in dt (both are first-order integrators of the same ODE)."""
    import dataclasses

    obs = wbs.default_obs()
    k, h, dt = 16, 40, 0.01
    key = jax.random.key(3)
    noise = jax.random.normal(key, (k, h, wbs.N_ACTIONS)) * jnp.asarray(
        wbs.default_sigma(), jnp.float32
    )
    actions = wbm.hover_nominal_action(wbm.WholeBodyParams(), h)[None] + noise

    p_par = wbm.WholeBodyParams(time_parallel=True)
    p_seq = wbm.WholeBodyParams(time_parallel=False)
    ee_p, q_p, _, base_p = wbm.rollout(p_par, obs.state, actions, dt)
    ee_s, q_s, _, base_s = wbm.rollout(p_seq, obs.state, actions, dt)

    np.testing.assert_allclose(np.asarray(q_p), np.asarray(q_s), atol=1e-5)
    # Attitude discretizations differ at O(dt^2 * omega^2); over 0.4 s with
    # torque noise they stay within millimeters/milliradians.
    np.testing.assert_allclose(
        np.asarray(base_p.pos), np.asarray(base_s.pos), atol=2e-2
    )
    # Quaternion sign canonicalization may differ; compare via dot product.
    qd = np.abs(np.sum(np.asarray(base_p.quat) * np.asarray(base_s.quat), axis=-1))
    assert qd.min() > 1 - 2e-4, f"quat mismatch: min dot {qd.min()}"
    np.testing.assert_allclose(
        np.asarray(ee_p.position), np.asarray(ee_s.position), atol=3e-2
    )


def test_hover_nominal_holds_altitude():
    """Gravity-balancing nominal keeps the coupled base near its altitude
    (small sag from the arm-gravity coupling is expected, since the nominal
    thrust includes the arm lump mass which the coupling also injects)."""
    params = small_params(k=1, h=50)
    obs = wbs.default_obs()
    actions = wbm.hover_nominal_action(params.model, 50)[None]
    ee, q, qdot, base = wbm.rollout(params.model, obs.state, actions, 0.01)
    z = np.asarray(base.pos[0, :, 2])
    assert abs(z[-1] - 2.1) < 0.2, f"altitude drifted to {z[-1]}"


def test_arm_gravity_wrench_magnitude():
    """Static arm reaction force equals total arm weight."""
    spec = kinova.chain()
    params = kinova.inertials()
    q = jnp.asarray(kinova.Q_HOME, jnp.float32)
    f, tau = wbm.arm_gravity_wrench(spec, params, q, jnp.eye(3))
    total_w = float(np.sum(params.mass)) * 9.81
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f)), total_w, rtol=1e-4)


def test_fast_gravity_torque_matches_rnea_wrench(rng):
    """The COM-moment shortcut equals the RNEA wrench torque, including under
    a tilted base."""
    from scipy.spatial.transform import Rotation as R

    spec = kinova.chain()
    params = kinova.inertials()
    for _ in range(3):
        q = jnp.asarray(rng.uniform(-1.5, 1.5, size=(4, 7)), jnp.float32)
        base_rot = jnp.asarray(
            R.from_euler("ZYX", rng.uniform(-0.5, 0.5, size=3)).as_matrix(),
            jnp.float32,
        )
        _, tau_rnea = wbm.arm_gravity_wrench(
            spec, params, q, jnp.broadcast_to(base_rot, (4, 3, 3))
        )
        tau_fast = wbm.arm_gravity_torque_fast(spec, params, q, base_rot)
        np.testing.assert_allclose(
            np.asarray(tau_fast), np.asarray(tau_rnea), rtol=1e-3, atol=1e-4
        )


def test_whole_body_solver_improves_ee_error():
    params = wbs.WholeBodyMPPIParams(
        mppi=MPPIConfig(
            n_samples=256, n_horizon=25, n_action=wbs.N_ACTIONS,
            dt=0.01, lam=0.1, sigma=wbs.default_sigma(), savgol_window=9,
        )
    )
    step, init = wbs.make_whole_body_solver(
        params, low_k_guard="off"  # intentional tiny smoke shape
    )
    obs0 = wbs.default_obs()

    from quadrotor_manipulator_mppi_tpu.models import chain as chain_mod
    from quadrotor_manipulator_mppi_tpu.models.multirotor import step12
    from quadrotor_manipulator_mppi_tpu.models.whole_body import (
        WholeBodyState,
        base_rotation,
    )
    from quadrotor_manipulator_mppi_tpu.ops import integrators
    from quadrotor_manipulator_mppi_tpu.utils import se3

    spec = params.model.chain()

    def ee_err(state):
        base_tf = se3.Transform(
            rot=base_rotation(state.base), trans=state.base.pos
        )
        ee = chain_mod.forward_kinematics(spec, state.q, base=base_tf)
        return jnp.linalg.norm(ee.trans - obs0.ee_target.position)

    def body(carry, _):
        state, solver = carry
        obs = wbs.WholeBodyObs(
            state=state, ee_target=obs0.ee_target, base_target=obs0.base_target
        )
        out, solver = step(solver, obs)
        # Plant == rollout model (perfect-model MPC): apply the first action.
        base = step12(
            params.model.vehicle, state.base, out.action[:4], 0.01,
            extra_mass=params.model.arm_mass_lump,
        )
        qdot = state.qdot + out.action[4:] * 0.01
        q = state.q + state.qdot * 0.01 + 0.5 * out.action[4:] * 1e-4
        state = WholeBodyState(base=base, q=q, qdot=qdot)
        return (state, solver), ee_err(state)

    run = jax.jit(lambda c0: jax.lax.scan(body, c0, None, length=200)[1])
    errs = np.asarray(run((obs0.state, init(jax.random.key(0)))))
    assert np.all(np.isfinite(errs))
    assert errs.min() < errs[0] * 0.6, f"no improvement: {errs[0]:.3f} -> min {errs.min():.3f}"


def test_obstacle_cost_steers_samples():
    from quadrotor_manipulator_mppi_tpu.ops import costs

    points = jnp.zeros((4, 10, 3))  # all trajectories sit at origin
    centers = jnp.asarray([[0.0, 0.0, 0.0]])
    radii = jnp.asarray([0.5])
    c = costs.sphere_obstacle_cost(points, centers, radii, weight=1.0)
    assert c.shape == (4,)
    assert float(c[0]) > 0  # deep penetration penalized
    far = costs.sphere_obstacle_cost(points + 10.0, centers, radii, weight=1.0)
    np.testing.assert_allclose(np.asarray(far), 0.0)


def test_attitude_low_k_guard():
    """The documented attitude-mode divergence floor (BASELINE.md 'Control
    parity': K >= ~2048) is enforced at solver construction — warn by
    default, raise on request, silent for position mode and at/above the
    floor."""
    import warnings

    import pytest

    low = small_params(k=256)  # default model -> attitude mode

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        wbs.make_whole_body_solver(low)
    assert any("below the validated floor" in str(w.message) for w in rec)

    with pytest.raises(ValueError, match="below the validated floor"):
        wbs.make_whole_body_solver(low, low_k_guard="error")

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        wbs.make_whole_body_solver(low, low_k_guard="off")
        wbs.make_whole_body_solver(small_params(k=wbs.ATTITUDE_MIN_SAMPLES))
        wbs.make_whole_body_solver(
            wbs.position_mode_params(n_samples=64, n_horizon=10)
        )
    assert not rec


def test_drag_kd_parallel_matches_scan():
    """Linear velocity drag as a precomputed (H, H) decay operator: the
    parallel-in-time wrench rollout with drag_kd > 0 must track the
    sequential step12 scan (which applies `- drag_kd * vel` per step) —
    closing the round-2 NotImplementedError (drag physics analog: rotor
    aero drag, gazebo_motor_model.cpp:440-452)."""
    import dataclasses

    obs = wbs.default_obs()
    k, h, dt = 16, 40, 0.01
    noise = jax.random.normal(jax.random.key(5), (k, h, wbs.N_ACTIONS)) * (
        jnp.asarray(wbs.default_sigma(), jnp.float32)
    )
    actions = wbm.hover_nominal_action(wbm.WholeBodyParams(), h)[None] + noise
    # A hefty drag so the decay operator is exercised well away from cumsum.
    # control_mode must be "wrench": the attitude/position modes dispatch to
    # their own rollouts regardless of time_parallel, which would make the
    # scan-vs-parallel comparison vacuous.
    p_par = wbm.WholeBodyParams(
        control_mode="wrench", time_parallel=True, drag_kd=0.8
    )
    p_seq = wbm.WholeBodyParams(
        control_mode="wrench", time_parallel=False, drag_kd=0.8
    )
    _, _, _, base_p = wbm.rollout(p_par, obs.state, actions, dt)
    _, _, _, base_s = wbm.rollout(p_seq, obs.state, actions, dt)
    np.testing.assert_allclose(
        np.asarray(base_p.vel), np.asarray(base_s.vel), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(base_p.pos), np.asarray(base_s.pos), atol=2e-2
    )
    # And drag actually bites: terminal speeds shrink vs the drag-free roll.
    _, _, _, base_0 = wbm.rollout(
        wbm.WholeBodyParams(control_mode="wrench", time_parallel=True),
        obs.state, actions, dt,
    )
    v_drag = np.linalg.norm(np.asarray(base_p.vel[:, -1]), axis=-1).mean()
    v_free = np.linalg.norm(np.asarray(base_0.vel[:, -1]), axis=-1).mean()
    assert v_drag < v_free


def test_drag_kd_attitude_mode_decays_initial_velocity():
    """Attitude-mode rollout with drag: an initial lateral velocity decays
    as alpha^t (no thrust tilt), matching the explicit-Euler drag law."""
    import dataclasses

    obs = wbs.default_obs()
    base = obs.state.base._replace(vel=jnp.asarray([2.0, 0.0, 0.0]))
    state = obs.state._replace(base=base)
    h, dt, kd = 30, 0.01, 2.0
    # Thrust exactly balancing gravity, level attitude setpoints.
    mp = wbm.WholeBodyParams(drag_kd=kd)
    u = jnp.broadcast_to(
        wbm.hover_nominal_action(mp, h), (1, h, wbs.N_ACTIONS)
    )
    traj = wbm._base_rollout_attitude(mp, state, u[..., :4], dt, 1)
    alpha = 1.0 - dt * kd
    expect = 2.0 * alpha ** np.arange(1, h + 1)
    np.testing.assert_allclose(
        np.asarray(traj.vel[0, :, 0]), expect, rtol=1e-4, atol=1e-4
    )


def test_rate_damping_parallel_matches_scan():
    """The wrench-mode body-rate damping (round 3): the parallel-in-time
    rollout's omega decay operator must track the sequential step12 scan
    (omega' = (1 - dt kd) omega + dt tau/I), and damping must actually
    shrink body rates vs the undamped roll."""
    obs = wbs.default_obs()
    k, h, dt = 16, 40, 0.01
    noise = jax.random.normal(jax.random.key(7), (k, h, wbs.N_ACTIONS)) * (
        jnp.asarray(wbs.wrench_sigma(), jnp.float32)
    )
    actions = wbm.hover_nominal_action(wbm.WholeBodyParams(), h)[None] + noise
    state = obs.state._replace(
        base=obs.state.base._replace(omega=jnp.asarray([0.4, -0.3, 0.2]))
    )
    p_par = wbm.WholeBodyParams(
        control_mode="wrench", time_parallel=True, rate_damping=8.0
    )
    p_seq = wbm.WholeBodyParams(
        control_mode="wrench", time_parallel=False, rate_damping=8.0
    )
    _, _, _, base_p = wbm.rollout(p_par, state, actions, dt)
    _, _, _, base_s = wbm.rollout(p_seq, state, actions, dt)
    np.testing.assert_allclose(
        np.asarray(base_p.omega), np.asarray(base_s.omega), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(base_p.pos), np.asarray(base_s.pos), atol=3e-2
    )
    _, _, _, base_0 = wbm.rollout(
        wbm.WholeBodyParams(control_mode="wrench", time_parallel=True),
        state, actions, dt,
    )
    w_damp = np.linalg.norm(np.asarray(base_p.omega[:, -1]), axis=-1).mean()
    w_free = np.linalg.norm(np.asarray(base_0.omega[:, -1]), axis=-1).mean()
    assert w_damp < 0.7 * w_free


def test_wrench_mode_precision_closed_loop():
    """Wrench mode as a PRECISION mode (round-4 stop-cost fix): with the
    terminal stopping-point cost charging plans that end the horizon
    adrift, direct actuation on the FULL plant reaches and HOLDS the EE
    target at the centimeter scale with a bounded-and-settling base —
    where the round-3 preset held a standing ~0.5 m weave (its 0.5 s
    horizon never saw the ~2 s lateral position mode).  Measured at this
    CI shape (K=1024, 6 s): L1 settles to ~6-12 mm with base excursion
    <= 0.25 m transient and tilt <= 0.02 rad; bounds ~2x.  The episode
    runs the full 6 s because convergence timing wobbles a few hundred ms
    across numerics changes (observed: the M^-1 vs triangular-solve
    substep path shifted it) and a mid-convergence tail fails spuriously.
    The flagship-K gate lives in tests_tpu."""
    from quadrotor_manipulator_mppi_tpu.sim import whole_body_loop as wbl

    params = wbs.wrench_mode_params(n_samples=1024, n_horizon=50)
    run = wbl.make_whole_body_episode(
        params, n_control_steps=600,
        cfg=wbl.WholeBodyLoopConfig(arm_coeffs_per_control=True),
    )
    _, init = wbs.make_whole_body_solver(params)
    plant = wbl.init_plant(params.model.vehicle)
    obs0 = wbs.default_obs()
    final, logs = jax.jit(run)(
        plant, init(jax.random.key(0)), obs0.ee_target, obs0.base_target
    )
    l1 = np.asarray(logs.l1_meas)
    tilt = np.asarray(logs.tilt)
    exc = np.linalg.norm(
        np.asarray(logs.base_pos) - np.asarray(obs0.base_target), axis=-1
    )
    assert np.all(np.isfinite(l1))
    assert l1[-150:].mean() < 0.020, l1[-150:].mean()
    assert l1[-50:].max() < 0.025, l1[-50:].max()
    assert exc.max() < 0.35, exc.max()
    assert exc[-100:].max() < 0.30, exc[-100:].max()
    assert tilt.max() < 0.05, tilt.max()

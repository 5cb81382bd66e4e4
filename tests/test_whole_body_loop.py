"""Full-plant whole-body closed loop (attitude mode, stabilized defaults)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.sim import whole_body_loop as wbl
from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs
from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig
import dataclasses


def small_params(k=256, h=50):
    base = wbs.WholeBodyMPPIParams()
    return dataclasses.replace(
        base, mppi=dataclasses.replace(base.mppi, n_samples=k, n_horizon=h)
    )


def test_attitude_mode_full_plant_meets_reach_gate():
    """MPPI (attitude mode) on the FULL plant (quaternion body, rotor lag,
    arm forward dynamics, gravity-moment coupling): reaches the reference's
    5 mm gate and holds within the 1 cm regression bound.

    Round 1's >3 s drift is fixed by (a) the arm gravity-moment feedforward
    in the plant-side attitude PD (the reference's own harrier_grav_feedback,
    controller.cpp:541-560) and (b) small thrust sigma + the distance-to-go
    schedule (the old sigma=30 N thrust dither rectified through the
    asymmetric rotor lag into a ~10 N climb bias — see default_sigma).
    Measured at flagship K=4096/800 steps: sub-mm hold on both metrics
    (benchmarks/artifacts/parity_attitude_k4096_r02.json).  Attitude mode
    needs K >= ~2048 — at lower K the softmin average can't cancel the
    exploration noise against the lag rectification and the loop diverges
    (position-cascade mode is the low-K-robust config); this test pins the
    smallest stable configuration (bounds ~4x measured).  Round 5's default
    stop cost (WholeBodyCostParams.stop_weight=1200 — the cross-seed
    robustness + station-keeping fix) makes the approach more conservative:
    convergence moved from ~1.2 s to ~3 s, so the episode runs 6 s."""
    params = small_params(k=2048)
    run = wbl.make_whole_body_episode(params, n_control_steps=600)
    _, init = wbs.make_whole_body_solver(params)
    plant = wbl.init_plant(params.model.vehicle)
    obs0 = wbs.default_obs()
    final, logs = jax.jit(run)(
        plant, init(jax.random.key(0)), obs0.ee_target, obs0.base_target
    )
    e = np.asarray(logs.ee_err)
    p = np.asarray(logs.base_pos)
    t = np.asarray(logs.tilt)
    l1_cmd = np.asarray(logs.l1_cmd)
    l1_meas = np.asarray(logs.l1_meas)
    tail = slice(-100, None)
    assert np.all(np.isfinite(e))
    assert (l1_cmd < 0.005).any(), f"never reached the gate: min {l1_cmd.min():.4f}"
    assert l1_cmd[tail].max() < 0.010, f"gate regressed: {l1_cmd[tail].max():.4f}"
    assert l1_meas[tail].max() < 0.020, f"measured regressed: {l1_meas[tail].max():.4f}"
    assert p[:, 2].min() > 0.5, f"lost altitude: {p[:, 2].min():.2f}"
    assert t.max() < 0.5, f"tipped: max tilt {t.max():.2f}"


def test_position_cascade_meets_reach_gate():
    """Position-cascade mode (MPPI setpoint offsets -> smooth-carrot
    backstepping inner loop + tube-feedback arm servo): converges on the
    full plant and HOLDS the end effector within the regression bound of
    the reference's reach gate.

    The reference's criterion (mppi.py:95-117, pose.py:121-123) is L1
    position error of the commanded EE pose < 5 mm; measured on TPU at the
    flagship K=4096/H=50 the loop holds L1_cmd < 2.5 mm and L1_measured
    < 5 mm across seeds (see benchmarks/artifacts/ and the tpu-marked
    test).  This CPU-sized run (K=256) asserts the 2x regression bound:
    1 cm on both the commanded gate and the measured error."""
    params = wbs.position_mode_params(n_samples=256, n_horizon=50)
    run = wbl.make_whole_body_episode(params, n_control_steps=700)
    _, init = wbs.make_whole_body_solver(params)
    plant = wbl.init_plant(params.model.vehicle)
    obs0 = wbs.default_obs()
    final, logs = jax.jit(run)(
        plant, init(jax.random.key(0)), obs0.ee_target, obs0.base_target
    )
    e = np.asarray(logs.ee_err)
    t = np.asarray(logs.tilt)
    p = np.asarray(logs.base_pos)
    l1_cmd = np.asarray(logs.l1_cmd)
    l1_meas = np.asarray(logs.l1_meas)
    tail = slice(-200, None)
    assert np.all(np.isfinite(e))
    assert (l1_cmd < 0.005).any(), f"never reached the 5 mm gate: min {l1_cmd.min():.4f}"
    assert l1_cmd[tail].max() < 0.010, f"gate regressed: {l1_cmd[tail].max():.4f}"
    assert l1_meas[tail].max() < 0.010, f"measured EE regressed: {l1_meas[tail].max():.4f}"
    assert t.max() < 0.1, f"tilt {t.max():.3f}"
    assert p[:, 2].min() > 1.4, f"altitude {p[:, 2].min():.2f}"


def test_position_rollout_response_matches_inner_loop_id(rng):
    """The position-mode rollout's per-axis linear response uses the same
    verified recursion machinery with the identified gains."""
    from quadrotor_manipulator_mppi_tpu.models.whole_body import (
        _attitude_response_matrices,
    )

    h, dt = 40, 0.1
    for kp, kd in [(1.7, 2.1), (9.0, 5.4)]:
        g_phi, g_om, hom = _attitude_response_matrices(h, dt, kp, kd)
        u = rng.normal(size=h)
        x, v = 0.4, -0.2
        xs = []
        for t_i in range(h):
            v = v + dt * (kp * (u[t_i] - x) - kd * v)
            x = x + dt * v
            xs.append(x)
        np.testing.assert_allclose(
            g_phi @ u + hom[:, 0, :] @ np.array([0.4, -0.2]), xs, atol=1e-9
        )


def test_attitude_rollout_linear_response_matches_recursion(rng):
    """The precomputed closed-loop convolution equals step-by-step PD
    integration for random setpoint sequences and initial states."""
    from quadrotor_manipulator_mppi_tpu.models.whole_body import (
        _attitude_response_matrices,
    )

    h, dt, kp, kd = 30, 0.01, 100.0, 18.0
    g_phi, g_om, hom = _attitude_response_matrices(h, dt, kp, kd)
    for _ in range(3):
        u = rng.normal(size=h) * 0.3
        phi, om = rng.normal() * 0.2, rng.normal() * 0.5
        x0 = np.array([phi, om])
        phis, oms = [], []
        for t in range(h):
            om = om + dt * (kp * (u[t] - phi) - kd * om)
            phi = phi + dt * om
            phis.append(phi)
            oms.append(om)
        np.testing.assert_allclose(g_phi @ u + hom[:, 0, :] @ x0, phis, atol=1e-10)
        np.testing.assert_allclose(g_om @ u + hom[:, 1, :] @ x0, oms, atol=1e-10)


def test_quat_from_rpy_matches_euler_matrix(rng):
    from quadrotor_manipulator_mppi_tpu.models.whole_body import _quat_from_rpy
    from quadrotor_manipulator_mppi_tpu.utils import rotations as rot

    rpy = jnp.asarray(rng.uniform(-1.0, 1.0, size=(16, 3)), jnp.float32)
    q = _quat_from_rpy(rpy)
    angles = jnp.stack([rpy[:, 2], rpy[:, 1], rpy[:, 0]], axis=-1)
    want = rot.euler_to_matrix(angles, "ZYX")
    np.testing.assert_allclose(
        np.asarray(rot.quat_to_matrix(q)), np.asarray(want), atol=1e-5
    )


def test_warm_start_decay_reverts_to_nominal():
    """With decay < 1 and no useful gradient (uniform cost), the plan leaks
    toward the nominal action between solves."""
    from quadrotor_manipulator_mppi_tpu.solver.mppi import (
        MPPIConfig, MPPIState, make_step,
    )

    nominal = np.asarray([5.0, 0.0])
    cfg = MPPIConfig(
        n_samples=32, n_horizon=8, n_action=2, sigma=0.01, savgol_window=0,
        warm_start_decay=0.5, nominal_action=nominal,
    )
    step = make_step(cfg, lambda v, obs: None, lambda aux, v, u, obs: jnp.zeros(32))
    u0 = jnp.full((8, 2), 100.0)
    state = MPPIState(u_prev=u0, key=jax.random.key(0), sigma=jnp.full((2,), 0.01))
    for _ in range(6):
        _, state = step(state, None)
    # 100 -> ~nominal + 0.5^6 * 95 ~ nominal + 1.5
    np.testing.assert_allclose(
        np.asarray(state.u_prev[:, 0]), 5.0, atol=2.5
    )


@pytest.mark.slow
def test_attitude_low_k_divergence_characterization():
    """Characterization of the LOW-K attitude failure mode itself (the
    boundary the guard enforces — BASELINE.md 'Control parity'): at K=256
    the softmin average cannot cancel the exploration noise against the
    asymmetric rotor-lag rectification, and the loop never settles at the
    reach gate the K=2048 run holds.  If this starts PASSING the gate, the
    floor moved — update ATTITUDE_MIN_SAMPLES and the docs."""
    params = small_params(k=256)
    run = wbl.make_whole_body_episode(
        params, n_control_steps=300,
        low_k_guard="off",  # this test exists to measure the divergence
    )
    plant = wbl.init_plant(params.model.vehicle)
    _, init = wbs.make_whole_body_solver(params, low_k_guard="off")
    obs0 = wbs.default_obs()
    _, logs = jax.jit(run)(
        plant, init(jax.random.key(0)), obs0.ee_target, obs0.base_target
    )
    e = np.asarray(logs.ee_err)
    # Divergent-or-drifting: the tail never approaches the 5 mm gate the
    # validated configuration holds (comfortably an order of magnitude off).
    assert not np.all(np.isfinite(e)) or e[-50:].min() > 0.05, (
        f"low-K attitude run unexpectedly reached the gate: "
        f"tail min {e[-50:].min():.4f} m — the divergence floor moved"
    )


def test_mass_matrix_per_control_parity():
    """The hoisted-M physics option (factor M once per 10 ms control step,
    the episode-benchmark serving shape) must track the per-substep-M
    trajectory closely — M(q) drifts ~1e-3 relative within one control
    period, so the episodes should agree to millimeters."""
    import jax

    from quadrotor_manipulator_mppi_tpu.sim import whole_body_loop as wbl
    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs

    params = wbs.position_mode_params(n_samples=128, n_horizon=20)
    common = dict(params=params, n_control_steps=40)
    run_ref = wbl.make_whole_body_episode(
        cfg=wbl.WholeBodyLoopConfig(), **common
    )
    run_fast = wbl.make_whole_body_episode(
        cfg=wbl.WholeBodyLoopConfig(mass_matrix_per_control=True), **common
    )
    _, init = wbs.make_whole_body_solver(params)
    plant = wbl.init_plant(params.model.vehicle)
    solver = init(jax.random.key(0))
    obs = wbs.default_obs()

    pf_ref, log_ref = jax.jit(run_ref)(
        plant, solver, obs.ee_target, obs.base_target
    )
    pf_fast, log_fast = jax.jit(run_fast)(
        plant, solver, obs.ee_target, obs.base_target
    )
    err = np.max(np.abs(np.asarray(log_ref.ee_err) - np.asarray(log_fast.ee_err)))
    assert err < 5e-3, err
    base_dev = np.max(
        np.abs(np.asarray(pf_ref[0].base.pos) - np.asarray(pf_fast[0].base.pos))
    )
    assert base_dev < 5e-3, base_dev


def test_frozen_arm_coeffs_episode_parity():
    """The frozen-coefficient serving path (all q-dependent dynamics
    coefficients hoisted to once per control period,
    ``WholeBodyLoopConfig.arm_coeffs_per_control``) must track the exact
    per-substep-RNEA episode to the same tolerance as the hoisted-M option
    — the decomposition is exact at the frozen q, so the only divergence
    source is the within-period coefficient drift."""
    import jax

    from quadrotor_manipulator_mppi_tpu.sim import whole_body_loop as wbl
    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs

    params = wbs.position_mode_params(n_samples=128, n_horizon=20)
    common = dict(params=params, n_control_steps=40)
    run_ref = wbl.make_whole_body_episode(
        cfg=wbl.WholeBodyLoopConfig(), **common
    )
    run_fast = wbl.make_whole_body_episode(
        cfg=wbl.WholeBodyLoopConfig(arm_coeffs_per_control=True), **common
    )
    _, init = wbs.make_whole_body_solver(params)
    plant = wbl.init_plant(params.model.vehicle)
    solver = init(jax.random.key(0))
    obs = wbs.default_obs()

    pf_ref, log_ref = jax.jit(run_ref)(
        plant, solver, obs.ee_target, obs.base_target
    )
    pf_fast, log_fast = jax.jit(run_fast)(
        plant, solver, obs.ee_target, obs.base_target
    )
    err = np.max(np.abs(np.asarray(log_ref.ee_err) - np.asarray(log_fast.ee_err)))
    assert err < 5e-3, err
    base_dev = np.max(
        np.abs(np.asarray(pf_ref[0].base.pos) - np.asarray(pf_fast[0].base.pos))
    )
    assert base_dev < 5e-3, base_dev


def test_frozen_arm_coeffs_with_payload_parity():
    """Frozen coefficients compose with the pick-weight payload path: the
    grasped mass rides link 7 (modified mass/COM), and the frozen
    extraction must freeze THOSE inertials — episode parity against the
    exact per-substep RNEA with the same payload."""
    import jax

    from quadrotor_manipulator_mppi_tpu.sim import whole_body_loop as wbl
    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs

    params = wbs.position_mode_params(n_samples=96, n_horizon=16)
    common = dict(params=params, n_control_steps=30)
    cfg_ref = wbl.WholeBodyLoopConfig(payload_mass=0.5)
    cfg_fast = wbl.WholeBodyLoopConfig(
        payload_mass=0.5, arm_coeffs_per_control=True
    )
    run_ref = wbl.make_whole_body_episode(cfg=cfg_ref, **common)
    run_fast = wbl.make_whole_body_episode(cfg=cfg_fast, **common)
    _, init = wbs.make_whole_body_solver(params)
    plant = wbl.init_plant(params.model.vehicle)
    solver = init(jax.random.key(0))
    obs = wbs.default_obs()

    _, log_ref = jax.jit(run_ref)(plant, solver, obs.ee_target, obs.base_target)
    _, log_fast = jax.jit(run_fast)(plant, solver, obs.ee_target, obs.base_target)
    err = np.max(np.abs(np.asarray(log_ref.ee_err) - np.asarray(log_fast.ee_err)))
    assert err < 5e-3, err

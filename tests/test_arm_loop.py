"""Arm node closed loop (kinova.py behavioral parity) + checkpoint/resume."""

import numpy as np

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.models import kinova
from quadrotor_manipulator_mppi_tpu.sim import arm_loop
from quadrotor_manipulator_mppi_tpu.solver import arm as arm_solver
from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig
from quadrotor_manipulator_mppi_tpu.ops import costs as costs_mod


def small_params():
    return arm_solver.ArmMPPIParams(
        mppi=MPPIConfig(n_samples=64, n_horizon=16, n_action=7, dt=0.01,
                        lam=0.1, sigma=0.1, savgol_window=9)
    )


def test_phase1_reaches_home_and_hands_over():
    """Computed-torque PD on the real arm dynamics reaches Q_HOME within
    tolerance and flips to phase 2 after the 50-tick hold (kinova.py:154-158)."""
    params = small_params()
    _, solver_init = arm_solver.make_arm_solver(params)
    run = arm_loop.make_arm_episode(
        cfg=arm_loop.ArmLoopConfig(torque_limit_scale=10.0),
        params=params,
        n_control_steps=300,  # 3 s: 1.5 s trajectory + hold + margin
    )
    state0 = arm_loop.init_arm_loop(solver_init(jax.random.key(0)))
    final, (q_log, err_log, tau_log) = jax.jit(run)(state0)

    q_end_phase1 = np.asarray(q_log[220])
    assert np.linalg.norm(q_end_phase1 - kinova.Q_HOME) < 0.05, q_end_phase1
    assert bool(final.phase2), "never handed over to MPPI"
    assert np.all(np.isfinite(np.asarray(tau_log)))


def test_phase2_mppi_reduces_ee_error():
    """After handover, the MPPI + inertia-weighted PD loop moves the EE
    toward the demo target."""
    params = small_params()
    _, solver_init = arm_solver.make_arm_solver(params)
    run = arm_loop.make_arm_episode(
        cfg=arm_loop.ArmLoopConfig(torque_limit_scale=10.0),
        params=params,
        n_control_steps=800,
    )
    state0 = arm_loop.init_arm_loop(solver_init(jax.random.key(0)))
    final, (q_log, err_log, tau_log) = jax.jit(run)(state0)
    err = np.asarray(err_log)
    # Error at handover (~2.2 s) vs best error afterwards.
    e_handover = err[250]
    assert err[300:].min() < e_handover * 0.7, (
        f"no MPPI progress: {e_handover:.3f} -> min {err[300:].min():.3f}"
    )


def test_checkpoint_roundtrip(tmp_path):
    from quadrotor_manipulator_mppi_tpu.utils import checkpoint

    params = small_params()
    step, init = arm_solver.make_arm_solver(params)
    state = init(jax.random.key(5))
    obs = arm_solver.ArmObs(
        q=jnp.asarray(kinova.Q_HOME, jnp.float32),
        qdot=jnp.zeros(7),
        base_pose=arm_solver.default_target(),  # any pose works as base here
        target=arm_solver.default_target(),
    )
    out1, state1 = step(state, obs)
    path = str(tmp_path / "solver.npz")
    checkpoint.save(path, state1)
    restored = checkpoint.restore(path, init(jax.random.key(0)))
    np.testing.assert_array_equal(
        np.asarray(restored.u_prev), np.asarray(state1.u_prev)
    )
    # Resumed key continues the same stream: next solves agree exactly.
    out_a, _ = step(state1, obs)
    out_b, _ = step(restored, obs)
    np.testing.assert_array_equal(np.asarray(out_a.u_seq), np.asarray(out_b.u_seq))

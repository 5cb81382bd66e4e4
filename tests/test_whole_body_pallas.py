"""Fused whole-body Pallas kernel vs the XLA solver.

With ``use_prng=False`` the fused step consumes the identical ``jax.random``
noise stream as the XLA pipeline (same key split, same ``sample_noise``
call), so the two backends must agree to float tolerance end to end —
rollout, FK, the full cost stack, softmin, Savitzky-Golay, clamping, warm
start, and covariance adaptation.  The in-kernel-PRNG production variant is
hardware-only (the interpreter stubs ``prng_random_bits``) and is validated
by bench + closed-loop runs, mirroring the drone kernel's strategy.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadrotor_manipulator_mppi_tpu.ops.pallas.whole_body_kernel import (
    make_whole_body_pallas_step,
)
from quadrotor_manipulator_mppi_tpu.solver import whole_body as wb


def _small(params: wb.WholeBodyMPPIParams, k=256, h=16) -> wb.WholeBodyMPPIParams:
    return dataclasses.replace(
        params, mppi=dataclasses.replace(params.mppi, n_samples=k, n_horizon=h)
    )


def _run_both(params, n_steps=3):
    step_xla, init = wb.make_whole_body_solver(params)
    step_fused = make_whole_body_pallas_step(params, use_prng=False, interpret=True)
    obs = wb.default_obs()
    st_x = init(jax.random.key(7))
    st_f = init(jax.random.key(7))
    for _ in range(n_steps):
        out, st_x = step_xla(st_x, obs)
        u_f, st_f = step_fused(st_f, obs)
        np.testing.assert_allclose(
            np.asarray(u_f), np.asarray(out.u_seq), rtol=2e-3, atol=2e-3
        )
    return st_x, st_f


def test_attitude_mode_matches_xla():
    st_x, st_f = _run_both(_small(wb.WholeBodyMPPIParams()))
    np.testing.assert_allclose(
        np.asarray(st_f.u_prev), np.asarray(st_x.u_prev), rtol=2e-3, atol=2e-3
    )


def test_position_mode_matches_xla_with_adaptive_sigma():
    params = _small(wb.position_mode_params())
    st_x, st_f = _run_both(params)
    # Covariance adaptation runs inside the update kernel (weighted second
    # moment of the accepted noise) — must track the XLA path.
    np.testing.assert_allclose(
        np.asarray(st_f.sigma), np.asarray(st_x.sigma), rtol=2e-3, atol=1e-4
    )


def test_obstacle_cost_matches_xla():
    params = _small(wb.WholeBodyMPPIParams())
    params = dataclasses.replace(
        params,
        cost=dataclasses.replace(
            params.cost,
            obstacle_weight=100.0,
            obstacle_centers=((0.3, 0.1, 1.8),),
            obstacle_radii=(0.4,),
        ),
    )
    _run_both(params)


def test_rejects_unsupported_configs():
    params = wb.WholeBodyMPPIParams()
    bad = dataclasses.replace(
        params, mppi=dataclasses.replace(params.mppi, n_samples=200)
    )
    with pytest.raises(ValueError, match="multiple"):
        make_whole_body_pallas_step(bad)
    bad = dataclasses.replace(
        params, model=dataclasses.replace(params.model, control_mode="wrench")
    )
    with pytest.raises(ValueError, match="attitude/position"):
        make_whole_body_pallas_step(bad)

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


def _run_both(params, n_steps=3, obs=None):
    # low_k_guard off: parity shapes are intentionally tiny.
    step_xla, init = wb.make_whole_body_solver(params, low_k_guard="off")
    step_fused = make_whole_body_pallas_step(params, use_prng=False, interpret=True)
    obs = wb.default_obs() if obs is None else obs
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


def _wrench_params(k=256, h=16, couple=True):
    import numpy as np

    base = wb.WholeBodyMPPIParams()
    mppi = dataclasses.replace(
        base.mppi,
        n_samples=k, n_horizon=h,
        sigma=wb.wrench_sigma(),
        u_min=None, u_max=None,
        nominal_action=np.concatenate(
            [[wb.default_nominal_action()[0]], np.zeros(wb.N_ACTIONS - 1)]
        ),
        sigma_scale_fn=None,
    )
    return dataclasses.replace(
        base,
        mppi=mppi,
        model=dataclasses.replace(
            base.model, control_mode="wrench", couple_arm_gravity=couple
        ),
    )


def test_wrench_mode_matches_xla():
    """The fused wrench rollout — rotor lag on the full wrench, in-kernel
    arm-gravity-moment coupling, omega cumsum, Hillis-Steele quaternion
    prefix scan — agrees with the XLA associative_scan path."""
    st_x, st_f = _run_both(_wrench_params())
    np.testing.assert_allclose(
        np.asarray(st_f.u_prev), np.asarray(st_x.u_prev), rtol=2e-3, atol=2e-3
    )


def test_wrench_mode_matches_xla_uncoupled():
    _run_both(_wrench_params(couple=False))


def test_wrench_mode_nonidentity_attitude_matches_xla():
    """Initial tilt + body rates exercise the SMEM q0/omega0/g_b path."""
    import jax.numpy as jnp

    params = _wrench_params(h=12)
    step_xla, init = wb.make_whole_body_solver(params)
    step_fused = make_whole_body_pallas_step(params, use_prng=False, interpret=True)
    obs = wb.default_obs()
    base = obs.state.base._replace(
        rpy=jnp.asarray([0.08, -0.05, 0.3]),
        omega=jnp.asarray([0.2, -0.1, 0.05]),
        vel=jnp.asarray([0.3, 0.0, -0.1]),
    )
    obs = obs._replace(state=obs.state._replace(base=base))
    st_x = init(jax.random.key(11))
    st_f = init(jax.random.key(11))
    for _ in range(2):
        out, st_x = step_xla(st_x, obs)
        u_f, st_f = step_fused(st_f, obs)
        np.testing.assert_allclose(
            np.asarray(u_f), np.asarray(out.u_seq), rtol=4e-3, atol=4e-3
        )


def test_rejects_unsupported_configs():
    params = wb.WholeBodyMPPIParams()
    bad = dataclasses.replace(
        params, mppi=dataclasses.replace(params.mppi, n_samples=200)
    )
    with pytest.raises(ValueError, match="multiple"):
        make_whole_body_pallas_step(bad)
    bad = dataclasses.replace(
        params, model=dataclasses.replace(params.model, control_mode="spline")
    )
    with pytest.raises(ValueError, match="unknown control mode"):
        make_whole_body_pallas_step(bad)


def test_drag_kd_matches_xla_wrench_and_attitude():
    """drag_kd > 0 in the fused kernel (VERDICT r2 item 6): the drag-decay
    velocity operator and the vhom/phom initial-velocity columns must track
    the XLA parallel-in-time rollout in both fused linear-velocity modes."""
    p = _wrench_params(h=12)
    p = dataclasses.replace(p, model=dataclasses.replace(p.model, drag_kd=0.5))
    _run_both(p)
    att = _small(wb.WholeBodyMPPIParams())
    att = dataclasses.replace(
        att, model=dataclasses.replace(att.model, drag_kd=0.5)
    )
    _run_both(att)


def test_rate_damping_matches_xla_wrench():
    """rate_damping > 0 in the fused kernel (round 3 wrench stabilizer):
    the omega decay operator (omat) and the ohom initial-rate column must
    track the XLA parallel-in-time rollout — from a NONZERO initial body
    rate, otherwise the sc[OM0]*ohom homogeneous term is identically zero
    and an ohom off-by-one would pass unnoticed."""
    p = _wrench_params(h=12)
    p = dataclasses.replace(
        p, model=dataclasses.replace(p.model, rate_damping=12.0)
    )
    obs0 = wb.default_obs()
    obs = obs0._replace(
        state=obs0.state._replace(
            base=obs0.state.base._replace(
                omega=jnp.asarray([0.5, -0.4, 0.3])
            )
        )
    )
    _run_both(p, obs=obs)
    # and combined with drag
    p2 = dataclasses.replace(
        p, model=dataclasses.replace(p.model, drag_kd=0.5)
    )
    _run_both(p2, obs=obs)


def test_wrench_mode_params_preset_matches_xla():
    """The full validated wrench preset (feed-forward pairing handled by the
    loop; here the solver side: couple off, damping on) agrees between
    backends."""
    _run_both(_small(wb.wrench_mode_params()))


def test_wrench_stop_cost_matches_xla():
    """The terminal stopping-point cost (WholeBodyCostParams.stop_weight —
    the wrench precision fix) computed in-kernel on the terminal pos/vel
    rows agrees with the XLA cost path."""
    params = _wrench_params(h=12)
    params = dataclasses.replace(
        params,
        cost=dataclasses.replace(
            params.cost, stop_weight=4000.0, stop_horizon=1.2
        ),
    )
    st_x, st_f = _run_both(params)
    np.testing.assert_allclose(
        np.asarray(st_f.u_prev), np.asarray(st_x.u_prev), rtol=2e-3, atol=2e-3
    )


def test_attitude_stop_cost_matches_xla():
    """Stop cost on the linear-response attitude rollout (pos/vel come from
    the (H, H) response matmuls there)."""
    params = _small(wb.WholeBodyMPPIParams(), k=256, h=12)
    params = dataclasses.replace(
        params,
        cost=dataclasses.replace(
            params.cost, stop_weight=1000.0, stop_horizon=0.8
        ),
    )
    _run_both(params)


def test_wide_tile_matches_default_tile():
    """The ``tile`` width knob (wider = fewer grid steps — the sharded
    small-K configs' lever) must not change the math: with explicit noise
    the 256-lane tiling reproduces the default 128-lane solve exactly."""
    params = _small(wb.WholeBodyMPPIParams(), k=256, h=12)
    step_128 = make_whole_body_pallas_step(params, use_prng=False,
                                           interpret=True)
    step_256 = make_whole_body_pallas_step(params, use_prng=False,
                                           interpret=True, tile=256)
    _, init = wb.make_whole_body_solver(params, low_k_guard="off")
    obs = wb.default_obs()
    st_a = init(jax.random.key(5))
    st_b = init(jax.random.key(5))
    for _ in range(2):
        u_a, st_a = step_128(st_a, obs)
        u_b, st_b = step_256(st_b, obs)
        np.testing.assert_allclose(
            np.asarray(u_b), np.asarray(u_a), rtol=1e-5, atol=1e-5
        )


def test_tile_validation():
    params = _small(wb.WholeBodyMPPIParams(), k=256, h=12)
    with pytest.raises(ValueError, match="multiple of"):
        make_whole_body_pallas_step(params, tile=192)   # not 128-aligned
    with pytest.raises(ValueError, match="multiple of"):
        make_whole_body_pallas_step(params, tile=512)   # K=256 not divisible

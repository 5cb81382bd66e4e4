"""Fused Pallas drone solve — explicit-noise validation on CPU.

The TPU interpreter stubs ``prng_random_bits`` to zeros, so the in-kernel
PRNG variant is only checkable on hardware (bench.py exercises it).  Here the
explicit-noise variant runs the identical kernel pipeline (tiled layout,
triangular-matmul integration, fused cost, two-pass weighted update) in
interpret mode and is compared bit-for-bit against the XLA implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.ops import costs, integrators, weights as w_ops
from quadrotor_manipulator_mppi_tpu.ops.pallas import drone_kernel as dk
from quadrotor_manipulator_mppi_tpu.utils import savgol
from quadrotor_manipulator_mppi_tpu.models.point_mass import PointMassState, step as pm_step

H, A, K = 32, 3, 256


def xla_solve(u_prev, noise, x0, v0, target, dt=0.01, lam=0.1):
    v = u_prev[None] + noise
    traj, _ = integrators.double_integrate(v, x0, v0, dt)
    s = costs.position_stage_cost(traj, target, 100.0)
    s = s + costs.position_terminal_cost(traj, target, 20.0)
    w = w_ops.softmin_weights(s, lam)
    du = w_ops.weighted_noise_average(w, noise)
    du = savgol.smooth(du, 5, 2)
    return u_prev + du


def pallas_solve(u_prev, noise, x0, v0, target):
    return dk.solve_drone_pallas(
        u_prev, x0, v0, target, jnp.asarray(0, jnp.int32), noise=noise,
        n_samples=K, n_horizon=H, n_action=A, interpret=True,
    )


@pytest.fixture
def problem(rng):
    u_prev = jnp.asarray(rng.normal(size=(H, A)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(K, H, A)) * 30.0, jnp.float32)
    x0 = jnp.asarray([0.1, -0.2, 1.0])
    v0 = jnp.asarray([0.0, 0.3, 0.0])
    target = jnp.asarray([1.0, 2.0, 3.4])
    return u_prev, noise, x0, v0, target


def test_pallas_pipeline_matches_xla(problem):
    u_prev, noise, x0, v0, target = problem
    u_pallas = pallas_solve(u_prev, noise, x0, v0, target)
    u_xla = xla_solve(u_prev, noise, x0, v0, target)
    np.testing.assert_allclose(
        np.asarray(u_pallas), np.asarray(u_xla), rtol=2e-4, atol=2e-4
    )


def test_pallas_closed_loop_reaches_waypoint(rng):
    u = jnp.zeros((H, A))
    st = PointMassState(jnp.zeros(3), jnp.zeros(3))
    tgt = jnp.asarray([1.0, 2.0, 3.4])
    errs = []
    for i in range(80):
        noise = jnp.asarray(rng.normal(size=(K, H, A)) * 30.0, jnp.float32)
        u = pallas_solve(u, noise, st.pos, st.vel, tgt)
        st = pm_step(st, u[0], 0.01)
        errs.append(float(jnp.linalg.norm(st.pos - tgt)))
    assert errs[-1] < errs[0] * 0.6, f"{errs[0]:.2f} -> {errs[-1]:.2f}"


def test_tri_matrices_integrate_like_cumsum(rng):
    lmat, lstrict = dk._tri_matrices(H, A)
    accel = rng.normal(size=(H, A))
    flat = accel.reshape(H * A, 1)
    vel = (lmat @ flat).reshape(H, A)
    np.testing.assert_allclose(vel, np.cumsum(accel, axis=0), atol=1e-12)
    vel_prev = (lstrict @ flat).reshape(H, A)
    want = np.concatenate([np.zeros((1, A)), np.cumsum(accel, axis=0)[:-1]], axis=0)
    np.testing.assert_allclose(vel_prev, want, atol=1e-12)

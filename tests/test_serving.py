"""Packed serving API: wire-format round trips and solver equivalence.

The packed step must be the SAME solver as the pytree step — only the tunnel
contract (argument packing) changes.  Reference transfer contract:
``controller.cpp:305-337`` (27-float robot_states), ``kinova.py:188-191``
(flat command reply).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quadrotor_manipulator_mppi_tpu.solver import serving, whole_body as wbs
from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig


def small_params(mode="attitude", k=64, h=10):
    if mode == "position":
        p = wbs.position_mode_params(n_samples=k, n_horizon=h)
    elif mode == "wrench":
        p = wbs.wrench_mode_params(n_samples=k, n_horizon=h)
    else:
        import dataclasses

        base = wbs.WholeBodyMPPIParams()
        p = dataclasses.replace(
            base, mppi=dataclasses.replace(base.mppi, n_samples=k, n_horizon=h)
        )
    return p


def test_obs_roundtrip():
    obs = wbs.default_obs()
    # Perturb so nothing is trivially zero.
    st = obs.state
    base = st.base._replace(
        pos=jnp.asarray([0.3, -0.2, 2.4]),
        rpy=jnp.asarray([0.05, -0.08, 0.4]),
        vel=jnp.asarray([0.1, 0.2, -0.05]),
        omega=jnp.asarray([0.01, -0.02, 0.03]),
    )
    obs = obs._replace(state=st._replace(base=base, qdot=jnp.full(7, 0.1)))
    obs_vec, target_vec = serving.pack_obs(obs)
    assert obs_vec.shape == (serving.OBS_SIZE,)
    assert target_vec.shape == (serving.TARGET_SIZE,)
    back = serving.unpack_obs(obs_vec, target_vec)
    for a, b in zip(jax.tree.leaves(obs), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("mode", ["attitude", "position", "wrench"])
def test_packed_equals_pytree_step(mode):
    params = small_params(mode)
    step, init = wbs.make_whole_body_solver(params, low_k_guard="off")
    pstep, pinit = serving.make_packed_step(
        params, backend="xla", low_k_guard="off", jit=False
    )
    key = jax.random.key(7)
    state = init(key)
    carry = pinit(key)
    obs = wbs.default_obs()
    obs_vec, target_vec = serving.pack_obs(obs)
    for _ in range(3):
        out, state = step(state, obs)
        out_vec, carry = pstep(carry, obs_vec, target_vec)
        np.testing.assert_allclose(
            np.asarray(out_vec[:11]), np.asarray(out.action), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_vec[11:18]), np.asarray(out.qdes), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_vec[18:25]), np.asarray(out.vdes), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(carry.u_prev), np.asarray(state.u_prev), atol=2e-5
        )
        # Same PRNG stream.
        assert np.array_equal(
            np.asarray(jax.random.key_data(carry.key)),
            np.asarray(jax.random.key_data(state.key)),
        )


def test_static_targets_variant():
    params = small_params("position")
    obs = wbs.default_obs()
    pstep_d, pinit = serving.make_packed_step(
        params, backend="xla", low_k_guard="off", jit=False
    )
    pstep_s, _ = serving.make_packed_step(
        params, backend="xla", low_k_guard="off", jit=False,
        static_targets=(obs.ee_target, obs.base_target),
    )
    key = jax.random.key(3)
    obs_vec, target_vec = serving.pack_obs(obs)
    out_d, _ = pstep_d(pinit(key), obs_vec, target_vec)
    out_s, _ = pstep_s(pinit(key), obs_vec)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s), atol=1e-6)


def test_unpack_out_fields():
    v = jnp.arange(25.0)
    out = serving.unpack_out(v)
    np.testing.assert_array_equal(np.asarray(out.action), np.arange(11.0))
    np.testing.assert_array_equal(np.asarray(out.qdes), np.arange(11.0, 18.0))
    np.testing.assert_array_equal(np.asarray(out.vdes), np.arange(18.0, 25.0))


def test_adaptive_sigma_rejected():
    import dataclasses

    base = wbs.WholeBodyMPPIParams()
    params = dataclasses.replace(
        base,
        mppi=dataclasses.replace(
            base.mppi, n_samples=32, n_horizon=8, adaptive_sigma=True,
            sigma_scale_fn=None,
        ),
    )
    with pytest.raises(ValueError, match="adaptive_sigma"):
        serving.make_packed_step(params, low_k_guard="off")

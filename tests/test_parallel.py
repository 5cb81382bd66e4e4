"""Sharded-solver tests on the 8-device virtual CPU mesh.

SURVEY.md test strategy (d): the sharded solve must equal a single-device
solve that consumes the same global noise set.  The sharded step draws noise
per shard from fold_in(key, shard_index); the single-device replica below
reconstructs exactly that noise layout and runs the unsharded math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.ops import sampling, weights as w_ops
from quadrotor_manipulator_mppi_tpu.parallel import mesh as mesh_mod
from quadrotor_manipulator_mppi_tpu.parallel.sharded import (
    make_sharded_solver,
    scenario_keys,
)
from quadrotor_manipulator_mppi_tpu.solver import drone as drone_solver
from quadrotor_manipulator_mppi_tpu.solver import whole_body as wb
from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig, MPPIState
from quadrotor_manipulator_mppi_tpu.utils import savgol


requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@requires_8
def test_sharded_drone_solver_matches_manual_global_replica():
    n_dev = 8
    k_total, h, a = 64, 32, 3
    params = drone_solver.DroneMPPIParams(
        mppi=MPPIConfig(
            n_samples=k_total, n_horizon=h, n_action=a,
            dt=0.01, lam=0.1, sigma=30.0, savgol_window=5,
        )
    )
    mesh = mesh_mod.make_mesh(n_sample_shards=n_dev, n_scenario_shards=1)
    sharded_step, init = make_sharded_solver(
        drone_solver.make_drone_solver, mesh, batch_scenarios=True, params=params
    )

    key = jax.random.key(42)
    state = MPPIState(u_prev=jnp.zeros((h, a)), key=key, sigma=jnp.full((a,), 30.0))
    states = jax.tree.map(lambda x: x[None], state)  # 1 scenario
    obs1 = drone_solver.DroneObs(
        x=jnp.asarray([0.2, -0.1, 1.0]),
        v=jnp.asarray([0.0, 0.1, 0.0]),
        target=jnp.asarray(drone_solver.DEFAULT_TARGET),
    )
    obs = jax.tree.map(lambda x: x[None], obs1)

    with jax.set_mesh(mesh):
        out, new_states = jax.jit(sharded_step)(states, obs)
    u_sharded = np.asarray(out.u_seq[0])

    # --- single-device replica consuming the identical global noise ---
    key_next, sub = jax.random.split(key)
    k_local = k_total // n_dev
    noise_shards = [
        sampling.sample_noise(
            jax.random.fold_in(sub, i), k_local, h, a, 30.0, jnp.float32
        )
        for i in range(n_dev)
    ]
    noise = jnp.concatenate(noise_shards, axis=0)
    v = state.u_prev[None] + noise
    from quadrotor_manipulator_mppi_tpu.ops import costs, integrators

    traj, _ = integrators.double_integrate(v, obs1.x, obs1.v, 0.01)
    s = costs.position_stage_cost(traj, obs1.target, 100.0)
    s = s + costs.position_terminal_cost(traj, obs1.target, 20.0)
    w = w_ops.softmin_weights(s, 0.1)
    du = w_ops.weighted_noise_average(w, noise)
    du = savgol.smooth(du, 5, 2)
    u_manual = np.asarray(state.u_prev + du)

    np.testing.assert_allclose(u_sharded, u_manual, rtol=2e-4, atol=2e-5)


@requires_8
def test_sharded_whole_body_scenario_batch_runs():
    n_dev = 8
    mesh = mesh_mod.make_mesh(n_sample_shards=4, n_scenario_shards=2)
    params = wb.WholeBodyMPPIParams(
        mppi=MPPIConfig(
            n_samples=16, n_horizon=8, n_action=wb.N_ACTIONS,
            dt=0.01, lam=0.1, sigma=wb.default_sigma(), savgol_window=5,
        )
    )
    step, init = make_sharded_solver(
        wb.make_whole_body_solver, mesh, params=params,
        low_k_guard="off",  # intentional tiny shape-validation config
    )
    n_scn = 4
    keys = scenario_keys(jax.random.key(0), n_scn)
    states = jax.vmap(init)(keys)
    obs1 = wb.default_obs()
    obs = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_scn,) + x.shape), obs1)
    with jax.set_mesh(mesh):
        out, new_states = jax.jit(step)(states, obs)
        jax.block_until_ready(out)
    assert out.action.shape == (n_scn, wb.N_ACTIONS)
    assert np.all(np.isfinite(np.asarray(out.action)))
    # Distinct keys -> distinct scenario solutions even with identical obs.
    assert not np.allclose(np.asarray(out.action[0]), np.asarray(out.action[1]))


@requires_8
def test_softmin_weights_sharded_equals_global(rng):
    """The three collectives reduce identically to the unsharded reduction."""
    mesh = mesh_mod.make_mesh(n_sample_shards=8, n_scenario_shards=1)
    s_global = jnp.asarray(rng.uniform(0, 50, size=256), jnp.float32)
    noise_global = jnp.asarray(rng.normal(size=(256, 16, 3)), jnp.float32)

    def local_fn(s, noise):
        w = w_ops.softmin_weights(s, 0.1, axis_name=mesh_mod.SAMPLE_AXIS)
        return w_ops.weighted_noise_average(w, noise, axis_name=mesh_mod.SAMPLE_AXIS)

    from jax.sharding import PartitionSpec as P

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(mesh_mod.SAMPLE_AXIS), P(mesh_mod.SAMPLE_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    with jax.set_mesh(mesh):
        du_sharded = np.asarray(jax.jit(sharded)(s_global, noise_global))
    w = w_ops.softmin_weights(s_global, 0.1)
    du = np.asarray(w_ops.weighted_noise_average(w, noise_global))
    np.testing.assert_allclose(du_sharded, du, rtol=1e-5, atol=1e-6)


@requires_8
def test_sharded_fused_pallas_matches_sharded_xla():
    """ROADMAP item closed: shard_map around the fused whole-body kernel.

    With explicit noise (use_prng=False) the fused step consumes the same
    fold_in(key, shard_index) noise stream as the sharded XLA step, so the
    two sharded backends must agree float-for-float — including the
    pmin/psum collectives between the kernel's two passes.
    """
    import dataclasses

    n_dev = 8
    mesh = mesh_mod.make_mesh(n_sample_shards=n_dev, n_scenario_shards=1)
    params = wb.WholeBodyMPPIParams()
    params = dataclasses.replace(
        params,
        mppi=dataclasses.replace(params.mppi, n_samples=128 * n_dev, n_horizon=12),
    )

    step_x, init = make_sharded_solver(
        wb.make_whole_body_solver, mesh, params=params,
        low_k_guard="off",  # intentional tiny shape-validation config
    )
    step_f, _ = make_sharded_solver(
        wb.make_whole_body_solver, mesh, params=params,
        low_k_guard="off",  # intentional tiny shape-validation config
        backend="pallas", pallas_use_prng=False, pallas_interpret=True,
    )

    states = jax.tree.map(lambda x: x[None], init(jax.random.key(3)))
    obs = jax.tree.map(lambda x: x[None], wb.default_obs())
    with jax.set_mesh(mesh):
        out_x, st_x = jax.jit(step_x)(states, obs)
        out_f, st_f = jax.jit(step_f)(states, obs)
        # Second step from the produced states: warm start + key threading.
        out_x2, _ = jax.jit(step_x)(st_x, obs)
        out_f2, _ = jax.jit(step_f)(st_f, obs)
    np.testing.assert_allclose(
        np.asarray(out_f.u_seq), np.asarray(out_x.u_seq), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_f2.u_seq), np.asarray(out_x2.u_seq), rtol=4e-3, atol=4e-3
    )


@requires_8
def test_multihost_helpers_single_process():
    """multihost.initialize is a safe no-op single-process, and
    host_local_scenarios places scenario arrays with the scenario sharding
    (single-process == device_put equivalence)."""
    from quadrotor_manipulator_mppi_tpu.parallel import multihost

    topo = multihost.initialize()
    assert topo["process_count"] == 1
    assert topo["initialized"] is False
    assert topo["global_devices"] == jax.device_count()

    mesh = mesh_mod.make_mesh(n_sample_shards=2, n_scenario_shards=4)
    data = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3)}
    placed = multihost.host_local_scenarios(mesh, data)
    assert placed["x"].shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(placed["x"]), data["x"])
    # Leading axis is sharded over the scenario mesh axis.
    spec = placed["x"].sharding.spec
    assert spec[0] == mesh_mod.SCENARIO_AXIS


def test_multihost_initialize_arg_plumbing(monkeypatch):
    """The env-var / explicit-arg / autodetect paths of multihost.initialize
    pass the right kwargs to jax.distributed.initialize (VERDICT r2 item 7)
    — monkeypatched, so no coordinator is actually contacted."""
    from quadrotor_manipulator_mppi_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "QMM_MULTIHOST"):
        monkeypatch.delenv(var, raising=False)

    # Explicit args win verbatim.
    monkeypatch.setattr(multihost, "_initialized", False)
    topo = multihost.initialize("10.0.0.1:1234", 4, 2)
    assert calls[-1] == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }
    assert topo["initialized"] is True

    # Standard env vars plumb through (ints parsed).
    monkeypatch.setattr(multihost, "_initialized", False)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "h0:9999")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    multihost.initialize()
    assert calls[-1] == {
        "coordinator_address": "h0:9999", "num_processes": 2, "process_id": 1
    }

    # Cloud-TPU autodetect opt-in: no kwargs at all.
    monkeypatch.setattr(multihost, "_initialized", False)
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var)
    monkeypatch.setenv("QMM_MULTIHOST", "1")
    multihost.initialize()
    assert calls[-1] == {}

    # Nothing configured -> no initialization attempt, honest topology.
    monkeypatch.setattr(multihost, "_initialized", False)
    monkeypatch.delenv("QMM_MULTIHOST")
    n = len(calls)
    topo = multihost.initialize()
    assert len(calls) == n
    assert topo["initialized"] is False

    # Already-initialized guard: a second call never re-initializes.
    monkeypatch.setattr(multihost, "_initialized", True)
    monkeypatch.setenv("QMM_MULTIHOST", "1")
    multihost.initialize()
    assert len(calls) == n
    monkeypatch.setattr(multihost, "_initialized", False)


@requires_8
def test_sharded_solve_collective_count():
    """The 3-collectives-per-solve contract (ops/weights.py: pmin rho, psum
    eta, psum weighted-noise) holds in the COMPILED program, not just in
    comments: the sample-sharded solve lowers to at most 3 all-reduces
    (XLA may fuse some, must never add any) and at least 1."""
    n_dev = 8
    k_total, h, a = 64, 16, 3
    params = drone_solver.DroneMPPIParams(
        mppi=MPPIConfig(
            n_samples=k_total, n_horizon=h, n_action=a,
            dt=0.01, lam=0.1, sigma=30.0, savgol_window=5,
        )
    )
    mesh = mesh_mod.make_mesh(n_sample_shards=n_dev, n_scenario_shards=1)
    sharded_step, init = make_sharded_solver(
        drone_solver.make_drone_solver, mesh, batch_scenarios=True,
        params=params,
    )
    state = MPPIState(
        u_prev=jnp.zeros((h, a)), key=jax.random.key(0),
        sigma=jnp.full((a,), 30.0),
    )
    states = jax.tree.map(lambda x: x[None], state)
    obs = jax.tree.map(
        lambda x: x[None],
        drone_solver.DroneObs(
            x=jnp.zeros(3), v=jnp.zeros(3),
            target=jnp.asarray(drone_solver.DEFAULT_TARGET),
        ),
    )
    with jax.set_mesh(mesh):
        txt = jax.jit(sharded_step).lower(states, obs).compile().as_text()
    n_ar = txt.count("all-reduce(") + txt.count("all-reduce-start(")
    assert 1 <= n_ar <= 3, f"collective contract broken: {n_ar} all-reduces"

"""Weak-scaling efficiency measurement over the device mesh.

Library core of the ``bench-scaling`` CLI scenario: time the whole-body
solve (a) on one device, (b) sample-sharded over all devices at the same
per-device K (the three softmin collectives are the only communication —
``mppi.py:183-191``), (c) scenario-sharded (independent problems, zero
communication).  Runs identically on the virtual CPU mesh and on real ICI
hardware; the analytic prediction for v5e-16 lives in
``benchmarks/ici_model.py``.
"""

from __future__ import annotations

import time


def measure_weak_scaling(
    n_devices: int,
    k_per_device: int = 2048,
    h: int = 50,
    iters: int = 10,
    backend: str = "xla",
) -> dict:
    import jax
    import jax.numpy as jnp

    from ..solver import whole_body as wbs
    from ..solver.mppi import MPPIConfig
    from . import mesh as mesh_mod
    from .sharded import make_sharded_solver, scenario_keys

    n = min(n_devices, jax.device_count())

    def mk_params(k_total):
        return wbs.WholeBodyMPPIParams(
            mppi=MPPIConfig(
                n_samples=k_total, n_horizon=h, n_action=wbs.N_ACTIONS,
                dt=0.01, lam=0.1, sigma=wbs.default_sigma(), savgol_window=9,
            )
        )

    def bench(fn):
        for _ in range(2):
            jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    obs1 = wbs.default_obs()

    # Single-device baseline at the per-device problem size.
    step1, init1 = wbs.make_whole_body_solver(mk_params(k_per_device),
                                              backend=backend)
    jstep1 = jax.jit(step1)
    st1 = init1(jax.random.key(0))
    t1 = bench(lambda: jstep1(st1, obs1)[0].u_seq)

    # Weak scaling over the sample axis.
    mesh_s = mesh_mod.make_mesh(n_sample_shards=n, n_scenario_shards=1)
    step_s, init_s = make_sharded_solver(
        wbs.make_whole_body_solver, mesh_s,
        params=mk_params(k_per_device * n), backend=backend,
    )
    states_s = jax.tree.map(lambda x: x[None], init_s(jax.random.key(0)))
    obs_s = jax.tree.map(lambda x: x[None], obs1)
    with jax.set_mesh(mesh_s):
        jstep_s = jax.jit(step_s)
        t_sample = bench(lambda: jstep_s(states_s, obs_s)[0].u_seq)

    # Weak scaling over the scenario axis (communication-free).
    mesh_c = mesh_mod.make_mesh(n_sample_shards=1, n_scenario_shards=n)
    step_c, init_c = make_sharded_solver(
        wbs.make_whole_body_solver, mesh_c, params=mk_params(k_per_device),
        backend=backend,
    )
    keys = scenario_keys(jax.random.key(0), n)
    states_c = jax.vmap(init_c)(keys)
    obs_c = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), obs1)
    with jax.set_mesh(mesh_c):
        jstep_c = jax.jit(step_c)
        t_scn = bench(lambda: jstep_c(states_c, obs_c)[0].u_seq)

    return {
        "devices": n,
        "backend": backend,
        "k_per_device": k_per_device,
        "h": h,
        "t_1dev_ms": round(t1, 3),
        "t_sample_sharded_ms": round(t_sample, 3),
        "t_scenario_sharded_ms": round(t_scn, 3),
        # Weak-scaling efficiency: same per-device work, ideal ratio 1.0.
        "weak_eff_sample_axis": round(t1 / t_sample, 3),
        "weak_eff_scenario_axis": round(t1 / t_scn, 3),
        "global_k_sample_axis": k_per_device * n,
        "global_solves_per_s_scenario_axis": round(n * 1e3 / t_scn, 1),
    }

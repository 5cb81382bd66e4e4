"""Scenario x sample scaling-efficiency measurement (BASELINE.json's
>= 85% multi-host target)."""

from __future__ import annotations

from .common import finish


def run_bench_scaling(args):
    """Weak scaling of the whole-body solve over the mesh's sample axis
    (global K = k/device x devices; the three per-solve collectives are the
    only communication) and over the scenario axis (independent problems,
    zero communication).

    Runs on whatever devices exist — the 8-device virtual CPU mesh today
    (``--platform cpu``), real ICI the moment multi-chip hardware appears
    (same command, no code changes).  One JSON line out."""
    import time as time_mod

    import jax
    import jax.numpy as jnp

    if args.platform == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.devices)
        except RuntimeError:
            pass  # backend already initialized (in-process callers)
    n = min(args.devices, jax.device_count())
    platform = jax.devices()[0].platform

    from ..parallel import mesh as mesh_mod
    from ..parallel.sharded import make_sharded_solver, scenario_keys
    from ..solver import whole_body as wbs
    from ..solver.mppi import MPPIConfig

    k_dev, h = args.k_per_device, 50
    backend = "pallas" if platform not in ("cpu",) else "xla"

    def mk_params(k_total):
        return wbs.WholeBodyMPPIParams(
            mppi=MPPIConfig(
                n_samples=k_total, n_horizon=h, n_action=wbs.N_ACTIONS,
                dt=0.01, lam=0.1, sigma=wbs.default_sigma(), savgol_window=9,
            )
        )

    def bench(fn, *fargs, iters=args.iters):
        out = fn(*fargs)
        jax.block_until_ready(out)
        out = fn(*fargs)
        jax.block_until_ready(out)
        t0 = time_mod.perf_counter()
        for _ in range(iters):
            out = fn(*fargs)
        jax.block_until_ready(out)
        return (time_mod.perf_counter() - t0) / iters * 1e3

    obs1 = wbs.default_obs()

    # --- single-device baseline at the per-device problem size -------------
    step1, init1 = wbs.make_whole_body_solver(mk_params(k_dev), backend=backend)
    jstep1 = jax.jit(step1)
    st1 = init1(jax.random.key(0))
    t1 = bench(lambda: jstep1(st1, obs1)[0].u_seq)

    # --- weak scaling over the sample axis ----------------------------------
    mesh_s = mesh_mod.make_mesh(n_sample_shards=n, n_scenario_shards=1)
    step_s, init_s = make_sharded_solver(
        wbs.make_whole_body_solver, mesh_s, params=mk_params(k_dev * n),
        backend=backend,
    )
    states_s = jax.tree.map(lambda x: x[None], init_s(jax.random.key(0)))
    obs_s = jax.tree.map(lambda x: x[None], obs1)
    with jax.set_mesh(mesh_s):
        jstep_s = jax.jit(step_s)
        t_sample = bench(lambda: jstep_s(states_s, obs_s)[0].u_seq)

    # --- weak scaling over the scenario axis --------------------------------
    mesh_c = mesh_mod.make_mesh(n_sample_shards=1, n_scenario_shards=n)
    step_c, init_c = make_sharded_solver(
        wbs.make_whole_body_solver, mesh_c, params=mk_params(k_dev),
        backend=backend,
    )
    keys = scenario_keys(jax.random.key(0), n)
    states_c = jax.vmap(init_c)(keys)
    obs_c = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), obs1)
    with jax.set_mesh(mesh_c):
        jstep_c = jax.jit(step_c)
        t_scn = bench(lambda: jstep_c(states_c, obs_c)[0].u_seq)

    finish(
        "bench-scaling",
        {
            "platform": platform,
            "devices": n,
            "backend": backend,
            "k_per_device": k_dev,
            "h": h,
            "t_1dev_ms": round(t1, 3),
            "t_sample_sharded_ms": round(t_sample, 3),
            "t_scenario_sharded_ms": round(t_scn, 3),
            # Weak-scaling efficiency: same per-device work, ideal ratio 1.0.
            "weak_eff_sample_axis": round(t1 / t_sample, 3),
            "weak_eff_scenario_axis": round(t1 / t_scn, 3),
            "global_k_sample_axis": k_dev * n,
            "global_solves_per_s_scenario_axis": round(n * 1e3 / t_scn, 1),
            **(
                {
                    "note": "virtual CPU devices share one machine's cores — "
                    "these efficiencies lower-bound the plumbing only; the "
                    ">=85% target is judged on real ICI hardware"
                }
                if platform == "cpu" else {}
            ),
        },
        {},
        args,
    )

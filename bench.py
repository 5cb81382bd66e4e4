"""Headline benchmark: whole-body MPPI solves/s on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "solve/s", "vs_baseline": R}

The baseline denominator is the reference-technology implementation of the
same solve (PyTorch, benchmarks/torch_reference.py) measured on this host
(torch-CPU — the reference's CUDA GPU is not available in this image; see
BASELINE.md).  The torch measurement is cached in
benchmarks/baseline_torch.json so repeated bench runs stay fast.

By default only the headline runs (each extra config costs minutes of
remote compile through the axon tunnel).  Set QMM_BENCH_FULL=1 to also time
the secondary configs (reference-parity arm/drone sizes, Pallas fused
kernels, multi-scenario batch, the K=16384/H=100 obstacle config) into
benchmarks/BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

K = 4096
H = 50
BASELINE_CACHE = os.path.join(REPO, "benchmarks", "baseline_torch.json")
DETAILS_PATH = os.path.join(REPO, "benchmarks", "BENCH_DETAILS.json")


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def bench_fn(fn, *args, iters=50, warmup=4):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup - 1):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"ms_per_solve": round(dt * 1e3, 4), "solves_per_s": round(1.0 / dt, 2)}


def torch_baseline() -> float:
    key = f"whole_body_k{K}_h{H}"
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
        if key in cache:
            return cache[key]["solves_per_s"]
    log("measuring torch-CPU reference baseline (one-time)...")
    from benchmarks.torch_reference import benchmark_whole_body

    rate = benchmark_whole_body(k=K, h=H, iters=3, warmup=1)
    cache[key] = {
        "solves_per_s": rate,
        "device": "cpu",
        "note": "reference-style PyTorch implementation; reference CUDA GPU "
        "not available in this environment",
    }
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=2)
    return rate


def headline(details: dict) -> dict:
    import jax
    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wb
    from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig

    params = wb.WholeBodyMPPIParams(
        mppi=MPPIConfig(
            n_samples=K, n_horizon=H, n_action=wb.N_ACTIONS,
            dt=0.01, lam=0.1, sigma=wb.default_sigma(), savgol_window=9,
        )
    )
    step, init = wb.make_whole_body_solver(params)
    jstep = jax.jit(step, donate_argnums=0)
    state = init(jax.random.key(0))
    obs = wb.default_obs()

    t0 = time.perf_counter()
    out, state = jstep(state, obs)
    jax.block_until_ready(out)
    log(f"compile+first solve: {time.perf_counter() - t0:.2f}s")

    # donate_argnums consumes state each call; rebuild wrapper that threads it.
    holder = {"state": state}

    def one():
        out, holder["state"] = jstep(holder["state"], obs)
        return out

    stats = bench_fn(one)
    details[f"whole_body_K{K}_H{H}"] = stats
    return stats


def secondary(details: dict) -> None:
    import jax
    import jax.numpy as jnp
    from quadrotor_manipulator_mppi_tpu.solver import arm as arm_solver
    from quadrotor_manipulator_mppi_tpu.solver import drone as drone_solver
    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wb
    from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig
    from quadrotor_manipulator_mppi_tpu.ops.pallas import drone_kernel as dk
    from quadrotor_manipulator_mppi_tpu.utils.pose import Pose

    # Reference-parity arm config (K=100, H=32).
    astep, ainit = arm_solver.make_arm_solver()
    jastep = jax.jit(astep)
    astate = ainit(jax.random.key(0))
    aobs = arm_solver.ArmObs(
        q=jnp.zeros(7), qdot=jnp.zeros(7),
        base_pose=Pose(position=jnp.asarray([0.0, 0.0, 2.1]),
                       quat=jnp.asarray([1.0, 0, 0, 0])),
        target=arm_solver.default_target(),
    )
    details["arm_K100_H32"] = bench_fn(lambda: jastep(astate, aobs)[0].qdes)

    # Reference-parity drone config (K=1000 -> 1024 for tiling comparisons).
    dparams = drone_solver.DroneMPPIParams(
        mppi=MPPIConfig(n_samples=1024, n_horizon=32, n_action=3,
                        dt=0.01, lam=0.1, sigma=30.0, savgol_window=5)
    )
    dstep, dinit = drone_solver.make_drone_solver(dparams)
    jdstep = jax.jit(dstep)
    dstate = dinit(jax.random.key(0))
    dobs = drone_solver.DroneObs(
        x=jnp.zeros(3), v=jnp.zeros(3),
        target=jnp.asarray(drone_solver.DEFAULT_TARGET),
    )
    details["drone_xla_K1024_H32"] = bench_fn(lambda: jdstep(dstate, dobs)[0].u_seq)

    # Pallas fused pipeline: in-kernel PRNG (noise never touches HBM) and
    # the explicit-noise variant for comparison.
    u0 = jnp.zeros((32, 3))
    details["drone_pallas_prng_K1024_H32"] = bench_fn(
        lambda: dk.solve_drone_pallas(
            u0, dobs.x, dobs.v, dobs.target, jnp.asarray(1, jnp.int32),
            n_samples=1024, n_horizon=32, n_action=3,
        )
    )
    noise = jax.random.normal(jax.random.key(0), (1024, 32, 3)) * 30.0
    details["drone_pallas_hbm_noise_K1024_H32"] = bench_fn(
        lambda: dk.solve_drone_pallas(
            u0, dobs.x, dobs.v, dobs.target, jnp.asarray(1, jnp.int32),
            noise=noise, n_samples=1024, n_horizon=32, n_action=3,
        )
    )

    # Multi-scenario batching (BASELINE.json config 5 shape, single chip):
    # 64 independent control problems x K=512 samples vmapped together.
    from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig as _MC
    import dataclasses as _dc

    msp = wb.WholeBodyMPPIParams()
    msp = _dc.replace(
        msp, mppi=_dc.replace(msp.mppi, n_samples=512, n_horizon=50)
    )
    mstep, minit = wb.make_whole_body_solver(msp)
    n_scn = 64
    mkeys = jax.random.split(jax.random.key(0), n_scn)
    mstates = jax.vmap(minit)(mkeys)
    mobs1 = wb.default_obs()
    mobs = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_scn,) + x.shape), mobs1
    )
    vstep = jax.jit(jax.vmap(mstep))
    out, mstates = vstep(mstates, mobs)
    jax.block_until_ready(out)
    ms = bench_fn(lambda: vstep(mstates, mobs)[0].action, iters=20)
    ms["scenario_solves_per_s"] = round(n_scn * 1e3 / ms["ms_per_solve"], 1)
    details[f"multi_scenario_{n_scn}x512_H50"] = ms

    # Large whole-body config with obstacle costs (BASELINE.json config 4).
    big = wb.WholeBodyMPPIParams(
        mppi=MPPIConfig(
            n_samples=16384, n_horizon=100, n_action=wb.N_ACTIONS,
            dt=0.01, lam=0.1, sigma=wb.default_sigma(), savgol_window=9,
        ),
        cost=wb.WholeBodyCostParams(
            obstacle_weight=100.0,
            obstacle_centers=((0.5, 0.5, 1.5), (-0.5, 1.0, 2.0)),
            obstacle_radii=(0.3, 0.4),
        ),
    )
    bstep, binit = wb.make_whole_body_solver(big)
    jbstep = jax.jit(bstep, donate_argnums=0)
    bstate = binit(jax.random.key(0))
    bobs = wb.default_obs()
    out, bstate = jbstep(bstate, bobs)
    jax.block_until_ready(out)
    holder = {"state": bstate}

    def one_big():
        out, holder["state"] = jbstep(holder["state"], bobs)
        return out

    details["whole_body_obstacles_K16384_H100"] = bench_fn(one_big, iters=20)


def main():
    import jax

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    details = {"device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"}

    stats = headline(details)
    log(f"tpu whole-body: {stats['solves_per_s']} solve/s "
        f"({stats['ms_per_solve']} ms/solve)")

    if os.environ.get("QMM_BENCH_FULL"):
        try:
            secondary(details)
        except Exception as e:  # secondary failures must not kill the headline
            details["secondary_error"] = repr(e)
            log(f"secondary benches failed: {e!r}")

    base = torch_baseline()
    details["torch_cpu_baseline_solves_per_s"] = base
    log(f"torch-cpu baseline: {base:.3f} solve/s")
    for k, v in details.items():
        log(f"  {k}: {v}")
    os.makedirs(os.path.dirname(DETAILS_PATH), exist_ok=True)
    with open(DETAILS_PATH, "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": f"whole_body_mppi_solves_per_s_K{K}_H{H}",
                "value": stats["solves_per_s"],
                "unit": "solve/s",
                "vs_baseline": round(stats["solves_per_s"] / base, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Headline benchmark: whole-body MPPI solves/s on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "solve/s", "vs_baseline": R}

The baseline denominator is the reference-technology implementation of the
same solve (PyTorch, benchmarks/torch_reference.py) measured on this host
(torch-CPU — the reference's CUDA GPU is not available in this image; see
BASELINE.md).  The torch measurement is cached in
benchmarks/baseline_torch.json so repeated bench runs stay fast.
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


def log(*args):
    print(*args, file=sys.stderr, flush=True)


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


def main():
    import jax

    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wb
    from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    params = wb.WholeBodyMPPIParams(
        mppi=MPPIConfig(
            n_samples=K,
            n_horizon=H,
            n_action=wb.N_ACTIONS,
            dt=0.01,
            lam=0.1,
            sigma=wb.default_sigma(),
            savgol_window=9,
        )
    )
    step, init = wb.make_whole_body_solver(params)
    jstep = jax.jit(step, donate_argnums=0)

    state = init(jax.random.key(0))
    obs = wb.default_obs()

    t0 = time.perf_counter()
    out, state = jstep(state, obs)
    jax.block_until_ready((out, state))
    log(f"compile+first solve: {time.perf_counter() - t0:.2f}s")

    # Warmup steady-state, then measure.
    for _ in range(3):
        out, state = jstep(state, obs)
    jax.block_until_ready(out)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out, state = jstep(state, obs)
    jax.block_until_ready((out, state))
    elapsed = time.perf_counter() - t0
    rate = iters / elapsed
    log(f"tpu whole-body: {rate:.2f} solve/s ({1e3 * elapsed / iters:.2f} ms/solve)")

    base = torch_baseline()
    log(f"torch-cpu baseline: {base:.3f} solve/s")

    print(
        json.dumps(
            {
                "metric": f"whole_body_mppi_solves_per_s_K{K}_H{H}",
                "value": round(rate, 3),
                "unit": "solve/s",
                "vs_baseline": round(rate / base, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

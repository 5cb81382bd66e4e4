"""Empirical pass split + roofline for the fused whole-body kernel
(round-4 verdict weak #4 / next #4: make "latency/VPU-bound" a measurement).

Times, all device-resident (jitted scan, state-threaded so every solve
draws fresh noise — LICM cannot hoist):

* ``full``      — the production two-pass solve;
* ``pass1``     — pass 1 (noise + rollout + FK + cost + softmin partials)
  via ``make_whole_body_pallas_step(bench_pass="cost")``;
* ``pass2+tail`` = full - pass1.

Each is compared against the analytic resource bounds
(``benchmarks.flops.roofline``): MXU time for the (H, H) operator stack at
bf16 peak, VPU time at the 4-ALU issue peak, HBM bytes at peak bandwidth.
The gap between the measured time and max(bounds) quantifies how far the
kernel is from its roofline; the round-5 glue-fusion experiment (fusing the
softmin + update tail into the passes changed nothing: 0.281 -> 0.294 ms)
already established the inter-pass XLA glue is NOT the residual.

Run on the real chip: ``python benchmarks/kernel_split.py`` (writes
``kernel_split`` into BENCH_DETAILS.json).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DETAILS_PATH = os.path.join(REPO, "benchmarks", "BENCH_DETAILS.json")

K, H = 4096, 50


def scan_time(step, init, obs, n=100, iters=3, repeats=5):
    import jax

    @jax.jit
    def run_n(st):
        def body(s, _):
            u, s = step(s, obs)
            return s, u[0]
        return jax.lax.scan(body, st, None, length=n)

    st0 = init(jax.random.key(1))
    jax.block_until_ready(run_n(st0)[1])
    blocks = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run_n(st0)
        jax.block_until_ready(out[1])
        blocks.append((time.perf_counter() - t0) / iters / n * 1e3)
    return round(statistics.median(blocks), 4), round(min(blocks), 4)


def main():
    import jax

    from benchmarks import flops
    from quadrotor_manipulator_mppi_tpu.ops.pallas.whole_body_kernel import (
        make_whole_body_pallas_step,
    )
    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wb
    from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig

    params = wb.WholeBodyMPPIParams(
        mppi=MPPIConfig(
            n_samples=K, n_horizon=H, n_action=wb.N_ACTIONS,
            dt=0.01, lam=0.1, sigma=wb.default_sigma(), savgol_window=9,
        )
    )
    _, init = wb.make_whole_body_solver(params, backend="pallas")
    obs = wb.default_obs()
    kind = getattr(jax.devices()[0], "device_kind", "")

    full = make_whole_body_pallas_step(params)
    pass1 = make_whole_body_pallas_step(params, bench_pass="cost")

    t_full, t_full_min = scan_time(full, init, obs)
    t_p1, t_p1_min = scan_time(pass1, init, obs)
    counts = flops.solve_flops(K, H, mode=params.model.control_mode)
    rl = flops.roofline(counts, t_full * 1e-3, K, H, kind)
    out = {
        "config": f"K{K}_H{H}_{params.model.control_mode}",
        "full_ms": t_full, "full_min_ms": t_full_min,
        "pass1_ms": t_p1, "pass1_min_ms": t_p1_min,
        "pass2_plus_tail_ms": round(t_full - t_p1, 4),
        "roofline": rl,
        "note": "pass1 = noise+rollout+FK+cost+softmin partials; glue "
                "fusion experiment showed inter-pass XLA work is not the "
                "residual (see BASELINE.md round-5 kernel notes)",
    }
    print(json.dumps(out, indent=2))
    details = {}
    if os.path.exists(DETAILS_PATH):
        with open(DETAILS_PATH) as f:
            details = json.load(f)
    details["kernel_split"] = out
    with open(DETAILS_PATH, "w") as f:
        json.dump(details, f, indent=2)


if __name__ == "__main__":
    main()

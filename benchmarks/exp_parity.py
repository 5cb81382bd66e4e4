"""Control-parity experiment: full-plant whole-body loop at flagship K/H.

Measures the reference's reach criterion (mppi.py:117: sum |dp| < 0.005 m,
an L1 gate on the commanded EE pose) on the in-framework full plant, plus
held-error statistics over the tail of the episode.

Usage: python benchmarks/exp_parity.py [--mode position] [--k 4096] [--steps 1000]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.sim import whole_body_loop as wbl
from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="position",
                    choices=["position", "attitude", "wrench"])
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--h", type=int, default=50)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tail", type=int, default=300, help="held-error window")
    ap.add_argument("--save", default="")
    args = ap.parse_args()

    if args.mode == "position":
        params = wbs.position_mode_params(n_samples=args.k, n_horizon=args.h)
    elif args.mode == "wrench":
        params = wbs.wrench_mode_params(n_samples=args.k, n_horizon=args.h)
    else:
        base = wbs.WholeBodyMPPIParams()
        params = dataclasses.replace(
            base, mppi=dataclasses.replace(base.mppi, n_samples=args.k, n_horizon=args.h)
        )

    run = wbl.make_whole_body_episode(params, n_control_steps=args.steps)
    _, init = wbs.make_whole_body_solver(params)
    plant = wbl.init_plant(params.model.vehicle)
    obs0 = wbs.default_obs()
    t0 = time.time()
    final, logs = jax.jit(run)(
        plant, init(jax.random.key(args.seed)), obs0.ee_target, obs0.base_target
    )
    jax.block_until_ready(logs.ee_err)
    wall = time.time() - t0
    e = np.asarray(logs.ee_err)
    t = np.asarray(logs.tilt)
    p = np.asarray(logs.base_pos)
    l1c = np.asarray(logs.l1_cmd)
    l1m = np.asarray(logs.l1_meas)
    tail = slice(-args.tail, None)
    reached = l1c < 0.005
    out = {
        "mode": args.mode,
        "k": args.k, "h": args.h, "steps": args.steps, "seed": args.seed,
        "wall_s": round(wall, 1),
        "min_ee_mm": round(float(e.min()) * 1000, 2),
        "final_ee_mm": round(float(e[-1]) * 1000, 2),
        "tail_mean_mm": round(float(e[tail].mean()) * 1000, 2),
        "tail_max_mm": round(float(e[tail].max()) * 1000, 2),
        "l1_cmd_tail_mean_mm": round(float(l1c[tail].mean()) * 1000, 2),
        "l1_cmd_tail_max_mm": round(float(l1c[tail].max()) * 1000, 2),
        "l1_meas_tail_mean_mm": round(float(l1m[tail].mean()) * 1000, 2),
        "l1_meas_tail_max_mm": round(float(l1m[tail].max()) * 1000, 2),
        "reach_gate_first_step": int(np.argmax(reached)) if reached.any() else -1,
        "held_fraction_after_reach": (
            round(float(reached[np.argmax(reached):].mean()), 3)
            if reached.any() else 0.0
        ),
        "max_tilt_rad": round(float(t.max()), 4),
        "min_alt_m": round(float(p[:, 2].min()), 3),
        # Base station-keeping (the wrench-precision claim's second gate).
        "base_exc_max_m": round(float(
            np.linalg.norm(p - np.asarray(obs0.base_target), axis=-1).max()
        ), 3),
        "base_exc_tail_max_m": round(float(
            np.linalg.norm(
                p[tail] - np.asarray(obs0.base_target), axis=-1
            ).max()
        ), 3),
    }
    print(json.dumps(out))
    if args.save:
        np.savez(
            args.save, ee_err=e, base_pos=p, tilt=t, l1_cmd=l1c, l1_meas=l1m,
            ori_err=np.asarray(logs.ori_err),
        )
        with open(args.save.rsplit(".", 1)[0] + ".json", "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

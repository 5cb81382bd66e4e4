"""Offline log analysis CLI — ``rotors_evaluation`` parity for .npz logs.

The reference's evaluation tooling parses recorded rosbags
(``/root/reference/src/rotors_simulator/rotors_evaluation/src/{hovering,
waypoints,disturbance}_eval.py`` over ``rosbag_tools/analyze_bag.py``).  The
TPU framework records trajectory logs as .npz (``run.py --save-log``); this
module computes the same metric families from them:

    python -m quadrotor_manipulator_mppi_tpu.evaluation.analyze hover \
        log.npz --target 0 0 2
    python -m quadrotor_manipulator_mppi_tpu.evaluation.analyze waypoint \
        log.npz --target 1 2 3.4 --radius 0.5
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from . import metrics


def analyze_hover(data, target, dt):
    import jax.numpy as jnp

    pos = jnp.asarray(data["pos"])
    rate = jnp.asarray(data["omega"]) if "omega" in data else jnp.zeros_like(pos)
    m = metrics.hover_metrics(pos, rate, jnp.asarray(target), dt=dt)
    return {
        "pos_rms_m": round(float(m.pos_rms), 4),
        "ang_rate_rms": round(float(m.ang_rate_rms), 4),
        "settling_time_s": round(float(m.settling_time), 2),
        "passed": bool(m.passed),
    }


def analyze_waypoint(data, target, dt, radius):
    import jax.numpy as jnp

    pos = jnp.asarray(data["pos"])
    t_resp = metrics.waypoint_response(pos, jnp.asarray(target), dt=dt, radius=radius)
    err = np.linalg.norm(np.asarray(pos) - np.asarray(target), axis=-1)
    return {
        "response_time_s": round(float(t_resp), 2),
        "min_err_m": round(float(err.min()), 4),
        "final_err_m": round(float(err[-1]), 4),
    }


def analyze_disturbance(data, target, dt, radius):
    """Recovery time: last time the error leaves the radius, after the peak
    disturbance excursion (disturbance_eval's recovery notion)."""
    import jax.numpy as jnp

    pos = np.asarray(data["pos"])
    err = np.linalg.norm(pos - np.asarray(target), axis=-1)
    peak_idx = int(err.argmax())
    st = metrics.settling_time(
        jnp.asarray(pos[peak_idx:]), jnp.asarray(target), dt=dt, radius=radius
    )
    return {
        "peak_err_m": round(float(err.max()), 4),
        "peak_time_s": round(peak_idx * dt, 2),
        "recovery_time_s": round(float(st), 2),
        "final_err_m": round(float(err[-1]), 4),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["hover", "waypoint", "disturbance"])
    p.add_argument("log")
    p.add_argument("--target", type=float, nargs=3, required=True)
    p.add_argument("--dt", type=float, default=0.01)
    p.add_argument("--radius", type=float, default=0.1)
    args = p.parse_args(argv)

    data = np.load(args.log)
    if args.kind == "hover":
        out = analyze_hover(data, args.target, args.dt)
    elif args.kind == "waypoint":
        out = analyze_waypoint(data, args.target, args.dt, args.radius)
    else:
        out = analyze_disturbance(data, args.target, args.dt, args.radius)
    print(json.dumps({"kind": args.kind, "log": args.log, **out}))


if __name__ == "__main__":
    main()

"""Scenario runner CLI — the framework's ``roslaunch + python node`` analog.

The reference runs a scenario by launching Gazebo and one of the MPPI nodes
(``README.md:14-22``: roslaunch aerial_manipulation aerial_manipulator +
python3 kinova.py).  Here one command runs the whole closed loop on device
and prints metrics JSON:

    python -m quadrotor_manipulator_mppi_tpu.run drone-waypoint
    python -m quadrotor_manipulator_mppi_tpu.run arm-reach --steps 800
    python -m quadrotor_manipulator_mppi_tpu.run whole-body --steps 300
    python -m quadrotor_manipulator_mppi_tpu.run hover --controller lee
    python -m quadrotor_manipulator_mppi_tpu.run mission

Scenario implementations live in the ``scenarios/`` package; every one
runs through the shared episode/checkpoint/report plumbing in
``scenarios/common.py`` (--steps, --seed, --save-log, --save-state /
--resume behave uniformly)."""

from __future__ import annotations

import argparse

from . import scenarios


def main(argv=None):
    p = argparse.ArgumentParser(prog="quadrotor_manipulator_mppi_tpu.run")
    p.add_argument("scenario", choices=scenarios.NAMES)
    p.add_argument("--steps", type=int, default=1000, help="control steps (100 Hz)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--controller", default="backstepping",
                   choices=["pid", "backstepping", "lee"])
    p.add_argument("--mode", default="position",
                   choices=["position", "attitude", "wrench"],
                   help="whole-body-full action mode")
    p.add_argument("--save-log", default=None)
    p.add_argument("--vehicle", default="harrier",
                   help="hover: stock vehicle preset (models/vehicles.py)")
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"],
                   help="force the CPU backend (any scenario; bench-scaling "
                        "uses it for the virtual mesh)")
    # bench-scaling options.
    p.add_argument("--devices", type=int, default=8,
                   help="bench-scaling: mesh size (clamped to available)")
    p.add_argument("--k-per-device", type=int, default=2048, dest="k_per_device")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--period", type=float, default=6.0,
                   help="figure-eight lap period [s]")
    p.add_argument("--scenarios", type=int, default=32,
                   help="whole-body-batch: batched episode count")
    p.add_argument("--hold", type=float, default=0.99,
                   help="whole-body-batch: held-fraction gate — a scenario "
                        "passes only if it HOLDS the 5 mm reach gate for "
                        "this fraction of steps after first reaching it")
    p.add_argument("--k", type=int, default=0,
                   help="fixed-wing/mapped-flight/whole-body-full: sample "
                        "count override (0 = preset)")
    p.add_argument("--file", default=None,
                   help="waypoint-file: RotorS-format waypoint file")
    p.add_argument("--smooth", action="store_true",
                   help="waypoint-file: fly a C2 cubic polynomial "
                        "trajectory through the waypoints (vel+acc "
                        "feed-forward) instead of step setpoints")
    p.add_argument("--out-dir", default=None, dest="out_dir",
                   help="camera-survey: geotagged-frame artifact directory")
    p.add_argument("--stream", default=None,
                   help="camera-survey: push captured frames to a live QMM "
                        "server (HOST:PORT) as IMAGE frames; view with "
                        "qmm_dashboard --camera")
    p.add_argument("--save-state", default=None, dest="save_state",
                   help="checkpoint the final episode state (plant + solver "
                        "incl. PRNG stream) to this .npz")
    p.add_argument("--resume", default=None,
                   help="resume from a --save-state checkpoint: the episode "
                        "continues exactly where the saved one stopped "
                        "(utils/checkpoint preserves the PRNG keys, so the "
                        "resumed noise stream is the one the uninterrupted "
                        "run would have drawn)")
    p.add_argument("--obstacles", default="spheres",
                   choices=["spheres", "esdf"],
                   help="mapped-flight: obstacle representation (top-N "
                        "sphere export or the occupancy distance field)")
    args = p.parse_args(argv)
    if args.platform == "cpu" and args.scenario != "bench-scaling":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized (e.g. under pytest conftest)
    scenarios.get(args.scenario)(args)


if __name__ == "__main__":
    main()

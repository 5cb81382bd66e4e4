"""Scenario registry: name -> runner, resolved lazily so importing the CLI
stays cheap (each scenario imports its own stack on first use)."""

from __future__ import annotations

import importlib

_REGISTRY = {
    "arm-reach": ("solvers", "run_arm_reach"),
    "bench-scaling": ("scaling", "run_bench_scaling"),
    "camera-survey": ("rotorcraft", "run_camera_survey"),
    "disturbance": ("rotorcraft", "run_disturbance"),
    "drone-waypoint": ("solvers", "run_drone_waypoint"),
    "figure-eight": ("rotorcraft", "run_figure_eight"),
    "fixed-wing": ("solvers", "run_fixed_wing"),
    "hover": ("rotorcraft", "run_hover"),
    "mapped-flight": ("solvers", "run_mapped_flight"),
    "mission": ("rotorcraft", "run_mission"),
    "multirotor-waypoint": ("solvers", "run_multirotor_waypoint"),
    "pick-weight": ("whole_body", "run_pick_weight"),
    "waypoint-file": ("rotorcraft", "run_waypoint_file"),
    "whole-body": ("solvers", "run_whole_body"),
    "whole-body-batch": ("whole_body", "run_whole_body_batch"),
    "whole-body-full": ("whole_body", "run_whole_body_full"),
}

NAMES = sorted(_REGISTRY)


def get(name: str):
    mod_name, fn_name = _REGISTRY[name]
    mod = importlib.import_module(f".{mod_name}", __package__)
    return getattr(mod, fn_name)

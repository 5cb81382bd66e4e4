"""Scenario runner CLI (in-process; conftest pins the CPU mesh)."""

import json

import numpy as np
import pytest

from quadrotor_manipulator_mppi_tpu.run import main


def run_cli(capsys, argv):
    main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_hover_lee(capsys):
    r = run_cli(capsys, ["hover", "--controller", "lee", "--steps", "400"])
    assert r["scenario"] == "hover"
    assert r["passed"] is True
    assert r["pos_rms_m"] < 0.1


def test_drone_waypoint(capsys, tmp_path):
    log = str(tmp_path / "log.npz")
    r = run_cli(capsys, ["drone-waypoint", "--steps", "300", "--save-log", log])
    assert r["scenario"] == "drone-waypoint"
    assert np.isfinite(r["min_err_m"])
    data = np.load(log)
    assert data["pos"].shape == (300, 3)


def test_mission(capsys):
    r = run_cli(capsys, ["mission", "--steps", "1500"])
    assert r["scenario"] == "mission"
    assert r["max_alt_m"] > 1.9
    assert r["landed"] is True


def test_arm_reach_short(capsys):
    r = run_cli(capsys, ["arm-reach", "--steps", "260"])
    assert r["scenario"] == "arm-reach"
    assert r["phase2"] is True

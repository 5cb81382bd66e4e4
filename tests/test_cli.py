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


def test_whole_body_mode_correct_plant(capsys):
    """Regression: the whole-body scenario must interpret attitude-mode
    actions as setpoints (one rollout-model step), not as torques fed to
    step12 — the solver should make real EE progress."""
    r = run_cli(capsys, ["whole-body", "--steps", "80"])
    assert r["min_ee_err_m"] < r["initial_ee_err_m"] * 0.75
    assert abs(r["base_alt_final_m"] - 2.1) < 0.8


def test_pick_weight_task(capsys):
    """pick_weight acceptance: reach the weight on its stand (the stand is
    a solver obstacle), grasp gated on measured EE proximity, payload
    attach (+0.5 kg with moment/inertia transfer), lift — the reference's
    task world on the full plant."""
    r = run_cli(capsys, ["pick-weight", "--steps", "700"])
    assert r["payload_kg"] == 0.5
    assert r["grasped"] is True
    assert r["grasp_hold_err_m"] < 0.05
    assert r["lift_min_err_m"] < 0.15
    assert r["max_tilt_rad"] < 0.1


def test_drone_waypoint_rejects_lee(capsys):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["drone-waypoint", "--controller", "lee", "--steps", "10"])


def test_figure_eight_aggressive_tracking(capsys):
    """Aggressive-maneuver envelope (ROADMAP control item): the adaptive
    backstepping law + AGGRESSIVE_GAINS + safeguards tracks the 6 s
    figure-eight inside the 0.15 m RMSE gate without exceeding a 0.45 rad
    commanded-tilt envelope."""
    r = run_cli(capsys, ["figure-eight", "--steps", "1800"])
    assert r["passed"] is True
    assert r["track_rms_m"] < 0.15
    assert r["max_tilt_rad"] < 0.6


def test_fixed_wing_waypoint_flyby(capsys):
    """Fixed-wing capability (gazebo_fw_dynamics_plugin physics + MPPI on
    top): the Techpod must fly by the waypoint without losing altitude or
    stalling.  Reduced K for CPU CI; run.py defaults use K=1024."""
    r = run_cli(capsys, ["fixed-wing", "--steps", "400", "--k", "192"])
    assert r["scenario"] == "fixed-wing"
    assert r["reached"] is True
    assert r["closest_approach_m"] < 20.0
    assert r["min_altitude_m"] > 80.0
    assert 10.0 < r["mean_speed_ms"] < 25.0


def test_mapped_flight_collision_free(capsys):
    """Online mapping on the control path (octomap-analog end-to-end): the
    vehicle must reach the waypoint through obstacles it discovers via
    lidar + occupancy grid, without ever touching the true geometry."""
    r = run_cli(capsys, ["mapped-flight", "--steps", "3000", "--k", "512"])
    assert r["reached"] is True
    assert r["final_dist_m"] < 0.6
    assert r["collided"] is False
    assert r["min_clearance_m"] > 0.1
    assert r["mapped_occupied_voxels"] > 20


def test_waypoint_file_mission(capsys, tmp_path):
    """waypoint_publisher_file parity: fly a RotorS-format waypoint file
    (wait_time x y z yaw_deg) with the Lee controller; every waypoint must
    be held within the hover-eval 0.2 m gate at its window end — including
    diagonal steps and yaw changes (the shaped-reference envelope)."""
    wp = tmp_path / "wps.txt"
    wp.write_text(
        "3.0 0.0 0.0 2.0 0.0\n"
        "4.0 1.5 1.5 2.5 60.0\n"
        "4.0 0.0 1.5 2.0 0.0\n"
    )
    r = run_cli(capsys, ["waypoint-file", "--file", str(wp)])
    assert r["n_waypoints"] == 3
    assert r["passed"] is True
    assert r["max_end_err_m"] < 0.2


def test_waypoint_file_default_resource(capsys):
    """The in-package example mission flies clean end to end."""
    r = run_cli(capsys, ["waypoint-file"])
    assert r["n_waypoints"] == 5
    assert r["passed"] is True


def test_mapped_flight_esdf_mode(capsys):
    """The distance-field obstacle representation (--obstacles esdf): same
    task, obstacle costs from occupancy-ESDF queries instead of the top-N
    sphere export."""
    r = run_cli(
        capsys,
        ["mapped-flight", "--steps", "3000", "--k", "512",
         "--obstacles", "esdf"],
    )
    assert r["reached"] is True
    assert r["collided"] is False
    assert r["min_clearance_m"] > 0.1


def test_waypoint_file_smooth_polynomial(capsys):
    """Polynomial-trajectory mode (mav_planning_msgs capability): the C2
    spline through the waypoints tracked with vel+acc+yaw feed-forward
    stays within 0.2 m everywhere and hits every knot."""
    r = run_cli(capsys, ["waypoint-file", "--smooth"])
    assert r["passed"] is True
    assert r["track_rms_m"] < 0.05
    assert r["max_end_err_m"] < 0.05

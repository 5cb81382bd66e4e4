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


def test_mission_save_and_resume(capsys, tmp_path):
    """--save-state / --resume: a mission checkpointed mid-flight and
    resumed continues the SAME trajectory as one uninterrupted run —
    utils/checkpoint round-trips the entire episode carry (plant, controller
    adaptation, mission state machine) and PRNG keys exactly."""
    ck = str(tmp_path / "mission.npz")
    r1 = run_cli(capsys, ["mission", "--steps", "400", "--save-state", ck])
    assert r1["final_phase"] >= 1
    import os

    assert os.path.exists(ck)
    # Resume: continues from the saved plant/mission state (cruise phase),
    # not from the ground.
    r2 = run_cli(capsys, ["mission", "--steps", "400", "--resume", ck])
    assert r2["max_alt_m"] >= r1["final_alt_m"] - 0.2


def test_whole_body_full_resume_matches_continuous(capsys, tmp_path):
    """Resumed-equals-continuous on the flagship loop: 30+30 steps through a
    checkpoint lands where one 60-step run lands (the PRNG-key and warm
    start serialization in utils/checkpoint guarantee the identical noise
    stream).  Uses the scenario functions directly at a CI-sized K."""
    import jax
    import numpy as np

    from quadrotor_manipulator_mppi_tpu.sim import whole_body_loop as wbl
    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs
    from quadrotor_manipulator_mppi_tpu.utils import checkpoint

    params = wbs.position_mode_params(n_samples=64, n_horizon=12)
    _, init = wbs.make_whole_body_solver(params)
    plant0 = wbl.init_plant(params.model.vehicle)
    obs = wbs.default_obs()
    sol0 = init(jax.random.key(0))

    run30 = jax.jit(wbl.make_whole_body_episode(params, n_control_steps=30))
    run60 = jax.jit(wbl.make_whole_body_episode(params, n_control_steps=60))

    # Continuous 60 steps.
    final_c, logs_c = run60(plant0, sol0, obs.ee_target, obs.base_target)

    # 30 steps -> checkpoint -> restore -> 30 more.
    mid, _ = run30(plant0, sol0, obs.ee_target, obs.base_target)
    ck = str(tmp_path / "wb.npz")
    checkpoint.save(ck, (mid[0], mid[1]))
    plant_r, sol_r = checkpoint.restore(ck, (plant0, sol0))
    final_r, logs_r = run30(plant_r, sol_r, obs.ee_target, obs.base_target)

    np.testing.assert_allclose(
        np.asarray(final_r[0].base.pos), np.asarray(final_c[0].base.pos),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(final_r[0].q), np.asarray(final_c[0].q), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logs_r.ee_err[-1]), np.asarray(logs_c.ee_err[-1]), atol=1e-5
    )


def test_camera_survey_writes_geotagged_frames(capsys, tmp_path):
    """The full camera stack on the product surface: orbit flight with the
    gimbal holding the depth camera on target, geotagged npz artifacts
    written at the capture cadence."""
    out = str(tmp_path / "frames")
    r = run_cli(
        capsys, ["camera-survey", "--steps", "400", "--out-dir", out]
    )
    assert r["frames_written"] >= 3
    assert r["point_err_tail_max_deg"] < 10.0
    d = np.load(r["first_frame"])
    assert d["image"].ndim == 2 and np.isfinite(d["image"]).any()
    assert abs(float(d["lat_deg"]) - 47.3667) < 0.01
    assert float(d["alt_m"]) > 488.0


def test_whole_body_batch_scenario(capsys):
    """Batched closed-loop serving: the FULL episode vmapped over scenarios
    (frozen-coefficient plant config) converges across randomized initial
    states and reports aggregate throughput."""
    r = run_cli(
        capsys,
        ["whole-body-batch", "--scenarios", "4", "--k-per-device", "64",
         "--steps", "120"],
    )
    assert r["scenarios"] == 4
    assert r["control_steps_per_s"] > 0
    # Tiny-K smoke shape: assert sane flight, not precision (the serving
    # gates live in the bench + the single-episode precision tests).
    assert r["l1_cmd_tail_mean_mm"] < 1500.0
    assert r["max_tilt_rad"] < 0.5


def test_mapped_flight_save_and_resume(capsys, tmp_path):
    """--save-state/--resume on the mapped-flight scenario round-trips the
    full carry (plant, controller, solver, occupancy grid): the resumed run
    starts with the previous run's map instead of an empty grid."""
    import os

    ck = str(tmp_path / "mapped.npz")
    r1 = run_cli(
        capsys,
        ["mapped-flight", "--steps", "250", "--k", "256", "--save-state", ck],
    )
    assert os.path.exists(ck)
    assert r1["mapped_occupied_voxels"] >= 0
    r2 = run_cli(
        capsys,
        ["mapped-flight", "--steps", "250", "--k", "256", "--resume", ck],
    )
    # The resumed run inherits the saved map: it can only add voxels.
    assert r2["mapped_occupied_voxels"] >= r1["mapped_occupied_voxels"]

"""Reference-side ROS adapter translation core + plant-parity tooling."""

import socket
import time

import numpy as np
import pytest

from quadrotor_manipulator_mppi_tpu.bridge import protocol as proto
from quadrotor_manipulator_mppi_tpu.bridge.ros_adapter import RosQmmAdapter
from quadrotor_manipulator_mppi_tpu.bridge.server import BridgeServer, SolverSession
from quadrotor_manipulator_mppi_tpu.evaluation import parity
from quadrotor_manipulator_mppi_tpu.solver import arm as arm_solver
from quadrotor_manipulator_mppi_tpu.solver import drone as drone_solver
from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig


def small_session():
    return SolverSession(
        arm_params=arm_solver.ArmMPPIParams(
            mppi=MPPIConfig(n_samples=32, n_horizon=8, n_action=7, dt=0.01,
                            lam=0.1, sigma=0.1, savgol_window=5)
        ),
        drone_params=drone_solver.DroneMPPIParams(
            mppi=MPPIConfig(n_samples=32, n_horizon=8, n_action=3, dt=0.01,
                            lam=0.1, sigma=30.0, savgol_window=5)
        ),
    )


def reference_joint_state():
    """The plugin's 14-position / 13-velocity layout (controller.cpp:304-337):
    hovering base at 2.1 m, identity quat (xyzw -> w last), arm at zero."""
    position = [0.0, 0.0, 2.1, 0.0, 0.0, 0.0, 1.0] + [0.0] * 7
    velocity = [0.0] * 13
    return position, velocity


def test_ros_adapter_round_trip_against_live_server():
    """The exact ROS-node flow minus rospy: JointState in -> QMM frames ->
    solver -> robot_cmd (7 efforts) and drone_pose (3 floats) published."""
    server = BridgeServer(session_factory=small_session)
    server.start()
    cmds, poses = [], []
    try:
        sock = socket.create_connection((server.host, server.port), timeout=5)
        adapter = RosQmmAdapter(sock, cmds.append, poses.append)
        position, velocity = reference_joint_state()
        for i in range(3):
            adapter.on_robot_states(position, velocity)
            # First reply waits on solver jit; very generous because the
            # full suite can run this under heavy host load (observed one
            # flake past 240 s on a loaded machine).  Each robot_states
            # frame produces BOTH a robot_cmd and a drone_pose reply, so
            # gate the wait on both counters — waiting on cmds alone can
            # cut off between the cmd frame and the pose frame that
            # follows it on the wire.
            deadline = time.time() + (480.0 if i == 0 else 240.0)
            want = i + 1
            while (
                (len(cmds) < want or len(poses) < want)
                and time.time() < deadline
            ):
                adapter.pump_once(timeout=0.5)
        assert len(cmds) >= 3 and len(poses) >= 3
        assert all(len(c) == 7 for c in cmds)
        assert all(len(p) == 3 for p in poses)
        tau = np.asarray(cmds[-1])
        assert np.all(np.isfinite(tau)) and np.any(np.abs(tau) > 1e-3)
        # Drone setpoints head toward the session's default target.
        assert np.all(np.isfinite(poses[-1]))
        adapter.stop()
    finally:
        server.stop()


def test_ros_adapter_ignores_short_messages():
    class DummySock:
        def __init__(self):
            self.sent = b""

        def sendall(self, b):
            self.sent += b

    s = DummySock()
    adapter = RosQmmAdapter(s, lambda c: None, lambda p: None)
    adapter.on_robot_states([0.0] * 5, [0.0] * 3)  # pre-arming partial state
    assert s.sent == b""
    position, velocity = reference_joint_state()
    adapter.on_robot_states(position, velocity)
    dec = proto.Decoder()
    dec.feed(s.sent)
    frame = dec.pop()
    assert frame.type == proto.MsgType.ROBOT_STATES
    assert len(frame.payload) == 27
    assert frame.payload[2] == pytest.approx(2.1)


def test_plant_matches_float64_oracle():
    """The in-framework JAX plant agrees with an independently written
    float64 integrator of the reference physics: single-step deviations at
    float32 rounding scale, micrometer-level 1 s near-hover trajectories."""
    rep = parity.oracle_parity_report(n_steps=1000, n_ensemble=128)
    dev = rep["single_step_max_dev"]
    assert dev["pos"] < 1e-5 and dev["vel"] < 1e-4
    assert dev["omega"] < 1e-4 and dev["quat"] < 1e-5
    assert rep["rmse_m"] < 1e-4, rep


def test_compare_logs_reports_deviation():
    a = {"pos": np.zeros((100, 3))}
    b = {"pos": np.zeros((100, 3))}
    b["pos"][50:, 0] = 0.01
    rep = parity.compare_logs(a, b, dt=0.01)
    assert rep["max_dev_m"] == pytest.approx(0.01)
    assert rep["final_dev_m"] == pytest.approx(0.01)
    assert rep["n_steps"] == 100

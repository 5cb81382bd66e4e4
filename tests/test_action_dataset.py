"""Action interface (the reference's declared ROS-Action to-do) + data
collection (its declared Data-Collection to-do): goal/feedback/result
semantics over the QMM bridge, and dataset record/save/load round-trips."""

import numpy as np
import pytest

from quadrotor_manipulator_mppi_tpu.bridge import protocol as proto
from quadrotor_manipulator_mppi_tpu.bridge.action import (
    ActionManager,
    ActionStatus,
    Task,
    cancel_frame,
    goal_frame,
)
from quadrotor_manipulator_mppi_tpu.evaluation import dataset as ds

from test_bridge import small_session


def _hover_state(z=2.1):
    state = [0.0] * 27
    state[2] = z
    state[6] = 1.0  # identity quaternion (xyzw)
    return state


def test_waypoint_goal_feedback_then_success():
    s = small_session()
    s.actions = ActionManager(hold_ticks=5, feedback_every=2, waypoint_tol=0.05)
    # Goal at the current hover position: already in tolerance.
    out = s.actions.handle_goal(
        goal_frame(1, Task.WAYPOINT, [0.0, 0.0, 2.1]).payload, s
    )
    assert out[-1].type == proto.MsgType.ACTION_FEEDBACK
    np.testing.assert_allclose(s.drone_target, [0.0, 0.0, 2.1])

    frames = []
    for _ in range(6):
        frames += [f for f in s.handle_states(_hover_state())
                   if f.type in (proto.MsgType.ACTION_FEEDBACK,
                                 proto.MsgType.ACTION_RESULT)]
    assert frames[-1].type == proto.MsgType.ACTION_RESULT
    assert frames[-1].payload[0] == 1.0
    assert frames[-1].payload[1] == float(ActionStatus.SUCCEEDED)
    assert any(f.type == proto.MsgType.ACTION_FEEDBACK for f in frames[:-1])
    # Terminal goal stops ticking: no further action frames.
    more = [f for f in s.handle_states(_hover_state())
            if f.type in (proto.MsgType.ACTION_FEEDBACK,
                          proto.MsgType.ACTION_RESULT)]
    assert more == []


def test_new_goal_preempts_active_one():
    s = small_session()
    s.actions.handle_goal(goal_frame(1, Task.WAYPOINT, [5.0, 0.0, 2.0]).payload, s)
    out = s.actions.handle_goal(
        goal_frame(2, Task.WAYPOINT, [0.0, 5.0, 2.0]).payload, s
    )
    results = [f for f in out if f.type == proto.MsgType.ACTION_RESULT]
    assert results and results[0].payload[0] == 1.0
    assert results[0].payload[1] == float(ActionStatus.PREEMPTED)
    assert s.actions.active.goal_id == 2
    np.testing.assert_allclose(s.drone_target, [0.0, 5.0, 2.0])


def test_cancel_and_timeout():
    s = small_session()
    mgr = ActionManager(timeout_ticks=3, feedback_every=100)
    s.actions = mgr
    mgr.handle_goal(goal_frame(7, Task.WAYPOINT, [9.0, 9.0, 9.0]).payload, s)
    out = mgr.handle_cancel(cancel_frame(7).payload, s)
    assert out[0].payload[1] == float(ActionStatus.CANCELED)
    # Cancel for a stale id is ignored.
    assert mgr.handle_cancel(cancel_frame(7).payload, s) == []

    mgr.handle_goal(goal_frame(8, Task.WAYPOINT, [9.0, 9.0, 9.0]).payload, s)
    res = []
    for _ in range(5):
        res += mgr.on_tick(1e9, np.zeros(3))
    assert res and res[-1].payload[1] == float(ActionStatus.ABORTED)


def test_land_goal_flows_through_session():
    s = small_session()
    s.actions.handle_goal(goal_frame(3, Task.LAND, []).payload, s)
    assert s.land
    out = s.actions.on_tick(0.0, np.asarray([0.0, 0.0, 0.03]))
    assert out and out[0].payload[1] == float(ActionStatus.SUCCEEDED)


def test_ee_reach_goal_updates_target_and_uses_l1_metric():
    s = small_session()
    s.actions = ActionManager(hold_ticks=1)
    s.actions.handle_goal(
        goal_frame(4, Task.EE_REACH, [0.2, 0.1, 1.8]).payload, s
    )
    np.testing.assert_allclose(np.asarray(s.ee_target.position), [0.2, 0.1, 1.8])
    assert s.actions.on_tick(0.006, np.zeros(3)) == []         # above reach tol
    out = s.actions.on_tick(0.004, np.zeros(3))                # mppi.py:117 gate
    assert out and out[0].payload[1] == float(ActionStatus.SUCCEEDED)


# ---------------------------------------------------------------------------
# Data collection
# ---------------------------------------------------------------------------

def test_recorder_roundtrip(tmp_path):
    rec = ds.TrajectoryRecorder(metadata={"task": "unit"})
    for i in range(4):
        rec.record(x=np.full(3, float(i)), u=np.full((2, 5), float(-i)))
    path = str(tmp_path / "traj.npz")
    rec.save(path)
    arrs, meta = ds.load_dataset(path)
    assert meta["task"] == "unit" and meta["n_steps"] == 4
    assert arrs["x"].shape == (4, 3) and arrs["u"].shape == (4, 2, 5)
    np.testing.assert_allclose(arrs["x"][:, 0], [0, 1, 2, 3])

    with pytest.raises(ValueError, match="fields"):
        rec.record(x=np.zeros(3))  # missing field


def test_collect_whole_body_dataset(tmp_path):
    import dataclasses

    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wb
    from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig

    params = wb.WholeBodyMPPIParams(
        mppi=MPPIConfig(n_samples=32, n_horizon=8, n_action=wb.N_ACTIONS,
                        dt=0.01, lam=0.1, sigma=wb.default_sigma(),
                        savgol_window=5)
    )
    rec = ds.collect_whole_body(
        n_solves=3, seed=1, params=params,
        low_k_guard="off",  # intentional tiny smoke shape
    )
    assert len(rec) == 3
    path = str(tmp_path / "wb.npz")
    rec.save(path)
    arrs, meta = ds.load_dataset(path)
    assert arrs["u_seq"].shape == (3, 8, 11)
    assert arrs["q"].shape == (3, 7)
    assert np.isfinite(arrs["u_seq"]).all()
    assert meta["n_horizon"] == 8 and meta["task"] == "whole_body_reach"
    # Perturbed initial states actually vary.
    assert np.std(arrs["base_pos"], axis=0).max() > 0.01

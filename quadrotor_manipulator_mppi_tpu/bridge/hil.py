"""HIL (hardware-in-the-loop) session: the in-framework plant speaking
MAVLink over UDP — the runtime role of ``gazebo_mavlink_interface``.

The reference plugin sits inside gzserver, streams ``HIL_SENSOR`` /
``HIL_STATE_QUATERNION`` to a PX4-class autopilot over UDP and applies the
``HIL_ACTUATOR_CONTROLS`` it receives to the rotors
(``gazebo_mavlink_interface.cpp:407-717``).  :class:`HilSession` does the
same around the JAX multirotor plant: each :meth:`tick` steps the plant at
the physics rate, emits the sensor/state messages (ISA pressure, NWU->FRD
conversions — ``bridge/mavlink.py``), polls the socket, and decodes
actuator controls into rotor-speed references via the
``(control + offset) * scaling + zero_position`` pipeline.

Transport is a plain UDP datagram pair, like upstream; any mavlink-speaking
autopilot (PX4 SITL, QGroundControl, or the loopback test controller in
``tests/test_hil.py``) can sit on the other end.
"""

from __future__ import annotations

import socket
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..models import multirotor as mr
from ..utils import rotations as rot
from . import mavlink as mav


@dataclass
class HilConfig:
    physics_dt: float = 0.001
    sensor_interval: int = 4       # HIL_SENSOR every N physics ticks (250 Hz)
    state_interval: int = 10       # HIL_STATE_QUATERNION every N ticks
    sysid: int = 1
    compid: int = 200              # the reference's encode_chan(1, 200, ...)
    lat_deg: float = 47.3667       # Zurich home (kLatZurich)
    lon_deg: float = 8.5500
    alt_home: float = mav.KALT_ZURICH_M


class HilSession:
    """One plant + one UDP peer.  Not jitted end-to-end (the socket is a
    host boundary by definition); the plant step itself is the jitted
    ``multirotor.step``."""

    def __init__(
        self,
        vehicle: Optional[mr.MultirotorParams] = None,
        config: HilConfig = None,
        bind: Tuple[str, int] = ("127.0.0.1", 0),
        peer: Optional[Tuple[str, int]] = None,
    ):
        self.vehicle = vehicle or mr.MultirotorParams()
        self.config = config or HilConfig()
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(bind)
        self.sock.setblocking(False)
        self.peer = peer
        self.parser = mav.Parser()
        self.amap = mav.ActuatorMap.rotors(
            self.vehicle.n_rotors, self.vehicle.max_rotor_speed
        )
        self.plant = mr.init_state(self.vehicle)
        self.rotor_cmd = np.zeros(self.vehicle.n_rotors)
        self.armed = False
        self.tick_count = 0
        self.seq = 0
        self._last_vel = np.zeros(3)

    @property
    def address(self) -> Tuple[str, int]:
        return self.sock.getsockname()

    def _send(self, name: str, values: dict) -> None:
        if self.peer is None:
            return
        frame = mav.encode(
            name, values, seq=self.seq, sysid=self.config.sysid,
            compid=self.config.compid,
        )
        self.seq = (self.seq + 1) & 0xFF
        self.sock.sendto(frame, self.peer)

    def _poll(self) -> None:
        while True:
            try:
                data, addr = self.sock.recvfrom(4096)
            except BlockingIOError:
                return
            if self.peer is None:
                self.peer = addr
            for name, msg in self.parser.push(data):
                if name == "HIL_ACTUATOR_CONTROLS":
                    refs, armed = mav.decode_actuator_controls(msg, self.amap)
                    self.rotor_cmd, self.armed = refs, armed

    def tick(self) -> None:
        """One physics step + message exchange."""
        cfg = self.config
        self._poll()
        prev_vel = np.asarray(self.plant.vel, np.float64)
        self.plant = mr.step(
            self.vehicle, self.plant, jnp.asarray(self.rotor_cmd),
            cfg.physics_dt,
        )
        self.tick_count += 1
        t_usec = int(self.tick_count * cfg.physics_dt * 1e6)

        pos = np.asarray(self.plant.pos, np.float64)
        vel = np.asarray(self.plant.vel, np.float64)
        quat = np.asarray(self.plant.quat, np.float64)
        omega = np.asarray(self.plant.omega, np.float64)
        rmat = np.asarray(rot.quat_to_matrix(self.plant.quat), np.float64)

        if self.tick_count % cfg.sensor_interval == 0:
            # specific force in body frame: R^T (a - g), NWU
            acc_w = (vel - prev_vel) / cfg.physics_dt
            f_spec = rmat.T @ (acc_w - np.array([0.0, 0.0, -mr.GRAVITY]))
            # Local geomagnetic field at the home fix: WMM magnetic-north
            # components rotated by the table declination (the plugin's
            # per-fix q_dn rotation) — NED -> NWU flips E and D.
            mag_ned = mav.mag_field_ned(cfg.lat_deg, cfg.lon_deg)
            mag_b = rmat.T @ np.array(
                [mag_ned[0], -mag_ned[1], -mag_ned[2]]
            )
            self._send(
                "HIL_SENSOR",
                mav.hil_sensor_values(
                    time_usec=t_usec,
                    accel_body_nwu=f_spec,
                    gyro_body_nwu=omega,
                    mag_body_nwu=mag_b,
                    alt_amsl=cfg.alt_home + pos[2],
                    airspeed_body_x=float((rmat.T @ vel)[0]),
                ),
            )

        if self.tick_count % cfg.state_interval == 0:
            # NWU world / body -> NED / FRD: flip y, z of world vectors and
            # the matching quaternion conjugation (q_ng/q_br of :410-417).
            vel_ned = np.array([vel[0], -vel[1], -vel[2]])
            # quaternion NWU->NED: q_ned = q_flip * q * q_flip with
            # q_flip = (0, 1, 0, 0) — componentwise: (w, x, -y, -z).
            q_ned = np.array([quat[0], quat[1], -quat[2], -quat[3]])
            acc_b = rmat.T @ ((vel - prev_vel) / cfg.physics_dt)
            self._send(
                "HIL_STATE_QUATERNION",
                mav.hil_state_quaternion_values(
                    time_usec=t_usec,
                    quat_wxyz_ned=q_ned,
                    omega_body_frd=mav.nwu_to_frd(omega),
                    lat_deg=cfg.lat_deg,
                    lon_deg=cfg.lon_deg,
                    alt_m=cfg.alt_home + pos[2],
                    vel_ned=vel_ned,
                    accel_body_frd=mav.nwu_to_frd(acc_b),
                    true_airspeed=float(np.linalg.norm(vel)),
                ),
            )

    def close(self) -> None:
        self.sock.close()

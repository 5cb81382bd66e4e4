"""End-to-end HIL loop over UDP: a loopback 'autopilot' arms the plant and
commands hover-class rotor speeds purely through MAVLink datagrams —
the gazebo_mavlink_interface runtime role, closed against the real plant."""

import socket

import numpy as np

from quadrotor_manipulator_mppi_tpu.bridge import hil as hil_mod
from quadrotor_manipulator_mppi_tpu.bridge import mavlink as mav
from quadrotor_manipulator_mppi_tpu.models import multirotor as mr


def test_hil_udp_loop_climbs_under_mavlink_control():
    veh = mr.MultirotorParams()
    # loopback "autopilot"
    ap = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    ap.bind(("127.0.0.1", 0))
    ap.setblocking(False)

    session = hil_mod.HilSession(
        vehicle=veh, bind=("127.0.0.1", 0), peer=ap.getsockname()
    )
    try:
        # above-hover normalized command on all rotors, armed
        hover = veh.hover_rotor_speed(extra_mass=0.0)
        cmd = min(1.0, 1.05 * hover / veh.max_rotor_speed)
        controls = [cmd] * veh.n_rotors + [0.0] * (16 - veh.n_rotors)
        frame = mav.encode(
            "HIL_ACTUATOR_CONTROLS",
            dict(time_usec=0, flags=mav.MOTOR_SPEED_FLAG, controls=controls,
                 mode=mav.MAV_MODE_FLAG_SAFETY_ARMED),
        )
        ap.sendto(frame, session.address)

        parser = mav.Parser()
        got = {}
        for _ in range(600):  # 0.6 s of physics
            session.tick()
            try:
                while True:
                    data, _ = ap.recvfrom(4096)
                    for name, msg in parser.push(data):
                        got[name] = msg
            except BlockingIOError:
                pass

        # the mavlink-commanded thrust made it climb
        assert session.armed
        assert float(session.plant.pos[2]) > 0.05
        # both HIL streams arrived and carry consistent physics
        assert "HIL_SENSOR" in got and "HIL_STATE_QUATERNION" in got
        state = got["HIL_STATE_QUATERNION"]
        assert state["alt"] > int(mav.KALT_ZURICH_M * 1000)  # climbed above home
        # NED vertical velocity negative while climbing
        assert state["vz"] < 0
        sensor = got["HIL_SENSOR"]
        # FRD specific force at near-hover: zacc ~ -g
        assert sensor["zacc"] < -5.0
        assert 900.0 < sensor["abs_pressure"] < 1013.0  # hPa at altitude
    finally:
        session.close()
        ap.close()


def test_hil_disarmed_stays_grounded():
    veh = mr.MultirotorParams()
    ap = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    ap.bind(("127.0.0.1", 0))
    ap.setblocking(False)
    session = hil_mod.HilSession(
        vehicle=veh, bind=("127.0.0.1", 0), peer=ap.getsockname()
    )
    try:
        controls = [1.0] * 16
        frame = mav.encode(
            "HIL_ACTUATOR_CONTROLS",
            dict(time_usec=0, flags=mav.MOTOR_SPEED_FLAG, controls=controls,
                 mode=0),  # NOT armed
        )
        ap.sendto(frame, session.address)
        for _ in range(200):
            session.tick()
        assert not session.armed
        np.testing.assert_allclose(session.rotor_cmd, 0.0)
        assert abs(float(session.plant.pos[2])) < 1e-3
    finally:
        session.close()
        ap.close()

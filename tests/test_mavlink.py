"""MAVLink v1 codec + HIL adapter tests (gazebo_mavlink_interface parity)."""

import struct

import numpy as np
import pytest

from quadrotor_manipulator_mppi_tpu.bridge import mavlink as mav


def test_payload_lengths_match_common_dialect():
    """The size-sorted wire layouts must reproduce the official common.xml
    payload lengths — a strong structural check on field order/types."""
    expected = {
        "HEARTBEAT": 9,
        "SYSTEM_TIME": 12,
        "HIL_ACTUATOR_CONTROLS": 81,
        "HIL_SENSOR": 64,
        "HIL_GPS": 36,
        "HIL_OPTICAL_FLOW": 44,
        "HIL_STATE_QUATERNION": 64,
        "DISTANCE_SENSOR": 14,
    }
    for name, ln in expected.items():
        assert mav.MESSAGES_BY_NAME[name].length == ln, name


def test_x25_crc_known_vector():
    """X.25 of the MAVLINK_MESSAGE_CRCS seed string convention: empty data
    returns the seed; a single zero byte gives the known 0xE1F0? — instead
    pin two self-evident properties plus a struct-level frame roundtrip."""
    assert mav.x25_crc(b"") == 0xFFFF
    # incremental == one-shot
    a = mav.x25_crc(b"hello world")
    b = mav.x25_crc(b"world", seed=mav.x25_crc(b"hello "))
    assert a == b


def _roundtrip(name, values, **kw):
    frame = mav.encode(name, values, **kw)
    parser = mav.Parser()
    msgs = parser.push(frame)
    assert len(msgs) == 1
    got_name, got = msgs[0]
    assert got_name == name
    return got


def test_heartbeat_roundtrip():
    got = _roundtrip(
        "HEARTBEAT",
        dict(custom_mode=42, type=2, autopilot=12, base_mode=81,
             system_status=4, mavlink_version=3),
        seq=7, sysid=1, compid=200,
    )
    assert got["custom_mode"] == 42
    assert got["mavlink_version"] == 3


def test_hil_sensor_roundtrip():
    vals = mav.hil_sensor_values(
        time_usec=123456789,
        accel_body_nwu=[0.1, 0.2, -9.8],
        gyro_body_nwu=[0.01, -0.02, 0.03],
        mag_body_nwu=[0.21, 0.0, 0.42],
        alt_amsl=488.0,
        airspeed_body_x=15.0,
    )
    got = _roundtrip("HIL_SENSOR", vals)
    assert got["time_usec"] == 123456789
    # NWU -> FRD flips y and z
    np.testing.assert_allclose(got["yacc"], -0.2, rtol=1e-6)
    np.testing.assert_allclose(got["zacc"], 9.8, rtol=1e-5)
    assert got["fields_updated"] == 4095


def test_isa_pressure_model():
    """ISA troposphere exactly as gazebo_mavlink_interface.cpp:462-505."""
    p0, t0, rho0 = mav.isa_pressure(0.0)
    np.testing.assert_allclose(p0, 101325.0, rtol=1e-9)
    np.testing.assert_allclose(t0, 288.0)
    np.testing.assert_allclose(rho0, 1.225, rtol=1e-9)
    p, t, rho = mav.isa_pressure(488.0)  # Zurich home altitude
    t_ref = 288.0 - 0.0065 * 488.0
    np.testing.assert_allclose(t, t_ref)
    np.testing.assert_allclose(p, 101325.0 / (288.0 / t_ref) ** 5.256,
                               rtol=1e-9)
    assert p < p0 and rho < rho0


def test_hil_state_quaternion_scalings():
    vals = mav.hil_state_quaternion_values(
        time_usec=1,
        quat_wxyz_ned=[1.0, 0.0, 0.0, 0.0],
        omega_body_frd=[0.1, 0.2, 0.3],
        lat_deg=47.3667, lon_deg=8.55, alt_m=488.0,
        vel_ned=[1.0, -2.0, 0.5],
        accel_body_frd=[0.0, 0.0, -9.81],
        true_airspeed=15.0,
    )
    got = _roundtrip("HIL_STATE_QUATERNION", vals)
    assert got["lat"] == int(47.3667e7)
    assert got["alt"] == 488000
    assert got["vx"] == 100 and got["vy"] == -200 and got["vz"] == 50
    assert got["true_airspeed"] == 1500
    assert got["zacc"] == -9810
    np.testing.assert_allclose(got["attitude_quaternion"], [1, 0, 0, 0])


def test_hil_actuator_controls_decode():
    amap = mav.ActuatorMap.rotors(8, max_speed=650.0)
    controls = [0.5] * 8 + [0.0] * 8
    vals = dict(time_usec=10, flags=mav.MOTOR_SPEED_FLAG, controls=controls,
                mode=mav.MAV_MODE_FLAG_SAFETY_ARMED)
    got = _roundtrip("HIL_ACTUATOR_CONTROLS", vals)
    refs, armed = mav.decode_actuator_controls(got, amap)
    assert armed
    np.testing.assert_allclose(refs, 325.0)
    # disarmed -> zero_position_disarmed
    vals["mode"] = 0
    got = _roundtrip("HIL_ACTUATOR_CONTROLS", vals)
    refs, armed = mav.decode_actuator_controls(got, amap)
    assert not armed
    np.testing.assert_allclose(refs, 0.0)


def test_parser_resync_through_garbage():
    f1 = mav.encode("HEARTBEAT", dict(custom_mode=1, type=2, autopilot=3,
                                      base_mode=4, system_status=5,
                                      mavlink_version=6))
    f2 = mav.encode("DISTANCE_SENSOR", dict(
        time_boot_ms=99, min_distance=20, max_distance=3000,
        current_distance=150, type=0, id=0, orientation=25, covariance=0))
    stream = b"\x00\x13garbage" + f1 + b"\xfe\x05junk" + f2 + b"\x01"
    parser = mav.Parser()
    msgs = []
    # feed byte-by-byte to exercise partial-frame buffering
    for i in range(0, len(stream), 3):
        msgs.extend(parser.push(stream[i:i + 3]))
    names = [n for n, _ in msgs]
    assert names == ["HEARTBEAT", "DISTANCE_SENSOR"]
    assert msgs[1][1]["orientation"] == 25  # downward facing (LidarCallback)


def test_corrupted_crc_rejected():
    f = mav.encode("HEARTBEAT", dict(custom_mode=1, type=2, autopilot=3,
                                     base_mode=4, system_status=5,
                                     mavlink_version=6))
    bad = f[:-1] + bytes([f[-1] ^ 0xFF])
    parser = mav.Parser()
    assert parser.push(bad) == []


def test_seq_and_ids_in_header():
    f = mav.encode("SYSTEM_TIME", dict(time_unix_usec=5, time_boot_ms=6),
                   seq=200, sysid=42, compid=9)
    assert f[0] == 0xFE
    assert f[2] == 200 and f[3] == 42 and f[4] == 9 and f[5] == 2


def test_array_length_validation():
    with pytest.raises(ValueError):
        mav.encode("HIL_ACTUATOR_CONTROLS", dict(
            time_usec=1, flags=0, controls=[0.0] * 4, mode=0))


def test_mag_declination_table_semantics():
    """geo_mag_declination.cpp port: floor-to-grid bilinear lookup with the
    plugin's bound clamps; spot values match the table and the plugin's own
    calibration comment (Seattle ~15 deg, gazebo_mavlink_interface.cpp:28)."""
    import numpy as np

    from quadrotor_manipulator_mppi_tpu.bridge import mavlink as mav

    # Exact grid point: lat=0, lon=0 -> table row 6 (lat index), col 18 -> -5.
    assert mav.mag_declination(0.0, 0.0) == pytest.approx(np.deg2rad(-5.0))
    # Out-of-range fixes return 0 (plugin :85-92).
    assert mav.mag_declination(95.0, 0.0) == 0.0
    # Seattle (47.59, -122.32): the reference's own comment says ~15 deg.
    sea = np.rad2deg(mav.mag_declination(47.592182, -122.316031))
    assert 13.0 < sea < 17.0, sea
    # Zurich: small positive declination (~2 deg in WMM2015).
    zrh = np.rad2deg(mav.mag_declination(47.3667, 8.55))
    assert 0.0 < zrh < 5.0, zrh


def test_mag_field_rotates_with_declination():
    import numpy as np

    from quadrotor_manipulator_mppi_tpu.bridge import mavlink as mav

    ned = mav.mag_field_ned(47.3667, 8.55)
    # Horizontal magnitude preserved, D untouched, E now nonzero.
    assert ned[2] == pytest.approx(mav.MAG_FIELD_D_NED[2])
    assert np.hypot(ned[0], ned[1]) == pytest.approx(mav.MAG_FIELD_D_NED[0])
    assert ned[1] != 0.0

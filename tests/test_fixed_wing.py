"""Fixed-wing aerodynamics tests (gazebo_fw_dynamics_plugin / liftdrag_plugin
behavioral parity: trim flight, static stability signs, stall model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadrotor_manipulator_mppi_tpu.models import fixed_wing as fw
from quadrotor_manipulator_mppi_tpu.utils import rotations as rot

AERO = fw.FwAeroParams()
VEH = fw.FwVehicleParams()


def _controls(ail=0.0, elev=0.0, flap=0.0, rud=0.0, thr=0.0, ail_diff=0.0):
    z = jnp.asarray
    return fw.FwControls(
        aileron_left=z(ail + ail_diff),
        aileron_right=z(ail - ail_diff),
        elevator=z(elev),
        flap=z(flap),
        rudder=z(rud),
        throttle=z(thr),
    )


def _trim_residual(x, speed):
    """(acc_x, acc_z, pitch-moment) residual at pitch attitude theta for a
    level flight path; computed from forces (no finite differencing, so f32
    rounding stays ~1e-5)."""
    theta, elev, thr = [float(v) for v in x]
    quat = rot.quat_from_axis_angle(jnp.asarray([0.0, theta, 0.0]))
    r = rot.quat_to_matrix(quat)
    v_air_b = jnp.einsum("ji,j->i", r, jnp.asarray([speed, 0.0, 0.0]))
    f_b, m_b = fw.fw_forces_moments(
        AERO, VEH, v_air_b, jnp.zeros(3), _controls(elev=elev, thr=thr)
    )
    f_w = jnp.einsum("ij,j->i", r, f_b)
    return np.array(
        [
            float(f_w[0]) / VEH.mass,
            float(f_w[2]) / VEH.mass - fw.GRAVITY,
            float(m_b[1]),
        ]
    )


def _solve_trim(speed=15.0):
    from scipy.optimize import fsolve

    x0 = np.array([0.05, 0.0, 0.4])
    x, info, ier, _ = fsolve(
        _trim_residual, x0, args=(speed,), full_output=True,
        xtol=1e-8, epsfcn=1e-6,
    )
    assert ier == 1, info
    return x


def test_trim_exists_and_is_sane():
    """A level-flight trim exists at cruise speed with physical values:
    small positive pitch, moderate throttle, lift balancing weight."""
    theta, elev, thr = _solve_trim(15.0)
    # NWU body frame: y points left, so nose-UP is a negative rotation
    # about +y; trim needs a small positive angle of attack.
    assert -0.2 < theta < 0.0
    assert abs(elev) < 1.0
    assert 0.0 < thr < 1.0
    res = _trim_residual([theta, elev, thr], 15.0)
    assert np.max(np.abs(res)) < 1e-3


def test_trimmed_flight_holds_altitude():
    """Integrating from trim for 2 s keeps altitude and speed (the pitch
    stiffness c_pitch_moment_alpha < 0 makes the Techpod statically stable)."""
    speed = 15.0
    theta, elev, thr = _solve_trim(speed)
    quat = rot.quat_from_axis_angle(jnp.asarray([0.0, float(theta), 0.0]))
    state = fw.FixedWingState(
        pos=jnp.asarray([0.0, 0.0, 100.0]),
        quat=quat,
        vel=jnp.asarray([speed, 0.0, 0.0]),
        omega=jnp.zeros(3),
    )
    controls = _controls(elev=float(elev), thr=float(thr))
    dt = 1e-3

    def body(s, _):
        return fw.step(AERO, VEH, s, controls, dt), s.pos[2]

    state_f, alts = jax.lax.scan(body, state, None, length=2000)
    assert abs(float(state_f.pos[2]) - 100.0) < 1.0
    assert abs(float(jnp.linalg.norm(state_f.vel)) - speed) < 1.0
    assert np.all(np.abs(np.asarray(alts) - 100.0) < 1.5)


def test_static_stability_signs():
    """Restoring-moment directions: pitch-up perturbation -> nose-down moment;
    positive sideslip -> weathervane yaw; aileron differential -> roll."""
    v = jnp.asarray([15.0, 0.0, 0.0])
    om = jnp.zeros(3)

    # alpha > 0 (NWU: negative body z velocity = NED w > 0)
    _, m_up = fw.fw_forces_moments(
        AERO, VEH, jnp.asarray([15.0, 0.0, -1.5]), om, _controls()
    )
    _, m_dn = fw.fw_forces_moments(
        AERO, VEH, jnp.asarray([15.0, 0.0, 1.5]), om, _controls()
    )
    # NWU pitch moment = -NED pitch moment; alpha>0 must pitch DOWN in NED
    # (c_pitch_moment_alpha slope -2.969) => NWU my > baseline.
    _, m_0 = fw.fw_forces_moments(AERO, VEH, v, om, _controls())
    assert float(m_up[1]) > float(m_0[1])
    assert float(m_dn[1]) < float(m_0[1])

    # positive NED sideslip (wind from the right; NWU -y airspeed component)
    _, m_beta = fw.fw_forces_moments(
        AERO, VEH, jnp.asarray([15.0, -2.0, 0.0]), om, _controls()
    )
    # c_yaw_moment_beta = +0.043: NED yaw moment positive -> NWU mz negative
    assert float(m_beta[2]) < float(m_0[2])

    # aileron differential rolls (c_roll_moment_delta_ail = +0.057; roll axis
    # is unflipped between NED and NWU)
    _, m_ail = fw.fw_forces_moments(AERO, VEH, v, om, _controls(ail_diff=0.5))
    assert float(m_ail[0]) > float(m_0[0])

    # rudder yaws (c_yaw_moment_delta_rud = +0.06 -> NED +mz -> NWU -mz)
    _, m_rud = fw.fw_forces_moments(AERO, VEH, v, om, _controls(rud=0.5))
    assert float(m_rud[2]) < float(m_0[2])


def test_throttle_thrust_quadratic():
    f0, _ = fw.fw_forces_moments(AERO, VEH, jnp.zeros(3), jnp.zeros(3),
                                 _controls(thr=0.0))
    f5, _ = fw.fw_forces_moments(AERO, VEH, jnp.zeros(3), jnp.zeros(3),
                                 _controls(thr=0.5))
    f1, _ = fw.fw_forces_moments(AERO, VEH, jnp.zeros(3), jnp.zeros(3),
                                 _controls(thr=1.0))
    # c_thrust = (0, 14.7217, 0): linear in throttle, along body x
    assert abs(float(f0[0])) < 1e-6
    np.testing.assert_allclose(float(f5[0]), 14.7217 * 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(f1[0]), 14.7217, rtol=1e-5)


def test_actuator_channel_map():
    arr = jnp.asarray([0.1, 0.2, 0.3, 0.4, 0.5, 0.6])
    c = fw.controls_from_actuators(arr)
    assert float(c.aileron_right) == pytest.approx(0.1)
    assert float(c.elevator) == pytest.approx(0.2)
    assert float(c.flap) == pytest.approx(0.3)
    assert float(c.rudder) == pytest.approx(0.4)
    assert float(c.aileron_left) == pytest.approx(0.5)
    assert float(c.throttle) == pytest.approx(0.6)


def test_batched_matches_single():
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    vels = jax.random.normal(keys[0], (8, 3)) * 5 + jnp.asarray([12.0, 0, 0])
    oms = jax.random.normal(keys[1], (8, 3)) * 0.3
    c = _controls(elev=0.1, thr=0.5, ail_diff=0.2)
    cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (8,)), c)
    fb, mb = fw.fw_forces_moments(AERO, VEH, vels, oms, cb)
    for i in range(8):
        fi, mi = fw.fw_forces_moments(AERO, VEH, vels[i], oms[i], c)
        np.testing.assert_allclose(np.asarray(fb[i]), np.asarray(fi), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mb[i]), np.asarray(mi), rtol=1e-6)


# ---------------------------------------------------------------------------
# liftdrag_plugin surface element
# ---------------------------------------------------------------------------


def test_liftdrag_lift_slope_and_stall():
    """Pre-stall lift is linear in alpha; past alpha_stall it decays with the
    post-stall slope (liftdrag_plugin.cpp:260-283)."""
    p = fw.LiftDragParams(cla=5.0, cda=0.1, alpha_stall=0.3, cla_stall=-2.0,
                          area=0.5)
    eye = jnp.eye(3)
    speed = 10.0

    def lift_z(alpha):
        # inflow tilted by alpha below the horizon: body stays level
        vel = jnp.asarray(
            [speed * np.cos(alpha), 0.0, -speed * np.sin(alpha)]
        )
        f, _ = fw.liftdrag_wrench(p, eye, vel)
        return float(f[2])

    q = 0.5 * p.air_density * speed**2 * p.area
    # linear region: lift ~ cla * alpha * q * area (z component, small alpha)
    for a in (0.05, 0.1, 0.2):
        np.testing.assert_allclose(lift_z(a), p.cla * a * q, rtol=0.05)
    # post-stall decays
    assert lift_z(0.45) < lift_z(0.29)


def test_liftdrag_drag_opposes_motion():
    p = fw.LiftDragParams(cla=5.0, cda=0.5, alpha_stall=0.3, area=0.5)
    vel = jnp.asarray([10.0, 0.0, -1.0])
    f, _ = fw.liftdrag_wrench(p, jnp.eye(3), vel)
    # drag component along -vel
    assert float(jnp.dot(f, vel)) < 0.0


def test_liftdrag_zero_at_rest():
    p = fw.LiftDragParams()
    f, t = fw.liftdrag_wrench(p, jnp.eye(3), jnp.zeros(3))
    assert float(jnp.linalg.norm(f)) == 0.0
    assert float(jnp.linalg.norm(t)) == 0.0


def test_liftdrag_cp_offset_torque():
    p = fw.LiftDragParams(cla=5.0, cma=0.0, alpha_stall=0.3, area=0.5,
                          cp=(0.0, 1.0, 0.0))
    vel = jnp.asarray([10.0, 0.0, -1.0])
    f, t = fw.liftdrag_wrench(p, jnp.eye(3), vel)
    expect = np.cross([0.0, 1.0, 0.0], np.asarray(f))
    np.testing.assert_allclose(np.asarray(t), expect, atol=1e-4)


def test_liftdrag_radial_symmetry_runs():
    p = fw.LiftDragParams(cla=5.0, radial_symmetry=True, area=0.2)
    vel = jnp.asarray([3.0, 0.0, -4.0])
    f, _ = fw.liftdrag_wrench(p, jnp.eye(3), vel)
    assert np.all(np.isfinite(np.asarray(f)))


def test_yaml_param_loaders(tmp_path):
    """RotorS fixed-wing YAML format (fw_parameters.h LoadAeroParamsYAML /
    LoadVehicleParamsYAML): flat coefficient vectors + per-surface
    deflection maps."""
    aero_f = tmp_path / "aero.yaml"
    aero_f.write_text(
        "alpha_max: 0.3\n"
        "c_lift_alpha: [0.2, 11.0, -40.0, 55.0]\n"
        "c_thrust: [0.0, 12.5, 0.0]\n"
        "not_a_field: 7\n"
    )
    aero = fw.aero_params_from_yaml(str(aero_f))
    assert aero.alpha_max == 0.3
    assert aero.c_lift_alpha == (0.2, 11.0, -40.0, 55.0)
    assert aero.c_thrust == (0.0, 12.5, 0.0)
    # untouched fields keep Techpod defaults
    assert aero.c_drag_alpha == fw.FwAeroParams().c_drag_alpha

    veh_f = tmp_path / "veh.yaml"
    veh_f.write_text(
        "wing_span: 2.0\nwing_surface: 0.4\nchord_length: 0.15\n"
        "thrust_inclination: 0.05\n"
        "aileron_left:\n  channel: 4\n  deflection_min: -0.3\n"
        "  deflection_max: 0.3\n"
    )
    veh = fw.vehicle_params_from_yaml(str(veh_f))
    assert veh.wing_span == 2.0
    assert veh.deflection_limit == 0.3
    assert veh.mass == fw.FwVehicleParams().mass  # not in the YAML

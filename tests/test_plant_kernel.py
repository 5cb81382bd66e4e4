"""Parity of the fused Pallas plant-tick kernel against the XLA
``physics_tick`` path (interpret mode on the CPU mesh).

The kernel is a behavioral twin of one control period of the serving
configuration (position mode + frozen arm coefficients, free flight); the
only numerical deviations are the scalar atan2/asin polynomial (~1e-7) and
float reassociation, so a single period matches tightly and a short
closed-loop episode stays within loop-feedback tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quadrotor_manipulator_mppi_tpu.models import rigid_body as rb
from quadrotor_manipulator_mppi_tpu.ops.pallas import plant_kernel as pk
from quadrotor_manipulator_mppi_tpu.sim import flight_control as fc
from quadrotor_manipulator_mppi_tpu.sim import whole_body_loop as wbl
from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs


def _params(k=64, h=8):
    import dataclasses

    p = wbs.position_mode_params(n_samples=k, n_horizon=h)
    return p


def _episode_pair(n_steps, k=64, h=8, seed=0):
    params = _params(k, h)
    outs = []
    for use_kernel in (False, True):
        cfg = wbl.WholeBodyLoopConfig(
            arm_coeffs_per_control=True, plant_kernel=use_kernel
        )
        run = wbl.make_whole_body_episode(
            params, cfg=cfg, n_control_steps=n_steps, low_k_guard="off"
        )
        _, init = wbs.make_whole_body_solver(params, low_k_guard="off")
        plant = wbl.init_plant(params.model.vehicle)
        obs0 = wbs.default_obs()
        final, logs = jax.jit(run)(
            plant, init(jax.random.key(seed)), obs0.ee_target, obs0.base_target
        )
        outs.append((final, logs))
    return outs


def test_single_period_matches_xla_tick():
    """One control period (10 x 1 kHz substeps) through the kernel equals
    the XLA scan to float tolerance, from a non-trivial state."""
    params = _params()
    vehicle = params.model.vehicle
    spec = params.model.chain()
    inertials = params.model.inertials()
    extra = params.model.arm_mass_lump

    plant = wbl.init_plant(vehicle)
    # Perturb so every term is exercised (tilt, rates, joint motion).
    base = plant.base._replace(
        pos=jnp.asarray([0.12, -0.2, 2.05]),
        quat=jnp.asarray([0.998, 0.03, -0.04, 0.02])
        / jnp.linalg.norm(jnp.asarray([0.998, 0.03, -0.04, 0.02])),
        vel=jnp.asarray([0.15, -0.1, 0.05]),
        omega=jnp.asarray([0.05, -0.08, 0.02]),
    )
    ctrl = plant.ctrl._replace(
        int_err=jnp.asarray([0.01, -0.02, 0.005]),
        prev_err=jnp.asarray([0.02, 0.01, -0.01]),
    )
    plant = plant._replace(
        base=base, qdot=jnp.full(7, 0.15), ctrl=ctrl
    )
    dyn = rb.frozen_arm_coeffs(spec, inertials, plant.q)
    cmd = jnp.asarray([0.1, -0.15, 2.1, 0.05])
    tau = jnp.asarray([1.0, -2.0, 0.5, 3.0, -0.2, 0.1, 0.05])

    # XLA reference: run the episode factory's own physics via a 1-step
    # episode is awkward; instead replicate the substep scan with the
    # public pieces (exact same ops as physics_tick's frozen branch).
    def xla_period(p):
        from quadrotor_manipulator_mppi_tpu.models import multirotor as mr
        from quadrotor_manipulator_mppi_tpu.sim import closed_loop as cl

        def tick(carry, _):
            pl_, = carry
            w, x, y, z = pl_.base.quat
            a0 = 9.81 * jnp.stack([
                2.0 * (x * z - w * y),
                2.0 * (y * z + w * x),
                1.0 - 2.0 * (x * x + y * y),
            ])
            qdd = rb.frozen_forward_dynamics(dyn, a0, pl_.qdot, tau)
            tau_g = rb.frozen_gravity_torque_on_base(dyn, a0)
            qdot = pl_.qdot + qdd * 0.001
            q_raw = pl_.q + qdot * 0.001
            q_lo = jnp.asarray(spec.lower, q_raw.dtype)
            q_hi = jnp.asarray(spec.upper, q_raw.dtype)
            q = jnp.clip(q_raw, q_lo, q_hi)
            at_stop = (q_raw < q_lo) | (q_raw > q_hi)
            qdot = jnp.where(at_stop, 0.0, qdot)
            sp = fc.FlightSetpoint(
                pos=cmd[0:3], vel=jnp.zeros(3), yaw=cmd[3],
                yaw_rate=jnp.zeros(()),
            )
            u, ctrl2 = fc.backstepping_step(
                fc.FlightGains(), vehicle, pl_.ctrl, sp, pos=pl_.base.pos,
                vel_world=pl_.base.vel, rpy=cl.rpy_of(pl_.base),
                omega_body=pl_.base.omega, dt=0.001, tau_g=tau_g,
            )
            base2 = mr.step(
                vehicle, pl_.base, fc.allocate(vehicle, u), 0.001,
                extra_mass=extra,
                external_wrench_body=(jnp.zeros(3), tau_g),
            )
            return (pl_._replace(base=base2, q=q, qdot=qdot, ctrl=ctrl2),), None

        (out,), _ = jax.lax.scan(tick, (p,), None, length=10)
        return out

    want = xla_period(plant)
    tick_k = pk.make_plant_tick_kernel(
        vehicle, fc.FlightGains(), spec, substeps=10, dt=0.001,
        extra_mass=extra, interpret=True,
    )
    got = pk.unpack_plant(
        tick_k(pk.pack_plant(plant), pk.pack_dyn(dyn), cmd, tau), plant
    )
    for name, a, b in [
        ("pos", got.base.pos, want.base.pos),
        ("quat", got.base.quat, want.base.quat),
        ("vel", got.base.vel, want.base.vel),
        ("omega", got.base.omega, want.base.omega),
        ("rotor", got.base.rotor_speed, want.base.rotor_speed),
        ("q", got.q, want.q),
        ("qdot", got.qdot, want.qdot),
        ("int_err", got.ctrl.int_err, want.ctrl.int_err),
        ("m_hat", got.ctrl.m_hat, want.ctrl.m_hat),
        ("n_hat", got.ctrl.n_hat, want.ctrl.n_hat),
    ]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_short_episode_matches_xla_path():
    """A 20-step closed-loop episode (solver in the loop) through the
    kernel tracks the XLA-plant episode within loop-feedback tolerance."""
    (f_x, logs_x), (f_k, logs_k) = _episode_pair(20)
    np.testing.assert_allclose(
        np.asarray(logs_k.ee_err), np.asarray(logs_x.ee_err),
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(f_k[0].base.pos), np.asarray(f_x[0].base.pos), atol=5e-3
    )


def test_unsupported_configs_rejected():
    params = _params()
    with pytest.raises(ValueError, match="plant_kernel"):
        wbl.make_whole_body_episode(
            params,
            cfg=wbl.WholeBodyLoopConfig(plant_kernel=True),  # no frozen coeffs
            n_control_steps=5, low_k_guard="off",
        )

"""Generalized primitive contact layer (sim/contact, VERDICT r2 item 2).

The reference's arm links and vehicle body collide with world geometry via
Gazebo/ODE (``worlds/basic.world:20-37``, ``urdf/j2s7s300.xacro`` collision
meshes).  These tests pin the unified in-framework layer: per-primitive
force laws, whole-body aggregation (base wrench + Jacobian-projected arm
torques), no-pass-through behavior in the closed loop, and obstacle-cost
avoidance keeping flights contact-free.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.models import kinova
from quadrotor_manipulator_mppi_tpu.sim import contact as ct

SPEC = kinova.chain("link_7")
LAW = ct.ContactParams()


def f(p, v, radius=0.05, world=None, **kw):
    cp = ct.ContactParams(world=world or ct.WorldPrimitives(), **kw)
    return np.asarray(
        ct.sphere_world_force(cp, jnp.asarray(p, jnp.float32),
                              jnp.asarray(v, jnp.float32), radius)
    )


def test_ground_plane_force():
    # Resting 2 cm deep: upward spring force, no lateral.
    out = f([0.0, 0.0, 0.03], [0.0, 0.0, 0.0])
    assert out[2] > 0 and abs(out[0]) < 1e-6
    np.testing.assert_allclose(out[2], 3000.0 * 0.02, rtol=1e-5)
    # Above ground: zero.
    np.testing.assert_allclose(f([0, 0, 0.2], [0, 0, 0]), 0.0)
    # Sliding: friction opposes the lateral velocity.
    out = f([0.0, 0.0, 0.03], [0.5, 0.0, 0.0])
    assert out[0] < 0


def test_world_sphere_and_cylinder_and_disc():
    w = ct.WorldPrimitives(
        has_ground=False,
        spheres=((1.0, 0.0, 1.0, 0.2),),
        cylinders=((0.0, 2.0, 0.0, 1.5, 0.1),),
        discs=((3.0, 0.0, 1.0, 0.3),),
    )
    # Overlapping the sphere from +x: pushed further +x.
    out = f([1.22, 0.0, 1.0], [0, 0, 0], world=w)
    assert out[0] > 0 and abs(out[1]) < 1e-6
    # Lateral cylinder contact inside the z-span; none above the column.
    out = f([0.12, 2.0, 0.7], [0, 0, 0], world=w)
    assert out[0] > 0
    np.testing.assert_allclose(f([0.12, 2.0, 2.0], [0, 0, 0], world=w), 0.0)
    # Disc supports from above within its radius; not from the side.
    out = f([3.0, 0.0, 1.03], [0, 0, 0], world=w)
    assert out[2] > 0
    np.testing.assert_allclose(f([3.5, 0.0, 1.03], [0, 0, 0], world=w), 0.0)


def test_whole_body_contact_arm_feels_the_stand():
    """The arm CANNOT pass through scene geometry silently any more: a world
    sphere placed at the EE produces joint torques (Jacobian projection) and
    a base wrench — the in-cost stand becomes real to the plant."""
    from quadrotor_manipulator_mppi_tpu.models import chain as chain_mod

    q = jnp.asarray(kinova.Q_HOME, jnp.float32)
    base_pos = jnp.asarray([0.0, 0.0, 2.1], jnp.float32)
    base_quat = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    ee, _ = chain_mod.forward_kinematics_posquat(
        SPEC, q, base_pos=base_pos, base_quat=base_quat
    )
    cp = ct.ContactParams(
        world=ct.WorldPrimitives(
            has_ground=False,
            spheres=((float(ee[0]), float(ee[1]), float(ee[2]) - 0.05, 0.1),),
        ),
        link_spheres=((6, 0.05),),
    )
    f_b, tau_b, tau_arm = jax.jit(
        lambda: ct.whole_body_contact(
            cp, SPEC, q, jnp.zeros(7), base_pos, base_quat,
            jnp.zeros(3), jnp.zeros(3),
        )
    )()
    assert float(jnp.linalg.norm(tau_arm)) > 0.1, "arm feels nothing"
    assert float(jnp.linalg.norm(f_b)) > 1.0, "base feels nothing"
    assert float(jnp.linalg.norm(tau_b)) > 0.01, "no moment about the base"
    # The EE sphere is pushed UP (away from the world sphere below it):
    # world +z maps to body +z at identity attitude.
    assert float(f_b[2]) > 0


def test_hull_ground_contact_supports_vehicle():
    cp = ct.ContactParams(link_spheres=())
    f_b, tau_b, tau_arm = ct.whole_body_contact(
        cp, SPEC, jnp.asarray(kinova.Q_HOME, jnp.float32), jnp.zeros(7),
        jnp.asarray([0.0, 0.0, 0.3], jnp.float32),
        jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32),
        jnp.zeros(3), jnp.zeros(3),
    )
    assert float(f_b[2]) > 0            # hull 5 cm into the ground -> pushed up
    np.testing.assert_allclose(np.asarray(tau_arm), 0.0)


@pytest.mark.slow
def test_closed_loop_stand_no_passthrough_and_avoidance():
    """VERDICT item 2 'done' criterion, both halves on one episode pair:

    (a) WITHOUT the obstacle cost, commanding the EE inside a stand column
        no longer passes through — the contact layer stops it (measured EE
        standoff ~ the column radius);
    (b) WITH the obstacle cost (the solver's in-cost stand), the closed
        loop stays clear of the geometry so contact never fires.
    """
    from quadrotor_manipulator_mppi_tpu.models import chain as chain_mod
    from quadrotor_manipulator_mppi_tpu.sim import whole_body_loop as wbl
    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs
    from quadrotor_manipulator_mppi_tpu.utils.pose import Pose

    params = wbs.position_mode_params(n_samples=128, n_horizon=30)
    obs0 = wbs.default_obs()
    tgt = np.asarray(obs0.ee_target.position)
    # A stand column whose axis passes through the EE target.
    col_r = 0.12
    world = ct.WorldPrimitives(
        ground_z=0.0,
        cylinders=((float(tgt[0]), float(tgt[1]), 0.0, float(tgt[2]) + 0.5,
                    col_r),),
    )
    cp = ct.ContactParams(world=world)

    def run(with_obstacle_cost):
        p = params
        if with_obstacle_cost:
            p = dataclasses.replace(
                p,
                cost=dataclasses.replace(
                    p.cost,
                    obstacle_weight=200.0,
                    obstacle_centers=((float(tgt[0]), float(tgt[1]),
                                       float(tgt[2])),),
                    obstacle_radii=(col_r + 0.1,),
                ),
            )
        ep = wbl.make_whole_body_episode(p, n_control_steps=250, contact=cp)
        _, init = wbs.make_whole_body_solver(p)
        plant = wbl.init_plant(p.model.vehicle)
        final, logs = jax.jit(ep)(
            plant, init(jax.random.key(0)), obs0.ee_target, obs0.base_target
        )
        spec = p.model.chain()
        ee, _ = chain_mod.forward_kinematics_posquat(
            spec, final[0].q, base_pos=final[0].base.pos,
            base_quat=final[0].base.quat,
        )
        standoff = float(np.linalg.norm(np.asarray(ee[:2]) - tgt[:2]))
        return final[0], logs, standoff

    plant_a, logs_a, standoff_a = run(with_obstacle_cost=False)
    e = np.asarray(logs_a.ee_err)
    assert np.all(np.isfinite(e))
    # (a) The EE presses toward the target on the column axis but contact
    # holds it out near the column surface (allow spring penetration).
    assert standoff_a > col_r - 0.07, (
        f"passed through the stand: lateral standoff {standoff_a:.3f} m"
    )

    plant_b, logs_b, _ = run(with_obstacle_cost=True)
    # (b) With the in-cost stand the loop keeps clear: zero contact force
    # at the final state.
    f_b, _, tau_arm = ct.whole_body_contact(
        cp, SPEC, plant_b.q, plant_b.qdot, plant_b.base.pos,
        plant_b.base.quat, plant_b.base.vel, plant_b.base.omega,
    )
    np.testing.assert_allclose(np.asarray(f_b), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tau_arm), 0.0, atol=1e-5)


def test_contact_wrench_survives_graspable_branch():
    """Regression: with BOTH the generalized-contact layer and a graspable
    object enabled, the contact base wrench must still reach the plant
    (the graspable branch used to overwrite it).  With the object placed
    far away (zero reaction), contact+graspable must match contact-only."""
    from quadrotor_manipulator_mppi_tpu.sim import graspable as gr
    from quadrotor_manipulator_mppi_tpu.sim import whole_body_loop as wbl
    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs

    params = wbs.position_mode_params(n_samples=64, n_horizon=16)
    obs0 = wbs.default_obs()
    cp = ct.ContactParams()
    gp = gr.GraspableParams()
    far_obj = gr.init_graspable(gp, pos=(100.0, 100.0, 50.0))

    def run(graspable, obj):
        ep = wbl.make_whole_body_episode(
            params, n_control_steps=40, contact=cp, graspable=graspable
        )
        _, init = wbs.make_whole_body_solver(params)
        plant = wbl.init_plant(params.model.vehicle)
        args = [plant, init(jax.random.key(0)), obs0.ee_target,
                obs0.base_target]
        if graspable is not None:
            args.append(obj)
        final, logs = jax.jit(ep)(*args)
        return np.asarray(logs.base_pos)

    base_contact_only = run(None, None)
    base_both = run(gp, far_obj)
    np.testing.assert_allclose(base_both, base_contact_only, atol=1e-5)

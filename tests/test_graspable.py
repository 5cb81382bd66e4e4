"""Free-body graspable object (sim/graspable): the pick_weight weight.

Reference behavior being modeled: the weight in
``/root/reference/src/aerial_manipulation/worlds/pick_weight.world`` is an
independent Gazebo rigid body resting on a support stand — it can be pushed
off during the approach and only moves with the gripper once grasped.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadrotor_manipulator_mppi_tpu.sim import graspable as gr


PARAMS = gr.GraspableParams(stand_center_xy=(1.0, 0.5), stand_top_z=1.2)
FAR = jnp.asarray([10.0, 10.0, 10.0])
ZERO3 = jnp.zeros(3)


def _roll(params, state, ee_pos, ee_vel, closed, n, dt=0.01):
    step = jax.jit(
        lambda s: gr.graspable_step(
            params, s, ee_pos, ee_vel, jnp.asarray(closed), dt
        )
    )
    for _ in range(n):
        state, reaction = step(state)
    return state, reaction


def test_rests_on_stand():
    s0 = gr.init_graspable(PARAMS)
    s, _ = _roll(PARAMS, s0, FAR, ZERO3, False, 200)
    # Settles into the penalty spring: within ~mg/k of the rest height.
    sag = PARAMS.mass * gr.GRAVITY / PARAMS.stiffness
    assert abs(float(s.pos[2]) - float(s0.pos[2])) < 3 * sag + 1e-3
    assert float(jnp.linalg.norm(s.pos[:2] - s0.pos[:2])) < 1e-3
    assert not bool(s.attached)


def test_falls_off_support_to_ground():
    # Start past the stand edge: no disc under it -> falls 1.2 m to the floor.
    s0 = gr.init_graspable(
        PARAMS, pos=(1.0 + PARAMS.stand_radius + 0.1, 0.5, 1.2 + PARAMS.radius)
    )
    s, _ = _roll(PARAMS, s0, FAR, ZERO3, False, 300)
    assert float(s.pos[2]) < PARAMS.ground_z + PARAMS.radius + 0.02
    assert abs(float(s.vel[2])) < 0.05


def test_ee_push_moves_object_and_reacts():
    s0 = gr.init_graspable(PARAMS)
    # Closed fist overlapping the object from the -x side, moving into it —
    # far enough out (> grasp_tol) that the close does NOT attach.
    ee = s0.pos + jnp.asarray([-(PARAMS.radius + PARAMS.ee_radius) * 0.6, 0, 0])
    s, reaction = _roll(PARAMS, s0, ee, jnp.asarray([0.2, 0.0, 0.0]), True, 1)
    # Object pushed in +x, reaction on the EE points in -x.
    assert float(s.pos[0]) > float(s0.pos[0]) + 1e-4
    assert float(reaction[0]) < 0.0
    assert not bool(s.attached)


def test_open_gripper_straddles_to_grasp_tolerance():
    """The round-2 regression: with a full-fist contact radius the open
    gripper could never get within grasp_tol (contact onset 0.10 m >
    0.05 m aperture).  Open fingers straddle the object: the EE parked just
    outside the palm-contact onset is INSIDE grasp tolerance and the object
    stays put."""
    assert PARAMS.radius + PARAMS.ee_radius_open < PARAMS.grasp_tol
    s0 = gr.init_graspable(PARAMS)
    ee = s0.pos + jnp.asarray(
        [0.0, 0.0, PARAMS.radius + PARAMS.ee_radius_open + 0.005]
    )
    s, reaction = _roll(PARAMS, s0, ee, ZERO3, False, 100)
    dist = float(jnp.linalg.norm(s.pos - ee))
    assert dist < PARAMS.grasp_tol
    assert float(jnp.linalg.norm(s.pos[:2] - s0.pos[:2])) < 1e-3
    np.testing.assert_allclose(np.asarray(reaction), 0.0, atol=1e-6)
    # Now the gripper closes at this pose -> attach.
    s, _ = _roll(PARAMS, s, ee, ZERO3, True, 1)
    assert bool(s.attached)


def test_gripper_open_near_object_does_not_attach():
    s0 = gr.init_graspable(PARAMS)
    s, _ = _roll(PARAMS, s0, s0.pos, ZERO3, False, 3)
    assert not bool(s.attached)


def test_attach_follows_ee():
    s0 = gr.init_graspable(PARAMS)
    s, reaction = _roll(PARAMS, s0, s0.pos, ZERO3, True, 1)
    assert bool(s.attached)
    # Rigid follower from then on; reaction force path is disabled.
    ee2 = s0.pos + jnp.asarray([0.3, -0.2, 0.5])
    s, reaction = _roll(PARAMS, s, ee2, ZERO3, True, 1)
    np.testing.assert_allclose(np.asarray(s.pos), np.asarray(ee2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(reaction), 0.0, atol=1e-9)


@pytest.mark.slow
def test_episode_with_free_body_object():
    """Whole-body episode threading the object: it stays on its stand while
    the vehicle holds position (EE nowhere near it), and the log carries the
    object track."""
    from quadrotor_manipulator_mppi_tpu.sim import whole_body_loop as wbl
    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs

    params = wbs.position_mode_params(n_samples=32, n_horizon=20)
    obs0 = wbs.default_obs()
    gp = gr.GraspableParams(
        stand_center_xy=(5.0, 5.0), stand_top_z=1.0
    )
    run = wbl.make_whole_body_episode(
        params, n_control_steps=10, graspable=gp
    )
    plant = wbl.init_plant(params.model.vehicle)
    _, init = wbs.make_whole_body_solver(params)
    solver = init(jax.random.key(0))
    obj = gr.init_graspable(gp)
    (plant, _, _, _, obj_f), log = jax.jit(run)(
        plant, solver, obs0.ee_target, obs0.base_target, obj
    )
    assert log.obj_pos.shape == (10, 3)
    assert float(jnp.linalg.norm(obj_f.pos[:2] - obj.pos[:2])) < 1e-3
    assert not bool(obj_f.attached)

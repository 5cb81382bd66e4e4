"""Single-solver scenarios: the reference node behaviors (drone/arm MPPI)
plus the multirotor, fixed-wing, and online-mapping presets."""

from __future__ import annotations

import numpy as np

from .common import finish, maybe_resume, maybe_save, perfect_model_episode, run_episode


def _base12(base):
    """(1,1) rollout BaseTraj slice -> a Multirotor12State observation."""
    import jax.numpy as jnp

    from ..models.multirotor import Multirotor12State
    from ..utils import rotations as rot

    ang = rot.matrix_to_euler(rot.quat_to_matrix(base.quat[0, 0]), "ZYX")
    return Multirotor12State(
        pos=base.pos[0, 0],
        rpy=jnp.stack([ang[2], ang[1], ang[0]]),
        vel=base.vel[0, 0],
        omega=base.omega[0, 0],
    )


def run_drone_waypoint(args):
    import jax
    import jax.numpy as jnp

    from ..evaluation import metrics as metrics_mod
    from ..models import multirotor as mr
    from ..sim import closed_loop as cl, flight_control as fc
    from ..solver import drone as drone_solver

    if args.controller == "lee":
        raise SystemExit(
            "drone-waypoint drives the pid/backstepping inner loop; "
            "use 'hover --controller lee' for the Lee controller"
        )
    veh = mr.MultirotorParams()
    target = jnp.asarray(drone_solver.DEFAULT_TARGET)
    step, init = drone_solver.make_drone_solver()
    cfg = cl.LoopConfig(controller=args.controller)
    run = cl.make_episode(
        cfg, veh,
        fc.SIM_TUNED_GAINS if cfg.controller == "pid" else fc.FlightGains(),
        solver_step=step,
        make_obs=lambda p: drone_solver.DroneObs(x=p.pos, v=p.vel, target=target),
        setpoint_of=lambda out, p: fc.hover_setpoint(out.xdes),
        n_control_steps=args.steps,
    )
    state0 = maybe_resume(
        args,
        cl.init_loop_state(cfg, veh, init(jax.random.key(args.seed)),
                           pos=(0, 0, 2.0)),
    )
    final, (pos, rpy, vel) = jax.jit(run)(state0)
    maybe_save(args, final)
    pos = np.asarray(pos)
    err = np.linalg.norm(pos - np.asarray(target), axis=-1)
    reach_t = metrics_mod.waypoint_response(jnp.asarray(pos), target, dt=0.01, radius=0.5)
    finish(
        "drone-waypoint",
        {
            "min_err_m": round(float(err.min()), 4),
            "final_err_m": round(float(err[-1]), 4),
            "response_time_s": round(float(reach_t), 2),
        },
        {"pos": pos, "rpy": np.asarray(rpy), "vel": np.asarray(vel)},
        args,
    )


def run_arm_reach(args):
    import jax

    from ..sim import arm_loop
    from ..solver import arm as arm_solver

    params = arm_solver.ArmMPPIParams()
    _, solver_init = arm_solver.make_arm_solver(params)
    run = arm_loop.make_arm_episode(params=params, n_control_steps=args.steps)
    state0 = maybe_resume(
        args, arm_loop.init_arm_loop(solver_init(jax.random.key(args.seed)))
    )
    final, (q_log, err_log, tau_log) = jax.jit(run)(state0)
    maybe_save(args, final)
    err = np.asarray(err_log)
    finish(
        "arm-reach",
        {
            "phase2": bool(final.phase2),
            "min_ee_err_m": round(float(err.min()), 4),
            "final_ee_err_m": round(float(err[-1]), 4),
        },
        {"q": np.asarray(q_log), "ee_err": err, "tau": np.asarray(tau_log)},
        args,
    )


def run_whole_body(args):
    """Perfect-model MPC loop: the plant is one step of the solver's own
    rollout model, so it stays mode-correct (the attitude-mode actions are
    setpoints, not torques — they must NOT be fed to step12)."""
    import jax
    import jax.numpy as jnp

    from ..models import chain as chain_mod, whole_body as wbm
    from ..models.whole_body import WholeBodyState
    from ..solver import whole_body as wbs

    params = wbs.WholeBodyMPPIParams()
    step, init = wbs.make_whole_body_solver(params)
    obs0 = wbs.default_obs()
    spec = params.model.chain()

    def ee_err(state):
        base_quat = wbm._quat_from_rpy(state.base.rpy)
        ee_pos, _ = chain_mod.forward_kinematics_posquat(
            spec, state.q, base_pos=state.base.pos, base_quat=base_quat
        )
        return jnp.linalg.norm(ee_pos - obs0.ee_target.position)

    def plant_step(state, action):
        _, q, qdot, base = wbm.rollout(
            params.model, state, action[None, None, :], 0.01
        )
        return WholeBodyState(base=_base12(base), q=q[0, 0], qdot=qdot[0, 0])

    errs, base_pos = perfect_model_episode(
        args, step, init(jax.random.key(args.seed)),
        obs_of=lambda st: wbs.WholeBodyObs(
            state=st, ee_target=obs0.ee_target, base_target=obs0.base_target
        ),
        plant_step=plant_step,
        log_of=lambda st: (ee_err(st), st.base.pos),
        state0=obs0.state,
    )
    errs = np.asarray(errs)
    finish(
        "whole-body",
        {
            "initial_ee_err_m": round(float(errs[0]), 4),
            "min_ee_err_m": round(float(errs.min()), 4),
            "final_ee_err_m": round(float(errs[-1]), 4),
            "base_alt_final_m": round(float(np.asarray(base_pos)[-1, 2]), 3),
        },
        {"ee_err": errs, "base_pos": np.asarray(base_pos)},
        args,
    )


def run_multirotor_waypoint(args):
    """Quadrotor-only MPPI (12-state rigid-body rollouts) to a waypoint."""
    import jax
    import jax.numpy as jnp

    from ..models.multirotor import Multirotor12State
    from ..models.whole_body import WholeBodyState
    from ..solver import multirotor_mppi as mm

    params = mm.MultirotorMPPIParams()
    step, init = mm.make_multirotor_solver(params)
    target = jnp.asarray([1.0, 2.0, 3.4])
    zq = jnp.zeros(1)

    def plant_step(state, action):
        st = WholeBodyState(base=state, q=zq, qdot=zq)
        return _base12(mm._base_rollout_attitude(
            params.model, st, action[None, None, :], 0.01, 1
        ))

    st0 = Multirotor12State(
        pos=jnp.asarray([0.0, 0.0, 2.0]), rpy=jnp.zeros(3),
        vel=jnp.zeros(3), omega=jnp.zeros(3),
    )
    errs = perfect_model_episode(
        args, step, init(jax.random.key(args.seed)),
        obs_of=lambda st: mm.MultirotorObs(state=st, target=target),
        plant_step=plant_step,
        log_of=lambda st: jnp.linalg.norm(st.pos - target),
        state0=st0,
    )
    errs = np.asarray(errs)
    finish(
        "multirotor-waypoint",
        {
            "min_err_m": round(float(errs.min()), 4),
            "final_err_m": round(float(errs[-1]), 4),
        },
        {"err": errs},
        args,
    )


def run_fixed_wing(args):
    """Fixed-wing waypoint flyby: MPPI flies the Techpod airframe
    (``models/fixed_wing.py``, the gazebo_fw_dynamics_plugin physics) to a
    waypoint ahead and off-axis, then reports the closest approach.

    One solver tick per 0.05 s, the plant integrating 5 x 0.01 s substeps
    holding the commanded surfaces — the same outer-solve / inner-physics
    split as the rotorcraft scenarios."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..models import fixed_wing as fw
    from ..solver import fixed_wing as fw_solver

    base = fw_solver.FwMPPIParams()
    params = dataclasses.replace(
        base,
        mppi=dataclasses.replace(base.mppi, n_samples=args.k or 1024),
    )
    cruise = 15.0
    target = jnp.asarray([250.0, 60.0, 110.0])
    step, init = fw_solver.make_fixed_wing_solver(params)
    plant0 = fw.init_state(pos=(0.0, 0.0, 100.0), vel=(cruise, 0.0, 0.0))

    def tick(carry, _):
        plant, sol = carry
        obs = fw_solver.FwObs(
            state=plant, target=target, cruise_speed=jnp.asarray(cruise)
        )
        out, sol = step(sol, obs)

        def sub(s, _):
            return fw.step(params.aero, params.veh, s, out.controls, 0.01), None

        plant, _ = jax.lax.scan(sub, plant, None, length=5)
        return (plant, sol), (plant.pos, jnp.linalg.norm(plant.vel))

    _, (pos, speed) = run_episode(
        args, tick, (plant0, init(jax.random.PRNGKey(args.seed))),
        length=args.steps,
    )
    pos = np.asarray(pos)
    dist = np.linalg.norm(pos - np.asarray(target), axis=-1)
    finish(
        "fixed-wing",
        {
            "closest_approach_m": round(float(dist.min()), 2),
            "reached": bool(dist.min() < 20.0),
            "min_altitude_m": round(float(pos[:, 2].min()), 2),
            "mean_speed_ms": round(float(np.asarray(speed).mean()), 2),
            "steps": args.steps,
        },
        {"pos": pos, "speed": np.asarray(speed)},
        args,
    )


def run_mapped_flight(args):
    """Online mapping on the control path: fly to a waypoint through
    obstacles the solver does NOT know a priori.  A horizontal lidar senses
    the scene each control step, rays update the occupancy grid
    (``sim/occupancy``, the octomap analog), the grid exports its top-N
    occupied voxels as sphere obstacles, and the map-aware MPPI preset
    (``solver/mapped``) consumes them — the entire
    sense -> map -> export -> solve -> actuate loop is ONE jitted scan.
    The reference's octomap builds maps offline; nothing upstream closes
    this loop.

    Metrics: closest approach to the goal, minimum clearance to the true
    (hidden) obstacles — a collision-free run keeps it positive — and how
    much of the scene the map discovered."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..sim import mapped_loop
    from ..solver import mapped as mapped_solver

    cfg = mapped_loop.MappedFlightConfig()
    base = mapped_solver.MappedMPPIParams(
        altitude_weight=8.0,
        use_esdf=(args.obstacles == "esdf"),
        esdf_params=cfg.grid,
    )
    params = dataclasses.replace(
        base, mppi=dataclasses.replace(base.mppi, n_samples=args.k or 1024)
    )
    control_step = mapped_loop.make_mapped_control_step(cfg, params)
    _, init = mapped_solver.make_mapped_solver(params)
    plant0, ctrl0, grid0 = mapped_loop.init_mapped_flight(cfg)
    sol0 = init(jax.random.PRNGKey(args.seed))
    # The per-step episode key lives IN the carry so --resume continues the
    # exact noise stream the uninterrupted run would have drawn (the same
    # guarantee the solver state's own key already had).
    ep_key0 = jax.random.PRNGKey(args.seed + 1)
    target = jnp.asarray(cfg.target)

    def tick(carry, _):
        plant, ctrl, sol, grid, ek = carry
        ek, sub = jax.random.split(ek)
        (plant, ctrl, sol, grid), out = control_step(plant, ctrl, sol, grid, sub)
        return (plant, ctrl, sol, grid, ek), out

    carry_f, (pos, clr) = run_episode(
        args, tick, (plant0, ctrl0, sol0, grid0, ep_key0), length=args.steps
    )
    grid_f = carry_f[3]
    pos = np.asarray(pos)
    dist = np.linalg.norm(pos - np.asarray(target), axis=-1)
    occ_voxels = int((np.asarray(grid_f.log_odds) > 0.0).sum())
    finish(
        "mapped-flight",
        {
            "final_dist_m": round(float(dist[-1]), 3),
            "min_dist_m": round(float(dist.min()), 3),
            "reached": bool(dist[-1] < 0.5),
            "min_clearance_m": round(float(np.asarray(clr).min()), 3),
            "collided": bool(np.asarray(clr).min() <= 0.0),
            "mapped_occupied_voxels": occ_voxels,
            "steps": args.steps,
        },
        {"pos": pos, "clearance": np.asarray(clr)},
        args,
    )

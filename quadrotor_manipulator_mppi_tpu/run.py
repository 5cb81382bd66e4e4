"""Scenario runner CLI — the framework's ``roslaunch + python node`` analog.

The reference runs a scenario by launching Gazebo and one of the MPPI nodes
(``README.md:14-22``: roslaunch aerial_manipulation aerial_manipulator +
python3 kinova.py).  Here one command runs the whole closed loop on device
and prints metrics JSON:

    python -m quadrotor_manipulator_mppi_tpu.run drone-waypoint
    python -m quadrotor_manipulator_mppi_tpu.run arm-reach --steps 800
    python -m quadrotor_manipulator_mppi_tpu.run whole-body --steps 300
    python -m quadrotor_manipulator_mppi_tpu.run hover --controller lee
    python -m quadrotor_manipulator_mppi_tpu.run mission

Options: --steps N, --seed S, --controller {pid,backstepping,lee},
--save-log PATH (.npz trajectory dump).  Solver-state checkpointing lives in
``utils/checkpoint.py`` (library API; see tests/test_arm_loop.py).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _maybe_resume(args, carry0):
    """--resume PATH: overwrite a scenario's initial carry from a checkpoint
    (utils/checkpoint restores PRNG keys exactly, so a resumed episode
    continues the noise stream the uninterrupted run would have drawn)."""
    if getattr(args, "resume", None):
        from .utils import checkpoint

        carry0 = checkpoint.restore(args.resume, carry0)
        print(f"resumed state from {args.resume}", file=sys.stderr)
    return carry0


def _maybe_save(args, carry_final):
    """--save-state PATH: checkpoint the final episode carry."""
    if getattr(args, "save_state", None):
        from .utils import checkpoint

        checkpoint.save(args.save_state, carry_final)
        print(f"saved state to {args.save_state}", file=sys.stderr)


def _finish(name, metrics, log_arrays, args):
    if args.save_log:
        np.savez(args.save_log, **log_arrays)
        metrics["log"] = args.save_log
    print(json.dumps({"scenario": name, **metrics}))


def _run_episode(args, tick, carry0, xs=None, length=None):
    """Shared scenario driver: the jitted ``lax.scan`` episode every raw
    scenario clones (tick over carry, per-step logs), with the
    --resume / --save-state checkpoint handling applied uniformly.
    Returns ``(final_carry, stacked_logs)``."""
    import jax

    carry0 = _maybe_resume(args, carry0)
    run = jax.jit(
        lambda c0: jax.lax.scan(tick, c0, xs, length=length)
    )
    carry_f, logs = run(carry0)
    _maybe_save(args, carry_f)
    return carry_f, logs


def run_drone_waypoint(args):
    import jax
    import jax.numpy as jnp

    from .evaluation import metrics as metrics_mod
    from .models import multirotor as mr
    from .sim import closed_loop as cl, flight_control as fc
    from .solver import drone as drone_solver

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
    state0 = cl.init_loop_state(cfg, veh, init(jax.random.key(args.seed)), pos=(0, 0, 2.0))
    _, (pos, rpy, vel) = jax.jit(run)(state0)
    pos = np.asarray(pos)
    err = np.linalg.norm(pos - np.asarray(target), axis=-1)
    reach_t = metrics_mod.waypoint_response(jnp.asarray(pos), target, dt=0.01, radius=0.5)
    _finish(
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

    from .sim import arm_loop
    from .solver import arm as arm_solver

    params = arm_solver.ArmMPPIParams()
    _, solver_init = arm_solver.make_arm_solver(params)
    run = arm_loop.make_arm_episode(params=params, n_control_steps=args.steps)
    state0 = arm_loop.init_arm_loop(solver_init(jax.random.key(args.seed)))
    final, (q_log, err_log, tau_log) = jax.jit(run)(state0)
    err = np.asarray(err_log)
    _finish(
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

    from .models import whole_body as wbm
    from .models.multirotor import Multirotor12State
    from .models.whole_body import WholeBodyState
    from .solver import whole_body as wbs
    from .utils import rotations as rot

    params = wbs.WholeBodyMPPIParams()
    step, init = wbs.make_whole_body_solver(params)
    obs0 = wbs.default_obs()
    spec = params.model.chain()

    from .models import chain as chain_mod

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
        ang = rot.matrix_to_euler(rot.quat_to_matrix(base.quat[0, 0]), "ZYX")
        base12 = Multirotor12State(
            pos=base.pos[0, 0],
            rpy=jnp.stack([ang[2], ang[1], ang[0]]),
            vel=base.vel[0, 0],
            omega=base.omega[0, 0],
        )
        return WholeBodyState(base=base12, q=q[0, 0], qdot=qdot[0, 0])

    def body(carry, _):
        state, solver = carry
        obs = wbs.WholeBodyObs(state=state, ee_target=obs0.ee_target,
                               base_target=obs0.base_target)
        out, solver = step(solver, obs)
        state = plant_step(state, out.action)
        return (state, solver), (ee_err(state), state.base.pos)

    run = jax.jit(lambda c0: jax.lax.scan(body, c0, None, length=args.steps)[1])
    errs, base_pos = run((obs0.state, init(jax.random.key(args.seed))))
    errs = np.asarray(errs)
    _finish(
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


def run_hover(args):
    import jax
    import jax.numpy as jnp

    from .evaluation import metrics as metrics_mod
    from .models import multirotor as mr, vehicles
    from .sim import closed_loop as cl, flight_control as fc
    from .sim import lee_controller as lee

    veh = vehicles.get(args.vehicle)
    target = jnp.asarray([0.0, 0.0, 2.0])
    plant0 = mr.init_state(veh, pos=(0.2, -0.2, 1.8))
    plant0 = plant0._replace(
        rotor_speed=jnp.full((veh.n_rotors,), veh.hover_rotor_speed())
    )

    if args.controller == "lee":
        gains = vehicles.lee_gains(args.vehicle)
        sp = lee.LeeSetpoint(target)

        def tick(plant, _):
            u = lee.lee_control(gains, veh, sp, pos=plant.pos,
                                vel_world=plant.vel, quat=plant.quat,
                                omega_body=plant.omega)
            plant = mr.step(veh, plant, fc.allocate(veh, u), 0.001)
            return plant, (plant.pos, plant.omega)

        run = jax.jit(lambda p: jax.lax.scan(tick, p, None, length=args.steps * 10))
        _, (pos, omega) = run(plant0)
    else:
        law = fc.pid_step if args.controller == "pid" else fc.backstepping_step
        gains = fc.SIM_TUNED_GAINS if args.controller == "pid" else fc.FlightGains()
        ctrl0 = fc.init_ctrl_state(veh.mass)
        sp = fc.hover_setpoint(target)

        def tick(carry, _):
            plant, c = carry
            u, c = law(gains, veh, c, sp, pos=plant.pos, vel_world=plant.vel,
                       rpy=cl.rpy_of(plant), omega_body=plant.omega, dt=0.001)
            plant = mr.step(veh, plant, fc.allocate(veh, u), 0.001)
            return (plant, c), (plant.pos, plant.omega)

        run = jax.jit(lambda c0: jax.lax.scan(tick, c0, None, length=args.steps * 10))
        _, (pos, omega) = run((plant0, ctrl0))

    m = metrics_mod.hover_metrics(
        jnp.asarray(pos), jnp.asarray(omega), target, dt=0.001
    )
    _finish(
        "hover",
        {
            "vehicle": args.vehicle,
            "controller": args.controller,
            "pos_rms_m": round(float(m.pos_rms), 4),
            "ang_rate_rms": round(float(m.ang_rate_rms), 4),
            "settling_time_s": round(float(m.settling_time), 2),
            "passed": bool(m.passed),
        },
        {"pos": np.asarray(pos), "omega": np.asarray(omega)},
        args,
    )


def run_figure_eight(args):
    """Aggressive-maneuver scenario (ROADMAP control item): the adaptive
    backstepping law tracks a figure-eight (Gerono lemniscate) with full
    velocity feed-forward on the octorotor plant — the fast-curved-path
    regime the reference never exercises (its controller only ever sees
    step setpoints, ``controller.cpp:667-673``).

    x = A sin(w tau), y = (A/2) sin(2w tau) at period ``--period``
    (default 6 s, A = 1.5 m: peak speed ~1.6 m/s, peak lateral accel
    ~1.6 m/s^2) with a smooth time-warp entry (tau(0) = tau'(0) = 0, so
    the path is dynamically feasible from rest) and full velocity +
    acceleration feed-forward.  Uses ``flight_control.AGGRESSIVE_GAINS``
    plus the validated safeguards (tilt clip, adaptive-estimate
    projection, integrator anti-windup — ``aggressive_safeguards``); the
    adaptive law itself is the reference-parity backstepping.  Reports
    tracking RMSE over the post-transient laps (gate: < 0.15 m at
    defaults) and max tilt.
    """
    import jax
    import jax.numpy as jnp

    from .models import multirotor as mr, vehicles
    from .sim import closed_loop as cl, flight_control as fc

    veh = vehicles.get(args.vehicle)
    amp, period, z0 = 1.5, args.period, 2.0
    omega = 2.0 * np.pi / period
    dt = 0.001
    n_ticks = args.steps * 10
    t_ramp = 1.5

    def ref(t):
        # Smooth time-warp: tau = t^2/(t + t_ramp) starts at rest and
        # approaches unit rate; derivatives give exact vel/acc references.
        tau = t * t / (t + t_ramp)
        dtau = (t * t + 2 * t * t_ramp) / (t + t_ramp) ** 2
        ddtau = 2 * t_ramp * t_ramp / (t + t_ramp) ** 3
        s, c = jnp.sin(omega * tau), jnp.cos(omega * tau)
        s2, c2 = jnp.sin(2 * omega * tau), jnp.cos(2 * omega * tau)
        zero = jnp.zeros_like(t)
        pos = jnp.stack([amp * s, 0.5 * amp * s2, z0 + zero], -1)
        vel = jnp.stack(
            [amp * omega * c * dtau, amp * omega * c2 * dtau, zero], -1
        )
        acc = jnp.stack(
            [
                -amp * omega**2 * s * dtau**2 + amp * omega * c * ddtau,
                -2 * amp * omega**2 * s2 * dtau**2 + amp * omega * c2 * ddtau,
                zero,
            ],
            -1,
        )
        return pos, vel, acc

    gains = fc.AGGRESSIVE_GAINS
    safe = fc.aggressive_safeguards(veh)
    plant0 = mr.init_state(veh, pos=(0.0, 0.0, z0))
    plant0 = plant0._replace(
        rotor_speed=jnp.full((veh.n_rotors,), veh.hover_rotor_speed())
    )
    ctrl0 = fc.init_ctrl_state(veh.mass)

    def tick(carry, t):
        plant, c = carry
        p_ref, v_ref, a_ref = ref(t)
        sp = fc.FlightSetpoint(
            pos=p_ref, vel=v_ref,
            yaw=jnp.zeros((), p_ref.dtype), yaw_rate=jnp.zeros((), p_ref.dtype),
        )
        u, c = fc.backstepping_step(
            gains, veh, c, sp, pos=plant.pos, vel_world=plant.vel,
            rpy=cl.rpy_of(plant), omega_body=plant.omega, dt=dt,
            acc_ff=a_ref, **safe,
        )
        plant = mr.step(veh, plant, fc.allocate(veh, u), dt)
        tilt = jnp.linalg.norm(cl.rpy_of(plant)[:2])
        return (plant, c), (jnp.linalg.norm(plant.pos - p_ref), tilt)

    ts = jnp.arange(n_ticks, dtype=jnp.float32) * dt
    run = jax.jit(lambda c0: jax.lax.scan(tick, c0, ts)[1])
    err, tilt = run((plant0, ctrl0))
    err, tilt = np.asarray(err), np.asarray(tilt)
    # Skip the entry transient (the time-warp spans roughly the first lap).
    settle = min(int(period / dt), n_ticks // 2)
    e_track = err[settle:]
    _finish(
        "figure-eight",
        {
            "vehicle": args.vehicle,
            "period_s": period,
            "peak_speed_ms": round(amp * omega, 2),
            "track_rms_m": round(float(np.sqrt((e_track**2).mean())), 4),
            "track_max_m": round(float(e_track.max()), 4),
            "max_tilt_rad": round(float(tilt.max()), 3),
            "passed": bool(np.sqrt((e_track**2).mean()) < 0.15),
        },
        {"err": err, "tilt": tilt},
        args,
    )


def run_disturbance(args):
    """Gusty hover in a spatially-varying wind field: backstepping hover
    under (a) a static wind-field grid (vertical shear + lateral variation,
    trilinearly interpolated per gazebo_wind_plugin.h:144-190), (b) a 5 m/s
    gust at t=2 s, (c) OU turbulence.  Reports the hover gate
    (hovering_eval.py:26-27 thresholds) and the disturbance-recovery metric
    (disturbance_eval analog)."""
    import jax
    import jax.numpy as jnp

    from .evaluation import analyze as analyze_mod
    from .evaluation import metrics as metrics_mod
    from .models import multirotor as mr
    from .sim import closed_loop as cl, flight_control as fc
    from .sim import wind as wind_mod

    veh = mr.MultirotorParams()
    target = jnp.asarray([0.0, 0.0, 2.0])

    # Shear field: wind grows with altitude and varies across x (a synthetic
    # stand-in for the reference's file-generated terrain fields).
    field = wind_mod.uniform_grid_field(
        lambda px, py, pz: (
            0.15 * pz + 0.1 * px, 0.05 * pz, np.zeros_like(px)
        ),
        x=(-10.0, 10.0, 9), y=(-10.0, 10.0, 9), z=(0.0, 12.0, 7),
    )
    wp = wind_mod.WindParams(
        gust_velocity=(5.0, 0.0, 0.0), gust_start=2.0,
        gust_duration=1.0, gust_period=1e9,
        turbulence_sigma=0.3, turbulence_tau=0.5,
    )
    gains = fc.FlightGains()
    plant0 = mr.init_state(veh, pos=(0.0, 0.0, 2.0))
    plant0 = plant0._replace(rotor_speed=jnp.full((8,), veh.hover_rotor_speed()))
    ctrl0 = fc.init_ctrl_state(veh.mass)
    sp = fc.hover_setpoint(target)
    wstate0 = wind_mod.init_wind()
    key0 = jax.random.key(args.seed)

    def tick(carry, i):
        plant, c, ws = carry
        wvel, ws = wind_mod.wind_velocity_at(
            wp, field, ws, i * 0.001, plant.pos, jax.random.fold_in(key0, i), 0.001
        )
        u, c = fc.backstepping_step(
            gains, veh, c, sp, pos=plant.pos, vel_world=plant.vel,
            rpy=cl.rpy_of(plant), omega_body=plant.omega, dt=0.001,
        )
        plant = mr.step(veh, plant, fc.allocate(veh, u), 0.001, wind_world=wvel)
        return (plant, c, ws), (plant.pos, plant.omega)

    n = args.steps * 10
    run = jax.jit(
        lambda c0: jax.lax.scan(tick, c0, jnp.arange(n), length=n)
    )
    _, (pos, omega) = run((plant0, ctrl0, wstate0))
    m = metrics_mod.hover_metrics(
        jnp.asarray(pos), jnp.asarray(omega), target, dt=0.001
    )
    rec = analyze_mod.analyze_disturbance(
        {"pos": np.asarray(pos)}, np.asarray(target), 0.001, 0.1
    )
    _finish(
        "disturbance",
        {
            "pos_rms_m": round(float(m.pos_rms), 4),
            "ang_rate_rms": round(float(m.ang_rate_rms), 4),
            "passed": bool(m.passed),
            **rec,
        },
        {"pos": np.asarray(pos), "omega": np.asarray(omega)},
        args,
    )


def run_mission(args):
    """Takeoff -> cruise (gear retracts) -> land: touchdown resolves through
    the penalty ground-contact model at the landing-gear feet
    (models/multirotor.ground_contact_wrench) — after the motor cut below
    0.5 m (controller.cpp:271-278) the vehicle falls onto the gear springs
    and settles upright at gear height, like Gazebo's ODE contacts catch it
    in the reference."""
    import jax
    import jax.numpy as jnp

    from .models import multirotor as mr
    from .sim import closed_loop as cl, flight_control as fc, scenario

    veh = mr.MultirotorParams()
    cfg = scenario.MissionConfig()
    gains = fc.FlightGains()
    contact = mr.GroundContactParams()

    def tick(carry, t):
        plant, ctrl, mission = carry
        mission = mission._replace(
            land_cmd=mission.land_cmd | (t > args.steps * 10 * 3 // 5)
        )
        mission, sp, motors_on = scenario.mission_step(
            cfg, mission, plant.pos, plant.vel, 0.001
        )
        u, ctrl = fc.backstepping_step(
            gains, veh, ctrl, sp, pos=plant.pos, vel_world=plant.vel,
            rpy=cl.rpy_of(plant), omega_body=plant.omega, dt=0.001,
        )
        plant = mr.step(
            veh, plant, fc.allocate(veh, u) * motors_on, 0.001,
            contact=contact, gear_ext=mission.gear,
        )
        tilt = jnp.linalg.norm(cl.rpy_of(plant)[:2])
        return (plant, ctrl, mission), (plant.pos[2], mission.phase, tilt)

    # Start resting on the extended gear (feet at -gear_height).
    plant0 = mr.init_state(veh, pos=(0.0, 0.0, contact.gear_height))
    (plant, _, mission), (z, phase, tilt) = _run_episode(
        args, tick,
        (plant0, fc.init_ctrl_state(veh.mass), scenario.init_mission()),
        xs=jnp.arange(args.steps * 10),
    )
    z = np.asarray(z)
    landed_phase = np.asarray(phase) == scenario.LANDED
    _finish(
        "mission",
        {
            "max_alt_m": round(float(z.max()), 3),
            "final_alt_m": round(float(z[-1]), 3),
            "final_phase": int(mission.phase),
            "landed": int(mission.phase) == scenario.LANDED,
            # Contact quality: settled on the gear, upright, at rest.
            "rest_height_m": round(float(z[landed_phase].mean()), 3)
            if landed_phase.any() else None,
            "final_tilt_rad": round(float(np.asarray(tilt)[-1]), 4),
            "final_vspeed_m_s": round(float(np.asarray(plant.vel)[2]), 4),
        },
        {"z": z, "phase": np.asarray(phase), "tilt": np.asarray(tilt)},
        args,
    )


def run_whole_body_full(args):
    """Whole-body MPPI on the FULL plant (quaternion body, rotor lag, arm
    forward dynamics) — the flagship closed loop.  --mode position (default;
    robust cascade), --mode attitude (the benchmark headline; needs
    K >= ~2048 closed-loop) or --mode wrench (direct actuation with the
    round-3 stabilizers: arm-gravity feed-forward + rate damping)."""
    import dataclasses

    import jax

    from .sim import whole_body_loop as wbl
    from .solver import whole_body as wbs

    k = args.k or 512
    if args.mode == "position":
        params = wbs.position_mode_params(n_samples=k)
    elif args.mode == "wrench":
        params = wbs.wrench_mode_params(n_samples=k)
    else:
        base = wbs.WholeBodyMPPIParams()
        params = dataclasses.replace(
            base, mppi=dataclasses.replace(base.mppi, n_samples=k)
        )
    run = wbl.make_whole_body_episode(params, n_control_steps=args.steps)
    _, init = wbs.make_whole_body_solver(params)
    plant = wbl.init_plant(params.model.vehicle)
    obs0 = wbs.default_obs()
    carry0 = (plant, init(jax.random.key(args.seed)))
    carry0 = _maybe_resume(args, carry0)
    final, logs = jax.jit(run)(
        carry0[0], carry0[1], obs0.ee_target, obs0.base_target
    )
    _maybe_save(args, (final[0], final[1]))
    e = np.asarray(logs.ee_err)
    l1_cmd = np.asarray(logs.l1_cmd)
    reached = l1_cmd < 0.005
    tail = slice(-min(300, args.steps // 3), None)
    _finish(
        "whole-body-full",
        {
            "min_ee_err_m": round(float(e.min()), 4),
            "final_ee_err_m": round(float(e[-1]), 4),
            # The reference's reach gate (mppi.py:117): L1 of the commanded
            # EE pose < 5 mm.
            "reach_gate_first_step": int(np.argmax(reached)) if reached.any() else -1,
            "l1_cmd_tail_mean_mm": round(float(l1_cmd[tail].mean()) * 1000, 2),
            "l1_cmd_tail_max_mm": round(float(l1_cmd[tail].max()) * 1000, 2),
            "l1_meas_tail_mean_mm": round(
                float(np.asarray(logs.l1_meas)[tail].mean()) * 1000, 2
            ),
            "max_tilt_rad": round(float(np.asarray(logs.tilt).max()), 3),
            "min_alt_m": round(float(np.asarray(logs.base_pos)[:, 2].min()), 3),
        },
        {
            "ee_err": e,
            "l1_cmd": l1_cmd,
            "l1_meas": np.asarray(logs.l1_meas),
            "ori_err": np.asarray(logs.ori_err),
            "base_pos": np.asarray(logs.base_pos),
            "tilt": np.asarray(logs.tilt),
        },
        args,
    )


def run_multirotor_waypoint(args):
    """Quadrotor-only MPPI (12-state rigid-body rollouts) to a waypoint."""
    import jax
    import jax.numpy as jnp

    from .models.multirotor import Multirotor12State
    from .models.whole_body import WholeBodyState
    from .solver import multirotor_mppi as mm
    from .utils import rotations as rot

    params = mm.MultirotorMPPIParams()
    step, init = mm.make_multirotor_solver(params)
    target = jnp.asarray([1.0, 2.0, 3.4])
    zq = jnp.zeros(1)

    def plant_step(state, action):
        st = WholeBodyState(base=state, q=zq, qdot=zq)
        base = mm._base_rollout_attitude(
            params.model, st, action[None, None, :], 0.01, 1
        )
        ang = rot.matrix_to_euler(rot.quat_to_matrix(base.quat[0, 0]), "ZYX")
        return Multirotor12State(
            pos=base.pos[0, 0],
            rpy=jnp.stack([ang[2], ang[1], ang[0]]),
            vel=base.vel[0, 0],
            omega=base.omega[0, 0],
        )

    def body(carry, _):
        st, solver = carry
        out, solver = step(solver, mm.MultirotorObs(state=st, target=target))
        st = plant_step(st, out.action)
        return (st, solver), jnp.linalg.norm(st.pos - target)

    st0 = Multirotor12State(
        pos=jnp.asarray([0.0, 0.0, 2.0]), rpy=jnp.zeros(3),
        vel=jnp.zeros(3), omega=jnp.zeros(3),
    )
    run = jax.jit(lambda c0: jax.lax.scan(body, c0, None, length=args.steps)[1])
    errs = np.asarray(run((st0, init(jax.random.key(args.seed)))))
    _finish(
        "multirotor-waypoint",
        {
            "min_err_m": round(float(errs.min()), 4),
            "final_err_m": round(float(errs[-1]), 4),
        },
        {"err": errs},
        args,
    )


def run_pick_weight(args):
    """pick_weight task (reference worlds/pick_weight.world analog): fly the
    whole-body system to the graspable weight RESTING ON ITS SUPPORT STAND,
    close the gripper (grasp succeeds only if the measured EE actually
    reaches the payload), then lift it 0.4 m — all on the full plant.

    The stand is both scene geometry (a sphere-approximated obstacle in the
    solver's cost, so sampled approaches avoid clipping it — the in-cost
    analog of Gazebo's collision geometry) and the payload's pre-grasp
    rest.  The weight itself is a FREE RIGID BODY (``sim/graspable``): a
    careless approach pushes it off the stand and the grasp fails, exactly
    the failure mode of the reference world's independent weight body.  The
    approach is therefore staged like a real pick: fly to a pre-grasp pose
    ABOVE the object, then descend vertically onto it with the open
    gripper's fingers straddling the weight, then close and lift."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from .sim import scenario as scen
    from .sim import whole_body_loop as wbl
    from .solver import whole_body as wbs
    from .utils.pose import Pose

    params = wbs.position_mode_params(n_samples=256, n_horizon=50)
    obs0 = wbs.default_obs()
    grasp_target = obs0.ee_target
    payload_pos = np.asarray(grasp_target.position)
    # Support stand: a column under the payload (top just below the grasp
    # point), entered into the solver cost as a sphere obstacle.
    stand_center = tuple(payload_pos + np.asarray([0.0, 0.0, -0.35]))
    params = dataclasses.replace(
        params,
        cost=dataclasses.replace(
            params.cost,
            obstacle_weight=100.0,
            obstacle_centers=(stand_center,),
            obstacle_radii=(0.25,),
        ),
    )
    _, init = wbs.make_whole_body_solver(params)
    plant = wbl.init_plant(params.model.vehicle)
    solver = init(jax.random.key(args.seed))
    lift_target = Pose(
        position=grasp_target.position + jnp.asarray([0.0, 0.0, 0.4]),
        quat=grasp_target.quat,
    )
    phase1 = max(args.steps * 2 // 3, 100)
    half = max(args.steps - phase1, 100)

    # The weight is a FREE RIGID BODY resting on the stand top (sim/graspable):
    # the approach can push it off, and the push reaction loads the vehicle.
    from .sim import graspable as grb

    gp = grb.GraspableParams(
        mass=scen.MissionConfig().payload_mass,
        stand_center_xy=(float(stand_center[0]), float(stand_center[1])),
        stand_top_z=float(payload_pos[2]) - 0.04,
        stand_radius=0.25,
    )
    obj = grb.init_graspable(gp, pos=tuple(payload_pos))

    # Phase 1a: fly to the PRE-GRASP pose above the object (gripper open).
    # Approaching from above keeps the lateral transient away from the
    # free body — a sideways swipe would knock it off the stand.
    pregrasp_target = Pose(
        position=grasp_target.position + jnp.asarray([0.0, 0.0, 0.12]),
        quat=grasp_target.quat,
    )
    p1a = max(phase1 * 3 // 5, 60)
    p1b = max(phase1 - p1a, 60)
    run1a = wbl.make_whole_body_episode(
        params, n_control_steps=p1a, graspable=gp
    )
    (plant, solver, _, _, obj), log1a = jax.jit(run1a)(
        plant, solver, pregrasp_target, obs0.base_target, obj
    )

    # Phase 1b: descend vertically onto the weight; the open fingers
    # straddle it (sim/graspable ee_radius_open), so the palm contact only
    # engages once the object center reaches the palm — inside grasp_tol.
    run1b = wbl.make_whole_body_episode(
        params, n_control_steps=p1b, graspable=gp
    )
    (plant, solver, _, _, obj), log1b = jax.jit(run1b)(
        plant, solver, grasp_target, obs0.base_target, obj
    )
    log1 = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b]), log1a, log1b
    )
    e1, t1 = log1.ee_err, log1.tilt
    grasp_err = float(np.asarray(e1)[-50:].mean())
    obj_track = np.asarray(log1.obj_pos)
    obj_max_disp = float(
        np.linalg.norm(obj_track - np.asarray(payload_pos), axis=-1).max()
    )

    # Grasp check: the gripper closes on the object WHERE IT ACTUALLY IS —
    # if the approach knocked it away, the grasp fails.
    spec = params.model.chain()
    from .models import chain as chain_mod

    ee_pos, _ = jax.jit(
        lambda p: chain_mod.forward_kinematics_posquat(
            spec, p.q, base_pos=p.base.pos, base_quat=p.base.quat
        )
    )(plant)
    ee_obj_dist = float(np.linalg.norm(np.asarray(ee_pos) - np.asarray(obj.pos)))
    grasped = ee_obj_dist < gp.grasp_tol
    if not grasped:
        _finish(
            "pick-weight",
            {
                "grasped": False,
                "grasp_hold_err_m": round(grasp_err, 4),
                "ee_to_object_m": round(ee_obj_dist, 4),
                "object_max_disp_m": round(obj_max_disp, 4),
                "payload_kg": scen.MissionConfig().payload_mass,
            },
            {"reach_err": np.asarray(e1), "obj_pos": obj_track},
            args,
        )
        return

    obj = obj._replace(attached=jnp.ones((), jnp.bool_))

    # Gripper closes -> the payload attaches rigidly at the EE.  The PLANT
    # gets the full point-mass transfer (added mass + COM shift on link 7 +
    # gravity moment on the base, WholeBodyLoopConfig.payload_mass); the
    # SOLVER is told only what the reference's controller knows — the added
    # lump mass (controller.cpp:159-161) — so the loop must be robust to
    # the unmodeled moment.
    cfg_payload = scen.MissionConfig()
    params2 = dataclasses.replace(
        params,
        model=dataclasses.replace(
            params.model,
            arm_mass_lump=params.model.arm_mass_lump + cfg_payload.payload_mass,
        ),
    )
    run2 = wbl.make_whole_body_episode(
        params2,
        cfg=wbl.WholeBodyLoopConfig(
            payload_mass=cfg_payload.payload_mass,
            plant_arm_lump=params.model.arm_mass_lump,
        ),
        n_control_steps=half,
    )
    (plant, solver, _, _), log2 = jax.jit(run2)(
        plant, solver, lift_target, obs0.base_target
    )
    e2, t2 = np.asarray(log2.ee_err), log2.tilt
    _finish(
        "pick-weight",
        {
            "grasped": True,
            "grasp_hold_err_m": round(grasp_err, 4),
            "lift_min_err_m": round(float(e2.min()), 4),
            "lift_final_err_m": round(float(e2[-1]), 4),
            "max_tilt_rad": round(
                float(max(np.asarray(t1).max(), np.asarray(t2).max())), 3
            ),
            "payload_kg": cfg_payload.payload_mass,
            "stand_obstacle": list(np.round(stand_center, 3)),
        },
        {"reach_err": np.asarray(e1), "lift_err": e2},
        args,
    )


def run_whole_body_batch(args):
    """Batched closed-loop evaluation — the production-serving shape: vmap
    the FULL whole-body episode (solver + plant physics) over many
    scenarios (randomized initial base positions and EE targets) in one
    jitted program.  Reports aggregate reach statistics and
    episode throughput.  Scenario count rides --devices (reused flag) x 8
    by default; shard over a scenario mesh for multi-chip."""
    import time as time_mod

    import jax
    import jax.numpy as jnp

    from .sim import whole_body_loop as wbl
    from .solver import whole_body as wbs
    from .utils.pose import Pose

    n_scn = args.scenarios
    params = wbs.position_mode_params(n_samples=args.k_per_device, n_horizon=50)
    # Serving config: frozen-coefficient plant + substep unroll (the same
    # cfg bench.py's episode entry times; parity-tested).  Batching
    # episodes amortizes the latency-bound plant ops across scenarios —
    # the aggregate control_steps_per_s is the multi-tenant serving number.
    run = wbl.make_whole_body_episode(
        params, n_control_steps=args.steps,
        cfg=wbl.WholeBodyLoopConfig(
            arm_coeffs_per_control=True, substep_unroll=10
        ),
    )
    _, init = wbs.make_whole_body_solver(params)
    obs0 = wbs.default_obs()

    key = jax.random.key(args.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    base_offsets = jax.random.uniform(k1, (n_scn, 3), minval=-0.3, maxval=0.3)
    tgt_offsets = jax.random.uniform(k2, (n_scn, 3), minval=-0.15, maxval=0.15)

    def make_scenario(i):
        plant = wbl.init_plant(
            params.model.vehicle,
            pos=tuple(jnp.asarray([0.0, 0.0, 2.1]) + base_offsets[i]),
        )
        solver = init(jax.random.fold_in(k3, i))
        target = Pose(
            position=obs0.ee_target.position + tgt_offsets[i],
            quat=obs0.ee_target.quat,
        )
        return plant, solver, target

    plants, solvers, targets = jax.vmap(make_scenario)(jnp.arange(n_scn))
    # Re-station the base over each scenario's EE goal (operator semantics:
    # moving the task goal moves the hover station with it).
    base_targets = obs0.base_target + tgt_offsets

    vrun = jax.jit(jax.vmap(run))
    # Warm call carries the compile; the reported wall is a steady-state run.
    final, logs = vrun(plants, solvers, targets, base_targets)
    jax.block_until_ready(logs.ee_err)
    t0 = time_mod.perf_counter()
    final, logs = vrun(plants, solvers, targets, base_targets)
    jax.block_until_ready(logs.ee_err)
    wall = time_mod.perf_counter() - t0

    l1c = np.asarray(logs.l1_cmd)      # (N, T)
    tail = l1c[:, -min(100, args.steps // 3):]
    reached = (l1c < 0.005).any(axis=1)
    _finish(
        "whole-body-batch",
        {
            "scenarios": n_scn,
            "k": args.k_per_device,
            "steps": args.steps,
            "wall_s": round(wall, 1),
            "episodes_per_s": round(n_scn / wall, 2),
            "control_steps_per_s": round(n_scn * args.steps / wall, 1),
            "reach_gate_fraction": round(float(reached.mean()), 3),
            "l1_cmd_tail_mean_mm": round(float(tail.mean()) * 1000, 2),
            "l1_cmd_tail_p95_mm": round(
                float(np.percentile(tail, 95)) * 1000, 2
            ),
            "max_tilt_rad": round(float(np.asarray(logs.tilt).max()), 4),
        },
        {"l1_cmd": l1c, "ee_err": np.asarray(logs.ee_err)},
        args,
    )


def run_bench_scaling(args):
    """Scenario x sample scaling-efficiency measurement (BASELINE.json's
    >= 85% multi-host target): weak scaling of the whole-body solve over the
    mesh's sample axis (global K = k/device x devices; the three
    per-solve collectives are the only communication) and over the scenario
    axis (independent problems, zero communication).

    Runs on whatever devices exist — the 8-device virtual CPU mesh today
    (``--platform cpu``), real ICI the moment multi-chip hardware appears
    (same command, no code changes).  One JSON line out.
    """
    import time as time_mod

    import jax
    import jax.numpy as jnp

    if args.platform == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.devices)
        except RuntimeError:
            pass  # backend already initialized (in-process callers)
    n = min(args.devices, jax.device_count())
    platform = jax.devices()[0].platform

    from .parallel import mesh as mesh_mod
    from .parallel.sharded import make_sharded_solver, scenario_keys
    from .solver import whole_body as wbs
    from .solver.mppi import MPPIConfig

    k_dev, h = args.k_per_device, 50
    backend = "pallas" if platform not in ("cpu",) else "xla"

    def mk_params(k_total):
        return wbs.WholeBodyMPPIParams(
            mppi=MPPIConfig(
                n_samples=k_total, n_horizon=h, n_action=wbs.N_ACTIONS,
                dt=0.01, lam=0.1, sigma=wbs.default_sigma(), savgol_window=9,
            )
        )

    def bench(fn, *fargs, iters=args.iters):
        out = fn(*fargs)
        jax.block_until_ready(out)
        out = fn(*fargs)
        jax.block_until_ready(out)
        t0 = time_mod.perf_counter()
        for _ in range(iters):
            out = fn(*fargs)
        jax.block_until_ready(out)
        return (time_mod.perf_counter() - t0) / iters * 1e3

    obs1 = wbs.default_obs()

    # --- single-device baseline at the per-device problem size -------------
    step1, init1 = wbs.make_whole_body_solver(mk_params(k_dev), backend=backend)
    jstep1 = jax.jit(step1)
    st1 = init1(jax.random.key(0))
    t1 = bench(lambda: jstep1(st1, obs1)[0].u_seq)

    # --- weak scaling over the sample axis ----------------------------------
    mesh_s = mesh_mod.make_mesh(n_sample_shards=n, n_scenario_shards=1)
    step_s, init_s = make_sharded_solver(
        wbs.make_whole_body_solver, mesh_s, params=mk_params(k_dev * n),
        backend=backend,
    )
    states_s = jax.tree.map(lambda x: x[None], init_s(jax.random.key(0)))
    obs_s = jax.tree.map(lambda x: x[None], obs1)
    with jax.set_mesh(mesh_s):
        jstep_s = jax.jit(step_s)
        t_sample = bench(lambda: jstep_s(states_s, obs_s)[0].u_seq)

    # --- weak scaling over the scenario axis --------------------------------
    mesh_c = mesh_mod.make_mesh(n_sample_shards=1, n_scenario_shards=n)
    step_c, init_c = make_sharded_solver(
        wbs.make_whole_body_solver, mesh_c, params=mk_params(k_dev),
        backend=backend,
    )
    keys = scenario_keys(jax.random.key(0), n)
    states_c = jax.vmap(init_c)(keys)
    obs_c = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), obs1)
    with jax.set_mesh(mesh_c):
        jstep_c = jax.jit(step_c)
        t_scn = bench(lambda: jstep_c(states_c, obs_c)[0].u_seq)

    _finish(
        "bench-scaling",
        {
            "platform": platform,
            "devices": n,
            "backend": backend,
            "k_per_device": k_dev,
            "h": h,
            "t_1dev_ms": round(t1, 3),
            "t_sample_sharded_ms": round(t_sample, 3),
            "t_scenario_sharded_ms": round(t_scn, 3),
            # Weak-scaling efficiency: same per-device work, ideal ratio 1.0.
            "weak_eff_sample_axis": round(t1 / t_sample, 3),
            "weak_eff_scenario_axis": round(t1 / t_scn, 3),
            "global_k_sample_axis": k_dev * n,
            "global_solves_per_s_scenario_axis": round(n * 1e3 / t_scn, 1),
            **(
                {
                    "note": "virtual CPU devices share one machine's cores — "
                    "these efficiencies lower-bound the plumbing only; the "
                    ">=85% target is judged on real ICI hardware"
                }
                if platform == "cpu" else {}
            ),
        },
        {},
        args,
    )


def run_fixed_wing(args):
    """Fixed-wing waypoint flyby: MPPI flies the Techpod airframe
    (``models/fixed_wing.py``, the gazebo_fw_dynamics_plugin physics) to a
    waypoint ahead and off-axis, then reports the closest approach.

    The loop is fully jitted: one solver tick per 0.05 s, the plant
    integrating 5 x 0.01 s substeps holding the commanded surfaces — the
    same outer-solve / inner-physics split as the rotorcraft scenarios.
    """
    import jax
    import jax.numpy as jnp

    from .models import fixed_wing as fw
    from .solver import fixed_wing as fw_solver

    import dataclasses

    base = fw_solver.FwMPPIParams()
    params = dataclasses.replace(
        base,
        mppi=dataclasses.replace(base.mppi, n_samples=args.k or 1024),
    )
    cruise = 15.0
    target = jnp.asarray([250.0, 60.0, 110.0])
    step, init = fw_solver.make_fixed_wing_solver(params)

    plant0 = fw.init_state(pos=(0.0, 0.0, 100.0), vel=(cruise, 0.0, 0.0))
    sol0 = init(jax.random.PRNGKey(args.seed))

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

    @jax.jit
    def episode():
        (plant, _), (pos, speed) = jax.lax.scan(
            tick, (plant0, sol0), None, length=args.steps
        )
        return plant, pos, speed

    plant_f, pos, speed = episode()
    pos = np.asarray(pos)
    dist = np.linalg.norm(pos - np.asarray(target), axis=-1)
    _finish(
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
    (``solver/mapped``) consumes them as part of the observation — the
    entire sense -> map -> export -> solve -> actuate loop is ONE jitted
    ``lax.scan``.  The reference's octomap builds maps offline; nothing
    upstream closes this loop.

    Metrics: closest approach to the goal, minimum clearance to the true
    (hidden) obstacles — a collision-free run keeps it positive — and how
    much of the scene the map discovered.
    """
    import jax
    import jax.numpy as jnp

    from .sim import mapped_loop
    from .solver import mapped as mapped_solver
    import dataclasses

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
    carry0 = _maybe_resume(args, (plant0, ctrl0, sol0, grid0))
    target = jnp.asarray(cfg.target)

    @jax.jit
    def episode(c0):
        keys = jax.random.split(jax.random.PRNGKey(args.seed + 1), args.steps)
        (plant, ctrl, sol, grid), (pos, clr) = jax.lax.scan(
            lambda carry, key: control_step(*carry, key), c0, keys,
        )
        return (plant, ctrl, sol, grid), pos, clr

    carry_f, pos, clr = episode(carry0)
    plant_f, grid_f = carry_f[0], carry_f[3]
    _maybe_save(args, carry_f)
    pos = np.asarray(pos)
    dist = np.linalg.norm(pos - np.asarray(target), axis=-1)
    occ_voxels = int((np.asarray(grid_f.log_odds) > 0.0).sum())
    _finish(
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


def run_camera_survey(args):
    """Aerial survey with the full camera stack (the three external RotorS
    camera plugins working together): the multirotor orbits a ground target
    while the 3-axis gimbal (``sim/gimbal``, world-frame P servo per the
    gimbal-controller plugin) holds the depth camera on it through the
    vehicle's banking; every capture interval the rendered depth frame
    (``sim/depth_camera`` + Kinect noise) is geotagged with the live GPS
    fix and stored as an npz artifact (``sim/geotag``, the
    geotagged-images-plugin analog).  ``--save-log`` keeps the flight logs;
    artifacts land in ``--out-dir``.  With ``--stream HOST:PORT`` each
    captured frame is also pushed to a live QMM solver server as IMAGE
    frames (``bridge/camera.CameraPublisher`` — the gst-plugin's
    stream-during-flight role); watch with ``qmm_dashboard --camera``."""
    import jax
    import jax.numpy as jnp

    from .models import multirotor as mr
    from .sim import closed_loop as cl, flight_control as fc
    from .sim import depth_camera as dc, gimbal as gb
    from .sim.geotag import GeotagParams, GeotagRecorder
    from .sim.sensors import GpsParams, gps_measure

    veh = mr.MultirotorParams()
    gains = fc.FlightGains()
    gparams = gb.GimbalParams()
    target = jnp.asarray([2.0, 0.0, 0.0])
    radius, alt, period = 3.0, 3.0, 12.0

    def tick(carry, t):
        plant, ctrl, gim = carry
        # Circular orbit setpoint around the target.
        ang = 2.0 * jnp.pi * t / (period * 1000.0)
        sp = fc.FlightSetpoint(
            pos=jnp.stack([
                target[0] + radius * jnp.cos(ang),
                target[1] + radius * jnp.sin(ang),
                jnp.asarray(alt, plant.pos.dtype),
            ]),
            vel=jnp.zeros(3), yaw=jnp.zeros(()), yaw_rate=jnp.zeros(()),
        )
        u, ctrl = fc.backstepping_step(
            gains, veh, ctrl, sp, pos=plant.pos, vel_world=plant.vel,
            rpy=cl.rpy_of(plant), omega_body=plant.omega, dt=0.001,
        )
        plant = mr.step(veh, plant, fc.allocate(veh, u), 0.001)
        cmd = gb.point_at(plant.pos, target)
        gim = gb.gimbal_step(gparams, gim, cmd, plant.quat, 0.001)
        axis = gb.camera_rotation(gim, plant.quat)[:, 2]
        want = target - plant.pos
        want = want / jnp.linalg.norm(want)
        point_err = jnp.arccos(jnp.clip(jnp.dot(axis, want), -1.0, 1.0))
        return (plant, ctrl, gim), (
            plant.pos, plant.quat, gim.angles, point_err
        )

    plant0 = mr.init_state(veh, pos=(target[0] + radius, 0.0, alt))
    (plant, _, gim), (pos, quat, gangles, perr) = _run_episode(
        args, tick,
        (plant0, fc.init_ctrl_state(veh.mass), gb.init_gimbal()),
        xs=jnp.arange(args.steps * 10),
    )

    # Host-side capture pass over the logged trajectory: render + tag every
    # interval (the plugin pair's runtime behavior, replayed exactly).
    cam = dc.DepthCameraParams(width=32, height=24, max_depth=30.0)
    rec = GeotagRecorder(
        params=GeotagParams(interval=1.0),
        out_dir=args.out_dir or "frames",
    )
    publisher = None
    if args.stream:
        import socket as socket_mod

        from .bridge.camera import CameraPublisher

        host, _, port = args.stream.rpartition(":")
        sock = socket_mod.create_connection((host or "127.0.0.1", int(port)),
                                            timeout=5)
        publisher = CameraPublisher(sock, rate_hz=10.0)
    gps = GpsParams(horizontal_noise=0.05, vertical_noise=0.1)
    spheres_c = jnp.asarray([[2.0, 0.0, 0.6], [0.5, 1.5, 0.4]])
    spheres_r = jnp.asarray([0.6, 0.4])
    key = jax.random.key(args.seed)
    pos_np, quat_np = np.asarray(pos), np.asarray(quat)
    gang_np = np.asarray(gangles)
    stride = 100  # capture decisions at 10 Hz over the 1 kHz log
    for i in range(0, pos_np.shape[0], stride):
        t = i * 1e-3
        key, k1, k2 = jax.random.split(key, 3)
        rec.on_gps(np.asarray(gps_measure(gps, k1, jnp.asarray(pos_np[i]))))
        if t - rec.last_capture_t < rec.params.interval:
            continue
        gim_i = gb.GimbalState(
            angles=jnp.asarray(gang_np[i]), rates=jnp.zeros(3)
        )
        rot_cw = gb.camera_rotation(gim_i, jnp.asarray(quat_np[i]))
        depth = dc.depth_render(
            cam, jnp.asarray(pos_np[i]), rot_cw,
            sphere_centers=spheres_c, sphere_radii=spheres_r,
        )
        depth = dc.noisy_depth(cam, k2, depth, model="kinect")
        depth_np = np.asarray(depth)
        rec.on_frame(
            t, depth_np, cam_pos=pos_np[i], cam_rot=np.asarray(rot_cw)
        )
        if publisher is not None:
            publisher.publish(depth_np, t)

    perr_np = np.asarray(perr)
    tail = perr_np[perr_np.shape[0] // 2:]
    _finish(
        "camera-survey",
        {
            "frames_written": len(rec.written),
            "first_frame": rec.written[0] if rec.written else None,
            "point_err_tail_max_deg": round(float(np.rad2deg(tail.max())), 2),
            "point_err_tail_mean_deg": round(float(np.rad2deg(tail.mean())), 2),
            "orbit_alt_final_m": round(float(pos_np[-1, 2]), 3),
        },
        {"pos": pos_np, "gimbal": gang_np, "point_err": perr_np},
        args,
    )


def run_waypoint_file(args):
    """File-driven waypoint mission — ``waypoint_publisher_file`` parity:
    parse a RotorS `wait_time x y z yaw_deg` file, command each waypoint
    for its wait window (the reference publishes the list as one timed
    trajectory tracked by the Lee controller), and report per-waypoint
    end-of-window position errors against the hover-eval 0.2 m gate.

    ``--file`` defaults to the in-package example mission.  The whole
    flight is one jitted scan; the active waypoint at tick t is a
    searchsorted over the cumulative schedule.
    """
    import os

    import jax
    import jax.numpy as jnp

    from .models import multirotor as mr, vehicles
    from .sim import flight_control as fc, lee_controller as lee
    from .utils.trajectory import read_waypoint_file

    path = args.file or os.path.join(
        os.path.dirname(__file__), "resources", "example_waypoints.txt"
    )
    waits, positions, yaws = read_waypoint_file(path)
    n_wp = len(waits)
    if n_wp == 0:
        raise SystemExit(f"no complete waypoints in {path}")

    veh = vehicles.get(args.vehicle)
    gains = vehicles.lee_gains(args.vehicle)
    dt = 0.001
    # schedule boundaries in ticks: waypoint i active on [start_i, end_i)
    ends = np.cumsum(waits) / dt
    total_ticks = int(ends[-1])
    ends_j = jnp.asarray(ends)
    pos_j = jnp.asarray(positions, jnp.float32)
    yaw_j = jnp.asarray(yaws, jnp.float32)

    plant0 = mr.init_state(veh, pos=tuple(positions[0]))
    plant0 = plant0._replace(
        rotor_speed=jnp.full((veh.n_rotors,), veh.hover_rotor_speed())
    )

    if args.smooth:
        # Polynomial-trajectory mode (the mav_planning_msgs capability):
        # fit a natural C2 cubic spline through the waypoints (knot times =
        # the cumulative wait schedule) and track the continuous reference
        # with full velocity + acceleration feed-forward — the smooth
        # trajectory-tracking regime the Lee controller was designed for.
        from .utils.trajectory import cubic_spline_coeffs, polynomial_sample

        knots = np.concatenate([[0.0], np.cumsum(waits)])
        kpts = np.concatenate([positions[:1], positions], axis=0)
        breaks, coeffs = cubic_spline_coeffs(knots, kpts)
        breaks_j = jnp.asarray(breaks, jnp.float32)
        coeffs_j = jnp.asarray(coeffs, jnp.float32)
        # Yaw rides its own C2 spline (unwrapped), giving smooth yaw with
        # rate feed-forward — the simultaneous-step envelope problem of the
        # discrete mode never arises on a continuous reference.
        yk = np.unwrap(np.concatenate([[0.0], yaws]))
        _, ycoeffs = cubic_spline_coeffs(knots, yk[:, None])
        ycoeffs_j = jnp.asarray(ycoeffs, jnp.float32)

        def tick_smooth(plant, t):
            ts = t.astype(jnp.float32) * dt
            p_ref = polynomial_sample(breaks_j, coeffs_j, ts)
            v_ref = polynomial_sample(breaks_j, coeffs_j, ts, derivative=1)
            a_ref = polynomial_sample(breaks_j, coeffs_j, ts, derivative=2)
            yaw_ref = polynomial_sample(breaks_j, ycoeffs_j, ts)[0]
            yaw_rate = polynomial_sample(breaks_j, ycoeffs_j, ts, derivative=1)[0]
            sp = lee.LeeSetpoint(p_ref, velocity=v_ref, acceleration=a_ref,
                                 yaw=yaw_ref, yaw_rate=yaw_rate)
            u = lee.lee_control(gains, veh, sp, pos=plant.pos,
                                vel_world=plant.vel, quat=plant.quat,
                                omega_body=plant.omega)
            plant = mr.step(veh, plant, fc.allocate(veh, u), dt)
            return plant, (plant.pos, p_ref)

        run = jax.jit(
            lambda p: jax.lax.scan(tick_smooth, p, jnp.arange(total_ticks))
        )
        _, (pos_log, ref_log) = run(plant0)
        pos_log, ref_log = np.asarray(pos_log), np.asarray(ref_log)
        err = np.linalg.norm(pos_log - ref_log, axis=-1)
        end_errors = [
            float(np.linalg.norm(pos_log[max(0, int(min(e, total_ticks)) - 1)]
                                 - positions[i]))
            for i, e in enumerate(ends)
        ]
        _finish(
            "waypoint-file",
            {
                "file": path,
                "smooth": True,
                "n_waypoints": n_wp,
                "track_rms_m": round(float(np.sqrt((err ** 2).mean())), 4),
                "track_max_m": round(float(err.max()), 4),
                "end_window_err_m": [round(e, 4) for e in end_errors],
                "max_end_err_m": round(max(end_errors), 4),
                "passed": bool(err.max() < 0.2),
            },
            {"pos": pos_log, "ref": ref_log},
            args,
        )
        return

    # Raw waypoint steps are outside this plant's Lee envelope: a 2.8 m
    # diagonal step commands ~47 deg of tilt, which saturates rotors
    # through the asymmetric lag and diverges (measured; the reference's
    # own waypoint files only ever command yaw 0 on the symmetric firefly,
    # so upstream never hits this).  Two standard shaping steps keep every
    # transient inside the stable region, verified across step directions
    # and yaw: (a) clamp the position-error carrot to 1 m (bounds
    # commanded tilt AND cruise speed ~1.3 m/s in every direction),
    # (b) slew the yaw reference at 0.6 rad/s.
    yaw_slew = 0.6 * dt
    carrot_r = 1.0

    def tick(carry, t):
        plant, yaw_cmd = carry
        idx = jnp.searchsorted(ends_j, t.astype(ends_j.dtype), side="right")
        idx = jnp.minimum(idx, n_wp - 1)
        dyaw = jnp.mod(yaw_j[idx] - yaw_cmd + np.pi, 2 * np.pi) - np.pi
        yaw_cmd = yaw_cmd + jnp.clip(dyaw, -yaw_slew, yaw_slew)

        err = pos_j[idx] - plant.pos
        d = jnp.linalg.norm(err)
        carrot = plant.pos + err * jnp.minimum(1.0, carrot_r / d.clip(1e-6))

        sp = lee.LeeSetpoint(carrot, yaw=yaw_cmd)
        u = lee.lee_control(gains, veh, sp, pos=plant.pos,
                            vel_world=plant.vel, quat=plant.quat,
                            omega_body=plant.omega)
        plant = mr.step(veh, plant, fc.allocate(veh, u), dt)
        return (plant, yaw_cmd), plant.pos

    # Start the slewed yaw reference at the PLANT's initial yaw (identity
    # attitude = 0), not the first waypoint's: otherwise a file whose first
    # line carries a large yaw would apply it as the very unshaped step the
    # slew exists to prevent.
    run = jax.jit(
        lambda p: jax.lax.scan(
            tick, (p, jnp.zeros((), jnp.float32)),
            jnp.arange(total_ticks),
        )
    )
    _, pos_log = run(plant0)
    pos_log = np.asarray(pos_log)

    # per-waypoint error at the end of its window (waypoints_eval analog)
    end_errors = []
    for i in range(n_wp):
        e = int(min(ends[i], total_ticks)) - 1
        end_errors.append(
            float(np.linalg.norm(pos_log[e] - positions[i]))
        )
    _finish(
        "waypoint-file",
        {
            "file": path,
            "n_waypoints": n_wp,
            "end_window_err_m": [round(e, 4) for e in end_errors],
            "max_end_err_m": round(max(end_errors), 4),
            "passed": bool(max(end_errors) < 0.2),  # hovering_eval.py:26
        },
        {"pos": pos_log},
        args,
    )


SCENARIOS = {
    "fixed-wing": run_fixed_wing,
    "mapped-flight": run_mapped_flight,
    "waypoint-file": run_waypoint_file,
    "bench-scaling": run_bench_scaling,
    "whole-body-batch": run_whole_body_batch,
    "disturbance": run_disturbance,
    "drone-waypoint": run_drone_waypoint,
    "pick-weight": run_pick_weight,
    "arm-reach": run_arm_reach,
    "whole-body": run_whole_body,
    "whole-body-full": run_whole_body_full,
    "multirotor-waypoint": run_multirotor_waypoint,
    "hover": run_hover,
    "figure-eight": run_figure_eight,
    "mission": run_mission,
    "camera-survey": run_camera_survey,
}


def main(argv=None):
    p = argparse.ArgumentParser(prog="quadrotor_manipulator_mppi_tpu.run")
    p.add_argument("scenario", choices=sorted(SCENARIOS))
    p.add_argument("--steps", type=int, default=1000, help="control steps (100 Hz)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--controller", default="backstepping",
                   choices=["pid", "backstepping", "lee"])
    p.add_argument("--mode", default="position",
                   choices=["position", "attitude", "wrench"],
                   help="whole-body-full action mode")
    p.add_argument("--save-log", default=None)
    p.add_argument("--vehicle", default="harrier",
                   help="hover: stock vehicle preset (models/vehicles.py)")
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"],
                   help="force the CPU backend (any scenario; bench-scaling "
                        "uses it for the virtual mesh)")
    # bench-scaling options.
    p.add_argument("--devices", type=int, default=8,
                   help="bench-scaling: mesh size (clamped to available)")
    p.add_argument("--k-per-device", type=int, default=2048, dest="k_per_device")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--period", type=float, default=6.0,
                   help="figure-eight lap period [s]")
    p.add_argument("--scenarios", type=int, default=32,
                   help="whole-body-batch: batched episode count")
    p.add_argument("--k", type=int, default=0,
                   help="fixed-wing/mapped-flight/whole-body-full: sample "
                        "count override (0 = preset)")
    p.add_argument("--file", default=None,
                   help="waypoint-file: RotorS-format waypoint file")
    p.add_argument("--smooth", action="store_true",
                   help="waypoint-file: fly a C2 cubic polynomial "
                        "trajectory through the waypoints (vel+acc "
                        "feed-forward) instead of step setpoints")
    p.add_argument("--out-dir", default=None, dest="out_dir",
                   help="camera-survey: geotagged-frame artifact directory")
    p.add_argument("--stream", default=None,
                   help="camera-survey: push captured frames to a live QMM "
                        "server (HOST:PORT) as IMAGE frames; view with "
                        "qmm_dashboard --camera")
    p.add_argument("--save-state", default=None, dest="save_state",
                   help="checkpoint the final episode state (plant + solver "
                        "incl. PRNG stream) to this .npz "
                        "(whole-body-full / mission / mapped-flight)")
    p.add_argument("--resume", default=None,
                   help="resume from a --save-state checkpoint: the episode "
                        "continues exactly where the saved one stopped "
                        "(utils/checkpoint preserves the PRNG key, so the "
                        "resumed noise stream is the one the uninterrupted "
                        "run would have drawn)")
    p.add_argument("--obstacles", default="spheres",
                   choices=["spheres", "esdf"],
                   help="mapped-flight: obstacle representation (top-N "
                        "sphere export or the occupancy distance field)")
    args = p.parse_args(argv)
    if args.platform == "cpu" and args.scenario != "bench-scaling":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized (e.g. under pytest conftest)
    SCENARIOS[args.scenario](args)


if __name__ == "__main__":
    main()

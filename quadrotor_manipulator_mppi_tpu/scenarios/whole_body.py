"""Whole-body scenarios on the FULL plant: the flagship closed loop, the
pick_weight task, and batched multi-scenario serving."""

from __future__ import annotations

import numpy as np

from ..evaluation.metrics import episode_quality
from .common import finish, maybe_resume, maybe_save


def run_whole_body_full(args):
    """Whole-body MPPI on the FULL plant (quaternion body, rotor lag, arm
    forward dynamics) — the flagship closed loop.  --mode position (default;
    robust cascade), --mode attitude (the benchmark headline; needs
    K >= ~2048 closed-loop) or --mode wrench (direct actuation with the
    round-3 stabilizers: arm-gravity feed-forward + rate damping)."""
    import dataclasses

    import jax

    from ..sim import whole_body_loop as wbl
    from ..solver import whole_body as wbs

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
    carry0 = maybe_resume(args, (plant, init(jax.random.key(args.seed))))
    final, logs = jax.jit(run)(
        carry0[0], carry0[1], obs0.ee_target, obs0.base_target
    )
    maybe_save(args, (final[0], final[1]))
    e = np.asarray(logs.ee_err)
    finish(
        "whole-body-full",
        {
            "min_ee_err_m": round(float(e.min()), 4),
            "final_ee_err_m": round(float(e[-1]), 4),
            **episode_quality(
                logs.l1_cmd, logs.l1_meas, min(300, args.steps // 3)
            ),
            "max_tilt_rad": round(float(np.asarray(logs.tilt).max()), 3),
            "min_alt_m": round(float(np.asarray(logs.base_pos)[:, 2].min()), 3),
        },
        {
            "ee_err": e,
            "l1_cmd": np.asarray(logs.l1_cmd),
            "l1_meas": np.asarray(logs.l1_meas),
            "ori_err": np.asarray(logs.ori_err),
            "base_pos": np.asarray(logs.base_pos),
            "tilt": np.asarray(logs.tilt),
        },
        args,
    )


def run_pick_weight(args):
    """pick_weight task (reference worlds/pick_weight.world analog): fly the
    whole-body system to the graspable weight RESTING ON ITS SUPPORT STAND,
    close the gripper (grasp succeeds only if the measured EE actually
    reaches the payload), then lift it 0.4 m — all on the full plant.

    The stand is both scene geometry (a sphere-approximated obstacle in the
    solver's cost, so sampled approaches avoid clipping it) and the
    payload's pre-grasp rest.  The weight itself is a FREE RIGID BODY
    (``sim/graspable``): a careless approach pushes it off the stand and
    the grasp fails, exactly the failure mode of the reference world's
    independent weight body.  The approach is staged like a real pick:
    pre-grasp pose ABOVE the object, vertical descent with the open
    gripper's fingers straddling the weight, then close and lift."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..models import chain as chain_mod
    from ..sim import graspable as grb
    from ..sim import scenario as scen
    from ..sim import whole_body_loop as wbl
    from ..solver import whole_body as wbs
    from ..utils.pose import Pose

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
    run1a = wbl.make_whole_body_episode(params, n_control_steps=p1a, graspable=gp)
    (plant, solver, _, _, obj), log1a = jax.jit(run1a)(
        plant, solver, pregrasp_target, obs0.base_target, obj
    )

    # Phase 1b: descend vertically onto the weight; the open fingers
    # straddle it (sim/graspable ee_radius_open), so the palm contact only
    # engages once the object center reaches the palm — inside grasp_tol.
    run1b = wbl.make_whole_body_episode(params, n_control_steps=p1b, graspable=gp)
    (plant, solver, _, _, obj), log1b = jax.jit(run1b)(
        plant, solver, grasp_target, obs0.base_target, obj
    )
    log1 = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), log1a, log1b)
    e1, t1 = log1.ee_err, log1.tilt
    grasp_err = float(np.asarray(e1)[-50:].mean())
    obj_track = np.asarray(log1.obj_pos)
    obj_max_disp = float(
        np.linalg.norm(obj_track - np.asarray(payload_pos), axis=-1).max()
    )

    # Grasp check: the gripper closes on the object WHERE IT ACTUALLY IS —
    # if the approach knocked it away, the grasp fails.
    spec = params.model.chain()
    ee_pos, _ = jax.jit(
        lambda p: chain_mod.forward_kinematics_posquat(
            spec, p.q, base_pos=p.base.pos, base_quat=p.base.quat
        )
    )(plant)
    ee_obj_dist = float(np.linalg.norm(np.asarray(ee_pos) - np.asarray(obj.pos)))
    grasped = ee_obj_dist < gp.grasp_tol
    if not grasped:
        finish(
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
    finish(
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
    jitted program.

    Scoring uses the SAME gate as the single-run parity harness
    (``benchmarks/exp_parity.py`` / round-4 verdict weak #2): a scenario
    passes only if, after first reaching the reference's 5 mm commanded-EE
    gate (``mppi.py:117``), it HOLDS the gate for >= ``--hold`` of the
    remaining steps (default 0.99) — not if the error ever dips below the
    gate once.  Measured-EE tail stats are reported alongside."""
    import time as time_mod

    import jax
    import jax.numpy as jnp

    from ..sim import whole_body_loop as wbl
    from ..solver import whole_body as wbs
    from ..utils.pose import Pose

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
    l1m = np.asarray(logs.l1_meas)
    tail_n = min(100, args.steps // 3)
    per = [episode_quality(l1c[i], l1m[i], tail_n) for i in range(n_scn)]
    held = np.asarray([p["held_fraction_after_converge"] for p in per])
    conv = np.asarray([p["converged_step"] for p in per])
    meas_tail_max = np.asarray([p["l1_meas_tail_max_mm"] for p in per])
    gate_held = (conv >= 0) & (held >= args.hold)
    finish(
        "whole-body-batch",
        {
            "scenarios": n_scn,
            "k": args.k_per_device,
            "steps": args.steps,
            "hold_gate": args.hold,
            "wall_s": round(wall, 1),
            "episodes_per_s": round(n_scn / wall, 2),
            "control_steps_per_s": round(n_scn * args.steps / wall, 1),
            # The held-fraction gate (the honest serving-quality number):
            # converged (gate held 50 consecutive ticks, kinova.py:154-157
            # debounce) AND held >= --hold thereafter.
            "gate_held_fraction": round(float(gate_held.mean()), 3),
            "median_converge_step": int(np.median(conv[conv >= 0]))
            if (conv >= 0).any() else -1,
            # Round-4's lenient any-dip number, kept for comparability.
            "reach_gate_fraction": round(float((l1c < 0.005).any(1).mean()), 3),
            "held_min": round(float(held.min()), 3),
            "l1_cmd_tail_mean_mm": round(
                float(l1c[:, -tail_n:].mean()) * 1000, 2
            ),
            "l1_cmd_tail_p95_mm": round(
                float(np.percentile(l1c[:, -tail_n:], 95)) * 1000, 2
            ),
            "l1_meas_tail_max_mm": round(float(meas_tail_max.max()), 2),
            "max_tilt_rad": round(float(np.asarray(logs.tilt).max()), 4),
        },
        {"l1_cmd": l1c, "l1_meas": l1m, "ee_err": np.asarray(logs.ee_err)},
        args,
    )

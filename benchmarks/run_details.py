"""Incrementally measure secondary bench configs into BENCH_DETAILS.json.

Each config costs minutes of remote compile on this setup, so the driver's
bench.py only runs the headline; this script fills in the rest, one subset
per invocation (results merge into the JSON):

    python benchmarks/run_details.py arm drone pallas
    python benchmarks/run_details.py multi big
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DETAILS_PATH = os.path.join(REPO, "benchmarks", "BENCH_DETAILS.json")


def main(which):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bench import bench_fn, log
    from quadrotor_manipulator_mppi_tpu.solver import arm as arm_solver
    from quadrotor_manipulator_mppi_tpu.solver import drone as drone_solver
    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wb
    from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig
    from quadrotor_manipulator_mppi_tpu.ops.pallas import drone_kernel as dk
    from quadrotor_manipulator_mppi_tpu.utils.pose import Pose

    details = {}
    if os.path.exists(DETAILS_PATH):
        with open(DETAILS_PATH) as f:
            details = json.load(f)
    dev = jax.devices()[0]
    details["device"] = f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"

    if "arm" in which:
        astep, ainit = arm_solver.make_arm_solver()
        jastep = jax.jit(astep)
        astate = ainit(jax.random.key(0))
        aobs = arm_solver.ArmObs(
            q=jnp.zeros(7), qdot=jnp.zeros(7),
            base_pose=Pose(position=jnp.asarray([0.0, 0.0, 2.1]),
                           quat=jnp.asarray([1.0, 0, 0, 0])),
            target=arm_solver.default_target(),
        )
        details["arm_K100_H32"] = bench_fn(lambda: jastep(astate, aobs)[0].qdes)
        log("arm done", details["arm_K100_H32"])

        # Device-resident: the reference-size arm solve back-to-back in one
        # jitted scan (the host-stepped number above is dominated by
        # per-call arg marshalling through the tunnel).
        @jax.jit
        def arm_scan(st):
            def body(s, _):
                out, s = astep(s, aobs)
                return s, out.qdes[0]
            return jax.lax.scan(body, st, None, length=100)

        jax.block_until_ready(arm_scan(astate)[1])
        r = bench_fn(lambda: arm_scan(astate)[1], iters=3, repeats=4)
        details["arm_scan_K100_H32"] = {
            "ms_per_solve": round(r["median_ms"] / 100, 4),
            "solves_per_s": round(1e5 / r["median_ms"], 1),
            "median_ms": round(r["median_ms"] / 100, 4),
            "min_ms": round(r["min_ms"] / 100, 4),
            "std_ms": round(r["std_ms"] / 100, 4),
            "n": r["n"],
            "note": "device-resident: 100 solves per dispatch; the "
                    "reference runs this loop at 100 Hz",
        }
        log("arm scan done", details["arm_scan_K100_H32"])

    dobs = drone_solver.DroneObs(
        x=jnp.zeros(3), v=jnp.zeros(3),
        target=jnp.asarray(drone_solver.DEFAULT_TARGET),
    )
    if "drone" in which:
        dparams = drone_solver.DroneMPPIParams(
            mppi=MPPIConfig(n_samples=1024, n_horizon=32, n_action=3,
                            dt=0.01, lam=0.1, sigma=30.0, savgol_window=5)
        )
        dstep, dinit = drone_solver.make_drone_solver(dparams)
        jdstep = jax.jit(dstep)
        dstate = dinit(jax.random.key(0))
        details["drone_xla_K1024_H32"] = bench_fn(
            lambda: jdstep(dstate, dobs)[0].u_seq
        )
        log("drone done", details["drone_xla_K1024_H32"])

        @jax.jit
        def drone_scan(st):
            def body(s, _):
                out, s = dstep(s, dobs)
                return s, out.xdes
            return jax.lax.scan(body, st, None, length=100)

        jax.block_until_ready(drone_scan(dstate)[1])
        r = bench_fn(lambda: drone_scan(dstate)[1], iters=3, repeats=4)
        details["drone_scan_K1024_H32"] = {
            "ms_per_solve": round(r["median_ms"] / 100, 4),
            "solves_per_s": round(1e5 / r["median_ms"], 1),
            "median_ms": round(r["median_ms"] / 100, 4),
            "min_ms": round(r["min_ms"] / 100, 4),
            "std_ms": round(r["std_ms"] / 100, 4),
            "n": r["n"],
            "note": "device-resident: 100 solves per dispatch",
        }
        log("drone scan done", details["drone_scan_K1024_H32"])

    if "pallas" in which:
        u0 = jnp.zeros((32, 3))
        details["drone_pallas_prng_K1024_H32"] = bench_fn(
            lambda: dk.solve_drone_pallas(
                u0, dobs.x, dobs.v, dobs.target, jnp.asarray(1, jnp.int32),
                n_samples=1024, n_horizon=32, n_action=3,
            )
        )
        log("pallas prng done", details["drone_pallas_prng_K1024_H32"])
        noise = jax.random.normal(jax.random.key(0), (1024, 32, 3)) * 30.0
        details["drone_pallas_hbm_noise_K1024_H32"] = bench_fn(
            lambda: dk.solve_drone_pallas(
                u0, dobs.x, dobs.v, dobs.target, jnp.asarray(1, jnp.int32),
                noise=noise, n_samples=1024, n_horizon=32, n_action=3,
            )
        )
        log("pallas hbm done", details["drone_pallas_hbm_noise_K1024_H32"])

    if "multi" in which:
        msp = wb.WholeBodyMPPIParams()
        msp = dataclasses.replace(
            msp, mppi=dataclasses.replace(msp.mppi, n_samples=512, n_horizon=50)
        )
        mstep, minit = wb.make_whole_body_solver(msp)
        n_scn = 64
        mstates = jax.vmap(minit)(jax.random.split(jax.random.key(0), n_scn))
        mobs1 = wb.default_obs()
        mobs = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_scn,) + x.shape), mobs1
        )
        vstep = jax.jit(jax.vmap(mstep))
        out, mstates = vstep(mstates, mobs)
        jax.block_until_ready(out)
        ms = bench_fn(lambda: vstep(mstates, mobs)[0].action, iters=20)
        ms["scenario_solves_per_s"] = round(n_scn * 1e3 / ms["ms_per_solve"], 1)
        details[f"multi_scenario_{n_scn}x512_H50"] = ms
        log("multi done", ms)

    if "big" in which:
        big = wb.WholeBodyMPPIParams(
            mppi=MPPIConfig(
                n_samples=16384, n_horizon=100, n_action=wb.N_ACTIONS,
                dt=0.01, lam=0.1, sigma=wb.default_sigma(), savgol_window=9,
                u_min=wb.default_action_bounds()[0],
                u_max=wb.default_action_bounds()[1],
                warm_start_decay=0.9,
                nominal_action=wb.default_nominal_action(),
            ),
            cost=wb.WholeBodyCostParams(
                obstacle_weight=100.0,
                obstacle_centers=((0.5, 0.5, 1.5), (-0.5, 1.0, 2.0)),
                obstacle_radii=(0.3, 0.4),
            ),
        )
        bstep, binit = wb.make_whole_body_solver(big)
        jbstep = jax.jit(bstep, donate_argnums=0)
        bstate = binit(jax.random.key(0))
        bobs = wb.default_obs()
        out, bstate = jbstep(bstate, bobs)
        jax.block_until_ready(out)
        holder = {"state": bstate}

        def one_big():
            out, holder["state"] = jbstep(holder["state"], bobs)
            return out

        details["whole_body_obstacles_K16384_H100"] = bench_fn(one_big, iters=20)
        log("big done", details["whole_body_obstacles_K16384_H100"])

    if "wbfused" in which:
        # XLA-vs-fused on the compute-bound obstacle config (the fused
        # kernel's headline win: noise/rollout/FK/cost never leave VMEM).
        big = wb.WholeBodyMPPIParams(
            mppi=MPPIConfig(
                n_samples=16384, n_horizon=100, n_action=wb.N_ACTIONS,
                dt=0.01, lam=0.1, sigma=wb.default_sigma(), savgol_window=9,
                u_min=wb.default_action_bounds()[0],
                u_max=wb.default_action_bounds()[1],
                warm_start_decay=0.9,
                nominal_action=wb.default_nominal_action(),
            ),
            cost=wb.WholeBodyCostParams(
                obstacle_weight=100.0,
                obstacle_centers=((0.5, 0.5, 1.5), (-0.5, 1.0, 2.0)),
                obstacle_radii=(0.3, 0.4),
            ),
        )
        fstep, finit = wb.make_whole_body_solver(big, backend="pallas")
        jfstep = jax.jit(fstep, donate_argnums=0)
        fstate = finit(jax.random.key(0))
        fobs = wb.default_obs()
        out, fstate = jfstep(fstate, fobs)
        jax.block_until_ready(out)
        holder_f = {"state": fstate}

        def one_fused():
            out, holder_f["state"] = jfstep(holder_f["state"], fobs)
            return out

        details["whole_body_obstacles_fused_K16384_H100"] = bench_fn(
            one_fused, iters=40
        )
        log("wbfused done", details["whole_body_obstacles_fused_K16384_H100"])

    if "position" in which:
        # The stable closed-loop config (position cascade + distance-to-go
        # schedule) at flagship size — the config you'd actually fly
        # (BASELINE.md "Control parity"), benched alongside the attitude
        # headline.
        pparams = wb.position_mode_params(n_samples=16384, n_horizon=50)
        pstep, pinit = wb.make_whole_body_solver(pparams, backend="pallas")
        jpstep = jax.jit(pstep)
        pstate = pinit(jax.random.key(0))
        pobs = wb.default_obs()
        out, pstate = jpstep(pstate, pobs)
        jax.block_until_ready(out)
        holder_p = {"state": pstate}

        def one_pos():
            out, holder_p["state"] = jpstep(holder_p["state"], pobs)
            return out

        entry = bench_fn(one_pos, iters=40)
        if entry["std_ms"] > 0.25 * entry["median_ms"]:
            entry["note"] = (
                "high relative std: host-stepped latency through the shared "
                "tunnel drifts with backend load (probe_tunnel); the "
                "device-resident scan entries are the stable numbers"
            )
        details["whole_body_position_fused_K16384_H50"] = entry

        p4 = wb.position_mode_params(n_samples=4096, n_horizon=50)
        pstep4, pinit4 = wb.make_whole_body_solver(p4, backend="pallas")
        jp4 = jax.jit(pstep4)
        st4 = pinit4(jax.random.key(0))
        details["whole_body_position_fused_K4096_H50"] = bench_fn(
            lambda: jp4(st4, pobs)[0].u_seq
        )
        log("position done", details["whole_body_position_fused_K4096_H50"])

    if "wrench" in which:
        # The fused direct-wrench mode (in-kernel quaternion prefix scan),
        # at the round-3 stabilized preset (rate damping via the omat/ohom
        # decay operators; arm-gravity feed-forward lives on the plant).
        wparams = wb.wrench_mode_params(n_samples=4096, n_horizon=50)
        wstep, winit = wb.make_whole_body_solver(wparams, backend="pallas")
        jw = jax.jit(wstep)
        wst = winit(jax.random.key(0))
        wobs = wb.default_obs()
        details["whole_body_wrench_fused_K4096_H50"] = bench_fn(
            lambda: jw(wst, wobs)[0].u_seq
        )
        log("wrench done", details["whole_body_wrench_fused_K4096_H50"])

    if "sharded" in which:
        # The production (fused Pallas, in-kernel PRNG) step traced under
        # shard_map on a 1-device mesh — the multi-chip code path on the one
        # real chip.  Compared against the headline unsharded number this
        # bounds the sharding overhead (collectives on a 1-device mesh are
        # no-ops, so any delta is shard_map tracing/layout cost).
        from quadrotor_manipulator_mppi_tpu.parallel import mesh as mesh_mod
        from quadrotor_manipulator_mppi_tpu.parallel.sharded import (
            make_sharded_solver,
        )

        mesh = mesh_mod.make_mesh(n_sample_shards=1, n_scenario_shards=1)
        sparams = wb.WholeBodyMPPIParams(
            mppi=MPPIConfig(
                n_samples=4096, n_horizon=50, n_action=wb.N_ACTIONS,
                dt=0.01, lam=0.1, sigma=wb.default_sigma(), savgol_window=9,
            )
        )
        sstep, sinit = make_sharded_solver(
            wb.make_whole_body_solver, mesh, params=sparams, backend="pallas"
        )
        sstates = jax.tree.map(lambda x: x[None], sinit(jax.random.key(0)))
        sobs = jax.tree.map(lambda x: x[None], wb.default_obs())
        with jax.set_mesh(mesh):
            jsstep = jax.jit(sstep)
            out, _ = jsstep(sstates, sobs)
            jax.block_until_ready(out)
            details["whole_body_sharded_pallas_1shard_K4096_H50"] = bench_fn(
                lambda: jsstep(sstates, sobs)[0].u_seq
            )
        log("sharded done", details["whole_body_sharded_pallas_1shard_K4096_H50"])

    if "fixedwing" in which:
        # Fixed-wing MPPI (round 3): H=40 sequential airframe rollouts
        # (lax.scan over the polynomial aero model) x K samples.
        from quadrotor_manipulator_mppi_tpu.models import fixed_wing as fwm
        from quadrotor_manipulator_mppi_tpu.solver import fixed_wing as fws

        fstep, finit = fws.make_fixed_wing_solver()
        jfstep = jax.jit(fstep)
        fstate = finit(jax.random.key(0))
        fobs = fws.FwObs(
            state=fwm.init_state(pos=(0.0, 0.0, 100.0), vel=(15.0, 0.0, 0.0)),
            target=jnp.asarray([250.0, 60.0, 110.0]),
            cruise_speed=jnp.asarray(15.0),
        )
        details["fixed_wing_K1024_H40"] = dict(
            bench_fn(lambda: jfstep(fstate, fobs)[0].u_seq),
            note="pipelined throughput (bench_fn overlaps dispatch); the "
                 "solve is small enough that the axon tunnel fully pipelines",
        )
        log("fixedwing done", details["fixed_wing_K1024_H40"])

    if "scan_modes" in which:
        # Device-resident per-mode solve times (jitted scan of 100
        # state-threaded solves, fused Pallas backend) — the throughput
        # companion to the host-stepped per-mode entries.
        presets = {
            "attitude": wb.WholeBodyMPPIParams(
                mppi=MPPIConfig(
                    n_samples=4096, n_horizon=50, n_action=wb.N_ACTIONS,
                    dt=0.01, lam=0.1, sigma=wb.default_sigma(),
                    savgol_window=9,
                )
            ),
            "position": wb.position_mode_params(n_samples=4096, n_horizon=50),
            "wrench": wb.wrench_mode_params(n_samples=4096, n_horizon=50),
        }
        sobs = wb.default_obs()
        for name, sp in presets.items():
            sstep, sinit = wb.make_whole_body_solver(sp, backend="pallas")

            @jax.jit
            def scan_n(st, _step=sstep):
                def body(s, _):
                    out, s = _step(s, sobs)
                    return s, out.action[0]
                return jax.lax.scan(body, st, None, length=100)

            st0 = sinit(jax.random.key(0))
            jax.block_until_ready(scan_n(st0)[1])
            r = bench_fn(lambda: scan_n(st0)[1], iters=3, repeats=4)
            details[f"whole_body_scan_{name}_K4096_H50"] = {
                "ms_per_solve": round(r["median_ms"] / 100, 4),
                "solves_per_s": round(1e5 / r["median_ms"], 1),
                "median_ms": round(r["median_ms"] / 100, 4),
                "min_ms": round(r["min_ms"] / 100, 4),
                "std_ms": round(r["std_ms"] / 100, 4),
                "n": r["n"],
                "note": "device-resident: 100 solves per dispatch",
            }
            log(f"scan {name} done",
                details[f"whole_body_scan_{name}_K4096_H50"])

    if "batch_episode" in which:
        # Multi-tenant closed-loop serving: the FULL whole-body episode
        # (solver + frozen-coefficient plant) vmapped over scenarios.
        # Batching amortizes the latency-bound plant ops (run.py
        # whole-body-batch is the CLI surface; this entry pins the number).
        from quadrotor_manipulator_mppi_tpu.sim import whole_body_loop as wbl
        from quadrotor_manipulator_mppi_tpu.utils.pose import Pose

        n_scn, k_scn, steps = 16, 512, 200
        bparams = wb.position_mode_params(n_samples=k_scn, n_horizon=50)
        brun = wbl.make_whole_body_episode(
            bparams, n_control_steps=steps,
            cfg=wbl.WholeBodyLoopConfig(
                arm_coeffs_per_control=True, substep_unroll=10
            ),
        )
        _, binit = wb.make_whole_body_solver(bparams)
        bobs = wb.default_obs()
        key = jax.random.key(0)
        k1, k2, k3 = jax.random.split(key, 3)
        boff = jax.random.uniform(k1, (n_scn, 3), minval=-0.3, maxval=0.3)
        toff = jax.random.uniform(k2, (n_scn, 3), minval=-0.15, maxval=0.15)

        def mk(i):
            plant = wbl.init_plant(
                bparams.model.vehicle,
                pos=tuple(jnp.asarray([0.0, 0.0, 2.1]) + boff[i]),
            )
            target = Pose(position=bobs.ee_target.position + toff[i],
                          quat=bobs.ee_target.quat)
            return plant, binit(jax.random.fold_in(k3, i)), target

        plants, solvers, targets = jax.vmap(mk)(jnp.arange(n_scn))
        btgts = bobs.base_target + toff
        vrun = jax.jit(jax.vmap(brun))
        out = vrun(plants, solvers, targets, btgts)
        jax.block_until_ready(out[1].ee_err)
        r = bench_fn(lambda: vrun(plants, solvers, targets, btgts)[1].ee_err,
                     iters=3, repeats=4)
        per_step = r["median_ms"] / steps
        details[f"batched_episode_{n_scn}x{k_scn}_H50"] = {
            "ms_per_episode_step": round(per_step, 4),
            "control_steps_per_s": round(n_scn * 1e3 / per_step, 1),
            "vehicles_at_100hz_realtime": round(n_scn * 10.0 / per_step, 1),
            "median_ms": r["median_ms"], "min_ms": r["min_ms"],
            "std_ms": r["std_ms"], "n": r["n"],
            "note": "full closed-loop episode (solver + 1 kHz plant) "
                    "vmapped over scenarios; latency-bound plant ops "
                    "amortize across the batch (XLA plant: vmap over "
                    "the SMEM plant-tick kernel is unsupported)",
        }
        log("batch_episode done", details[f"batched_episode_{n_scn}x{k_scn}_H50"])

    if "packed_ab" in which:
        # Same-conditions A/B of the serving-call shapes: the tunnel's
        # absolute per-call latency drifts 2-3x with shared-backend load
        # (probe_tunnel), so the packed-vs-pytree claim is only meaningful
        # measured back-to-back in one process.  Three shapes, identical
        # solver math: (a) round-4 pytree step with donation (12 leaves
        # in), (b) pytree step without donation, (c) packed serving step
        # (solver/serving.py: 4 leaves in, sigma/targets trace-constant).
        from quadrotor_manipulator_mppi_tpu.solver import serving

        aparams = wb.WholeBodyMPPIParams(
            mppi=MPPIConfig(
                n_samples=4096, n_horizon=50, n_action=wb.N_ACTIONS,
                dt=0.01, lam=0.1, sigma=wb.default_sigma(), savgol_window=9,
            )
        )
        astep, ainit = wb.make_whole_body_solver(aparams, backend="pallas")
        aobs = wb.default_obs()

        jd = jax.jit(astep, donate_argnums=0)
        jn = jax.jit(astep)
        pstep, pinit = serving.make_packed_step(
            aparams, backend="pallas", jit=False
        )
        jp = jax.jit(pstep)
        ov, tv = serving.pack_obs(aobs)
        ov, tv = jax.device_put(ov), jax.device_put(tv)
        h = {"sd": ainit(jax.random.key(0)), "sn": ainit(jax.random.key(0)),
             "c": pinit(jax.random.key(0))}

        def pytree_donated():
            out, h["sd"] = jd(h["sd"], aobs)
            return out

        def pytree_plain():
            out, h["sn"] = jn(h["sn"], aobs)
            return out

        def packed():
            out, h["c"] = jp(h["c"], ov, tv)
            return out

        variants = {
            "pytree_donated": pytree_donated,
            "pytree_no_donate": pytree_plain,
            "packed": packed,
        }
        # Tunnel latency drifts monotonically within a process (measured:
        # sequential A/B orderings invert between runs), so the blocks are
        # INTERLEAVED round-robin — each variant samples the same drift.
        import statistics
        import time as time_mod

        for fn in variants.values():
            jax.block_until_ready(fn())
            for _ in range(3):
                fn()
            jax.block_until_ready(fn())
        blocks = {name: [] for name in variants}
        for _ in range(7):
            for name, fn in variants.items():
                t0 = time_mod.perf_counter()
                for _ in range(30):
                    out = fn()
                jax.block_until_ready(out)
                blocks[name].append(
                    (time_mod.perf_counter() - t0) / 30 * 1e3
                )
        ab = {
            name: {
                "median_ms": round(statistics.median(bs), 4),
                "min_ms": round(min(bs), 4),
                "std_ms": round(statistics.pstdev(bs), 4),
                "n": len(bs),
            }
            for name, bs in blocks.items()
        }
        ab["note"] = (
            "blocks interleaved round-robin (tunnel latency drifts "
            "within a process); compare WITHIN this entry only"
        )
        details["serving_call_ab_K4096_H50"] = ab
        log("packed_ab done", ab)

    if "bridge" in which:
        # END-TO-END bridge serving latency (round-4 verdict next #1): a
        # loopback TCP client streams ROBOT_STATES frames at the flagship
        # problem size and times client -> solve -> (ROBOT_CMD +
        # DRONE_POSE) reply.  The server runs the fused bridge head
        # (solver/serving.make_bridge_step): ONE jitted dispatch + ONE
        # device->host readback per tick.  On this image the readback pays
        # the tunnel's fixed D2H quantum (~24 ms, benchmarks/
        # probe_tunnel.py) — an environment artifact of the remote-device
        # tunnel, not of the serving path: dispatch-side latency is the
        # whole_body_K4096_H50 entry (~0.4 ms), and a co-located TPU host
        # reads 10 floats back in microseconds.
        import socket as socket_mod
        import statistics
        import time as time_mod

        from quadrotor_manipulator_mppi_tpu.bridge import protocol as proto
        from quadrotor_manipulator_mppi_tpu.bridge.server import (
            BridgeServer, WholeBodySession,
        )

        bparams = wb.position_mode_params(n_samples=4096, n_horizon=50)
        server = BridgeServer(
            session_factory=lambda: WholeBodySession(params=bparams)
        )
        server.start()
        try:
            cli = socket_mod.create_connection((server.host, server.port))
            cli.settimeout(120.0)
            state = [0.0] * 27
            state[2] = 2.1
            state[6] = 1.0

            def tick():
                cli.sendall(proto.encode(
                    proto.Frame(proto.MsgType.ROBOT_STATES, state)
                ))
                dec = proto.Decoder()
                got = set()
                while {proto.MsgType.ROBOT_CMD,
                       proto.MsgType.DRONE_POSE} - got:
                    dec.feed(cli.recv(1 << 16))
                    for fr in dec.frames():
                        got.add(fr.type)

            tick()  # compile + warm
            for _ in range(3):
                tick()
            samples = []
            for _ in range(40):
                t0 = time_mod.perf_counter()
                tick()
                samples.append((time_mod.perf_counter() - t0) * 1e3)
            details["bridge_serving_K4096_H50"] = {
                "median_ms": round(statistics.median(samples), 2),
                "min_ms": round(min(samples), 2),
                "std_ms": round(statistics.pstdev(samples), 2),
                "n": len(samples),
                "note": "client->solve->reply over loopback TCP; on this "
                        "image dominated by the tunnel's fixed D2H readback "
                        "quantum (see the 'tunnel' entry), not by solve "
                        "dispatch (~0.4 ms) or TCP",
            }
            cli.close()
        finally:
            server.stop()
        log("bridge done", details["bridge_serving_K4096_H50"])

    if "mapped" in which:
        # Map-in-the-loop serving shape (round 3): one full control step of
        # run.py mapped-flight — lidar raycast, occupancy-grid ray
        # insertion, top-N obstacle export, map-aware MPPI solve, 10 x
        # 1 kHz backstepping plant ticks — via the SAME factory the CLI
        # scenario flies (sim/mapped_loop.make_mapped_control_step).
        from quadrotor_manipulator_mppi_tpu.sim import mapped_loop
        from quadrotor_manipulator_mppi_tpu.solver import mapped as ms

        mcfg = mapped_loop.MappedFlightConfig()
        mparams = ms.MappedMPPIParams(altitude_weight=8.0)
        control_step = mapped_loop.make_mapped_control_step(mcfg, mparams)
        _, minit = ms.make_mapped_solver(mparams)
        plant, ctrl, grid = mapped_loop.init_mapped_flight(mcfg)
        sol = minit(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        jcs = jax.jit(control_step)
        out0 = jcs(plant, ctrl, sol, grid, key)
        jax.block_until_ready(out0[0][0].pos)

        details["mapped_flight_control_step_K1024"] = dict(
            bench_fn(lambda: jcs(plant, ctrl, sol, grid, key)[0][0].pos),
            note="lidar + occupancy insert + obstacle export + solve + "
                 "10x1kHz plant, one jitted step",
        )
        log("mapped done", details["mapped_flight_control_step_K1024"])

    with open(DETAILS_PATH, "w") as f:
        json.dump(details, f, indent=2)
    print(json.dumps({"updated": sorted(which)}))


if __name__ == "__main__":
    main(sys.argv[1:] or ["arm", "drone", "pallas"])

"""Whole-body closed loop: MPPI wrench+arm actions driving the full plant.

The complete in-framework aerial-manipulator simulation — the configuration
the reference names as its end goal (``README.md:31`` "Whole Body Control")
but never built.  Unlike ``sim/closed_loop`` (MPPI emits setpoints for an
inner-loop flight controller, the reference's drone architecture), here the
whole-body solver's first action is applied *directly*:

* base — [thrust, tau] allocated to 8 rotor commands
  (``flight_control.allocate``) and stepped through the full quaternion
  plant with asymmetric rotor lag (``multirotor.step``);
* arm — the MPPI (qdes, vdes) tracked by the reference's inertia-weighted
  PD torque law (``kinova.py:184``), stepped through the arm's own forward
  dynamics with the base attitude rotating gravity;
* coupling — the arm's configuration-dependent gravity moment acts on the
  base as an external torque (same quasi-static model the solver rolls out).

The solver's internal model (reduced 12-state, no rotor lag, kinematic arm)
deliberately mismatches the plant — closing the loop across that gap is the
robustness test that matters.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import kinova, multirotor as mr, rigid_body as rb
from ..models.multirotor import Multirotor12State, MultirotorParams, MultirotorState
from ..models.whole_body import WholeBodyState, arm_gravity_torque_fast
from ..solver import whole_body as wbs
from ..solver.mppi import MPPIState
from ..utils import rotations as rot
from ..utils.pose import Pose
from . import closed_loop as cl
from . import flight_control as fc
from . import graspable as gr

Array = jax.Array


@dataclass(frozen=True)
class WholeBodyLoopConfig:
    physics_dt: float = 0.001
    substeps: int = 10
    track_kp: float = 400.0   # kinova.py:184
    track_kd: float = 40.0
    # NOTE the reference law damps qdot to ZERO rather than tracking the
    # solver's vdes (kinova.py:184 computes vdes and discards it).  Round 5
    # tried the "obvious" computed-torque upgrade tau = M(kp e + kd(vdes -
    # qdot)) + nle to kill tracking lag — measured: it DIVERGES (0.5 m EE
    # errors; vdes is one integration of the softmin-averaged noise, so the
    # feed-forward injects the exploration dither straight into the arm).
    # The reference's pure damping is the right call; lag is closed by the
    # tube servo + base station-keeping weights instead.
    # Position mode: command the plan's own predicted position this many
    # control steps ahead instead of the raw sampled offset.  Raw offsets
    # jump every solve and destabilize the adaptive backstepping loop; the
    # predicted trajectory is a smooth carrot (the reference's xdes
    # semantics, drone.py:239-241, with a slightly longer lead).
    setpoint_lookahead: int = 10
    # Tube feedback around the MPPI plan (the deterministic fine-positioning
    # layer): a damped-least-squares arm servo on the measured EE *pose*
    # residual (position + rotation-vector orientation), added to the
    # solver's qdes.  MPPI's stochastic update has a noise floor (du is a
    # softmin-weighted average of sampled noise — it dithers around the
    # optimum at the sigma scale), and its optimum trades position against
    # orientation; the servo minimizes the same 6-DoF pose error
    # deterministically, so near the target the two layers agree.  The gate
    # is ~0 beyond tube_radius, so MPPI alone steers the transient, and ~1
    # inside, where the local linearization is exact.  This is what closes
    # the reference's reach criterion (sum |dp| < 0.005 m, mppi.py:117) on
    # the full plant.
    # Servo strength; None = mode-dependent default (0.8, except 1.5 in
    # wrench mode — measured round 5: the stronger correction halves the
    # tail's >5 mm fraction there, while position/attitude keep the
    # validated 0.8).
    tube_gain: Optional[float] = None
    # Gate distance [m]; 0 disables; None = mode-dependent default.
    # Position mode uses 0.3 (not just a terminal-hold radius): the DLS
    # servo follows the full 6-DoF pose-error gradient, which also walks
    # the arm out of bad kinematic branches that trap MPPI's Gaussian
    # exploration (measured: a batch scenario stalled at 0.3 m with joint 4
    # against its stop converges to ~1 cm with the wider gate, and the
    # nominal case reaches the 5 mm gate ~40% sooner).  Attitude/wrench
    # modes use 0.08: there MPPI's own arm plan is the fast EE actuator and
    # a mid-transient servo fights it (measured divergence at 0.3).
    tube_radius: Optional[float] = None
    tube_mu: float = 3e-4       # DLS damping
    tube_clip: float = 0.05     # per-joint correction clamp [rad]
    tube_ori_weight: float = 0.3  # rad -> m exchange rate in the residual
    # Grasped payload (pick_weight task): a point mass rigidly attached at
    # the end effector.  Plant-side it transfers the full rigid-body
    # effects — added mass, gravity moment about the base at the live EE
    # position, parallel-axis inertia increment, and the load on the arm's
    # last link (the reference models payloads as added mass only,
    # controller.cpp:159-161; the solver's internal model keeps that lump
    # view, so closing the loop across the richer plant is the robustness
    # test).
    payload_mass: float = 0.0
    # Plant-side arm lump override.  By default the plant carries the same
    # arm_mass_lump as the solver's model; set this when the solver's lump
    # deliberately differs (e.g. pick-weight tells the solver about the
    # grasped mass as a lump, reference-style, while the plant carries the
    # physical payload via payload_mass — without the override the mass
    # would be double-counted).
    plant_arm_lump: Optional[float] = None
    # Factor the arm mass matrix once per CONTROL step (10 ms) instead of
    # every 1 kHz physics substep.  M(q) drifts O(|qdot| dt_control) ~ 1e-3
    # relative within one control period, while computing it costs J extra
    # RNEA passes per substep — the dominant cost of the jitted episode.
    # Off by default (bit-identical legacy physics); the episode benchmark
    # turns it on.
    mass_matrix_per_control: bool = False
    # The serving-path arm dynamics: freeze ALL q-dependent dynamics
    # coefficients once per control period (``rigid_body.frozen_arm_coeffs``
    # — one batched RNEA), then evaluate each 1 kHz substep's forward
    # dynamics and base gravity-moment coupling as einsum contractions
    # (gravity-linear + velocity-quadratic decomposition, exact at the
    # frozen q).  Same approximation class as mass_matrix_per_control
    # (coefficients drift O(|qdot| dt_control) ~ 1e-3 relative in 10 ms;
    # parity-tested against the per-substep RNEA path) at a fraction of
    # the per-substep op count — the round-4 episode-throughput win.
    # Implies mass_matrix_per_control.
    arm_coeffs_per_control: bool = False
    # lax.scan unroll factor for the 1 kHz substep loop.  The substep body
    # is hundreds of tiny (3,3)-sized ops (unrolled RNEA); unrolling lets
    # XLA fuse across substeps and hide per-op latency.  Trades compile
    # time for steady-state speed; numerics unchanged.
    substep_unroll: int = 1
    # Run the whole control period's physics as ONE Pallas scalar kernel
    # (``ops/pallas/plant_kernel``): the ~600 tiny sequential XLA ops of
    # the 10 substeps collapse into a single fori_loop on the TPU scalar
    # core.  Position mode + arm_coeffs_per_control + free flight only
    # (the kernel is a behavioral twin of physics_tick for exactly that
    # configuration; parity-tested).  Interpret-mode fallback runs on CPU
    # automatically for tests.
    plant_kernel: bool = False


class WholeBodyPlant(NamedTuple):
    base: MultirotorState   # full quaternion plant
    q: Array                # (7,)
    qdot: Array             # (7,)
    ctrl: fc.FlightCtrlState  # inner-loop state (used by position mode)


class WholeBodyLog(NamedTuple):
    """Per-control-step episode telemetry.

    ``l1_cmd`` is the reference's own reach metric (``mppi.py:95-117``):
    L1 position error of the FK of the COMMANDED qdes at the measured base
    pose, gated at 0.005 m.  ``ee_err``/``l1_meas`` measure the physical
    plant EE — stricter than anything the reference checks.
    """

    ee_err: Array    # L2 measured EE position error [m]
    base_pos: Array  # (3,)
    tilt: Array      # |(roll, pitch)| [rad]
    l1_cmd: Array    # reference reach-gate metric [m]
    l1_meas: Array   # L1 measured EE position error [m]
    ori_err: Array   # measured EE geodesic orientation error [rad]
    obj_pos: Array   # (3,) graspable-object world position (zeros if none)


def init_plant(
    vehicle: MultirotorParams,
    pos=(0.0, 0.0, 2.1),
    q0=None,
    extra_mass: float = 5.54,
    dtype=jnp.float32,
) -> WholeBodyPlant:
    base = mr.init_state(vehicle, pos=pos, dtype=dtype)
    base = base._replace(
        rotor_speed=jnp.full((vehicle.n_rotors,), vehicle.hover_rotor_speed(extra_mass), dtype)
    )
    q = jnp.asarray(kinova.Q_HOME if q0 is None else q0, dtype)
    return WholeBodyPlant(
        base=base, q=q, qdot=jnp.zeros(7, dtype),
        ctrl=fc.init_ctrl_state(vehicle.mass + extra_mass, dtype),
    )


def observe(plant: WholeBodyPlant) -> WholeBodyState:
    """Full plant -> the solver's reduced observation."""
    rpy = cl.rpy_of(plant.base)
    base12 = Multirotor12State(
        pos=plant.base.pos, rpy=rpy, vel=plant.base.vel, omega=plant.base.omega
    )
    return WholeBodyState(base=base12, q=plant.q, qdot=plant.qdot)


def make_whole_body_episode(
    params: wbs.WholeBodyMPPIParams = None,
    cfg: WholeBodyLoopConfig = WholeBodyLoopConfig(),
    n_control_steps: int = 300,
    graspable: Optional[gr.GraspableParams] = None,
    gripper_closed: bool = False,
    backend: str = "xla",
    contact: "Optional[object]" = None,
    low_k_guard: str = "warn",
):
    """Returns run((plant, solver_state, obs_targets)) -> (final, logs).

    With ``graspable`` set, the pick_weight object is simulated as a FREE
    RIGID BODY (``sim/graspable``): the episode carry gains a
    ``GraspableState`` (``run(plant, solver, ee_target, base_target, obj)``),
    the gripper palm can push the object off its stand during the approach,
    and the push reaction acts back on the vehicle as an external wrench.
    ``gripper_closed`` is the episode-static gripper command (the phased
    pick-weight scenario closes it between episodes).

    ``contact`` (a ``sim.contact.ContactParams``) enables the generalized
    primitive contact layer: the vehicle hull and arm-link collision
    spheres feel the world geometry (ground/stand), with forces applied as
    a quasi-static base wrench + Jacobian-projected arm torques per
    control period — the in-framework analog of Gazebo's link collision
    (``worlds/basic.world:20-37``).  ``backend`` selects the solver
    pipeline ("xla" or the fused "pallas")."""
    params = params or wbs.WholeBodyMPPIParams()
    vehicle = params.model.vehicle
    plant_lump = (
        cfg.plant_arm_lump if cfg.plant_arm_lump is not None
        else params.model.arm_mass_lump
    )
    extra = plant_lump + cfg.payload_mass
    spec = params.model.chain()
    inertials = params.model.inertials()
    if cfg.payload_mass > 0.0:
        # The grasped mass rides the last arm link (the EE tip frame IS the
        # link-7 frame, so the payload sits at that frame's origin): the arm
        # dynamics, the base gravity-moment coupling (tau_g) and the RNEA
        # tracking feedforward all feel it through link-7's combined
        # mass/COM.  The point mass at the frame origin adds no inertia
        # about itself; the COM shift carries the moment transfer.
        import dataclasses as _dc

        m = inertials.mass.copy()
        com = inertials.com.copy()
        m7, mp = m[-1], cfg.payload_mass
        com[-1] = com[-1] * (m7 / (m7 + mp))
        m[-1] = m7 + mp
        inertials = _dc.replace(inertials, mass=m, com=com)
    step, _ = wbs.make_whole_body_solver(
        params, backend=backend, low_k_guard=low_k_guard
    )

    mode = params.model.control_mode
    use_plant_kernel = bool(cfg.plant_kernel)
    if use_plant_kernel:
        if not (mode == "position" and cfg.arm_coeffs_per_control
                and graspable is None and contact is None):
            raise ValueError(
                "plant_kernel covers the serving configuration only: "
                "position mode + arm_coeffs_per_control, free flight"
            )
        import jax as _jax

        from ..ops.pallas import plant_kernel as pk

        plant_tick_fused = pk.make_plant_tick_kernel(
            vehicle, fc.FlightGains(), spec,
            substeps=cfg.substeps, dt=cfg.physics_dt, extra_mass=extra,
            interpret=(_jax.default_backend() == "cpu"),
        )
    inertia = jnp.asarray(vehicle.inertia, jnp.float32)
    kp_att = jnp.asarray(
        [params.model.att_kp_rp, params.model.att_kp_rp, params.model.att_kp_yaw]
    )
    kd_att = jnp.asarray(
        [params.model.att_kd_rp, params.model.att_kd_rp, params.model.att_kd_yaw]
    )

    def physics_tick(carry, _):
        plant, action_cmd, tau_arm_pd, ext_wrench_b, dyn = carry

        # Arm dynamics under the tilted-gravity field, with hard joint
        # stops: q clamps at the URDF limits and the velocity component
        # driving into a stop zeroes (inelastic stop — matches how Gazebo's
        # joint limits catch the reference arm).
        if cfg.arm_coeffs_per_control:
            # Frozen-coefficient fast path: the only live attitude input is
            # a0 = R^T (0, 0, g) = g * (third row of R), read straight off
            # the quaternion — no 3x3 matrix, no RNEA.
            w, x, y, z = plant.base.quat
            a0 = 9.81 * jnp.stack([
                2.0 * (x * z - w * y),
                2.0 * (y * z + w * x),
                1.0 - 2.0 * (x * x + y * y),
            ])
            qdd = rb.frozen_forward_dynamics(dyn, a0, plant.qdot, tau_arm_pd)
            tau_g = rb.frozen_gravity_torque_on_base(dyn, a0)
        else:
            base_rot = rot.quat_to_matrix(plant.base.quat)
            if cfg.mass_matrix_per_control:
                qdd = rb.forward_dynamics_chol(
                    spec, inertials, plant.q, plant.qdot, tau_arm_pd, dyn,
                    base_rot=base_rot,
                )
            else:
                qdd = rb.forward_dynamics(
                    spec, inertials, plant.q, plant.qdot, tau_arm_pd,
                    base_rot=base_rot,
                )
            # Arm gravity moment on the base (quasi-static reaction).
            tau_g = arm_gravity_torque_fast(spec, inertials, plant.q, base_rot)
        qdot = plant.qdot + qdd * cfg.physics_dt
        q_raw = plant.q + qdot * cfg.physics_dt
        q_lo = jnp.asarray(spec.lower, q_raw.dtype)
        q_hi = jnp.asarray(spec.upper, q_raw.dtype)
        q = jnp.clip(q_raw, q_lo, q_hi)
        at_stop = (q_raw < q_lo) | (q_raw > q_hi)
        qdot = jnp.where(at_stop, 0.0, qdot)
        ctrl = plant.ctrl

        if mode == "attitude":
            # Plant-side attitude PD — the same law the rollout models —
            # plus the arm gravity-moment feedforward.  The reference's own
            # flight controller feeds forward exactly this wrench
            # (harrier_grav_feedback, controller.cpp:541-560,587-610);
            # without it the constant configuration-dependent arm moment
            # biases the PD attitude, and the resulting steady tilt
            # integrates into the lateral drift the rollout (which models a
            # disturbance-free loop) cannot predict.
            rpy = cl.rpy_of(plant.base)
            tau = inertia * (
                kp_att * (action_cmd[1:4] - rpy) - kd_att * plant.base.omega
            ) - tau_g
            wrench_cmd = jnp.concatenate([action_cmd[0:1], tau])
        elif mode == "position":
            # Backstepping inner loop tracks the MPPI position setpoint —
            # the reference's drone architecture extended with the arm.
            sp = fc.FlightSetpoint(
                pos=action_cmd[0:3],
                vel=jnp.zeros(3, action_cmd.dtype),
                yaw=action_cmd[3],
                yaw_rate=jnp.zeros((), action_cmd.dtype),
            )
            wrench_cmd, ctrl = fc.backstepping_step(
                fc.FlightGains(), vehicle, ctrl, sp,
                pos=plant.base.pos, vel_world=plant.base.vel,
                rpy=cl.rpy_of(plant.base), omega_body=plant.base.omega,
                dt=cfg.physics_dt, tau_g=tau_g,
            )
        else:
            # Direct wrench, with two plant-side stabilizers the rollout
            # models exactly:
            # (1) arm gravity-moment feed-forward -tau_g — the reference's
            #     own harrier_grav_feedback (controller.cpp:541-560): the
            #     inverted arm exerts a CONSTANT ~18 N*m roll moment; with
            #     the feed-forward, zero sampled torque = level hover, so
            #     the warm-start's decay toward the zero-torque nominal is
            #     an equilibrium, not a fight.  The pairing is automatic:
            #     the plant feeds tau_g forward exactly when the solver's
            #     model does NOT carry the coupling (couple_arm_gravity
            #     False) — either way, model and plant see the same net
            #     torque, and legacy couple=True configs keep their
            #     original physics;
            # (2) with rate_damping, the 1 kHz body-rate feedback
            #     tau -= kd I omega (modeled by step12 /
            #     _base_rollout_parallel with the same kd).
            tau_cmd = action_cmd[1:4]
            if not params.model.couple_arm_gravity:
                tau_cmd = tau_cmd - tau_g
            if params.model.rate_damping:
                tau_cmd = tau_cmd - params.model.rate_damping * (
                    inertia * plant.base.omega
                )
            wrench_cmd = jnp.concatenate([action_cmd[0:1], tau_cmd])

        rotor_cmd = fc.allocate(vehicle, wrench_cmd)
        base = mr.step(
            vehicle, plant.base, rotor_cmd, cfg.physics_dt,
            extra_mass=extra,
            external_wrench_body=(
                ext_wrench_b[0], tau_g + ext_wrench_b[1]
            ),
        )
        nxt = WholeBodyPlant(base=base, q=q, qdot=qdot, ctrl=ctrl)
        return (nxt, action_cmd, tau_arm_pd, ext_wrench_b, dyn), None

    tube_radius = (
        cfg.tube_radius if cfg.tube_radius is not None
        else (0.3 if mode == "position" else 0.08)
    )
    tube_gain = (
        cfg.tube_gain if cfg.tube_gain is not None
        else (1.5 if mode == "wrench" else 0.8)
    )

    def control_step(carry, _):
        if graspable is not None:
            plant, solver, ee_target, base_target, obj = carry
        else:
            plant, solver, ee_target, base_target = carry
        obs = wbs.WholeBodyObs(
            state=observe(plant), ee_target=ee_target, base_target=base_target
        )
        out, solver = step(solver, obs)

        qdes = out.qdes
        if tube_radius > 0.0 and tube_gain > 0.0:
            from ..models import chain as chain_mod

            def pose_err(qq):
                """6-vector pose error to the target: [dp, w_ori * rotvec]."""
                p, ee_q = chain_mod.forward_kinematics_posquat(
                    spec, qq, base_pos=plant.base.pos, base_quat=plant.base.quat
                )
                e_p = ee_target.position - p
                qe = rot.quat_multiply(ee_target.quat, rot.quat_conjugate(ee_q))
                # Small-angle rotation vector: 2 sign(w) * vec (sign keeps
                # the short way around on the double cover).
                e_o = 2.0 * jnp.sign(qe[0]) * qe[1:]
                return jnp.concatenate([e_p, cfg.tube_ori_weight * e_o])

            err6 = pose_err(plant.q)
            de_dq = jax.jacfwd(pose_err)(plant.q)                  # (6, 7)
            d = jnp.linalg.norm(err6[:3])
            gate = jax.nn.sigmoid(
                (tube_radius - d) / (0.25 * tube_radius)
            )
            # Gauss-Newton/DLS step on ||err6||: de_dq dq = -err6.
            a = de_dq @ de_dq.T + cfg.tube_mu * jnp.eye(6, dtype=err6.dtype)
            dq = -de_dq.T @ jnp.linalg.solve(a, err6)
            dq = jnp.clip(dq, -cfg.tube_clip, cfg.tube_clip)
            qdes = qdes + tube_gain * gate * dq
        # Never command beyond the joint stops.
        qdes = jnp.clip(
            qdes, jnp.asarray(spec.lower, qdes.dtype),
            jnp.asarray(spec.upper, qdes.dtype),
        )

        # Arm torque: track the MPPI setpoint (reference phase-2 law).
        base_rot = rot.quat_to_matrix(plant.base.quat)
        if cfg.arm_coeffs_per_control:
            # One batched RNEA yields every dynamics coefficient the whole
            # control period needs; nle here is EXACT (coefficients are
            # taken at this very q).
            dyn = rb.frozen_arm_coeffs(spec, inertials, plant.q)
            m = dyn.mass
            a0_now = rb.gravity_accel(base_rot, plant.q.dtype)
            nle = rb.frozen_nle(dyn, a0_now, plant.qdot)
        else:
            m = rb.mass_matrix(spec, inertials, plant.q)
            nle = rb.nonlinear_effects(
                spec, inertials, plant.q, plant.qdot, base_rot=base_rot
            )
        tau_arm = m @ (
            cfg.track_kp * (qdes - plant.q) - cfg.track_kd * plant.qdot
        ) + nle
        effort = jnp.asarray(spec.effort, tau_arm.dtype)
        tau_arm = jnp.clip(tau_arm, -effort, effort)

        if mode == "position":
            # Smooth carrot: the model's predicted closed-loop position a
            # short lookahead along the updated plan.
            from ..models.whole_body import _base_rollout_position

            pred = _base_rollout_position(
                params.model, observe(plant), out.u_seq[None, :, :4],
                cfg.substeps * cfg.physics_dt, 1,
            )
            la = min(cfg.setpoint_lookahead, pred.pos.shape[1] - 1)
            base_cmd = jnp.concatenate(
                [pred.pos[0, la], out.action[3:4]]
            )
        else:
            base_cmd = out.action[:4]

        # Graspable free body: step it over this control period with the
        # current palm pose/velocity, and feed the push reaction back onto
        # the vehicle as a constant body wrench for the period.
        dtype = plant.base.pos.dtype
        ext_wrench_b = (jnp.zeros(3, dtype), jnp.zeros(3, dtype))
        if contact is not None:
            # Generalized primitive contact: hull + arm links vs world.
            from . import contact as ct

            f_cb, tau_cb, tau_carm = ct.whole_body_contact(
                contact, spec, plant.q, plant.qdot, plant.base.pos,
                plant.base.quat, plant.base.vel, plant.base.omega,
            )
            ext_wrench_b = (ext_wrench_b[0] + f_cb, ext_wrench_b[1] + tau_cb)
            tau_arm = jnp.clip(tau_arm + tau_carm, -effort, effort)
        if graspable is not None:
            from ..models import chain as chain_mod

            def fk_pos(qq, bp, bq):
                p, _ = chain_mod.forward_kinematics_posquat(
                    spec, qq, base_pos=bp, base_quat=bq
                )
                return p

            quat_dot = 0.5 * rot.quat_multiply(
                plant.base.quat,
                jnp.concatenate([jnp.zeros(1, dtype), plant.base.omega]),
            )
            ee_pos_now, ee_vel_now = jax.jvp(
                fk_pos,
                (plant.q, plant.base.pos, plant.base.quat),
                (plant.qdot, plant.base.vel, quat_dot),
            )
            obj, reaction_w = gr.graspable_step(
                graspable, obj, ee_pos_now, ee_vel_now,
                jnp.asarray(gripper_closed), cfg.substeps * cfg.physics_dt,
            )
            base_rot_now = rot.quat_to_matrix(plant.base.quat)
            f_b = base_rot_now.T @ reaction_w
            tau_b = base_rot_now.T @ jnp.cross(
                ee_pos_now - plant.base.pos, reaction_w
            )
            # ACCUMULATE (the generalized-contact branch above may already
            # have contributed hull/arm-vs-world forces).
            ext_wrench_b = (ext_wrench_b[0] + f_b, ext_wrench_b[1] + tau_b)
            # The manipulator feels the contact too: project the EE reaction
            # through the arm Jacobian into joint torques (the same route
            # tau_g takes base-ward), held constant over the control period
            # — Gazebo's arm-side contact coupling, quasi-statically.
            j_ee = jax.jacfwd(
                lambda qq: fk_pos(qq, plant.base.pos, plant.base.quat)
            )(plant.q)
            tau_arm = jnp.clip(tau_arm + j_ee.T @ reaction_w, -effort, effort)

        if cfg.arm_coeffs_per_control:
            pass  # dyn already holds the frozen coefficients (incl. chol)
        elif cfg.mass_matrix_per_control:
            dyn = jnp.linalg.cholesky(m)
        else:  # unused dummy; the tick traces the per-substep M path
            dyn = jnp.zeros((spec.n_joints, spec.n_joints), plant.q.dtype)
        if use_plant_kernel:
            from ..ops.pallas import plant_kernel as pk

            svec = plant_tick_fused(
                pk.pack_plant(plant), pk.pack_dyn(dyn), base_cmd, tau_arm
            )
            plant = pk.unpack_plant(svec, plant)
        else:
            (plant, _, _, _, _), _ = jax.lax.scan(
                physics_tick, (plant, base_cmd, tau_arm, ext_wrench_b, dyn),
                None, length=cfg.substeps, unroll=cfg.substep_unroll,
            )

        # Logs: EE world position error, base state.
        from ..models import chain as chain_mod

        ee_pos, ee_q = chain_mod.forward_kinematics_posquat(
            spec, plant.q, base_pos=plant.base.pos, base_quat=plant.base.quat
        )
        ee_err = jnp.linalg.norm(ee_pos - ee_target.position)
        tilt = jnp.linalg.norm(cl.rpy_of(plant.base)[:2])
        qe = rot.quat_multiply(ee_target.quat, rot.quat_conjugate(ee_q))
        ori_err = 2.0 * jnp.arccos(jnp.clip(jnp.abs(qe[0]), 0.0, 1.0))
        cmd_pos, _ = chain_mod.forward_kinematics_posquat(
            spec, qdes, base_pos=plant.base.pos, base_quat=plant.base.quat
        )
        log = WholeBodyLog(
            ee_err=ee_err,
            base_pos=plant.base.pos,
            tilt=tilt,
            l1_cmd=jnp.sum(jnp.abs(cmd_pos - ee_target.position)),
            l1_meas=jnp.sum(jnp.abs(ee_pos - ee_target.position)),
            ori_err=ori_err,
            obj_pos=(obj.pos if graspable is not None
                     else jnp.zeros(3, dtype)),
        )
        if graspable is not None:
            return (plant, solver, ee_target, base_target, obj), log
        return (plant, solver, ee_target, base_target), log

    def run(plant: WholeBodyPlant, solver: MPPIState,
            ee_target: Pose, base_target: Array,
            obj: Optional[gr.GraspableState] = None):
        carry = (
            (plant, solver, ee_target, base_target) if graspable is None
            else (plant, solver, ee_target, base_target, obj)
        )
        return jax.lax.scan(control_step, carry, None, length=n_control_steps)

    return run

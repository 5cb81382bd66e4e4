"""Whole-body quadrotor + arm MPPI — the flagship solver config.

The capability the reference names as its end goal but never built
(``README.md:30-34`` to-do list: "Whole Body Control (Drone + Manipulator)").
Couples the octorotor wrench and the arm joint accelerations in one sampled
action space (4 + 7 = 11 actions) over a true-dynamics rollout
(``models/whole_body.rollout``), with an end-effector pose cost plus base
regularization.  Benchmark point per BASELINE.json: K=4096, H=50.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import kinova
from ..models.multirotor import Multirotor12State
from ..models.whole_body import (
    N_BASE_ACTIONS,
    WholeBodyParams,
    WholeBodyState,
    hover_nominal_action,
    rollout,
)
from ..ops import costs as costs_mod
from ..utils.pose import Pose
from .mppi import MPPIConfig, MPPIState, make_step

Array = jax.Array

N_ACTIONS = N_BASE_ACTIONS + kinova.N_JOINTS  # 11


def default_sigma() -> np.ndarray:
    """Per-action exploration scales for the default ("attitude") mode:
    [thrust N, roll/pitch/yaw setpoint rad, qddot x7].

    Thrust sigma is deliberately small (8 N around the ~199 N hover
    nominal): the plant's rotor lag is ASYMMETRIC (tau_up 0.0125 <
    tau_down 0.025, gazebo_motor_model.cpp via models/multirotor.py), so
    zero-mean thrust dither rectifies into a net upward bias of order
    sigma*(tau_down-tau_up)/(tau_down+tau_up) — at the old sigma=30 that
    was ~10 N (~0.5 m/s^2 of un-modeled climb), the root cause of the
    attitude-mode altitude runaway."""
    return np.asarray([8.0, 0.08, 0.08, 0.05] + [1.0] * kinova.N_JOINTS)


def wrench_sigma() -> np.ndarray:
    """Exploration scales for the direct-wrench research mode:
    [thrust N, torque N*m x3, qddot x7]."""
    return np.asarray([30.0, 3.0, 3.0, 1.0] + [1.0] * kinova.N_JOINTS)


@dataclass(frozen=True)
class WholeBodyCostParams:
    """EE pose weights follow the reference arm stack (cost_manager.py:30-43);
    the base-regularization terms are new (the reference has no whole-body
    solver to take them from) and tuned for closed-loop station-keeping:
    weak base costs let the solver trade the base away for transient EE
    progress and then drift."""

    stage_pose_weight: float = 50.0
    stage_orientation_weight: float = 30.0
    terminal_pose_weight: float = 40.0
    terminal_orientation_weight: float = 30.0
    base_pos_weight: float = 100.0      # keep the base near its setpoint
    attitude_weight: float = 200.0      # roll/pitch upright regularization
    omega_weight: float = 5.0
    vel_weight: float = 40.0
    action_weight: float = 0.0
    joint_limit_weight: float = 1.0
    # Soft (quadratic, x1e3) vs hard (reference 1e10 cliff) joint-limit
    # penalty.  The rollout clamps joint trajectories at the limits (real
    # joints stop), so the soft gradient is the default — the hard cliff
    # freezes exploration when the plan grazes a stop (ops/costs
    # joint_limit_soft_cost docstring).
    joint_limit_soft: bool = True
    gamma: float = 0.98
    ori_mode: str = "log"
    obstacle_weight: float = 0.0
    obstacle_centers: tuple = ()        # ((x, y, z), ...)
    obstacle_radii: tuple = ()
    # Terminal stopping-point cost on the BASE: penalize where the base is
    # *heading* at the end of the horizon, |p_H + T_stop * v_H - p*|^2.
    # This encodes the value of the slow (~2 s) lateral position mode that
    # a 0.5 s horizon cannot roll out — a sample that ends the horizon
    # drifting away pays now, so the softmin favors plans that end heading
    # to a stop over the target.  Round 4 added it as the wrench-mode
    # precision fix (weight 8000 there); round 5 measured the DEFAULT
    # (attitude) mode needs it too: without it attitude trades the base
    # 0.4-0.6 m away for EE precision and one of three seeds at K=4096
    # walks into a divergent drift regime — at weight 1200 all seeds hold
    # the EE at <= 2.3 mm MEASURED with the base settled inside 0.07 m
    # (artifacts parity_attitude_k4096_r05).  Position mode pins it to 0
    # (its modeled inner loop already supplies the damping).
    stop_weight: float = 1200.0
    stop_horizon: float = 1.2           # T_stop [s]: lookahead of the coast


def default_nominal_action() -> np.ndarray:
    """Hover nominal for warm-start reversion: gravity-balancing thrust,
    level attitude, zero joint accelerations."""
    nominal = np.zeros(N_ACTIONS)
    p = WholeBodyParams()
    nominal[0] = (p.vehicle.mass + p.arm_mass_lump) * 9.81
    return nominal


def default_action_bounds():
    """Physical clamps for the attitude mode: thrust in [0, 400] N, tilt
    setpoints within +-0.35 rad, yaw +-0.6, joint accel +-20 rad/s^2."""
    lo = np.asarray([0.0, -0.35, -0.35, -0.6] + [-20.0] * kinova.N_JOINTS)
    hi = np.asarray([400.0, 0.35, 0.35, 0.6] + [20.0] * kinova.N_JOINTS)
    return lo, hi


def ee_error_sigma_schedule(
    r0: float = 0.25, floor: float = 0.02,
    base_floor: Optional[float] = None,
):
    """Exploration schedule for the whole-body task: scale sigma by the
    CURRENT end-effector distance-to-go, ``clip(|p_ee - p*| / r0, floor, 1)``.

    MPPI's update is a softmin-weighted noise average, so the held plan
    dithers at the sigma scale even at the optimum (measured ~50 mrad of
    qdes dither -> ~2 cm EE noise floor at arm sigma 2.0).  Scheduling by
    distance-to-go keeps exploration hot during the transient and collapses
    the noise floor near the target — the fix for the reference's 5 mm
    reach gate (mppi.py:117) on the full plant.  One 7-joint FK per solve.

    ``base_floor`` (round 5) sets a SEPARATE floor for the 4 base channels:
    in wrench mode the near-convergence base-wrench dither excites base
    motion faster than the arm's ~20 rad/s tracking loop can counter (the
    measured-vs-commanded EE gap), so the base floor collapses further
    (0.005) while the arm keeps exploration headroom — measured: worst-seed
    measured-EE tail mean 6.4 -> 4.3 mm at K=2048.
    """
    from ..models.whole_body import _quat_from_rpy

    def scale(obs: "WholeBodyObs") -> Array:
        from ..models import chain as chain_mod
        from . import whole_body as _wb

        spec = _wb._SCHEDULE_CHAIN
        bq = _quat_from_rpy(obs.state.base.rpy)
        ee_pos, _ = chain_mod.forward_kinematics_posquat(
            spec, obs.state.q, base_pos=obs.state.base.pos, base_quat=bq
        )
        d = jnp.linalg.norm(ee_pos - obs.ee_target.position)
        s_arm = jnp.clip(d / r0, floor, 1.0)
        if base_floor is None:
            return s_arm
        s_base = jnp.clip(d / r0, base_floor, 1.0)
        return jnp.concatenate([
            jnp.broadcast_to(s_base, (N_BASE_ACTIONS,)),
            jnp.broadcast_to(s_arm, (kinova.N_JOINTS,)),
        ])

    # Declarative identity so config.py can JSON-round-trip the schedule.
    scale.__qmm_schedule__ = {
        "kind": "ee_error", "r0": r0, "floor": floor,
        **({} if base_floor is None else {"base_floor": base_floor}),
    }
    return scale


_SCHEDULE_CHAIN = kinova.chain("link_7")


def position_mode_params(
    n_samples: int = 4096, n_horizon: int = 50
) -> "WholeBodyMPPIParams":
    """Whole-body params for the position-cascade mode: actions are
    [base setpoint offsets xyz, yaw_des, qddot x7]; nominal = hold station.
    The most robust closed-loop configuration (see WholeBodyParams).

    Arm exploration starts hot (sigma 2.0 rad/s^2 — the arm's fast dynamics
    do the fine end-effector positioning while the slow base loop
    coarse-positions) and the distance-to-go schedule
    (:func:`ee_error_sigma_schedule`) collapses it near the target; with the
    tube-feedback servo (``sim/whole_body_loop``) the full plant meets the
    reference's 5 mm reach tolerance (measured — see BASELINE.md)."""
    sigma = np.asarray([0.25, 0.25, 0.25, 0.1] + [2.0] * kinova.N_JOINTS)
    lo = np.asarray([-1.5, -1.5, -1.0, -0.6] + [-20.0] * kinova.N_JOINTS)
    hi = np.asarray([1.5, 1.5, 1.0, 0.6] + [20.0] * kinova.N_JOINTS)
    return WholeBodyMPPIParams(
        mppi=MPPIConfig(
            n_samples=n_samples,
            n_horizon=n_horizon,
            n_action=N_ACTIONS,
            dt=0.01,
            lam=0.1,
            sigma=sigma,
            savgol_window=9,
            u_min=lo,
            u_max=hi,
            warm_start_decay=0.9,
            nominal_action=np.zeros(N_ACTIONS),
            sigma_scale_fn=ee_error_sigma_schedule(),
        ),
        model=WholeBodyParams(control_mode="position"),
        cost=WholeBodyCostParams(
            base_pos_weight=50.0, attitude_weight=100.0,
            omega_weight=1.0, vel_weight=10.0,
            stop_weight=0.0,
        ),
    )


def wrench_mode_params(
    n_samples: int = 4096, n_horizon: int = 50
) -> "WholeBodyMPPIParams":
    """Whole-body params for the direct-wrench mode, with the round-3
    stabilizers that take it from research-fragile to stable closed loop:

    * plant-side arm gravity-moment feed-forward (the reference's own
      harrier_grav_feedback) paired with ``couple_arm_gravity=False`` —
      the inverted arm's constant ~18 N*m roll moment otherwise fights
      the warm-start's decay toward the zero-torque nominal and the
      loop rolls over (measured);
    * body-rate damping ``rate_damping=12`` — the 1 kHz feedback
      tau -= kd I omega, modeled in the rollout as a decay operator
      (parallel-in-time), which stops 100 Hz-held torques from
      destabilizing attitude through the asymmetric rotor lag;
    * (round 4) the terminal stopping-point cost
      (``WholeBodyCostParams.stop_weight``): the 0.5 s horizon cannot roll
      out the ~2 s lateral position mode, so samples were never charged
      for ending the horizon adrift — the cause of the old ~0.5 m base
      weave.  Charging the predicted coast point |p_H + 1.2 s * v_H - p*|^2
      closes it — direct wrench actuation is a precision mode alongside
      attitude/position (gated in CI at K=1024 and at flagship K in
      tests_tpu);
    * (round 5) MEASURED-EE precision pass: stronger station-keeping
      (base 800 / vel 600, stop 8000) and a separate near-convergence
      sigma floor for the base channels (0.005 vs 0.02 arm) — the
      residual measured-vs-commanded EE gap is the arm's ~20 rad/s
      tracking loop chasing base-wrench dither, so the fix is calming the
      dither, not stiffening the arm (kp 900/1600 and vdes feed-forward
      both measured WORSE — they pump the base through the reaction
      coupling).  Measured at K=2048 x 4 seeds: measured-EE tail mean
      6.4 -> 4.3 mm, >5 mm fraction 0.82 -> 0.26.
    """
    sigma = np.asarray([8.0, 1.2, 1.2, 0.5] + [1.0] * kinova.N_JOINTS)
    lo = np.asarray([0.0, -6.0, -6.0, -3.0] + [-20.0] * kinova.N_JOINTS)
    hi = np.asarray([400.0, 6.0, 6.0, 3.0] + [20.0] * kinova.N_JOINTS)
    return WholeBodyMPPIParams(
        mppi=MPPIConfig(
            n_samples=n_samples,
            n_horizon=n_horizon,
            n_action=N_ACTIONS,
            dt=0.01,
            lam=0.1,
            sigma=sigma,
            savgol_window=9,
            u_min=lo,
            u_max=hi,
            warm_start_decay=0.9,
            nominal_action=default_nominal_action(),
            sigma_scale_fn=ee_error_sigma_schedule(base_floor=0.005),
        ),
        model=WholeBodyParams(
            control_mode="wrench", rate_damping=12.0,
            couple_arm_gravity=False,
        ),
        cost=WholeBodyCostParams(
            base_pos_weight=800.0, vel_weight=600.0,
            attitude_weight=400.0, omega_weight=10.0,
            stop_weight=8000.0, stop_horizon=1.2,
        ),
    )


@dataclass(frozen=True)
class WholeBodyMPPIParams:
    mppi: MPPIConfig = field(
        default_factory=lambda: MPPIConfig(
            n_samples=4096,
            n_horizon=50,
            n_action=N_ACTIONS,
            dt=0.01,
            lam=0.1,
            sigma=default_sigma(),
            savgol_window=9,
            savgol_polyorder=2,
            shift_warm_start=False,
            u_min=default_action_bounds()[0],
            u_max=default_action_bounds()[1],
            warm_start_decay=0.9,
            nominal_action=default_nominal_action(),
            sigma_scale_fn=ee_error_sigma_schedule(),
        )
    )
    model: WholeBodyParams = field(default_factory=WholeBodyParams)
    cost: WholeBodyCostParams = field(default_factory=WholeBodyCostParams)


class WholeBodyObs(NamedTuple):
    state: WholeBodyState
    ee_target: Pose
    base_target: Array  # (3,) hover/station-keeping position for the base


class WholeBodyOutput(NamedTuple):
    action: Array        # (11,) [thrust, tau, qddot] to apply now
    u_seq: Array         # (H, 11)
    qdes: Array          # (7,) next arm position setpoint
    vdes: Array          # (7,) next arm velocity setpoint


ATTITUDE_MIN_SAMPLES = 2048
"""Validated sample-count floor for attitude mode (BASELINE.md "Control
parity"): below K≈2048 the softmin average cannot cancel the exploration
noise against the asymmetric rotor-lag rectification and the closed loop
diverges.  Position-cascade mode is the low-K-robust configuration."""


def make_whole_body_solver(
    params: WholeBodyMPPIParams = WholeBodyMPPIParams(),
    axis_name: Optional[str] = None,
    n_local_samples: Optional[int] = None,
    backend: str = "xla",
    pallas_use_prng: bool = True,
    pallas_interpret: bool = False,
    low_k_guard: str = "warn",
):
    """Build (step, init) for the whole-body solve.

    backend="xla" is the reference pipeline; backend="pallas" swaps in the
    fused kernel (``ops/pallas/whole_body_kernel``) — same step contract,
    ~4x faster on the compute-bound configs (noise/rollout/FK/cost never
    leave VMEM).  Both backends are sharding-ready: trace with ``axis_name``
    + ``n_local_samples`` inside ``shard_map`` (``parallel/sharded.py``
    does this) and the sample-axis reductions become ICI collectives.

    ``low_k_guard`` polices the documented attitude-mode divergence floor
    (:data:`ATTITUDE_MIN_SAMPLES`): ``"warn"`` (default) emits a warning,
    ``"error"`` raises, ``"off"`` silences — so a user configuring
    ``control_mode="attitude"`` with small K gets told up front instead of
    discovering silent instability mid-flight.
    """
    cfg = params.mppi
    cp = params.cost
    mp = params.model
    if mp.control_mode == "attitude" and cfg.n_samples < ATTITUDE_MIN_SAMPLES:
        msg = (
            f"attitude-mode whole-body MPPI with n_samples={cfg.n_samples} is "
            f"below the validated floor K={ATTITUDE_MIN_SAMPLES}: the closed "
            "loop diverges (BASELINE.md 'Control parity'). Use "
            "position-cascade mode for low K, raise n_samples, or pass "
            "low_k_guard='off' to proceed anyway."
        )
        if low_k_guard == "error":
            raise ValueError(msg)
        if low_k_guard == "warn":
            import warnings

            warnings.warn(msg, stacklevel=2)
        elif low_k_guard != "off":
            raise ValueError(f"unknown low_k_guard {low_k_guard!r}")
    spec = mp.chain()
    q_lower = jnp.asarray(spec.lower, jnp.float32)
    q_upper = jnp.asarray(spec.upper, jnp.float32)
    has_obstacles = cp.obstacle_weight and len(cp.obstacle_centers)

    def rollout_fn(v: Array, obs: WholeBodyObs):
        return rollout(mp, obs.state, v, cfg.dt)

    def cost_fn(aux, v: Array, u_prev: Array, obs: WholeBodyObs) -> Array:
        ee, q, qdot, base = aux
        target_pos = obs.ee_target.position
        target_quat = obs.ee_target.quat
        s = costs_mod.pose_stage_cost_pq(
            ee.position, ee.quat, target_pos, target_quat,
            cp.stage_pose_weight, cp.stage_orientation_weight, cp.ori_mode,
        )
        s = s + costs_mod.pose_terminal_cost_pq(
            ee.position, ee.quat, target_pos, target_quat,
            cp.terminal_pose_weight, cp.terminal_orientation_weight, cp.ori_mode,
        )
        if cp.base_pos_weight:
            s = s + costs_mod.position_stage_cost(
                base.pos, obs.base_target, cp.base_pos_weight / base.pos.shape[-2]
            )
        if cp.attitude_weight:
            s = s + cp.attitude_weight * jnp.mean(base.tilt_squared(), axis=-1)
        if cp.omega_weight:
            s = s + cp.omega_weight * jnp.mean(
                jnp.sum(base.omega * base.omega, axis=-1), axis=-1
            )
        if cp.vel_weight:
            s = s + cp.vel_weight * jnp.mean(
                jnp.sum(base.vel * base.vel, axis=-1), axis=-1
            )
        if cp.stop_weight:
            d_stop = (
                base.pos[..., -1, :] + cp.stop_horizon * base.vel[..., -1, :]
                - obs.base_target
            )
            s = s + cp.stop_weight * jnp.sum(d_stop * d_stop, axis=-1)
        if cp.action_weight:
            s = s + costs_mod.action_cost(v, cp.action_weight, cp.gamma)
        if cp.joint_limit_weight:
            if cp.joint_limit_soft:
                s = s + costs_mod.joint_limit_soft_cost(
                    q, q_lower, q_upper, cp.gamma,
                    weight=1e3 * cp.joint_limit_weight,
                )
            else:
                s = s + cp.joint_limit_weight * costs_mod.joint_limit_cost(
                    q, q_lower, q_upper, cp.gamma
                )
        if has_obstacles:
            s = s + costs_mod.sphere_obstacle_cost(
                ee.position,
                jnp.asarray(cp.obstacle_centers, ee.position.dtype),
                jnp.asarray(cp.obstacle_radii, ee.position.dtype),
                cp.obstacle_weight,
            )
        return s

    if backend == "pallas":
        from ..ops.pallas.whole_body_kernel import make_whole_body_pallas_step

        inner = make_whole_body_pallas_step(
            params,
            use_prng=pallas_use_prng,
            interpret=pallas_interpret,
            axis_name=axis_name,
            n_local_samples=n_local_samples,
        )
    elif backend == "xla":
        inner = make_step(cfg, rollout_fn, cost_fn, axis_name, n_local_samples)
    else:
        raise ValueError(f"unknown backend {backend!r}")

    def step(state: MPPIState, obs: WholeBodyObs) -> Tuple[WholeBodyOutput, MPPIState]:
        qddot_prev = state.u_prev[0, N_BASE_ACTIONS:]
        u_seq, new_state = inner(state, obs)
        u0 = u_seq[0]
        arm_u0 = u0[N_BASE_ACTIONS:]
        vdes = obs.state.qdot + arm_u0 * cfg.dt
        qdes = obs.state.q + qddot_prev * cfg.dt + 0.5 * arm_u0 * cfg.dt * cfg.dt
        return WholeBodyOutput(action=u0, u_seq=u_seq, qdes=qdes, vdes=vdes), new_state

    def init(key: Array, dtype=jnp.float32) -> MPPIState:
        from .mppi import _diag_sigma

        if mp.control_mode == "position":
            # Setpoint-offset actions: hold-station nominal is all zeros.
            u0 = jnp.zeros((cfg.n_horizon, N_ACTIONS), dtype)
        else:
            u0 = hover_nominal_action(mp, cfg.n_horizon, dtype)
        return MPPIState(u_prev=u0, key=key, sigma=_diag_sigma(cfg, dtype))

    return step, init


def default_obs(dtype=jnp.float32) -> WholeBodyObs:
    """A hover + reach task: base at 2.1 m (the launch file's hover target,
    ``launch/aerial_manipulator.launch:30-45``), arm at home, EE target =
    the reference demo target (``mppi.py:71-73``)."""
    base = Multirotor12State(
        pos=jnp.asarray([0.0, 0.0, 2.1], dtype),
        rpy=jnp.zeros(3, dtype),
        vel=jnp.zeros(3, dtype),
        omega=jnp.zeros(3, dtype),
    )
    state = WholeBodyState(
        base=base,
        q=jnp.asarray(kinova.Q_HOME, dtype),
        qdot=jnp.zeros(7, dtype),
    )
    from .arm import default_target

    # The reference demo target is world-frame for a base hovering at ~2.1 m
    # (it sits ~0.45 m below the base, within the hanging arm's workspace).
    target = default_target(dtype)
    return WholeBodyObs(state=state, ee_target=target, base_target=base.pos)

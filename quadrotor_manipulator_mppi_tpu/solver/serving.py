"""Packed serving API: the minimum-argument whole-body solve call.

A real plant served over the bridge pays per-call host marshalling for every
ARRAY ARGUMENT crossing the device tunnel (~0.05 ms/array measured on this
host — BASELINE.md "Measurement methodology").  The natural pytree call
``step(MPPIState, WholeBodyObs)`` crosses 12 leaves (3 state + 9 obs) and
returns 7 — marshalling, not compute, dominates its ~0.8 ms latency.

This module packs the tunnel contract down to the reference's own transfer
shape: the plant publishes ONE flat state vector per tick (27 floats —
``/root/reference/src/aerial_manipulation/src/controller.cpp:305-337``
packs base xyz + quaternion + 7 arm joints into a 14-position/13-velocity
``JointState``), and the solver replies with one flat command vector
(the reference replies with 7 torques on ``robot_cmd`` plus a setpoint on
``drone_pose`` — ``kinova.py:188-191``, ``drone.py:239-241``).  Everything
else is trace-time constant:

* ``sigma`` — constant unless ``adaptive_sigma`` (the CVIS update) is on;
  folded out of the carried state,
* the task targets — either baked in (``static_targets``) or passed as one
  10-float vector,
* the solver state — ``(u_prev, key)``, device-resident and donated.

Layouts (all float32):

``obs_vec`` (27,) — the robot_states contract, wxyz quaternion (the repo
convention; the reference message is xyzw, ``controller.cpp:312-315`` — the
bridge converts):

    [0:3]   base world position
    [3:7]   base quaternion wxyz (body->world)
    [7:14]  arm joint positions q
    [14:17] base world linear velocity
    [17:20] base body angular velocity
    [20:27] arm joint velocities qdot

``target_vec`` (10,): [ee position (3), ee quaternion wxyz (4),
base station-keeping target (3)].

``out_vec`` (25,): [action (11), qdes (7), vdes (7)].
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.multirotor import Multirotor12State
from ..models.whole_body import WholeBodyState
from ..utils import rotations as rot
from ..utils.pose import Pose
from . import whole_body as wbs
from .mppi import MPPIState, _diag_sigma

Array = jax.Array

OBS_SIZE = 27
TARGET_SIZE = 10
OUT_SIZE = 25


class PackedCarry(NamedTuple):
    """Device-resident solver state for the packed call: 2 tunnel arguments
    instead of MPPIState's 3 (sigma is a trace-time constant here)."""

    u_prev: Array  # (H, A)
    key: Array     # PRNG key


def pack_obs(obs: "wbs.WholeBodyObs") -> Tuple[Array, Array]:
    """WholeBodyObs -> (obs_vec (27,), target_vec (10,)).

    The base attitude is converted rpy -> quaternion so the wire format
    matches the plant's natural output (the reference plant publishes a
    quaternion, ``controller.cpp:312-315``)."""
    st = obs.state
    quat = rot.matrix_to_quat(
        rot.euler_to_matrix(
            jnp.stack([st.base.rpy[2], st.base.rpy[1], st.base.rpy[0]]), "ZYX"
        )
    )
    obs_vec = jnp.concatenate([
        st.base.pos, quat, st.q, st.base.vel, st.base.omega, st.qdot
    ]).astype(jnp.float32)
    target_vec = jnp.concatenate([
        obs.ee_target.position, obs.ee_target.quat, obs.base_target
    ]).astype(jnp.float32)
    return obs_vec, target_vec


def unpack_obs(obs_vec: Array, target_vec: Array) -> "wbs.WholeBodyObs":
    """(obs_vec, target_vec) -> WholeBodyObs (traced; runs on device)."""
    quat = rot.quat_normalize(obs_vec[3:7])
    ang = rot.matrix_to_euler(rot.quat_to_matrix(quat), "ZYX")
    rpy = jnp.stack([ang[2], ang[1], ang[0]])
    base = Multirotor12State(
        pos=obs_vec[0:3], rpy=rpy, vel=obs_vec[14:17], omega=obs_vec[17:20]
    )
    state = WholeBodyState(base=base, q=obs_vec[7:14], qdot=obs_vec[20:27])
    return wbs.WholeBodyObs(
        state=state,
        ee_target=Pose(position=target_vec[0:3],
                       quat=rot.quat_normalize(target_vec[3:7])),
        base_target=target_vec[7:10],
    )


def unpack_out(out_vec: Array) -> "wbs.WholeBodyOutput":
    """out_vec (25,) -> WholeBodyOutput (without the full plan u_seq, which
    stays on device — fetch it from the carry's u_prev if needed)."""
    return wbs.WholeBodyOutput(
        action=out_vec[0:11], u_seq=None,
        qdes=out_vec[11:18], vdes=out_vec[18:25],
    )


def make_packed_step(
    params: "wbs.WholeBodyMPPIParams" = None,
    backend: str = "pallas",
    static_targets: Optional["wbs.WholeBodyObs"] = None,
    low_k_guard: str = "warn",
    jit: bool = True,
):
    """Build the packed serving solve.

    Returns ``(pstep, pinit)``:

    * ``pinit(key) -> PackedCarry`` — device-resident solver state;
    * with ``static_targets`` (a WholeBodyObs or (ee_target Pose, base_target)
      tuple): ``pstep(carry, obs_vec) -> (out_vec, carry)`` — THREE tunnel
      arguments per call (u_prev, key, obs_vec), the minimum-latency shape
      for a fixed task;
    * without: ``pstep(carry, obs_vec, target_vec) -> (out_vec, carry)``.

    The carry is donated when ``jit=True`` — its buffers never round-trip.
    Solver semantics are bit-identical to ``make_whole_body_solver``'s step
    (tested in ``tests/test_serving.py``); only the wire format changes.
    """
    params = params or wbs.WholeBodyMPPIParams()
    cfg = params.mppi
    if cfg.adaptive_sigma:
        raise ValueError(
            "packed serving folds sigma to a trace-time constant; "
            "adaptive_sigma needs the full MPPIState API"
        )
    step, init = wbs.make_whole_body_solver(
        params, backend=backend, low_k_guard=low_k_guard
    )
    sigma_const = _diag_sigma(cfg, jnp.float32)

    if static_targets is not None:
        if isinstance(static_targets, wbs.WholeBodyObs):
            ee_t, base_t = static_targets.ee_target, static_targets.base_target
        else:
            ee_t, base_t = static_targets
        _, target_const = pack_obs(
            wbs.WholeBodyObs(
                state=wbs.default_obs().state, ee_target=ee_t, base_target=base_t
            )
        )

        def pstep(carry: PackedCarry, obs_vec: Array):
            obs = unpack_obs(obs_vec, target_const)
            out, new = step(
                MPPIState(u_prev=carry.u_prev, key=carry.key, sigma=sigma_const),
                obs,
            )
            out_vec = jnp.concatenate([out.action, out.qdes, out.vdes])
            return out_vec, PackedCarry(u_prev=new.u_prev, key=new.key)
    else:

        def pstep(carry: PackedCarry, obs_vec: Array, target_vec: Array):
            obs = unpack_obs(obs_vec, target_vec)
            out, new = step(
                MPPIState(u_prev=carry.u_prev, key=carry.key, sigma=sigma_const),
                obs,
            )
            out_vec = jnp.concatenate([out.action, out.qdes, out.vdes])
            return out_vec, PackedCarry(u_prev=new.u_prev, key=new.key)

    def pinit(key: Array, dtype=jnp.float32) -> PackedCarry:
        st = init(key, dtype)
        return PackedCarry(u_prev=st.u_prev, key=st.key)

    if jit:
        pstep = jax.jit(pstep, donate_argnums=0)
    return pstep, pinit


BRIDGE_OUT_SIZE = 10


def make_bridge_step(
    params=None,
    setpoint_lookahead: int = 10,
    backend: str = "xla",
    low_k_guard: str = "warn",
    jit: bool = True,
):
    """The whole-body BRIDGE serving head: one jitted call per plant tick.

    ``bstep(carry, obs_vec, target_vec) -> (reply_vec, carry)`` where
    ``reply_vec`` (10,) = [arm efforts tau (7), base position carrot xdes
    (3)] — exactly the payloads of the ROBOT_CMD + DRONE_POSE frames the
    QMM bridge sends back (the reference's two reply topics,
    ``kinova.py:188-191`` / ``drone.py:239-241``).  Fuses the solve, the
    inertia-weighted tracking law (``kinova.py:184``) and the smooth-carrot
    prediction into ONE dispatch with ONE host readback — the bridge
    session previously paid two separate fetches per tick.

    Position-cascade mode only (its base command IS a position setpoint,
    the DRONE_POSE contract).
    """
    from ..models import rigid_body as rb
    from ..models.whole_body import _base_rollout_position

    params = params or wbs.position_mode_params(n_samples=512, n_horizon=50)
    if params.model.control_mode != "position":
        raise ValueError("the bridge head requires the position mode")
    if params.mppi.adaptive_sigma:
        raise ValueError(
            "packed serving folds sigma to a trace-time constant; "
            "adaptive_sigma needs the full MPPIState API"
        )
    step, init = wbs.make_whole_body_solver(
        params, backend=backend, low_k_guard=low_k_guard
    )
    sigma_const = _diag_sigma(params.mppi, jnp.float32)
    spec = params.model.chain()
    inertials = params.model.inertials()

    def bstep(carry: PackedCarry, obs_vec: Array, target_vec: Array):
        obs = unpack_obs(obs_vec, target_vec)
        out, new = step(
            MPPIState(u_prev=carry.u_prev, key=carry.key, sigma=sigma_const),
            obs,
        )
        q, qdot = obs.state.q, obs.state.qdot
        base_rot = rot.quat_to_matrix(rot.quat_normalize(obs_vec[3:7]))
        m = rb.mass_matrix(spec, inertials, q)
        nle = rb.nonlinear_effects(
            spec, inertials, q, qdot, base_rot=base_rot
        )
        tau = m @ (400.0 * (out.qdes - q) - 40.0 * qdot) + nle
        # Smooth carrot: the plan's own predicted closed-loop position a
        # short lookahead along the freshly-updated plan u_seq.
        pred = _base_rollout_position(
            params.model, obs.state, out.u_seq[None, :, :4],
            params.mppi.dt, 1,
        )
        la = min(setpoint_lookahead, pred.pos.shape[1] - 1)
        reply = jnp.concatenate([tau, pred.pos[0, la]])
        return reply, PackedCarry(u_prev=new.u_prev, key=new.key)

    def pinit(key: Array, dtype=jnp.float32) -> PackedCarry:
        st = init(key, dtype)
        return PackedCarry(u_prev=st.u_prev, key=st.key)

    if jit:
        bstep = jax.jit(bstep)
    return bstep, pinit

"""Fixed-wing waypoint MPPI preset.

The reference stack carries the fixed-wing capability (Techpod +
``gazebo_fw_dynamics_plugin``) but never closes an autonomous loop over it —
its fixed-wing flying is joystick/HIL only (SURVEY.md 2.3).  Here the same
functional MPPI engine that drives the arm/drone/whole-body solvers flies
the Techpod: samples are normalized surface commands
[aileron-differential, elevator, rudder, throttle-offset] rolled out through
the full polynomial airframe model (:mod:`..models.fixed_wing`) with a
``lax.scan`` over the horizon — sequential in t like the whole-body model,
embarrassingly parallel over K.

Costs: horizontal waypoint progress + altitude hold + cruise-airspeed
keeping + bank/rate regularization + a ground-crash barrier.  A fixed-wing
cannot hover, so the task semantic is *flyby*: minimize the closest-approach
distance along the horizon, not a terminal hover.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import fixed_wing as fw
from ..utils import rotations as rot
from .mppi import MPPIConfig, MPPIState, init_state, make_step

Array = jax.Array


class FwObs(NamedTuple):
    state: fw.FixedWingState  # current (unbatched) plant state
    target: Array             # (3,) waypoint, world frame
    cruise_speed: Array       # scalar [m/s]


class FwOutput(NamedTuple):
    controls: fw.FwControls   # next-tick surface commands (normalized)
    u_seq: Array              # (H, 4) updated plan


@dataclass(frozen=True)
class FwMPPIParams:
    mppi: MPPIConfig = field(
        default_factory=lambda: MPPIConfig(
            n_samples=1024,
            n_horizon=40,
            n_action=4,
            dt=0.05,
            lam=0.05,
            sigma=(0.25, 0.25, 0.2, 0.15),
            savgol_window=5,
            savgol_polyorder=2,
            shift_warm_start=True,
            u_min=(-1.0, -1.0, -1.0, -0.5),
            u_max=(1.0, 1.0, 1.0, 0.5),
        )
    )
    aero: fw.FwAeroParams = field(default_factory=fw.FwAeroParams)
    veh: fw.FwVehicleParams = field(default_factory=fw.FwVehicleParams)
    base_throttle: float = 0.5
    w_waypoint: float = 4.0       # stage horizontal+vertical distance
    w_closest: float = 400.0      # closest-approach (the flyby objective)
    w_altitude: float = 8.0
    w_speed: float = 2.0
    w_bank: float = 40.0
    w_rate: float = 2.0
    w_action: float = 0.5
    crash_z: float = 5.0          # altitude floor [m]
    crash_penalty: float = 1e6


def _controls_of(v: Array, base_throttle: float) -> fw.FwControls:
    """Map a (..., 4) action vector onto surface commands."""
    ail = jnp.clip(v[..., 0], -1.0, 1.0)
    return fw.FwControls(
        aileron_left=ail,
        aileron_right=-ail,
        elevator=jnp.clip(v[..., 1], -1.0, 1.0),
        flap=jnp.zeros_like(ail),
        rudder=jnp.clip(v[..., 2], -1.0, 1.0),
        throttle=jnp.clip(base_throttle + v[..., 3], 0.0, 1.0),
    )


def make_fixed_wing_solver(
    params: FwMPPIParams = FwMPPIParams(),
    axis_name: Optional[str] = None,
    n_local_samples: Optional[int] = None,
):
    """Returns (step, init) with step(state, obs) -> (FwOutput, state)."""
    cfg = params.mppi

    def rollout(v: Array, obs: FwObs):
        k = v.shape[0]
        s0 = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (k,) + x.shape), obs.state
        )

        def body(s, vt):
            c = _controls_of(vt, params.base_throttle)
            s_next = fw.step(params.aero, params.veh, s, c, cfg.dt)
            # Rollout-model protection: wild samples (full deflection for
            # the whole horizon) can spin the explicit-Euler airframe into
            # V^2-force blowup within H steps; a NaN in ANY sample poisons
            # the softmin.  Clamp to a generous flight envelope — the
            # optimum is far inside it, so the clamp never binds on the
            # trajectories that matter.
            s_next = s_next._replace(
                vel=jnp.clip(s_next.vel, -60.0, 60.0),
                omega=jnp.clip(s_next.omega, -12.0, 12.0),
            )
            out = (s_next.pos, s_next.vel, s_next.quat, s_next.omega)
            return s_next, out

        _, (pos, vel, quat, omega) = jax.lax.scan(
            body, s0, jnp.swapaxes(v, 0, 1)
        )
        # scan stacks over t: (H, K, ...) -> (K, H, ...)
        return jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1),
                            (pos, vel, quat, omega))

    def cost(aux, v: Array, u_prev: Array, obs: FwObs) -> Array:
        pos, vel, quat, omega = aux
        dist = jnp.linalg.norm(pos - obs.target, axis=-1)       # (K, H)
        s = params.w_waypoint * jnp.sum(dist, axis=-1)
        s = s + params.w_closest * jnp.min(dist, axis=-1)
        s = s + params.w_altitude * jnp.sum(
            jnp.abs(pos[..., 2] - obs.target[2]), axis=-1
        )
        speed = jnp.linalg.norm(vel, axis=-1)
        s = s + params.w_speed * jnp.sum(
            (speed - obs.cruise_speed) ** 2, axis=-1
        )
        # bank: world-z component of the body-y (left-wing) axis — zero in
        # level flight.  R[2, 1] of the body->world rotation.
        m = rot.quat_to_matrix(quat)               # (K, H, 3, 3)
        s = s + params.w_bank * jnp.sum(m[..., 2, 1] ** 2, axis=-1)
        s = s + params.w_rate * jnp.sum(omega * omega, axis=(-1, -2))
        s = s + params.w_action * jnp.sum(v * v, axis=(-1, -2))
        s = s + params.crash_penalty * jnp.any(
            pos[..., 2] < params.crash_z, axis=-1
        )
        # Belt-and-braces: a non-finite rollout must lose, not poison the
        # softmin normalization.
        return jnp.where(jnp.isfinite(s), s, params.crash_penalty)

    inner = make_step(cfg, rollout, cost, axis_name, n_local_samples)

    def step(state: MPPIState, obs: FwObs) -> Tuple[FwOutput, MPPIState]:
        u_seq, new_state = inner(state, obs)
        return (
            FwOutput(
                controls=_controls_of(u_seq[0], params.base_throttle),
                u_seq=u_seq,
            ),
            new_state,
        )

    def init(key: Array) -> MPPIState:
        return init_state(cfg, key)

    return step, init

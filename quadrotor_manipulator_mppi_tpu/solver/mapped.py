"""Map-aware point-mass MPPI: dynamic obstacles from an online occupancy map.

Connects the perception stack to the control path: the occupancy grid
(``sim/occupancy``, the octomap analog) exports its top-N occupied voxels as
sphere obstacles every solve, and this preset consumes them as part of the
OBSERVATION — unlike the whole-body preset's trace-time obstacle list
(``solver/whole_body.py:84-86``), the obstacle set here changes every step
without retracing, which is what online mapping requires.  Inert export
slots arrive with radius 0; the margin is folded into the live radii by the
caller (a zero-radius slot with nonzero margin would otherwise still repel).

The reference has no equivalent — its octomap plugin builds maps for
offline use and nothing consumes them in control.  This is the natural
TPU-native composition: one jitted scan runs sense -> map -> export ->
solve -> actuate (see ``run.py mapped-flight``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import costs as costs_mod
from ..ops import integrators
from .mppi import MPPIConfig, MPPIState, init_state, make_step

Array = jax.Array


class MappedObs(NamedTuple):
    x: Array             # (3,) position
    v: Array             # (3,) velocity
    target: Array        # (3,)
    obst_centers: Array  # (N, 3) dynamic obstacle spheres (map export)
    obst_radii: Array    # (N,)  0 = inert slot
    # Optional ESDF (sim/occupancy.distance_field) — consumed instead of
    # the sphere export when MappedMPPIParams.use_esdf is set.
    dist_field: Array = None


class MappedOutput(NamedTuple):
    xdes: Array
    vdes: Array
    u_seq: Array


@dataclass(frozen=True)
class MappedMPPIParams:
    mppi: MPPIConfig = field(
        default_factory=lambda: MPPIConfig(
            n_samples=1024,
            n_horizon=32,
            n_action=3,
            dt=0.05,
            lam=0.1,
            sigma=6.0,
            savgol_window=5,
            savgol_polyorder=2,
            shift_warm_start=True,
            u_min=-6.0,
            u_max=6.0,
            # Distance-to-go exploration schedule (the same mechanism that
            # closes the whole-body reach gate): full sigma in the open
            # field, ~15% near the goal, killing the point-mass MPPI's
            # softmin dither radius at convergence.
            sigma_scale_fn=lambda obs: jnp.clip(
                jnp.linalg.norm(obs.x - obs.target) / 3.0, 0.15, 1.0
            ),
        )
    )
    stage_weight: float = 6.0
    terminal_weight: float = 60.0
    obstacle_weight: float = 2000.0
    speed_weight: float = 0.5
    max_speed: float = 2.0
    # The emitted position setpoint is the plan's own predicted position
    # this many rollout steps ahead (the whole-body loop's
    # setpoint_lookahead semantics): a one-step carrot leads the plant by
    # ~u dt^2 = millimeters and the closed loop creeps.
    lookahead: int = 8
    # Altitude-corridor penalty |z - target_z| (0 disables).  With a planar
    # lidar the map only covers the flight plane; without the corridor the
    # solver happily climbs over obstacles through UNSCANNED space and
    # clips what the map never saw.  Keeping the task in the sensed plane
    # forces lateral avoidance — the sensor geometry's honest envelope.
    altitude_weight: float = 0.0
    # ESDF obstacle mode: instead of the top-N sphere export, the rollout
    # queries the occupancy map's distance field directly — smooth
    # clearance everywhere the map covers, no N-obstacle truncation.
    # Requires the OccupancyParams the field was built with (static
    # geometry) and obs.dist_field each solve.
    use_esdf: bool = False
    esdf_params: object = None        # sim.occupancy.OccupancyParams
    esdf_margin: float = 0.9          # clearance floor [m]
    esdf_max_dist: float = 2.0
    esdf_weight: float = 2000.0
    # Inside this radius the emitted carrot blends linearly toward the
    # target itself.  Re-planning from the measured state makes the
    # lookahead carrot FOLLOW the plant (carrot = x + O(u dt^2)), so
    # endgame convergence creeps and overshoot recovers glacially; the
    # inner flight loop holds a fixed point at mm level, so hand it the
    # goal once the map-informed plan is no longer needed to dodge
    # anything (obstacle costs still veto the plan that got us here).
    hold_radius: float = 1.5


def make_mapped_solver(
    params: MappedMPPIParams = MappedMPPIParams(),
    axis_name: Optional[str] = None,
    n_local_samples: Optional[int] = None,
):
    """Returns (step, init); step(state, obs) -> (MappedOutput, state)."""
    cfg = params.mppi

    def rollout(v: Array, obs: MappedObs):
        traj, vel = integrators.double_integrate(v, obs.x, obs.v, cfg.dt)
        return traj, vel

    def cost(aux, v: Array, u_prev: Array, obs: MappedObs) -> Array:
        traj, vel = aux
        dist = jnp.linalg.norm(traj - obs.target, axis=-1)        # (K, H)
        s = params.stage_weight * jnp.sum(dist, axis=-1)
        s = s + params.terminal_weight * dist[..., -1]
        if params.use_esdf:
            from ..sim import occupancy as occ_mod

            clearance = occ_mod.query_distance(
                params.esdf_params, obs.dist_field, traj,
                max_dist=params.esdf_max_dist,
            )
            pen = jnp.maximum(params.esdf_margin - clearance, 0.0)
            s = s + params.esdf_weight * jnp.sum(pen * pen, axis=-1)
        else:
            s = s + costs_mod.sphere_obstacle_cost(
                traj, obs.obst_centers, obs.obst_radii, params.obstacle_weight
            )
        speed = jnp.linalg.norm(vel, axis=-1)
        s = s + params.speed_weight * jnp.sum(
            jnp.maximum(speed - params.max_speed, 0.0) ** 2, axis=-1
        )
        if params.altitude_weight:
            s = s + params.altitude_weight * jnp.sum(
                jnp.abs(traj[..., 2] - obs.target[2]), axis=-1
            )
        return s

    inner = make_step(cfg, rollout, cost, axis_name, n_local_samples)

    def step(state: MPPIState, obs: MappedObs) -> Tuple[MappedOutput, MPPIState]:
        u_seq, new_state = inner(state, obs)
        plan, plan_v = integrators.double_integrate(
            u_seq[None], obs.x, obs.v, cfg.dt
        )
        look = min(params.lookahead, cfg.n_horizon) - 1
        xdes, vdes = plan[0, look], plan_v[0, look]
        if params.hold_radius > 0.0:
            w = jnp.clip(
                1.0 - jnp.linalg.norm(obs.x - obs.target) / params.hold_radius,
                0.0, 1.0,
            )
            xdes = (1.0 - w) * xdes + w * obs.target
            vdes = (1.0 - w) * vdes
        return MappedOutput(xdes=xdes, vdes=vdes, u_seq=u_seq), new_state

    def init(key: Array) -> MPPIState:
        return init_state(cfg, key)

    return step, init

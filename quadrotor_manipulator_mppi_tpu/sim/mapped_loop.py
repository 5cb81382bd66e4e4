"""The map-in-the-loop control step: sense -> map -> export -> solve ->
actuate as one jittable function.

Single source of truth for the serving-shape step that ``run.py
mapped-flight`` flies and ``benchmarks/run_details.py`` times — one full
100 Hz control period: lidar raycast against the (hidden) true scene,
occupancy-grid ray insertion, top-N occupied-voxel obstacle export with the
safety margin folded into live radii, a map-aware MPPI solve, and 10 x
1 kHz backstepping plant ticks tracking the emitted carrot.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models import multirotor as mr
from ..solver import mapped as mapped_solver
from ..utils import rotations as rot
from . import closed_loop as cl
from . import flight_control as fc
from . import occupancy as occ
from . import sensors

Array = jax.Array


@dataclass(frozen=True)
class MappedFlightConfig:
    """The mapped-flight scene + sensing/mapping geometry (shared between
    the CLI scenario and the benchmark)."""

    target: Tuple[float, float, float] = (9.0, 0.0, 1.8)
    start: Tuple[float, float, float] = (0.0, 0.0, 1.8)
    # True scene (hidden from the solver): two spheres astride the line.
    true_centers: Tuple = ((3.5, 0.35, 1.8), (6.5, -0.5, 1.8))
    true_radii: Tuple = (1.0, 1.0)
    lidar: sensors.LidarParams = field(
        default_factory=lambda: sensors.LidarParams(
            n_beams=48, max_range=12.0, noise=0.01
        )
    )
    grid: occ.OccupancyParams = field(
        default_factory=lambda: occ.OccupancyParams(
            origin=(-1.0, -4.0, 0.8), resolution=0.25, shape=(48, 32, 8),
            n_free_samples=24, max_range=10.0,
        )
    )
    max_obstacles: int = 64
    margin: float = 0.65  # voxel half-diagonal 0.217 + vehicle radius
    physics_dt: float = 0.001
    substeps: int = 10


def make_mapped_control_step(
    cfg: MappedFlightConfig,
    params: mapped_solver.MappedMPPIParams,
    vehicle: mr.MultirotorParams = None,
    gains: fc.FlightGains = None,
):
    """Returns ``control_step(plant, ctrl, solver, grid, key) ->
    ((plant, ctrl, solver, grid), (pos, clearance))`` — jit/scan-ready."""
    veh = vehicle or mr.MultirotorParams()
    gains = gains or fc.FlightGains()
    if params.use_esdf:
        # ONE source of grid geometry: the field is built from cfg.grid, so
        # the solver must query with the same params.  Fill an unset
        # esdf_params automatically; reject a mismatched one (a wrong frame
        # makes out-of-bounds queries read max_dist — "all clear" — and the
        # vehicle would plan straight through mapped obstacles).
        import dataclasses as _dc

        if params.esdf_params is None:
            params = _dc.replace(params, esdf_params=cfg.grid)
        elif params.esdf_params != cfg.grid:
            raise ValueError(
                "MappedMPPIParams.esdf_params differs from "
                "MappedFlightConfig.grid — the ESDF would be queried in the "
                "wrong frame"
            )
    step, _ = mapped_solver.make_mapped_solver(params)
    lp, op = cfg.lidar, cfg.grid
    dirs_b = sensors.lidar_directions(lp)
    true_c = jnp.asarray(cfg.true_centers)
    true_r = jnp.asarray(cfg.true_radii)
    target = jnp.asarray(cfg.target)

    def control_step(plant, ctrl, sol, grid, key):
        rotm = rot.quat_to_matrix(plant.quat)
        ranges = sensors.lidar_measure(
            lp, key, plant.pos, rotm, ground_z=-50.0,
            sphere_centers=true_c, sphere_radii=true_r,
        )
        dirs_w = jnp.einsum("ij,bj->bi", rotm, dirs_b)
        endpoints = plant.pos[None, :] + dirs_w * ranges[:, None]
        grid = occ.insert_rays(
            op, grid, plant.pos, endpoints, jnp.ones((lp.n_beams,), bool)
        )
        centers, radii = occ.occupied_centers(
            op, grid, max_n=cfg.max_obstacles
        )
        radii_eff = jnp.where(radii > 0.0, radii + cfg.margin, 0.0)

        dist_field = None
        if params.use_esdf:
            dist_field = occ.distance_field(
                op, grid, max_dist=params.esdf_max_dist
            )
        obs = mapped_solver.MappedObs(
            x=plant.pos, v=plant.vel, target=target,
            obst_centers=centers, obst_radii=radii_eff,
            dist_field=dist_field,
        )
        out, sol = step(sol, obs)
        # Position-only carrot (the drone_pose contract, drone.py:239-241):
        # feeding the plan's own velocity forward removes the inner loop's
        # damping and runs away.
        sp = fc.hover_setpoint(out.xdes)

        def tick(c, _):
            p, ct = c
            u, ct = fc.backstepping_step(
                gains, veh, ct, sp, pos=p.pos, vel_world=p.vel,
                rpy=cl.rpy_of(p), omega_body=p.omega, dt=cfg.physics_dt,
            )
            p = mr.step(veh, p, fc.allocate(veh, u), cfg.physics_dt)
            return (p, ct), None

        (plant, ctrl), _ = jax.lax.scan(
            tick, (plant, ctrl), None, length=cfg.substeps
        )
        clearance = jnp.min(
            jnp.linalg.norm(plant.pos - true_c, axis=-1) - true_r
        )
        return (plant, ctrl, sol, grid), (plant.pos, clearance)

    return control_step


def init_mapped_flight(cfg: MappedFlightConfig, vehicle=None):
    """(plant, ctrl, grid) initial state for the mapped-flight loop."""
    veh = vehicle or mr.MultirotorParams()
    plant = mr.init_state(veh, pos=cfg.start)
    plant = plant._replace(
        rotor_speed=jnp.full((veh.n_rotors,), veh.hover_rotor_speed())
    )
    return plant, fc.init_ctrl_state(veh.mass), occ.init_grid(cfg.grid)

"""Occupancy-grid mapping — the TPU-native ``gazebo_octomap_plugin`` analog.

The reference's octomap plugin
(``rotors_gazebo_plugins/src/gazebo_octomap_plugin.cpp``) builds an OcTree
occupancy map of the Gazebo world by in-world ray probing and serves it over
a ROS service.  A pointer-chasing octree is the wrong data structure for a
TPU; the redesign is a **dense log-odds voxel grid** held as one device
array, updated by batched ray insertion:

* every sensor ray contributes ``miss`` log-odds to a fixed number of
  equally spaced samples along the free segment and ``hit`` log-odds to the
  endpoint voxel — all rays in a scan land in two ``scatter-add`` ops
  (static shapes, jit/scan-friendly, batched over whole depth images);
* standard octomap defaults: p_hit = 0.7, p_miss = 0.4, clamped to
  [p_min = 0.12, p_max = 0.97] (the octomap library's defaults, which the
  plugin inherits);
* queries are O(1) gathers, so the solver can consume the map directly —
  :func:`occupied_centers` exports the top-N occupied voxels as the sphere
  obstacles the MPPI obstacle cost already understands.

The map lives in a plain :class:`NamedTuple` pytree: insertion inside a
jitted closed loop costs one fused update, and checkpoint/resume falls out
of the existing pytree checkpoint machinery.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array

# octomap library defaults (octomap::OcTree): P(hit)=0.7, P(miss)=0.4,
# clamping thresholds 0.12 / 0.97, occupancy threshold 0.5.
LOG_ODDS_HIT = math.log(0.7 / 0.3)
LOG_ODDS_MISS = math.log(0.4 / 0.6)
LOG_ODDS_MIN = math.log(0.12 / 0.88)
LOG_ODDS_MAX = math.log(0.97 / 0.03)
OCCUPIED_THRESHOLD = 0.0  # log-odds 0 == p 0.5


@dataclass(frozen=True)
class OccupancyParams:
    origin: Tuple[float, float, float] = (-5.0, -5.0, 0.0)
    resolution: float = 0.1           # [m] voxel edge
    shape: Tuple[int, int, int] = (100, 100, 40)
    n_free_samples: int = 32          # free-space samples per ray (static)
    max_range: float = 10.0           # rays longer than this only carve


class OccupancyGrid(NamedTuple):
    log_odds: Array                   # (nx, ny, nz)


def init_grid(params: OccupancyParams, dtype=jnp.float32) -> OccupancyGrid:
    return OccupancyGrid(log_odds=jnp.zeros(params.shape, dtype))


def _voxel_index(params: OccupancyParams, pts: Array) -> Tuple[Array, Array]:
    """World points -> (indices (..., 3), in_bounds (...))."""
    origin = jnp.asarray(params.origin, pts.dtype)
    ijk = jnp.floor((pts - origin) / params.resolution).astype(jnp.int32)
    shape = jnp.asarray(params.shape, jnp.int32)
    inb = jnp.all((ijk >= 0) & (ijk < shape), axis=-1)
    ijk = jnp.clip(ijk, 0, shape - 1)
    return ijk, inb


def insert_rays(
    params: OccupancyParams,
    grid: OccupancyGrid,
    origin_pos: Array,                # (3,) sensor origin, world
    endpoints: Array,                 # (R, 3) ray endpoints, world
    valid: Array,                     # (R,) bool — invalid rays are no-ops
) -> OccupancyGrid:
    """Batched log-odds ray insertion (octomap ``insertPointCloud`` analog).

    Free-space carving uses ``n_free_samples`` equally spaced points on
    (0, 1) of each ray (exclusive of the endpoint voxel); the endpoint gets
    the hit update unless the ray exceeds ``max_range`` (then it only
    carves, like octomap's maxrange handling).
    """
    lo = grid.log_odds
    dtype = lo.dtype
    delta = endpoints - origin_pos[None, :]
    length = jnp.linalg.norm(delta, axis=-1)              # (R,)
    over = length > params.max_range
    # cap carving at max_range along the ray direction
    scale = jnp.where(over, params.max_range / jnp.maximum(length, 1e-9), 1.0)
    capped = origin_pos[None, :] + delta * scale[..., None]

    # free samples: fractions strictly inside (0, 1) of the capped segment
    fr = (jnp.arange(params.n_free_samples, dtype=dtype) + 0.5) / (
        params.n_free_samples + 1
    )
    free_pts = origin_pos[None, None, :] + (
        capped - origin_pos[None, :]
    )[:, None, :] * fr[None, :, None]                     # (R, S, 3)
    f_ijk, f_inb = _voxel_index(params, free_pts)
    f_w = (f_inb & valid[:, None]).astype(dtype) * LOG_ODDS_MISS

    e_ijk, e_inb = _voxel_index(params, endpoints)
    e_hit = e_inb & valid & ~over
    e_w = e_hit.astype(dtype) * LOG_ODDS_HIT

    flat = lo.reshape(-1)
    nx, ny, nz = params.shape

    def ravel(ijk):
        return (ijk[..., 0] * ny + ijk[..., 1]) * nz + ijk[..., 2]

    e_flat = ravel(e_ijk)
    # Octomap's insertPointCloud semantics: cells occupied in THIS scan are
    # removed from the scan's free set (computeUpdate discards free cells
    # that coincide with endpoints), otherwise adjacent beams' near-endpoint
    # free samples erode every surface they hit.  Static-shape version: a
    # scatter-max hit mask gathered at the free samples.
    hit_mask = (
        jnp.zeros((nx * ny * nz,), jnp.int32)
        .at[e_flat]
        .max(e_hit.astype(jnp.int32))
    )
    f_flat = ravel(f_ijk)
    f_w = f_w * (1 - hit_mask[f_flat]).astype(dtype)

    flat = flat.at[f_flat.reshape(-1)].add(f_w.reshape(-1))
    flat = flat.at[e_flat].add(e_w)
    lo = jnp.clip(flat.reshape(lo.shape), LOG_ODDS_MIN, LOG_ODDS_MAX)
    return OccupancyGrid(log_odds=lo)


def occupancy_prob(grid: OccupancyGrid) -> Array:
    return jax.nn.sigmoid(grid.log_odds)


def query(params: OccupancyParams, grid: OccupancyGrid, pts: Array) -> Array:
    """Occupancy probability at world points (O(1) gather; out-of-bounds
    reads return 0.5 / unknown)."""
    ijk, inb = _voxel_index(params, pts)
    p = jax.nn.sigmoid(
        grid.log_odds[ijk[..., 0], ijk[..., 1], ijk[..., 2]]
    )
    return jnp.where(inb, p, 0.5)


def voxel_centers(params: OccupancyParams) -> np.ndarray:
    """(nx*ny*nz, 3) world centers of every voxel (host-side helper)."""
    nx, ny, nz = params.shape
    ix, iy, iz = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    ijk = np.stack([ix, iy, iz], axis=-1).reshape(-1, 3)
    return np.asarray(params.origin) + (ijk + 0.5) * params.resolution


def occupied_centers(
    params: OccupancyParams,
    grid: OccupancyGrid,
    max_n: int = 64,
    threshold: float = OCCUPIED_THRESHOLD,
) -> Tuple[Array, Array]:
    """Top-``max_n`` most-occupied voxels above ``threshold`` as solver
    obstacles: ``(centers (max_n, 3), radii (max_n,))``.

    Static output shape (jit-safe): slots beyond the actual occupied count
    get radius 0, which the sphere obstacle cost treats as inert.  Radius
    for live slots is half the voxel diagonal (a conservative bound).
    """
    lo = grid.log_odds.reshape(-1)
    vals, idx = jax.lax.top_k(lo, max_n)
    nx, ny, nz = params.shape
    iz = idx % nz
    iy = (idx // nz) % ny
    ix = idx // (ny * nz)
    ijk = jnp.stack([ix, iy, iz], axis=-1)
    centers = (
        jnp.asarray(params.origin, lo.dtype)
        + (ijk.astype(lo.dtype) + 0.5) * params.resolution
    )
    r = 0.5 * params.resolution * math.sqrt(3.0)
    radii = jnp.where(vals > threshold, r, 0.0)
    return centers, radii


def save_npz(path: str, params: OccupancyParams, grid: OccupancyGrid) -> None:
    """Durable map artifact (the plugin's octomap-file service analog)."""
    np.savez(
        path,
        log_odds=np.asarray(grid.log_odds),
        origin=np.asarray(params.origin),
        resolution=params.resolution,
        n_free_samples=params.n_free_samples,
        max_range=params.max_range,
    )


def load_npz(path: str) -> Tuple[OccupancyParams, OccupancyGrid]:
    d = np.load(path)
    lo = d["log_odds"]
    params = OccupancyParams(
        origin=tuple(float(x) for x in d["origin"]),
        resolution=float(d["resolution"]),
        shape=lo.shape,
        n_free_samples=int(d["n_free_samples"]),
        max_range=float(d["max_range"]),
    )
    return params, OccupancyGrid(log_odds=jnp.asarray(lo))


# ---------------------------------------------------------------------------
# Euclidean-ish distance field (the voxblox-ESDF analog).
# ---------------------------------------------------------------------------


def distance_field(
    params: OccupancyParams,
    grid: OccupancyGrid,
    max_dist: float = 2.0,
    threshold: float = OCCUPIED_THRESHOLD,
) -> Array:
    """(nx, ny, nz) distance-to-nearest-occupied-voxel [m], clamped at
    ``max_dist`` — a chamfer-relaxation EDT computed entirely on device.

    Modern mapping stacks pair the occupancy map with an ESDF (voxblox,
    nvblox) so planners get smooth clearance gradients instead of a sphere
    list; octomap itself ships ``DynamicEDT3D`` for the same purpose.  The
    TPU-native version is jit-friendly brute relaxation: initialize
    occupied voxels to 0 and everything else to ``max_dist``, then repeat
    d <- min(d, shift(d, axis) + resolution) over the 6-neighborhood for
    ceil(max_dist / resolution) sweeps (each sweep is 6 rolls + mins — a
    fused elementwise pass; the grid easily fits VMEM/HBM).  The result is
    the L1-chamfer upper bound of the Euclidean distance — conservative,
    which is the safe direction for clearance costs.
    """
    res = params.resolution
    occ_mask = grid.log_odds > threshold
    d0 = jnp.where(occ_mask, 0.0, max_dist).astype(grid.log_odds.dtype)
    n_iter = int(np.ceil(max_dist / res))

    def relax(d, _):
        for axis in range(3):
            for shift in (1, -1):
                rolled = jnp.roll(d, shift, axis=axis)
                # edge rows roll around the grid; reset them to max_dist
                idx = 0 if shift == 1 else -1
                rolled = jax.lax.dynamic_update_index_in_dim(
                    rolled, jnp.full_like(
                        jax.lax.index_in_dim(rolled, idx, axis, keepdims=False),
                        max_dist,
                    ),
                    idx, axis,
                )
                d = jnp.minimum(d, rolled + res)
        return jnp.minimum(d, max_dist), None

    d, _ = jax.lax.scan(relax, d0, None, length=n_iter)
    return d


def query_distance(
    params: OccupancyParams,
    dist: Array,
    pts: Array,
    max_dist: float = 2.0,
) -> Array:
    """Clearance [m] at world points via the precomputed distance field
    (nearest-voxel gather; out-of-bounds reads return ``max_dist``)."""
    ijk, inb = _voxel_index(params, pts)
    d = dist[ijk[..., 0], ijk[..., 1], ijk[..., 2]]
    return jnp.where(inb, d, max_dist)

"""Fused Pallas MPPI solve for the point-mass (drone) task.

The SURVEY.md stage-7 kernel: sample -> rollout -> cost fused on-chip, with
two TPU-specific design moves the XLA path can't express:

* **Noise is never materialized in HBM.**  Pass 1 seeds the per-core PRNG
  from (seed, tile index), draws the tile's noise in VMEM, rolls out, and
  emits only the per-sample cost S (K floats).  After the (tiny) softmin on
  host-side XLA, pass 2 *regenerates* the identical noise from the same
  seeds and accumulates the weighted sum per tile.  For K=16384, H=100 the
  noise block alone is 20 MB/solve of round-trip HBM traffic saved.
* **Samples live on the lane axis.**  Tiles are laid out (H*A, TILE) so the
  8x128 VPU vectorizes across samples, and the horizon integration becomes
  two lower-triangular (H*A, H*A) matmuls on the MXU (cumsum-as-matmul)
  instead of a sequential loop.

Layout notes: payload rows are h*A + a; the triangular integrators are
Kronecker products L (x) I_A precomputed on host.  The in-kernel normal
sampler is Box-Muller over 24-bit uniforms from ``pltpu.prng_random_bits``
— a different stream than ``jax.random.normal``, so this backend is
validated distributionally and behaviorally (reaches the same targets),
not bit-for-bit against the XLA path.

Performance status (measured, round 4 — BENCH_DETAILS
``drone_backend_crossover``): the XLA drone pipeline beats this kernel at
every sample count (0.08-0.10 ms vs 0.17-0.22 ms, K=1024..16384).  The
point-mass rollout is pure cumsums that XLA fuses into a handful of ops,
while the kernel pays its in-kernel PRNG twice (two-pass regeneration) on
a solve with almost no compute to hide it under.  The production drone
backend is therefore the XLA path; this kernel is kept as the minimal,
heavily-commented template of the two-pass fused-PRNG pattern — the
whole-body kernel builds on its TILE/_normals machinery and DOES win
(5.7x on the compute-bound obstacle config) where there is real compute
per sample.

Runtime note (axon v5e, jax 0.9): ``prng_random_bits`` yields *signed*
int32 and Mosaic cannot cast uint32 -> f32, hence the low-24-bit masking in
``_normals``; the TPU *interpreter* stubs ``prng_random_bits`` to zeros, so
CPU tests validate the pipeline via the explicit-noise variant and the PRNG
variant is validated on hardware (deterministic, N(0,1) statistics).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import savgol

TILE = 128  # samples per kernel instance (lane width)


def _tri_matrices(h: int, a: int) -> Tuple[np.ndarray, np.ndarray]:
    """(L (x) I_A, strict-L (x) I_A) — cumulative and exclusive-cumulative
    sums over the horizon for (H*A,) flattened payloads."""
    lower = np.tril(np.ones((h, h)))
    strict = np.tril(np.ones((h, h)), k=-1)
    eye = np.eye(a)
    return np.kron(lower, eye), np.kron(strict, eye)


def _normals(shape) -> jax.Array:
    """Standard normals via Box-Muller over two 24-bit uniform draws.

    ``prng_random_bits`` yields *signed* int32 on this runtime: a plain
    ``>> 8`` would arithmetic-shift sign bits into the "uniform" (log of the
    resulting negatives is NaN), and Mosaic cannot cast uint32 -> f32 — so
    mask to the low 24 bits on int32 (always non-negative) instead.
    """
    b1 = pltpu.prng_random_bits(shape) & 0xFFFFFF
    b2 = pltpu.prng_random_bits(shape) & 0xFFFFFF
    u1 = b1.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-7
    u2 = b2.astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * np.pi * u2)


def _rollout_errsq(u_prev, noise, lmat, lstrict, x0, v0, target, dt, h, a):
    """Shared pass-1/pass-2 math: (H*A, T) noise -> (H*A, T) squared error."""
    accel = u_prev + noise                                    # (HA, T)
    vel_prev = (
        jnp.dot(lstrict, accel, preferred_element_type=jnp.float32) * dt + v0
    )
    pos = (
        jnp.dot(lmat, vel_prev * dt + 0.5 * accel * dt * dt,
                preferred_element_type=jnp.float32)
        + x0
    )
    err = pos - target
    return err * err


def _cost_kernel(seed_ref, u_prev_ref, l_ref, ls_ref, x0_ref, v0_ref,
                 tgt_ref, wt_ref, s_ref, *, dt, h, a, sigma):
    tile = pl.program_id(0)
    pltpu.prng_seed(seed_ref[tile])
    noise = sigma * _normals((h * a, TILE))
    errsq = _rollout_errsq(
        u_prev_ref[:], noise, l_ref[:], ls_ref[:],
        x0_ref[:], v0_ref[:], tgt_ref[:], dt, h, a,
    )
    # Per-step weights (stage vs terminal) broadcast over lanes.  The output
    # buffer holds all tiles (full-array block: TPU requires sublane-divisible
    # blocks, so per-tile (1, T) blocks won't lower); each grid step writes
    # its own row — disjoint, and the TPU grid is sequential.
    s_ref[pl.ds(tile, 1), :] = jnp.sum(errsq * wt_ref[:], axis=0, keepdims=True)


def _update_kernel(seed_ref, w_ref, du_ref, *, h, a, sigma):
    tile = pl.program_id(0)
    pltpu.prng_seed(seed_ref[tile])
    noise = sigma * _normals((h * a, TILE))
    # Weighted sum over this tile's samples (lanes).
    w_row = w_ref[pl.ds(tile, 1), :]
    du_ref[pl.ds(tile, 1), :] = jnp.sum(noise * w_row, axis=1, keepdims=True).T


# Explicit-noise variants: identical math with the noise streamed from HBM.
# Used (a) to validate the kernel pipeline bit-for-bit against the XLA path
# (the TPU interpreter stubs prng_random_bits to zeros, so the PRNG variant
# is only checkable on hardware), and (b) for callers that want JAX-keyed
# noise at the cost of the extra HBM round trip.

def _cost_kernel_noise(noise_ref, u_prev_ref, l_ref, ls_ref, x0_ref, v0_ref,
                       tgt_ref, wt_ref, s_ref, *, dt, h, a):
    tile = pl.program_id(0)
    errsq = _rollout_errsq(
        u_prev_ref[:], noise_ref[0], l_ref[:], ls_ref[:],
        x0_ref[:], v0_ref[:], tgt_ref[:], dt, h, a,
    )
    s_ref[pl.ds(tile, 1), :] = jnp.sum(errsq * wt_ref[:], axis=0, keepdims=True)


def _update_kernel_noise(noise_ref, w_ref, du_ref):
    tile = pl.program_id(0)
    w_row = w_ref[pl.ds(tile, 1), :]
    du_ref[pl.ds(tile, 1), :] = jnp.sum(noise_ref[0] * w_row, axis=1, keepdims=True).T


@functools.partial(
    jax.jit,
    static_argnames=("n_samples", "n_horizon", "n_action", "dt", "lam",
                     "sigma", "stage_w", "term_w", "savgol_window",
                     "interpret"),
)
def solve_drone_pallas(
    u_prev: jax.Array,     # (H, A)
    x0: jax.Array,         # (3,)
    v0: jax.Array,         # (3,)
    target: jax.Array,     # (3,)
    seed: jax.Array,       # () int32
    noise: jax.Array = None,  # optional (K, H, A): explicit-noise mode
    n_samples: int = 1024,
    n_horizon: int = 32,
    n_action: int = 3,
    dt: float = 0.01,
    lam: float = 0.1,
    sigma: float = 30.0,
    stage_w: float = 100.0,
    term_w: float = 20.0,
    savgol_window: int = 5,
    interpret: bool = False,
) -> jax.Array:
    """One fused MPPI solve; returns the updated (H, A) control plan.

    Without ``noise`` the kernels generate it on-chip (never touching HBM —
    the production mode).  With ``noise`` the same pipeline streams the given
    (already sigma-scaled) noise tiles from HBM (testing / JAX-keyed mode).
    """
    h, a = n_horizon, n_action
    if n_samples % TILE:
        raise ValueError(f"n_samples must be a multiple of {TILE}")
    n_tiles = n_samples // TILE
    ha = h * a

    lmat, lstrict = _tri_matrices(h, a)
    lmat = jnp.asarray(lmat, jnp.float32)
    lstrict = jnp.asarray(lstrict, jnp.float32)

    u_flat = u_prev.reshape(ha, 1)
    x0_c = jnp.tile(x0, h).reshape(ha, 1)
    v0_c = jnp.tile(v0, h).reshape(ha, 1)
    tgt_c = jnp.tile(target, h).reshape(ha, 1)
    wt = np.full((h,), stage_w)
    wt[-1] = term_w
    wt_c = jnp.asarray(np.repeat(wt, a).reshape(ha, 1), jnp.float32)
    # Non-overlapping per-tile streams: consecutive caller seeds must not
    # share any tile stream (seed+tile would overlap n_tiles-1 of them).
    seed_arr = (
        jnp.asarray(seed, jnp.int32) * np.int32(n_tiles)
        + jnp.arange(n_tiles, dtype=jnp.int32)
    )

    vm = pltpu.VMEM
    const_specs = [
        pl.BlockSpec((ha, 1), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((ha, ha), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((ha, ha), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((ha, 1), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((ha, 1), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((ha, 1), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((ha, 1), lambda i: (0, 0), memory_space=vm),
    ]
    # Per-tile outputs use a full-array VMEM block with in-kernel row writes
    # (TPU lowering rejects blocks whose sublane dim is neither 8-divisible
    # nor the full array dim).
    s_spec = pl.BlockSpec((n_tiles, TILE), lambda i: (0, 0), memory_space=vm)
    s_shape = jax.ShapeDtypeStruct((n_tiles, TILE), jnp.float32)
    if noise is None:
        s = pl.pallas_call(
            functools.partial(_cost_kernel, dt=dt, h=h, a=a, sigma=sigma),
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + const_specs,
            out_specs=s_spec,
            out_shape=s_shape,
            interpret=interpret,
        )(seed_arr, u_flat, lmat, lstrict, x0_c, v0_c, tgt_c, wt_c)
    else:
        # (K, H, A) -> (n_tiles, HA, TILE): samples on lanes.
        noise_t = noise.reshape(n_tiles, TILE, ha).transpose(0, 2, 1)
        noise_spec = pl.BlockSpec(
            (1, ha, TILE), lambda i: (i, 0, 0), memory_space=vm
        )
        s = pl.pallas_call(
            functools.partial(_cost_kernel_noise, dt=dt, h=h, a=a),
            grid=(n_tiles,),
            in_specs=[noise_spec] + const_specs,
            out_specs=s_spec,
            out_shape=s_shape,
            interpret=interpret,
        )(noise_t, u_flat, lmat, lstrict, x0_c, v0_c, tgt_c, wt_c)

    s_flat = s.reshape(-1)
    rho = jnp.min(s_flat)
    w = jnp.exp((rho - s_flat) / lam)
    w = w / jnp.sum(w)
    w_tiles = w.reshape(n_tiles, TILE)

    w_spec = pl.BlockSpec((n_tiles, TILE), lambda i: (0, 0), memory_space=vm)
    out_spec = pl.BlockSpec((n_tiles, ha), lambda i: (0, 0), memory_space=vm)
    out_shape = jax.ShapeDtypeStruct((n_tiles, ha), jnp.float32)
    if noise is None:
        du_partial = pl.pallas_call(
            functools.partial(_update_kernel, h=h, a=a, sigma=sigma),
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), w_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(seed_arr, w_tiles)
    else:
        du_partial = pl.pallas_call(
            _update_kernel_noise,
            grid=(n_tiles,),
            in_specs=[noise_spec, w_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(noise_t, w_tiles)

    du = jnp.sum(du_partial, axis=0).reshape(h, a)
    if savgol_window:
        du = savgol.smooth(du, savgol_window, 2)
    return u_prev + du

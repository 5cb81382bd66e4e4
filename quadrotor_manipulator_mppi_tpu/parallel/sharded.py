"""Sharded MPPI solvers: (scenario, sample) over a TPU mesh via shard_map.

The single-chip solve and the sharded solve run the *same* engine code
(``solver/mppi.make_step``): inside ``shard_map`` each device draws only its
local K-shard of noise (decorrelated by folding the device index into the
PRNG key) and the three sample-axis reductions in ``ops/weights.py`` become
ICI collectives.  Scenario batches vmap on top and shard over the scenario
axis with no communication at all.

Equivalence contract (tested on the virtual CPU mesh): because softmin
weights normalize globally, a sharded solve with the same *global* noise set
equals the single-chip solve up to reduction reassociation
(``tests/test_parallel.py`` reconstructs the 8-shard noise layout on one
device and checks float-level agreement, for both the XLA and fused-Pallas
backends).

Note the noise set is a function of the SHARD LAYOUT: each device draws its
local K-shard from ``fold_in(key, shard_index)``, so re-sharding the same
seed across a different device count yields a *different* (equally valid)
global sample set.  Runs are reproducible at fixed seed + fixed shard
count; cross-shard-count bitwise reproducibility would require per-sample
key folding (K splits instead of n_dev), which costs one key-derivation per
sample and is not worth it for a Monte-Carlo solver.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import SAMPLE_AXIS, SCENARIO_AXIS

Array = jax.Array


def make_sharded_solver(
    make_step_fn: Callable[..., Tuple[Callable, Callable]],
    mesh: Mesh,
    batch_scenarios: bool = True,
    **preset_kwargs,
):
    """Shard a task preset (``solver/arm.make_arm_solver``-style factory).

    ``make_step_fn(axis_name=..., n_local_samples=..., **kwargs)`` must return
    ``(step, init)``; its config's ``n_samples`` is interpreted as the GLOBAL
    sample count and divided over the mesh's sample axis.

    Returns ``(sharded_step, init)`` where ``sharded_step(states, obs)``
    expects, when ``batch_scenarios``, state/obs pytrees with a leading
    scenario axis divisible by the scenario-mesh size.
    """
    n_smp = mesh.shape[SAMPLE_AXIS]
    params = preset_kwargs.get("params")
    if params is None:
        raise ValueError(
            "make_sharded_solver requires explicit params= so the GLOBAL "
            "n_samples can be divided over the sample shards (omitting it "
            "would silently multiply the sample count by the shard count)"
        )
    total_k = params.mppi.n_samples
    if total_k % n_smp:
        raise ValueError(f"n_samples {total_k} not divisible by {n_smp} shards")
    step, init = make_step_fn(
        axis_name=SAMPLE_AXIS,
        n_local_samples=total_k // n_smp,
        **preset_kwargs,
    )

    inner = jax.vmap(step) if batch_scenarios else step
    spec = P(SCENARIO_AXIS) if batch_scenarios else P()

    sharded = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    return sharded, init


def scenario_keys(key: Array, n_scenarios: int) -> Array:
    """Independent solver keys per scenario (vmap/shard-ready)."""
    return jax.random.split(key, n_scenarios)

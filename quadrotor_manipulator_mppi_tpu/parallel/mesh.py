"""Device-mesh construction for sharded MPPI.

The reference is single-process/single-GPU; its only parallel axis is the
Monte-Carlo sample batch (SURVEY.md section 2.4).  The TPU-native scaling
model shards two axes over a ``jax.sharding.Mesh``:

* ``sample``  — MPPI rollouts (K), reduced by exactly three collectives per
  solve (min, sum, weighted-average psum — ``ops/weights.py``);
* ``scenario`` — independent initial states / control problems (embarrassingly
  parallel; BASELINE.json config 5: 256 scenarios x K samples on a v5e-16).

Axis sizes are chosen so the sample axis rides ICI within a host and the
scenario axis can span DCN across hosts (scenario needs zero communication).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SAMPLE_AXIS = "sample"
SCENARIO_AXIS = "scenario"


def make_mesh(
    n_sample_shards: Optional[int] = None,
    n_scenario_shards: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh with axes (scenario, sample).  Defaults to all devices on the
    sample axis (the latency-optimal layout for a single control problem)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_sample_shards is None:
        n_sample_shards = len(devs) // n_scenario_shards
    if n_sample_shards * n_scenario_shards != len(devs):
        raise ValueError(
            f"{n_scenario_shards} x {n_sample_shards} != {len(devs)} devices"
        )
    arr = np.asarray(devs).reshape(n_scenario_shards, n_sample_shards)
    return Mesh(arr, (SCENARIO_AXIS, SAMPLE_AXIS))


def scenario_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-scenario state pytrees (leading scenario axis)."""
    return NamedSharding(mesh, P(SCENARIO_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

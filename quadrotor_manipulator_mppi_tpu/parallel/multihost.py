"""Multi-host bring-up: jax.distributed initialization + host-spanning data.

The single-host story (``mesh.py`` + ``sharded.py``) already produces SPMD
programs whose sample-axis collectives ride ICI; this module adds the two
pieces a multi-host (DCN-connected) run needs, so the moment a v5e pod
slice is attached the same solvers scale with no solver-code changes:

1. **Process bring-up** — :func:`initialize`: every host runs the SAME
   program; ``jax.distributed.initialize()`` wires the processes together
   (auto-detected coordinator on Cloud TPU; explicit env override
   elsewhere), after which ``jax.devices()`` is the GLOBAL device list and
   ``mesh.make_mesh`` spans hosts transparently.

2. **Host-local data placement** — :func:`host_local_scenarios`: for the
   scenario axis (the DCN-friendly, zero-communication axis — SURVEY.md
   section 2.4), each host materializes only its own scenarios;
   ``jax.make_array_from_process_local_data`` assembles the global array
   without all-gathering through DCN.

Recipe (same command on every host):

    from quadrotor_manipulator_mppi_tpu.parallel import multihost, mesh
    multihost.initialize()                      # no-op single-process
    m = mesh.make_mesh(n_sample_shards=8,       # intra-host ICI
                       n_scenario_shards=jax.process_count())
    ...make_sharded_solver(..., mesh=m)...

Measured single-chip/virtual-mesh validation: ``run.py bench-scaling``;
real-ICI efficiency (BASELINE.json >= 85% target) is measured with the
same command once hardware is attached.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Bring up jax.distributed if this looks like a multi-process run.

    Safe to call unconditionally: single-process runs (no coordinator env,
    no args) skip initialization and return the local topology.  Explicit
    args or the standard env vars (``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``) force it; on Cloud TPU
    pods ``jax.distributed.initialize()`` auto-detects everything, which
    ``QMM_MULTIHOST=1`` opts into.
    """
    global _initialized
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    auto = os.environ.get("QMM_MULTIHOST") == "1"
    want = coordinator_address is not None or num_processes is not None or auto
    if want and not _initialized:
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
            kwargs["num_processes"] = (
                num_processes if num_processes is not None
                else int(env_np) if env_np else None
            )
            kwargs["process_id"] = (
                process_id if process_id is not None
                else int(env_pid) if env_pid else None
            )
        jax.distributed.initialize(**kwargs)
        _initialized = True
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "initialized": _initialized,
    }


def host_local_scenarios(mesh, global_pytree):
    """Assemble globally-sharded scenario arrays from process-local data.

    ``global_pytree`` leaves carry a leading GLOBAL scenario axis; each
    process passes only its own slice's values at the global shape —
    ``jax.make_array_from_process_local_data`` places them without moving
    scenario data across DCN.  Single-process this is equivalent to
    ``jax.device_put`` with the scenario sharding.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import SCENARIO_AXIS

    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))

    def place(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(place, global_pytree)

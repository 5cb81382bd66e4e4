"""Worker process for the LIVE multi-process collective test.

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device global runtime with Gloo cross-process
collectives — the same initialization path ``parallel/multihost.py``
drives on real multi-host TPU pods (there the transport is DCN/ICI).  The
worker runs the PRODUCTION sample-sharded whole-body solve over the global
mesh and process 0 writes the resulting action to ``out_path`` for the
pytest driver to compare against a single-process 8-device reference.

Invoked by tests/test_multiprocess.py as:
    python tests/multiproc_worker.py <coordinator> <pid> <nproc> <out.npy>
"""

import sys


def main():
    coord, pid, nproc, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.device_count() == 4 * nproc, jax.devices()
    assert jax.local_device_count() == 4

    import numpy as np

    from quadrotor_manipulator_mppi_tpu.parallel import mesh as mesh_mod
    from quadrotor_manipulator_mppi_tpu.parallel import sharded
    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs

    params = wbs.position_mode_params(n_samples=256, n_horizon=16)
    mesh = mesh_mod.make_mesh()  # all 8 GLOBAL devices on the sample axis
    step, init = sharded.make_sharded_solver(
        wbs.make_whole_body_solver, mesh, batch_scenarios=False, params=params
    )
    # Multiprocess placement: hand the jit HOST (numpy) pytrees and let
    # in_shardings replicate them onto the global mesh — device_put cannot
    # target non-addressable shardings.
    # raw uint32 keys (typed PRNG keys cannot round-trip via numpy)
    state = jax.tree.map(np.asarray, init(jax.random.PRNGKey(0)))
    obs = jax.tree.map(np.asarray, wbs.default_obs())
    rep = mesh_mod.replicated(mesh)
    jstep = jax.jit(step, in_shardings=(rep, rep), out_shardings=rep)
    out, _ = jstep(state, obs)
    action = np.asarray(jax.device_get(out.action))
    if pid == 0:
        np.save(out_path, action)
    # all processes must exit cleanly for the test to pass
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

"""LIVE multi-process distributed test: two OS processes, 4 virtual CPU
devices each, joined by ``jax.distributed`` with Gloo collectives, running
the production sample-sharded whole-body solve over the 8-device GLOBAL
mesh.  This exercises the real cross-process runtime (coordinator
handshake, global device enumeration, cross-process psum/pmin) that
``parallel/multihost.py`` plumbs on TPU pods — upgrading the multihost
story beyond the monkeypatched argument tests in test_parallel.py.

The result must match a single-process 8-virtual-device run at float
tolerance: the sharded noise layout is a function of the mesh axis index
(fold_in(key, shard_index)), which is identical in both topologies.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_solve_matches_single_process(tmp_path):
    out_path = str(tmp_path / "action.npy")
    coord = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(REPO, "tests", "multiproc_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(pid), "2", out_path],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    assert os.path.exists(out_path), outs[0][-3000:]
    action_mp = np.load(out_path)

    # single-process reference on this process's own 8 virtual devices
    import jax

    from quadrotor_manipulator_mppi_tpu.parallel import mesh as mesh_mod
    from quadrotor_manipulator_mppi_tpu.parallel import sharded
    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs

    params = wbs.position_mode_params(n_samples=256, n_horizon=16)
    mesh = mesh_mod.make_mesh()
    step, init = sharded.make_sharded_solver(
        wbs.make_whole_body_solver, mesh, batch_scenarios=False, params=params
    )
    out, _ = jax.jit(step)(init(jax.random.PRNGKey(0)), wbs.default_obs())
    action_sp = np.asarray(out.action)

    assert action_mp.shape == action_sp.shape
    np.testing.assert_allclose(action_mp, action_sp, rtol=1e-4, atol=2e-5)

"""Hardware tier: in-kernel PRNG statistics, Pallas-vs-XLA distributional
equivalence, the 100 Hz latency budget, and the full-K reach gate.

These cover exactly what the CPU suite cannot (``tests/test_whole_body_pallas.py``
docstring's acknowledged gap): ``pltpu.prng_random_bits`` only exists on
hardware, latency is only meaningful on the real chip, and the flagship-K
closed loops are too slow for the CPU mesh.
"""

import dataclasses
import functools
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.sim import whole_body_loop as wbl
from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs


# ---------------------------------------------------------------------------
# 1. In-kernel PRNG statistics (the production noise source).
# ---------------------------------------------------------------------------


def _draw_inkernel_normals(seed: int, rows: int = 512, tile: int = 128):
    """Emit a (rows, tile) block of the fused kernel's normals on hardware."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from quadrotor_manipulator_mppi_tpu.ops.pallas.whole_body_kernel import (
        _normals_erfinv,
    )

    def kernel(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        out_ref[:, :] = _normals_erfinv((rows, tile))

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((rows, tile), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, tile), jnp.float32),
    )(jnp.asarray([seed], jnp.int32))
    return np.asarray(out).ravel()


def test_inkernel_prng_normality():
    """erfinv-normals: correct moments and KS distance to N(0, 1).

    The generator caps |z| at sqrt(2)*erfinv(1 - 2^-24) ~ 5.4 (24-bit
    uniforms; truncated tail mass ~6e-8).  Thresholds sit well above the
    statistical floor at this sample size but far below any real defect
    (the round-1 signed-bits bug produced NaNs/skew orders of magnitude
    larger)."""
    from scipy import stats

    z = np.concatenate([_draw_inkernel_normals(s) for s in (1, 12345, 987654)])
    n = z.size  # ~196k
    assert np.all(np.isfinite(z))
    assert abs(z.mean()) < 4.0 / np.sqrt(n), f"mean {z.mean():.5f}"
    assert abs(z.std() - 1.0) < 0.01, f"std {z.std():.5f}"
    assert abs(float(stats.skew(z))) < 0.03
    ks = stats.kstest(z, "norm").statistic
    assert ks < 0.006, f"KS {ks:.5f}"
    assert np.abs(z).max() < 5.5  # documented cap


def test_inkernel_prng_deterministic_and_seed_sensitive():
    a1 = _draw_inkernel_normals(7, rows=64)
    a2 = _draw_inkernel_normals(7, rows=64)
    b = _draw_inkernel_normals(8, rows=64)
    np.testing.assert_array_equal(a1, a2)
    assert not np.allclose(a1, b)


# ---------------------------------------------------------------------------
# 2. Pallas-PRNG vs XLA solve: distributional equivalence.
# ---------------------------------------------------------------------------


def test_pallas_prng_solve_matches_xla_distribution():
    """The production (in-kernel PRNG) fused solve and the XLA solve draw
    from different streams but identical distributions, so across many keys
    the solve outputs must agree statistically: the per-(h, a) mean of
    u_seq converges at ~sigma_eff/sqrt(n_keys); compare against the XLA
    pipeline's own across-key spread."""
    params = wbs.WholeBodyMPPIParams(
        mppi=dataclasses.replace(
            wbs.WholeBodyMPPIParams().mppi, n_samples=1024, n_horizon=16
        )
    )
    obs = wbs.default_obs()
    n_keys = 24

    def collect(backend):
        # low_k_guard off: single solves for distribution statistics, not a
        # closed loop — the attitude-mode floor does not apply.
        step, init = wbs.make_whole_body_solver(
            params, backend=backend, low_k_guard="off"
        )
        jstep = jax.jit(step)
        outs = []
        for i in range(n_keys):
            out, _ = jstep(init(jax.random.key(100 + i)), obs)
            outs.append(np.asarray(out.u_seq))
        return np.stack(outs)  # (n_keys, H, A)

    u_x = collect("xla")
    u_p = collect("pallas")
    # Across-key mean: both estimate the same deterministic MPPI update.
    # With 24 keys the SE estimate is itself noisy, so the per-entry z
    # thresholds are deliberately loose — a real PRNG defect (the round-1
    # signed-bit bug) shifts z by orders of magnitude, not tenths.
    se = u_x.std(axis=0) / np.sqrt(n_keys) + 1e-6
    zscore = np.abs(u_p.mean(axis=0) - u_x.mean(axis=0)) / se
    assert np.median(zscore) < 2.0, f"z median {np.median(zscore):.2f}"
    assert np.percentile(zscore, 95) < 5.0, f"z p95 {np.percentile(zscore, 95):.2f}"
    # Across-key spread agrees within 2x (same exploration statistics).
    ratio = (u_p.std(axis=0) + 1e-6) / (u_x.std(axis=0) + 1e-6)
    assert 0.5 < np.median(ratio) < 2.0, f"std ratio median {np.median(ratio):.2f}"


# ---------------------------------------------------------------------------
# 3. Real-time budget: flagship solve < 10 ms (100 Hz loop, BASELINE.json).
# ---------------------------------------------------------------------------


def test_flagship_solve_meets_100hz_budget():
    from quadrotor_manipulator_mppi_tpu.solver.mppi import MPPIConfig

    params = wbs.WholeBodyMPPIParams(
        mppi=MPPIConfig(
            n_samples=4096, n_horizon=50, n_action=wbs.N_ACTIONS,
            dt=0.01, lam=0.1, sigma=wbs.default_sigma(), savgol_window=9,
        )
    )
    step, init = wbs.make_whole_body_solver(params, backend="pallas")
    jstep = jax.jit(step, donate_argnums=0)
    state = init(jax.random.key(0))
    obs = wbs.default_obs()
    out, state = jstep(state, obs)
    jax.block_until_ready(out)
    for _ in range(3):
        out, state = jstep(state, obs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 50
    for _ in range(iters):
        out, state = jstep(state, obs)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    assert ms < 10.0, f"{ms:.2f} ms/solve exceeds the 100 Hz budget"


# ---------------------------------------------------------------------------
# 4. Full-K closed-loop reach gate (the reference's 5 mm criterion).
# ---------------------------------------------------------------------------


def _run_episode(params, steps):
    run = wbl.make_whole_body_episode(params, n_control_steps=steps)
    _, init = wbs.make_whole_body_solver(params)
    plant = wbl.init_plant(params.model.vehicle)
    obs0 = wbs.default_obs()
    _, logs = jax.jit(run)(
        plant, init(jax.random.key(0)), obs0.ee_target, obs0.base_target
    )
    return logs


def test_full_k_position_mode_meets_reference_reach_gate():
    """Flagship K=4096/H=50 position-cascade loop: the reference's own
    criterion (L1 commanded EE error < 5 mm, mppi.py:95-117) met and held,
    and the measured EE also within 5 mm over the final 3 s."""
    logs = _run_episode(wbs.position_mode_params(4096, 50), 1000)
    l1_cmd = np.asarray(logs.l1_cmd)
    l1_meas = np.asarray(logs.l1_meas)
    tail = slice(-300, None)
    assert (l1_cmd < 0.005).any()
    assert l1_cmd[tail].max() < 0.005, f"{l1_cmd[tail].max()*1000:.2f} mm"
    assert l1_meas[tail].max() < 0.007, f"{l1_meas[tail].max()*1000:.2f} mm"
    assert np.asarray(logs.tilt).max() < 0.05


def test_full_k_attitude_mode_submm_hold():
    logs = _run_episode(wbs.WholeBodyMPPIParams(), 800)
    l1_cmd = np.asarray(logs.l1_cmd)
    l1_meas = np.asarray(logs.l1_meas)
    tail = slice(-200, None)
    assert (l1_cmd < 0.005).any()
    assert l1_cmd[tail].max() < 0.002, f"{l1_cmd[tail].max()*1000:.2f} mm"
    assert l1_meas[tail].max() < 0.005, f"{l1_meas[tail].max()*1000:.2f} mm"


# ---------------------------------------------------------------------------
# Round-3 components on hardware: fixed-wing flyby, map-in-the-loop flight.
# ---------------------------------------------------------------------------


def test_fixed_wing_flyby_on_hardware():
    """The Techpod MPPI waypoint flyby (run.py fixed-wing) at full preset
    K=1024 reaches the waypoint on the real chip."""
    import quadrotor_manipulator_mppi_tpu.scenarios.solvers as run_mod

    class A:
        steps, seed, k, save_log, platform = 400, 0, 0, None, "auto"

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        run_mod.run_fixed_wing(A())
    import json

    r = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert r["reached"] is True
    assert r["min_altitude_m"] > 80.0


def test_mapped_flight_on_hardware():
    """Online occupancy mapping on the control path at full K=1024:
    collision-free waypoint reach with map-derived obstacles."""
    import quadrotor_manipulator_mppi_tpu.scenarios.solvers as run_mod

    class A:
        steps, seed, k, save_log, platform = 3000, 0, 0, None, "auto"
        obstacles = "spheres"

    import io
    import json
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        run_mod.run_mapped_flight(A())
    r = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert r["collided"] is False
    assert r["reached"] is True


def test_wrench_mode_precision_full_k():
    """Wrench precision gate at flagship K on the real chip (fused kernel
    path, incl. the in-kernel terminal stopping-point cost).  Round-5
    levels (per-channel sigma floor + base 800/vel 600/stop 8000 + tube
    gain 1.5 — see wrench_mode_params): measured-EE tail mean 3.3-3.9 mm,
    tail max 4.1-5.9 mm, settled excursion 0.057-0.085 m, transient peak
    <= 0.24 m across seeds 0-2 at K=4096 (artifacts parity_wrench_
    k4096_r05).  Bounds leave margin for the kernel's different noise
    stream while locking in the round-5 precision level."""
    import jax
    import jax.numpy as jnp

    params = wbs.wrench_mode_params(n_samples=4096, n_horizon=50)
    run = wbl.make_whole_body_episode(params, n_control_steps=600,
                                      backend="pallas")
    _, init = wbs.make_whole_body_solver(params, backend="pallas")
    plant = wbl.init_plant(params.model.vehicle)
    obs0 = wbs.default_obs()
    final, logs = jax.jit(run)(
        plant, init(jax.random.key(0)), obs0.ee_target, obs0.base_target
    )
    l1 = np.asarray(logs.l1_meas)
    tilt = np.asarray(logs.tilt)
    exc = np.linalg.norm(
        np.asarray(logs.base_pos) - np.asarray(obs0.base_target), axis=-1
    )
    assert np.all(np.isfinite(l1))
    assert l1[-150:].mean() < 0.007, l1[-150:].mean()
    assert l1[-150:].max() < 0.010, l1[-150:].max()
    assert exc[-150:].max() < 0.15, exc[-150:].max()
    assert exc.max() < 0.30, exc.max()
    assert tilt.max() < 0.05, tilt.max()

"""Scenario x sample scaling-efficiency measurement (BASELINE.json's
>= 85% multi-host target); the measurement core is
``parallel/scaling.measure_weak_scaling``."""

from __future__ import annotations

from .common import finish


def run_bench_scaling(args):
    """Weak scaling of the whole-body solve over the mesh's sample axis and
    over the scenario axis.  Runs on whatever devices exist — the 8-device
    virtual CPU mesh today (``--platform cpu``), real ICI the moment
    multi-chip hardware appears (same command, no code changes).  One JSON
    line out; the analytic v5e-16 prediction is
    ``benchmarks/ici_model.py``."""
    import jax

    if args.platform == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.devices)
        except RuntimeError:
            pass  # backend already initialized (in-process callers)
    platform = jax.devices()[0].platform

    from ..parallel.scaling import measure_weak_scaling

    out = measure_weak_scaling(
        args.devices, k_per_device=args.k_per_device, iters=args.iters,
        backend="pallas" if platform not in ("cpu",) else "xla",
    )
    if platform == "cpu":
        out["note"] = (
            "virtual CPU devices share one machine's cores — these "
            "efficiencies lower-bound the plumbing only; the >=85% target "
            "is judged on real ICI hardware"
        )
    finish("bench-scaling", {"platform": platform, **out}, {}, args)

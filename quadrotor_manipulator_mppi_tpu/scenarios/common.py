"""Shared scenario plumbing: every scenario reports through :func:`finish`
and runs its episode through :func:`run_episode` (or an equivalent jitted
scan built from these helpers) — none hand-rolls resume/save/report logic.

The CLI analog of the reference's roslaunch+node pattern
(``README.md:14-22``); metrics JSON replaces watching Gazebo.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def maybe_resume(args, carry0):
    """--resume PATH: overwrite a scenario's initial carry from a checkpoint
    (utils/checkpoint restores PRNG keys exactly, so a resumed episode
    continues the noise stream the uninterrupted run would have drawn)."""
    if getattr(args, "resume", None):
        from ..utils import checkpoint

        carry0 = checkpoint.restore(args.resume, carry0)
        print(f"resumed state from {args.resume}", file=sys.stderr)
    return carry0


def maybe_save(args, carry_final):
    """--save-state PATH: checkpoint the final episode carry."""
    if getattr(args, "save_state", None):
        from ..utils import checkpoint

        checkpoint.save(args.save_state, carry_final)
        print(f"saved state to {args.save_state}", file=sys.stderr)


def finish(name, metrics, log_arrays, args):
    if args.save_log:
        np.savez(args.save_log, **log_arrays)
        metrics["log"] = args.save_log
    print(json.dumps({"scenario": name, **metrics}))


def run_episode(args, tick, carry0, xs=None, length=None):
    """Shared scenario driver: the jitted ``lax.scan`` episode (tick over
    carry, per-step logs) with --resume / --save-state handled uniformly.
    Returns ``(final_carry, stacked_logs)``."""
    import jax

    carry0 = maybe_resume(args, carry0)
    run = jax.jit(lambda c0: jax.lax.scan(tick, c0, xs, length=length))
    carry_f, logs = run(carry0)
    maybe_save(args, carry_f)
    return carry_f, logs


def hover_plant(veh, pos, dtype=None):
    """Plant at rest at ``pos`` with rotors pre-spun to hover — the standing
    initial condition of every rotorcraft scenario."""
    import jax.numpy as jnp

    from ..models import multirotor as mr

    kw = {} if dtype is None else {"dtype": dtype}
    plant = mr.init_state(veh, pos=pos, **kw)
    return plant._replace(
        rotor_speed=jnp.full((veh.n_rotors,), veh.hover_rotor_speed())
    )


def perfect_model_episode(args, step, solver0, obs_of, plant_step, log_of,
                          state0):
    """Perfect-model MPC loop: the plant is one step of the solver's own
    rollout model (mode-correct by construction).  Shared by the
    ``whole-body`` and ``multirotor-waypoint`` scenarios."""

    def body(carry, _):
        state, solver = carry
        out, solver = step(solver, obs_of(state))
        state = plant_step(state, out.action)
        return (state, solver), log_of(state)

    _, logs = run_episode(args, body, (state0, solver0), length=args.steps)
    return logs

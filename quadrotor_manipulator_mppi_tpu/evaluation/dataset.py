"""Trajectory / control dataset collection.

The reference declares "Data Collection" as future work
(``/root/reference/README.md:30-34`` to-do list) — its only durable
artifact is rosbag recording (``gazebo_bag_plugin.cpp``).  This module is
the TPU stack's version: a typed recorder that accumulates named per-step
arrays from any control loop (closed-loop sim, the bridge server, hardware
logs) and round-trips them through a single ``.npz`` file with JSON
metadata, plus a convenience collector that rolls a solver against an
observation stream to produce (observation, plan) supervision pairs for
offline / imitation learning.

Everything is NumPy at this layer — collection happens at the host
boundary where device arrays have already been fetched, and consumers
(training pipelines, analysis notebooks) want plain arrays.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Tuple

import numpy as np

_META_KEY = "__qmm_metadata__"


@dataclass
class TrajectoryRecorder:
    """Accumulate named per-step records; every field must be recorded at
    every step (enforced) so the saved arrays stay aligned."""

    metadata: Dict = field(default_factory=dict)
    _rows: Dict[str, list] = field(default_factory=dict)
    _n: int = 0

    def record(self, **named_values) -> None:
        if self._n == 0 and not self._rows:
            self._rows = {k: [] for k in named_values}
        if set(named_values) != set(self._rows):
            raise ValueError(
                f"record fields {sorted(named_values)} != {sorted(self._rows)}"
            )
        for k, v in named_values.items():
            self._rows[k].append(np.asarray(v))
        self._n += 1

    def __len__(self) -> int:
        return self._n

    def arrays(self) -> Dict[str, np.ndarray]:
        return {k: np.stack(v) for k, v in self._rows.items()}

    def save(self, path: str) -> None:
        arrs = self.arrays()
        meta = dict(self.metadata)
        meta["n_steps"] = self._n
        arrs[_META_KEY] = np.frombuffer(
            json.dumps(meta, sort_keys=True).encode(), dtype=np.uint8
        )
        np.savez_compressed(path, **arrs)


def load_dataset(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Inverse of :meth:`TrajectoryRecorder.save` -> (arrays, metadata)."""
    with np.load(path) as z:
        arrs = {k: z[k] for k in z.files if k != _META_KEY}
        meta = {}
        if _META_KEY in z.files:
            meta = json.loads(bytes(z[_META_KEY].tobytes()).decode())
    return arrs, meta


def collect_solver_dataset(
    step: Callable,
    state,
    obs_stream,
    extract_obs: Callable[[object], Dict[str, np.ndarray]],
    extract_out: Callable[[object], Dict[str, np.ndarray]],
    metadata: Optional[Dict] = None,
) -> TrajectoryRecorder:
    """Roll ``step(state, obs) -> (out, state)`` over ``obs_stream`` and
    record ``extract_obs(obs) | extract_out(out)`` per solve — the
    (observation, plan) pairs an imitation/offline-RL pipeline trains on.
    """
    rec = TrajectoryRecorder(metadata=dict(metadata or {}))
    for obs in obs_stream:
        out, state = step(state, obs)
        row = dict(extract_obs(obs))
        row.update(extract_out(out))
        rec.record(**{k: np.asarray(v) for k, v in row.items()})
    return rec


def collect_whole_body(
    n_solves: int = 20,
    seed: int = 0,
    params=None,
    low_k_guard: str = "warn",
) -> TrajectoryRecorder:
    """Ready-made collector for the flagship solver: perturbed hover states
    -> whole-body plans.  Columns: base state (12), arm q/qdot (7+7),
    ee_target (3), u_seq (H, 11), action (11), qdes/vdes (7+7)."""
    import jax
    import jax.numpy as jnp

    from ..models.multirotor import Multirotor12State
    from ..models.whole_body import WholeBodyState
    from ..solver import whole_body as wb

    params = params or wb.WholeBodyMPPIParams()
    step, init = wb.make_whole_body_solver(params, low_k_guard=low_k_guard)
    step = jax.jit(step)
    base_obs = wb.default_obs()
    keys = jax.random.split(jax.random.key(seed), n_solves)

    def obs_stream():
        for k in keys:
            dp, dq, dv = (
                0.2 * jax.random.normal(jax.random.fold_in(k, i), (n,))
                for i, n in enumerate((3, 7, 3))
            )
            state = WholeBodyState(
                base=Multirotor12State(
                    pos=base_obs.state.base.pos + dp,
                    rpy=base_obs.state.base.rpy,
                    vel=base_obs.state.base.vel + 0.1 * dv,
                    omega=base_obs.state.base.omega,
                ),
                q=base_obs.state.q + 0.1 * dq,
                qdot=base_obs.state.qdot,
            )
            yield base_obs._replace(state=state)

    return collect_solver_dataset(
        step,
        init(jax.random.key(seed + 1)),
        obs_stream(),
        extract_obs=lambda o: {
            "base_pos": o.state.base.pos, "base_rpy": o.state.base.rpy,
            "base_vel": o.state.base.vel, "base_omega": o.state.base.omega,
            "q": o.state.q, "qdot": o.state.qdot,
            "ee_target": o.ee_target.position,
        },
        extract_out=lambda out: {
            "u_seq": out.u_seq, "action": out.action,
            "qdes": out.qdes, "vdes": out.vdes,
        },
        metadata={
            "task": "whole_body_reach",
            "n_samples": params.mppi.n_samples,
            "n_horizon": params.mppi.n_horizon,
            "seed": seed,
        },
    )

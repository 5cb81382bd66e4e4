"""The functional MPPI engine.

The TPU-native redesign of the reference's solver classes
(``/root/reference/src/mav_mppi/scripts/mppi_solver/mppi.py:122-169`` and
``drone_mppi.py:140-176``): instead of a stateful object mutating GPU tensors
from a 100 Hz Python loop, the engine is a pure function

    step(state, obs) -> (u_seq, new_state)

built once from a static :class:`MPPIConfig` plus two task callables (rollout
and cost), then ``jax.jit``-ed.  All cross-step state — the receding-horizon
warm start ``u_prev`` (reference ``mppi.py:153``) and the PRNG key (the
reference's ``torch.randn`` is unseeded; we make randomness explicit) — lives
in a :class:`MPPIState` pytree that stays device-resident between solves.

The same ``step`` body runs single-chip or sharded: pass ``axis_name`` when
tracing inside ``shard_map`` and the three sample-axis reductions (min, sum,
weighted average — see ``ops/weights.py``) become ICI collectives.

Solve pipeline (1:1 with the reference's compute_control_input):
  sample noise -> v = u_prev + eps -> rollout -> per-sample cost S ->
  softmin weights -> du = sum_k w_k eps_k -> Savitzky-Golay smooth ->
  u = u_prev + du -> (optional constraint clamp) -> warm start.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import sampling, weights as weights_ops
from ..utils import savgol

Array = jax.Array
RolloutFn = Callable[[Array, Any], Any]          # (v (K,H,A), obs) -> aux
CostFn = Callable[[Any, Array, Array, Any], Array]  # (aux, v, u_prev, obs) -> S (K,)


@dataclass(frozen=True)
class MPPIConfig:
    """Static solver hyperparameters (trace-time constants).

    Defaults follow the reference arm solver (``mppi.py:37-42,75``;
    sigma/savgol per ``standard_normal_noise.py:17`` and ``mppi.py:149``).
    """

    n_samples: int = 100
    n_horizon: int = 32
    n_action: int = 7
    dt: float = 0.01
    lam: float = 0.1
    sigma: Any = 0.1              # scalar | (A,) | (A, A)
    savgol_window: int = 9        # 0 disables smoothing
    savgol_polyorder: int = 2
    shift_warm_start: bool = False  # reference keeps u unshifted (mppi.py:153)
    u_min: Optional[Any] = None   # per-action clamp (drone defines +-10,
    u_max: Optional[Any] = None   # disabled — drone_mppi.py:132-138,163)
    zero_mean_noise: bool = False
    # Warm-start reversion: u_prev <- nominal + decay * (u - nominal).
    # 1.0 = the reference behavior (keep the plan verbatim).  Values < 1 leak
    # the plan back toward ``nominal_action`` between solves, preventing the
    # accumulated-noise random walk that destabilizes station-keeping tasks
    # (the plan is re-derived every 10 ms anyway; old information should
    # decay on the same timescale the state changes).
    warm_start_decay: float = 1.0
    nominal_action: Optional[Any] = None  # (A,) or (H, A); default zeros
    # Covariance adaptation (CVIS/MPOPI-style): carry a per-action diagonal
    # sigma in the solver state and update it from the importance-weighted
    # second moment of the accepted noise, clipped to
    # [sigma_min_scale, sigma_max_scale] x the configured sigma.  Requires a
    # scalar or per-action (diagonal) ``sigma``.
    adaptive_sigma: bool = False
    adapt_beta: float = 0.1
    sigma_min_scale: float = 0.3
    sigma_max_scale: float = 3.0
    # Task-space exploration scheduling: an optional traceable
    # ``obs -> scalar`` multiplier on the live sigma for THIS solve (state
    # stores the unscaled sigma).  MPPI's update du is a softmin-weighted
    # average of the sampled noise, so even at the optimum it dithers at the
    # sigma scale; scheduling sigma by distance-to-go (e.g. current EE
    # error) removes that noise floor near convergence while keeping full
    # exploration during the transient.  The reference has no analog — its
    # sigma is a hardcoded constant (standard_normal_noise.py:17).
    sigma_scale_fn: Optional[Callable[[Any], Array]] = None


class MPPIState(NamedTuple):
    u_prev: Array  # (H, A) nominal control (acceleration) sequence
    key: Array     # PRNG key
    sigma: Array   # (A,) live per-action exploration std (== config sigma
                   # unless adaptive_sigma updates it)


def _diag_sigma(config: MPPIConfig, dtype) -> Array:
    """The live sigma stored in MPPIState — EXACTLY what sampling consumes.

    scalar -> (A,) diag; (A,) -> as-is; full (A, A) -> the matrix itself
    (``ops/sampling.sample_noise`` handles all three).  A full matrix is
    incompatible with the CVIS diagonal adaptation, which is rejected here
    rather than silently approximated."""
    s = jnp.asarray(config.sigma, dtype)
    if s.ndim == 0:
        return jnp.full((config.n_action,), s, dtype)
    if s.ndim == 1:
        return s
    if config.adaptive_sigma:
        raise ValueError("adaptive_sigma requires scalar or diagonal sigma")
    return s


def init_state(config: MPPIConfig, key: Array, dtype=jnp.float32) -> MPPIState:
    return MPPIState(
        u_prev=jnp.zeros((config.n_horizon, config.n_action), dtype),
        key=key,
        sigma=_diag_sigma(config, dtype),
    )


def make_step(
    config: MPPIConfig,
    rollout_fn: RolloutFn,
    cost_fn: CostFn,
    axis_name: Optional[str] = None,
    n_local_samples: Optional[int] = None,
) -> Callable[[MPPIState, Any], Tuple[Array, MPPIState]]:
    """Build the solve step.  ``n_local_samples`` overrides K for the
    per-device shard when the sample axis is sharded (total K stays
    ``config.n_samples``; weights normalize globally via the collectives)."""
    k_local = n_local_samples or config.n_samples
    if config.adaptive_sigma and config.sigma_scale_fn is not None:
        # The CVIS second-moment update would absorb the schedule's scale^2
        # into the carried sigma — the two mechanisms fight.  Pick one.
        raise ValueError("adaptive_sigma and sigma_scale_fn are exclusive")

    def step(state: MPPIState, obs: Any) -> Tuple[Array, MPPIState]:
        key, sub = jax.random.split(state.key)
        if axis_name is not None:
            # Decorrelate shards: fold the device index into the key.
            sub = jax.random.fold_in(sub, jax.lax.axis_index(axis_name))
        # state.sigma is the single live representation (init_state stores
        # exactly the configured scalar-diag/diag/full-matrix object; the
        # adaptive update keeps it diagonal).
        sigma_live = state.sigma
        if config.sigma_scale_fn is not None:
            sigma_live = sigma_live * config.sigma_scale_fn(obs)
        noise = sampling.sample_noise(
            sub, k_local, config.n_horizon, config.n_action,
            sigma_live, state.u_prev.dtype,
        )
        if config.zero_mean_noise:
            noise = sampling.zero_mean_trick(noise)

        v = state.u_prev[None] + noise
        aux = rollout_fn(v, obs)
        s = cost_fn(aux, v, state.u_prev, obs)

        w = weights_ops.softmin_weights(s, config.lam, axis_name)
        du = weights_ops.weighted_noise_average(w, noise, axis_name)
        if config.savgol_window:
            du = savgol.smooth(du, config.savgol_window, config.savgol_polyorder)

        u = state.u_prev + du
        if config.u_min is not None or config.u_max is not None:
            u = jnp.clip(
                u,
                None if config.u_min is None else jnp.asarray(config.u_min, u.dtype),
                None if config.u_max is None else jnp.asarray(config.u_max, u.dtype),
            )

        if config.shift_warm_start:
            warm = jnp.concatenate([u[1:], u[-1:]], axis=0)
        else:
            warm = u
        if config.warm_start_decay < 1.0:
            nominal = (
                jnp.zeros_like(warm)
                if config.nominal_action is None
                else jnp.broadcast_to(
                    jnp.asarray(config.nominal_action, warm.dtype), warm.shape
                )
            )
            warm = nominal + config.warm_start_decay * (warm - nominal)

        sigma_next = state.sigma
        if config.adaptive_sigma:
            # Importance-weighted second moment of the accepted noise,
            # averaged over the horizon (CVIS-style diagonal adaptation).
            m2 = jnp.einsum("k,kha->a", w, noise * noise) / config.n_horizon
            if axis_name is not None:
                m2 = jax.lax.psum(m2, axis_name)
            base = _diag_sigma(config, warm.dtype)
            var = (1.0 - config.adapt_beta) * state.sigma**2 + config.adapt_beta * m2
            sigma_next = jnp.clip(
                jnp.sqrt(var),
                config.sigma_min_scale * base,
                config.sigma_max_scale * base,
            )
        return u, MPPIState(u_prev=warm, key=key, sigma=sigma_next)

    return step

"""Rollout integrators: prefix-sum kinematics and scan-based true dynamics.

The reference's rollouts are kinematic double integrations implemented with
``cumsum`` so the horizon axis is embarrassingly parallel
(``/root/reference/src/mav_mppi/scripts/sampling/standard_normal_noise.py:32-50``
for the arm, ``mppi_solver/drone_mppi.py:46-55`` for the drone — identical
math).  :func:`double_integrate` reproduces that scheme exactly.  For true
(sequential-in-time) dynamics, :func:`scan_rollout` wraps ``lax.scan`` over
the horizon with samples batched in the carried state.
"""

from __future__ import annotations

from typing import Callable, Tuple, TypeVar

import jax
import jax.numpy as jnp

Array = jax.Array
State = TypeVar("State")


def double_integrate(
    accel: Array, q0: Array, v0: Array, dt: float
) -> Tuple[Array, Array]:
    """Kinematic double integration along the horizon axis (-2).

    accel: [..., H, A]; q0, v0: broadcastable to [..., A].
    Returns (q, v), each [..., H, A], with the reference's exact update
    q[t] = q[t-1] + v[t-1]*dt + 0.5*a[t]*dt^2,  v[t] = v[t-1] + a[t]*dt.
    """
    v0b = jnp.asarray(v0)[..., None, :]
    q0b = jnp.asarray(q0)[..., None, :]
    v = jnp.cumsum(accel * dt, axis=-2) + v0b
    v_prev = jnp.concatenate(
        [jnp.broadcast_to(v0b, v[..., :1, :].shape), v[..., :-1, :]], axis=-2
    )
    dq = v_prev * dt + 0.5 * accel * dt * dt
    q = jnp.cumsum(dq, axis=-2) + q0b
    return q, v


def scan_rollout(
    step: Callable[[State, Array], State],
    x0: State,
    u_seq: Array,
    extract: Callable[[State], Array] = lambda s: s,
):
    """Roll true dynamics over the horizon with ``lax.scan``.

    ``step(state, u_t) -> next_state`` operates on the whole sample batch at
    once (state leaves carry the K axis); ``u_seq`` has the horizon on axis 0
    ([H, K, ...]).  Returns the stacked per-step outputs with horizon first.
    """

    def body(state, u_t):
        nxt = step(state, u_t)
        return nxt, extract(nxt)

    _, ys = jax.lax.scan(body, x0, u_seq)
    return ys

"""Softmin sample weighting — the MPPI update's reduction core.

Parity: the reference's ``compute_weights``
(``/root/reference/src/mav_mppi/scripts/mppi_solver/mppi.py:173-193`` and
``drone_mppi.py:110-130``): rho = min(S), w = exp(-(S - rho)/lambda) / eta.

This is exactly two collectives over the sample axis (a min and a sum) plus
elementwise math, so the sharded version runs the identical code with
``axis_name`` set inside ``shard_map`` — XLA lowers ``jnp.min``/``jnp.sum``
with a ``lax.pmin``/``psum`` pair over ICI (SURVEY.md section 2.4/5's noted
TPU-native equivalent of the reference's single-GPU reduction).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def softmin_weights(
    s: Array, lam: float, axis_name: Optional[str] = None
) -> Array:
    """Per-sample weights w_k over the leading sample axis of ``s`` (K,).

    With ``axis_name``, ``s`` is the local K-shard inside shard_map/pmap and
    the min/sum reduce globally; weights still sum to 1 across all shards.
    """
    rho = jnp.min(s)
    if axis_name is not None:
        rho = jax.lax.pmin(rho, axis_name)
    scaled = jnp.exp((rho - s) / lam)
    eta = jnp.sum(scaled)
    if axis_name is not None:
        eta = jax.lax.psum(eta, axis_name)
    return scaled / eta


def weighted_noise_average(
    weights: Array, noise: Array, axis_name: Optional[str] = None
) -> Array:
    """du = sum_k w_k * eps_k over the sample axis (``mppi.py:148``).

    noise: (K, H, A); weights: (K,).  Sharded: psum of the local partial sum —
    the third and last collective of an MPPI solve.
    """
    du = jnp.einsum("k,kha->ha", weights, noise)
    if axis_name is not None:
        du = jax.lax.psum(du, axis_name)
    return du

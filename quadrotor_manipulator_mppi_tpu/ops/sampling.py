"""Control-noise sampling for MPPI, on-device with JAX PRNG.

Parity surface: the reference's ``StandardSamplling``
(``/root/reference/src/mav_mppi/scripts/sampling/standard_normal_noise.py:6-29``)
draws ``randn(K, H, A)`` and right-multiplies by a covariance-shaping matrix
(sigma = 0.1*I for the arm, 30*I for the drone).  Differences here:

* counter-based JAX PRNG with explicit keys — the reference's ``torch.randn``
  is unseeded and nondeterministic run-to-run; tests that need bit-identical
  noise inject it explicitly,
* a diagonal fast path (the reference always pays a (1, A) @ (A, A) matmul per
  sample-step even though its sigma is a scalar multiple of I),
* shard-friendly: pass a per-device key and sample only the local K-shard.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array
Sigma = Union[float, Array]


def sigma_matrix(sigma: Sigma, n_action: int, dtype=jnp.float32) -> Array:
    """Normalize a sigma spec (scalar | (A,) diag | (A, A) full) to (A, A)."""
    s = jnp.asarray(sigma, dtype)
    if s.ndim == 0:
        return jnp.eye(n_action, dtype=dtype) * s
    if s.ndim == 1:
        return jnp.diag(s)
    return s


def sample_noise(
    key: Array,
    n_samples: int,
    n_horizon: int,
    n_action: int,
    sigma: Sigma,
    dtype=jnp.float32,
) -> Array:
    """Draw shaped noise eps ~ N(0, Sigma^T Sigma) of shape (K, H, A).

    Matches the reference's ``noise = randn @ Sigma`` shaping
    (``standard_normal_noise.py:24-29``): for their diagonal Sigma this is a
    per-action std scale.  Scalar/diag sigma take the elementwise fast path.
    """
    z = jax.random.normal(key, (n_samples, n_horizon, n_action), dtype)
    s = jnp.asarray(sigma, dtype)
    if s.ndim <= 1:
        return z * s  # broadcast over the action axis
    return jnp.einsum("kha,ab->khb", z, s)


def zero_mean_trick(noise: Array) -> Array:
    """Antithetic-style centering: subtract the sample mean so the noise
    population is exactly zero-mean (variance-reduction option; off by
    default — not part of the reference behavior)."""
    return noise - jnp.mean(noise, axis=0, keepdims=True)

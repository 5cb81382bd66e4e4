"""Savitzky-Golay smoothing along the horizon axis, TPU-style.

Behavioral parity with the reference's smoother
(``/root/reference/src/mav_mppi/scripts/filter/svg_filter.py:13-90``): odd
window, polynomial LS coefficients, *reflect-flip* edge padding
(``data[:p].flip, data, data[-p:].flip``), applied independently per DoF.

Two deliberate TPU-first deviations:

* coefficients are computed **once at trace time** with NumPy (the reference
  rebuilds the Vandermonde matrix and inverts it on-GPU on every call,
  ``svg_filter.py:52-55``) and baked into the program as constants;
* all DoF columns are smoothed in one dense matmul against a precomputed
  banded smoothing matrix ``S`` (H x H), instead of a Python loop of per-column
  conv1d calls.  For H<=128 the whole matrix lives in one MXU tile, so the
  filter is a single (H, H) x (H, A) matmul.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


@lru_cache(maxsize=None)
def savgol_coefficients(window: int, polyorder: int) -> np.ndarray:
    """Central smoothing coefficients, float64 NumPy (trace-time constant).

    Least-squares fit of a degree-``polyorder`` polynomial over the window;
    the smoothed value is the fitted polynomial at the window center, i.e. the
    first row of ``(A^T A)^-1 A^T`` for the centered Vandermonde ``A``.
    """
    if window % 2 != 1:
        raise ValueError("window must be odd")
    if polyorder >= window:
        raise ValueError("polyorder must be < window")
    half = window // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    a = np.stack([x**i for i in range(polyorder + 1)], axis=1)
    coeffs = np.linalg.lstsq(a, np.eye(window), rcond=None)[0][0]
    return coeffs  # shape (window,)


@lru_cache(maxsize=None)
def savgol_matrix(horizon: int, window: int, polyorder: int) -> np.ndarray:
    """Dense (horizon, horizon) smoothing operator including edge padding.

    Row t holds the effective weights of every input sample on output t, with
    the reference's reflect-flip padding folded in: padding index ``-k`` maps
    to input ``k - 1`` and ``H - 1 + k`` maps to ``H - k`` (flip *without*
    repeating the edge sample — matches ``data[:p].flip(0)`` semantics).
    """
    c = savgol_coefficients(window, polyorder)
    half = window // 2
    s = np.zeros((horizon, horizon))
    for t in range(horizon):
        for j, w in enumerate(c):
            src = t + j - half
            if src < 0:
                src = -src - 1  # reflect-flip of data[:half]
            elif src >= horizon:
                src = 2 * horizon - 1 - src  # reflect-flip of data[-half:]
            s[t, src] += w
    return s


def smooth(seq: Array, window: int, polyorder: int) -> Array:
    """Smooth ``seq`` of shape [..., H, A] along the H axis.

    One matmul per call; the smoothing matrix is a compile-time constant.
    """
    horizon = seq.shape[-2]
    s = jnp.asarray(savgol_matrix(horizon, window, polyorder), dtype=seq.dtype)
    return jnp.einsum("ht,...ta->...ha", s, seq)

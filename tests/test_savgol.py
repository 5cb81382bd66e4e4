"""SavGol smoothing vs the NumPy oracle and scipy."""

import numpy as np
from scipy.signal import savgol_coeffs

import jax.numpy as jnp

from quadrotor_manipulator_mppi_tpu.utils import savgol

import oracle


def test_coefficients_match_scipy():
    for window, order in [(9, 2), (5, 2), (7, 3)]:
        got = savgol.savgol_coefficients(window, order)
        want = savgol_coeffs(window, order, use="dot")
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_smooth_matches_oracle(rng):
    for window, order, h, a in [(9, 2, 32, 7), (5, 2, 32, 3), (7, 2, 50, 13)]:
        seq = rng.normal(size=(h, a))
        got = np.asarray(savgol.smooth(jnp.asarray(seq), window, order))
        want = oracle.savgol(seq, window, order)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_smooth_preserves_polynomial(rng):
    # A quadratic is invariant under SavGol(window, 2) in the interior.
    t = np.linspace(0, 1, 32)
    seq = (3 * t**2 - 2 * t + 1)[:, None]
    got = np.asarray(savgol.smooth(jnp.asarray(seq), 9, 2))
    np.testing.assert_allclose(got[4:-4], seq[4:-4], atol=1e-6)


def test_smooth_batched(rng):
    seq = rng.normal(size=(4, 32, 7))
    got = np.asarray(savgol.smooth(jnp.asarray(seq), 9, 2))
    for i in range(4):
        want = oracle.savgol(seq[i], 9, 2)
        np.testing.assert_allclose(got[i], want, atol=1e-5)

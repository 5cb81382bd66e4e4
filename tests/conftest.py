"""Test configuration: force an 8-device virtual CPU mesh.

The image's sitecustomize registers the axon (TPU) PJRT plugin and pins
``jax_platforms`` to "axon,cpu", so env vars alone don't switch platforms —
we override the config directly before any backend is initialized.

Multi-chip sharding tests run against this virtual mesh (SURVEY.md's test
strategy (d): sharded solver must equal the single-chip solver at fixed
seed).  Benchmarks — not tests — run on the real TPU chip via bench.py.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu"

"""Hardware-gated test tier — runs against the REAL TPU chip.

The default suite (``tests/``) forces an 8-device virtual CPU mesh, which
cannot execute the in-kernel PRNG production path (``pltpu.prng_random_bits``
is stubbed in interpret mode) or measure real latencies.  This tier covers
exactly that gap (VERDICT r01 item 5):

    python -m pytest tests_tpu/ -m tpu

Every test here is marked ``tpu`` and the whole tier auto-skips when no TPU
is attached, so accidentally including it in a CPU run is harmless.  Bench
infrastructure runs it and commits the log (benchmarks/artifacts/).
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402


def _tpu_available() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except RuntimeError:
        return False


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)
    if not _tpu_available():
        skip = pytest.mark.skip(reason="no TPU attached")
        for item in items:
            item.add_marker(skip)

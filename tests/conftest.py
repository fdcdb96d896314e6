"""Test configuration: run on a virtual 8-device CPU mesh.

All tests run on CPU (fast, deterministic); multi-chip sharding tests use
the 8 virtual host devices. TPU execution is exercised by bench.py and
the driver's compile checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)

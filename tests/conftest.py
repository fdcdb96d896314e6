"""Test configuration: run on a virtual 8-device CPU mesh.

All tests run on CPU (fast, deterministic); multi-chip sharding tests use
the 8 virtual host devices. TPU execution is exercised by bench.py and
the driver's compile checks.

The container's sitecustomize registers the axon TPU plugin and forces
``jax_platforms="axon,cpu"`` at interpreter start, so the env var alone is
not enough — we must override the config after importing jax and before
any backend is initialised.
"""

import os

# silence XLA:CPU AOT-cache machine-feature mismatch error spam (the cached
# executables load and run fine; the loader logs at ERROR level)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite re-jits the same solver shapes often
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)

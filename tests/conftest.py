"""Test configuration: hermetic CPU backend with 8 virtual devices.

Multi-device tests run on a virtual CPU mesh (the TPU-native substitute for a
fake backend; see SURVEY.md §4) — real-TPU benchmarking happens in bench.py,
not in the unit suite.
"""

import os

# Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The env var alone is not enough on this image (the axon TPU plugin still
# registers); the config update reliably pins the test suite to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)

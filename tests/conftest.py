"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip shardings are validated on a virtual CPU mesh (real TPU hardware
in CI has a single chip). These env vars must be set before jax initializes.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the axon TPU
# plugin, but unit tests need a deterministic f32 backend and 8 virtual
# devices for sharding tests.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient sitecustomize registers the TPU plugin before conftest runs,
# so the env var alone does not switch the backend — force it via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

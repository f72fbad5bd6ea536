"""Test config: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via
XLA host-platform device faking (set BEFORE jax import anywhere).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's axon sitecustomize force-registers the TPU backend and sets
# jax_platforms="axon,cpu" regardless of the env var — override it here so
# the suite runs on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
# Don't downcast f64 test fixtures; runtime code creates f32 arrays and is
# unaffected.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)

"""Test config: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via
XLA host-platform device faking (set BEFORE jax import anywhere).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# on-disk render cache: the synthetic renderer dominates e2e wall time
# and most modules re-render identical sequences (persists across runs
# and xdist workers; atomically written, safe to delete any time)
os.environ.setdefault(
    "TPUSLAM_RENDER_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".render_cache"))
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
# persistent XLA compilation cache: the suite's wall time is dominated by
# per-worker/per-session CPU compiles of the same programs (the renderer
# itself is ~50 ms/frame); compiled executables are reused across xdist
# workers AND sessions
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# Don't downcast f64 test fixtures; runtime code creates f32 arrays and is
# unaffected.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)

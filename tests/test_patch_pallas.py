"""Parity: the TPU Pallas patch-gather path vs the XLA gather fallback.

The Mosaic kernel (DMA double-buffering, tile-aligned superpatch fetch,
masked-shift/one-hot epilogue) is the ONLY path that runs on hardware, so
it must be covered off-chip too: interpret=True executes the same kernel
logic on CPU. ADVICE r2 (medium): this was previously untested.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.ops.patch_pallas import (
    MAX_SIZE,
    _extract_patches_tpu,
    _extract_patches_xla,
)


@pytest.mark.parametrize("size", [5, 31, 37, MAX_SIZE])
def test_tpu_path_matches_xla_gather(rng, size):
    h, w = 480, 752
    img = jnp.asarray(rng.rand(h, w).astype(np.float32) * 255.0)
    k = 64
    ys = rng.randint(0, h - size, k)
    xs = rng.randint(0, w - size, k)
    yx = jnp.asarray(np.stack([ys, xs], -1).astype(np.int32))

    ref = np.asarray(_extract_patches_xla(img, yx, size))
    got = np.asarray(_extract_patches_tpu(img, yx, size, interpret=True))
    # bitwise: the one-hot epilogue runs at Precision.HIGHEST so the f32
    # image operand is never truncated to bf16 (ADVICE r2 medium)
    np.testing.assert_array_equal(got, ref)


def test_tpu_path_edge_keypoints(rng):
    """Corners / image edges: the aligned superpatch fetch must stay in
    bounds after padding for every legal top-left corner."""
    h, w = 96, 200
    size = 37
    img = jnp.asarray(rng.rand(h, w).astype(np.float32))
    corners = [
        (0, 0),
        (0, w - size),
        (h - size, 0),
        (h - size, w - size),
        (7, 127),  # max sub-tile offsets
        (8, 128),  # exactly on tile boundaries
    ]
    yx = jnp.asarray(np.array(corners, np.int32))
    ref = np.asarray(_extract_patches_xla(img, yx, size))
    got = np.asarray(_extract_patches_tpu(img, yx, size, interpret=True))
    np.testing.assert_array_equal(got, ref)

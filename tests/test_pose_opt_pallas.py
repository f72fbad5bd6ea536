"""Fused Pallas pose solver == reference XLA pose solver (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.core import lie
from tpuslam.solve.pose_opt import pose_optimize
from tpuslam.solve.pose_opt_pallas import pose_optimize_fused


def _problem(n=300, stereo=False, outliers=30, seed=0):
    rng = np.random.RandomState(seed)
    fx = fy = 458.0
    cx, cy = 376.0, 240.0
    bf = 47.9 if stereo else 0.0
    X = np.stack(
        [rng.randn(n), rng.randn(n), rng.rand(n) * 4 + 2], -1
    ).astype(np.float32)
    u = fx * X[:, 0] / X[:, 2] + cx
    v = fy * X[:, 1] / X[:, 2] + cy
    ur = u - bf / X[:, 2]
    uvr = np.stack([u, v, ur], -1) + rng.randn(n, 3).astype(np.float32) * 0.3
    uvr[:outliers] += rng.randn(outliers, 3) * 40  # gross outliers
    is_stereo = np.zeros(n, bool)
    if stereo:
        is_stereo[: n // 2] = True
    dR, dt = lie.se3_exp(
        jnp.asarray([0.05, -0.02, 0.03, 0.02, -0.015, 0.01], jnp.float32)
    )
    args = (
        dR,
        dt,
        jnp.asarray(X),
        jnp.asarray(uvr.astype(np.float32)),
        jnp.ones(n, jnp.float32),
        jnp.asarray(is_stereo),
        jnp.ones(n, bool),
        fx,
        fy,
        cx,
        cy,
        bf,
    )
    return args


@pytest.mark.parametrize("stereo", [False, True])
def test_fused_matches_xla(stereo):
    args = _problem(stereo=stereo)
    R1, t1, in1, c1 = pose_optimize(*args)
    R2, t2, in2, c2 = pose_optimize_fused(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=2e-3)
    # inlier sets agree except at the chi2 gate boundary
    agree = np.mean(np.asarray(in1) == np.asarray(in2))
    assert agree > 0.97
    # and both recover the true pose (identity)
    np.testing.assert_allclose(np.asarray(R2), np.eye(3), atol=5e-3)
    np.testing.assert_allclose(np.asarray(t2), 0.0, atol=2e-2)


def test_fused_nonaligned_n():
    args = _problem(n=217)
    R2, t2, in2, c2 = pose_optimize_fused(*args, interpret=True)
    assert c2.shape == (217,)
    np.testing.assert_allclose(np.asarray(R2), np.eye(3), atol=5e-3)
    np.testing.assert_allclose(np.asarray(t2), 0.0, atol=2e-2)

"""Batched DLT-PnP RANSAC tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.core import lie
from tpuslam.solve.pnp import dlt_pose, pnp_ransac


def _scene(rng, N=60):
    R = np.asarray(lie.so3_exp(jnp.asarray(rng.randn(3) * 0.4)))
    t = np.array([0.3, -0.2, 0.5])
    X = np.stack([rng.uniform(-2, 2, N), rng.uniform(-2, 2, N),
                  rng.uniform(4, 10, N)], 1)
    # world points such that camera sees them: X defined in camera frame,
    # move to world: Xw = R^T (Xc - t)
    Xw = (X - t) @ R
    xy = X[:, :2] / X[:, 2:3]
    return R, t, Xw, xy


def test_dlt_exact(rng):
    R, t, Xw, xy = _scene(rng, N=6)
    Re, te = dlt_pose(jnp.asarray(Xw[None]), jnp.asarray(xy[None]))
    np.testing.assert_allclose(np.asarray(Re[0]), R, atol=1e-6)
    np.testing.assert_allclose(np.asarray(te[0]), t, atol=1e-6)


def test_pnp_ransac_outliers(rng):
    R, t, Xw, xy = _scene(rng, N=80)
    xy_noisy = xy.copy()
    out = rng.choice(80, 30, replace=False)
    xy_noisy[out] += rng.randn(30, 2) * 0.2
    res = pnp_ransac(
        jnp.asarray(Xw), jnp.asarray(xy_noisy), jnp.ones(80),
        jnp.ones(80, bool), jax.random.PRNGKey(1), n_hyp=512,
        focal2=300.0 ** 2,
    )
    inl = np.asarray(res["inliers"])
    gt_inl = np.ones(80, bool)
    gt_inl[out] = False
    assert int(res["n_inliers"]) >= 0.9 * gt_inl.sum()
    assert not (inl & ~gt_inl).any()
    np.testing.assert_allclose(np.asarray(res["R"]), R, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res["t"]), t, atol=5e-2)


def test_pnp_with_padding(rng):
    R, t, Xw, xy = _scene(rng, N=50)
    Xp = np.concatenate([Xw, np.zeros((14, 3))])
    xyp = np.concatenate([xy, np.zeros((14, 2))])
    valid = np.zeros(64, bool)
    valid[:50] = True
    res = pnp_ransac(
        jnp.asarray(Xp), jnp.asarray(xyp), jnp.ones(64), jnp.asarray(valid),
        jax.random.PRNGKey(0), n_hyp=256, focal2=300.0 ** 2,
    )
    assert int(res["n_inliers"]) >= 45
    assert not np.asarray(res["inliers"])[50:].any()

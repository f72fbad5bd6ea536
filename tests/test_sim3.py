"""Sim3 Horn closed form, RANSAC, and GN refinement."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.core import lie
from tpuslam.solve.sim3 import horn_sim3, optimize_sim3, sim3_ransac

FX = FY = 300.0
CX = CY = 200.0


def _random_sim3(rng, s=None):
    s = s if s is not None else 0.5 + rng.rand() * 2
    R = np.asarray(lie.so3_exp(jnp.asarray(rng.randn(3) * 0.5)))
    t = rng.randn(3)
    return s, R, t


def test_horn_exact(rng):
    s, R, t = _random_sim3(rng)
    X1 = rng.randn(20, 3)
    X2 = s * X1 @ R.T + t
    se, Re, te = horn_sim3(jnp.asarray(X1[None]), jnp.asarray(X2[None]))
    np.testing.assert_allclose(float(se[0]), s, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(Re[0]), R, atol=1e-6)
    np.testing.assert_allclose(np.asarray(te[0]), t, atol=1e-6)


def test_horn_fix_scale(rng):
    _, R, t = _random_sim3(rng)
    X1 = rng.randn(15, 3)
    X2 = X1 @ R.T + t
    se, Re, te = horn_sim3(jnp.asarray(X1[None]), jnp.asarray(X2[None]),
                           fix_scale=True)
    assert float(se[0]) == 1.0
    np.testing.assert_allclose(np.asarray(Re[0]), R, atol=1e-6)
    np.testing.assert_allclose(np.asarray(te[0]), t, atol=1e-6)


def _make_ransac_problem(rng, N=80, outlier_frac=0.3, s_true=1.8):
    """Points in cam1 frame; cam2 = Sim3(cam1). uv are exact projections."""
    _, R, t = _random_sim3(rng)
    s = s_true
    X1 = np.stack([rng.uniform(-2, 2, N), rng.uniform(-2, 2, N),
                   rng.uniform(3, 9, N)], 1)
    X2 = s * X1 @ R.T + t
    X2[:, 2] += 10.0  # keep in front of cam2
    t = t + np.array([0, 0, 10.0])
    n_out = int(N * outlier_frac)
    out_idx = rng.choice(N, n_out, replace=False)
    X2_noisy = X2.copy()
    X2_noisy[out_idx] += rng.randn(n_out, 3) * 3.0
    def proj(X):
        return np.stack([FX * X[:, 0] / X[:, 2] + CX,
                         FY * X[:, 1] / X[:, 2] + CY], 1)
    uv1 = proj(X1)
    uv2 = proj(X2_noisy)
    inlier_mask = np.ones(N, bool)
    inlier_mask[out_idx] = False
    return X1, X2_noisy, uv1, uv2, (s, R, t), inlier_mask


def test_sim3_ransac_with_outliers(rng):
    X1, X2, uv1, uv2, (s, R, t), gt_inl = _make_ransac_problem(rng)
    N = len(X1)
    out = sim3_ransac(
        jnp.asarray(X1), jnp.asarray(X2), jnp.ones(N, bool),
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(N), jnp.ones(N),
        FX, FY, CX, CY, jax.random.PRNGKey(0), n_hyp=256,
    )
    assert int(out["n_inliers"]) >= 0.9 * gt_inl.sum()
    est_inl = np.asarray(out["inliers"])
    # no outlier survives
    assert not (est_inl & ~gt_inl).any()
    np.testing.assert_allclose(float(out["s"]), s, rtol=0.02)
    np.testing.assert_allclose(np.asarray(out["R"]), R, atol=0.02)


def test_optimize_sim3_refines(rng):
    X1, X2, uv1, uv2, (s, R, t), gt_inl = _make_ransac_problem(
        rng, outlier_frac=0.1)
    N = len(X1)
    # perturb the truth and refine
    s0 = s * 1.1
    R0 = R @ np.asarray(lie.so3_exp(jnp.asarray([0.03, -0.02, 0.01])))
    t0 = t + rng.randn(3) * 0.1
    se, Re, te, inl, n = optimize_sim3(
        jnp.asarray(s0), jnp.asarray(R0), jnp.asarray(t0),
        jnp.asarray(X1), jnp.asarray(X2), jnp.ones(N, bool),
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(N), jnp.ones(N),
        FX, FY, CX, CY, n_iters=15,
    )
    assert int(n) >= 0.9 * gt_inl.sum()
    np.testing.assert_allclose(float(se), s, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(Re), R, atol=5e-3)
    np.testing.assert_allclose(np.asarray(te), t, atol=0.05)

"""Two-view reconstruction tests on synthetic geometry."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.core import lie
from tpuslam.ops import twoview as TV


def synth_pair(rng, n=300, planar=False, noise_px=0.5, fx=400.0):
    if planar:
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 5.0)], -1
        )
        X[:, 2] += X[:, 0] * 0.1  # slight tilt
    else:
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)], -1
        )
    w = np.array([0.02, -0.06, 0.01])
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = np.array([0.6, 0.05, 0.02])
    x1 = X[:, :2] / X[:, 2:3]
    Xc2 = X @ R.T + t
    x2 = Xc2[:, :2] / Xc2[:, 2:3]
    x1 += rng.randn(n, 2) * noise_px / fx
    x2 += rng.randn(n, 2) * noise_px / fx
    return X, R, t, x1, x2


def _run(rng, planar, outlier_frac=0.1):
    X, R, t, x1, x2 = synth_pair(rng, planar=planar)
    n = len(x1)
    n_out = int(n * outlier_frac)
    idx = rng.choice(n, n_out, replace=False)
    x2b = x2.copy()
    x2b[idx] += rng.uniform(0.05, 0.2, (n_out, 2))
    out = TV.reconstruct_two_views(
        jnp.asarray(x1), jnp.asarray(x2b), jnp.ones(n, bool), jax.random.PRNGKey(0)
    )
    return X, R, t, out, idx


def test_general_scene_uses_f(rng):
    X, R, t, out, out_idx = _run(rng, planar=False)
    assert bool(out["success"])
    assert not bool(out["used_h"])
    R21 = np.asarray(out["R21"])
    t21 = np.asarray(out["t21"])
    np.testing.assert_allclose(R21, R, atol=5e-3)
    # translation up to scale
    tn = t / np.linalg.norm(t)
    assert min(np.abs(t21 - tn).max(), np.abs(t21 + tn).max()) < 2e-2
    good = np.asarray(out["good"])
    assert good.sum() > 150
    assert good[out_idx].mean() < 0.2
    # triangulated structure correct up to scale (depth noise floor at z~8,
    # baseline 0.6, 0.5px noise is ~0.2 — check median, not max)
    Xe = np.asarray(out["X"])[good]
    err = np.abs(Xe * np.median(X[good][:, 2] / Xe[:, 2]) - X[good]).max(-1)
    assert np.median(err) < 0.12
    assert err.max() < 0.8


def test_planar_scene_uses_h(rng):
    X, R, t, out, out_idx = _run(rng, planar=True)
    assert bool(out["success"])
    assert bool(out["used_h"])
    R21 = np.asarray(out["R21"])
    np.testing.assert_allclose(R21, R, atol=2e-2)
    t21 = np.asarray(out["t21"])
    tn = t / np.linalg.norm(t)
    assert min(np.abs(t21 - tn).max(), np.abs(t21 + tn).max()) < 5e-2


def test_pure_rotation_rejected(rng):
    # no translation -> no parallax -> must not report success
    n = 300
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)], -1
    )
    R = np.asarray(lie.so3_exp(jnp.asarray(np.array([0.03, -0.05, 0.02]))))
    x1 = X[:, :2] / X[:, 2:3]
    Xc2 = X @ R.T
    x2 = Xc2[:, :2] / Xc2[:, 2:3]
    x1 += rng.randn(n, 2) * 0.5 / 400
    x2 += rng.randn(n, 2) * 0.5 / 400
    out = TV.reconstruct_two_views(
        jnp.asarray(x1), jnp.asarray(x2), jnp.ones(n, bool), jax.random.PRNGKey(0)
    )
    assert not bool(out["success"])


def test_triangulate_exact(rng):
    X = np.stack(
        [rng.uniform(-2, 2, 50), rng.uniform(-1.5, 1.5, 50), rng.uniform(4, 8, 50)], -1
    )
    R = np.asarray(lie.so3_exp(jnp.asarray(np.array([0.1, 0.05, -0.02]))))
    t = np.array([0.5, -0.1, 0.03])
    x1 = X[:, :2] / X[:, 2:3]
    Xc2 = X @ R.T + t
    x2 = Xc2[:, :2] / Xc2[:, 2:3]
    Xt = np.asarray(
        TV.triangulate_batch(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(R), jnp.asarray(t),
            jnp.asarray(x1), jnp.asarray(x2),
        )
    )
    np.testing.assert_allclose(Xt, X, atol=1e-6)

"""core/linalg.spd_solve: f32-robust preconditioned solves.

The TPU dtype is f32 while the reference runs g2o in double
(Thirdparty/g2o linear_solver_eigen.h); these tests pin the properties
that let the solvers match double-precision behavior at f32.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.core.linalg import masked_spd_solve, spd_solve


def _spd(rng, n, cond_scale=4.0):
    A = rng.randn(n, n)
    H = A @ A.T + 1e-3 * np.eye(n)
    D = np.diag(10.0 ** rng.uniform(-cond_scale, cond_scale, n))
    return D @ H @ D


def test_f64_accuracy(rng):
    for n in (3, 6, 15, 24):
        H = _spd(rng, n)
        b = rng.randn(n)
        x = np.linalg.solve(H, b)
        xs = np.asarray(spd_solve(jnp.asarray(H), jnp.asarray(b)))
        assert np.abs(xs - x).max() <= 1e-9 * max(1.0, np.abs(x).max()), n


def test_f32_badly_scaled_diagonal(rng):
    """Jacobi scaling must recover ~f32-eps accuracy on diagonally
    ill-scaled SPD systems (fx^2-scaled reprojection normal matrices)."""
    for n in (6, 12):
        H = _spd(rng, n, cond_scale=4.0)
        b = rng.randn(n)
        x = np.linalg.solve(H, b)
        x32 = np.asarray(spd_solve(jnp.asarray(H, jnp.float32),
                                   jnp.asarray(b, jnp.float32)))
        rel = np.abs(x32 - x).max() / np.abs(x).max()
        assert rel < 1e-4, (n, rel)


def test_zero_and_nonfinite_guard(rng):
    # all-zero H (dead system) -> dx = 0, not NaN/explosion
    out = np.asarray(spd_solve(jnp.zeros((6, 6)), jnp.ones(6)))
    np.testing.assert_array_equal(out, np.zeros(6))
    # non-finite entries -> dx = 0
    H = _spd(rng, 6)
    H[2, 3] = np.nan
    H[3, 2] = np.nan
    out = np.asarray(spd_solve(jnp.asarray(H), jnp.ones(6)))
    assert np.all(np.isfinite(out))
    np.testing.assert_array_equal(out, np.zeros(6))


def test_dead_variable_rows(rng):
    """Rows with zero diagonal (masked-out variables) get dx=0 while the
    live sub-system solves correctly."""
    H = _spd(rng, 6)
    H[4, :] = 0.0
    H[:, 4] = 0.0
    b = rng.randn(6)
    out = np.asarray(spd_solve(jnp.asarray(H), jnp.asarray(b)))
    assert out[4] == 0.0
    live = [0, 1, 2, 3, 5]
    x_live = np.linalg.solve(H[np.ix_(live, live)], b[live])
    np.testing.assert_allclose(out[live], x_live, rtol=1e-6, atol=1e-9)


def test_masked_solve(rng):
    H = _spd(rng, 8)
    b = rng.randn(8)
    free = np.ones(8, bool)
    free[[1, 6]] = False
    out = np.asarray(masked_spd_solve(jnp.asarray(H), jnp.asarray(b),
                                      jnp.asarray(free)))
    assert out[1] == 0.0 and out[6] == 0.0
    idx = np.nonzero(free)[0]
    x_live = np.linalg.solve(H[np.ix_(idx, idx)], b[idx])
    np.testing.assert_allclose(out[idx], x_live, rtol=1e-6, atol=1e-9)


def test_batched(rng):
    H = np.stack([_spd(rng, 6) for _ in range(5)])
    b = rng.randn(5, 6)
    out = np.asarray(spd_solve(jnp.asarray(H), jnp.asarray(b)))
    for i in range(5):
        np.testing.assert_allclose(
            out[i], np.linalg.solve(H[i], b[i]), rtol=1e-6, atol=1e-9)


def test_relative_damping_scale_invariance(rng):
    """Marquardt damping: scaling H and b by a constant leaves dx at the
    same relative solution (absolute damping would not)."""
    H = _spd(rng, 6)
    b = rng.randn(6)
    x1 = np.asarray(spd_solve(jnp.asarray(H), jnp.asarray(b), damping=1e-2))
    x2 = np.asarray(spd_solve(jnp.asarray(1e6 * H), jnp.asarray(1e6 * b),
                              damping=1e-2))
    np.testing.assert_allclose(x1, x2, rtol=1e-8)

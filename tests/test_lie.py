"""Property tests for batched Lie ops against closed forms and scipy."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRot

from tpuslam.core import lie


def rand_w(rng, n=64, scale=2.0):
    return rng.randn(n, 3).astype(np.float32) * scale


def test_so3_exp_matches_scipy(rng):
    w = rand_w(rng)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    R_ref = ScipyRot.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = rand_w(rng, scale=1.0)
    w2 = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(w))))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_log_near_pi(rng):
    axes = rng.randn(32, 3)
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    for ang in [np.pi - 1e-4, np.pi - 1e-6]:
        w = (axes * ang).astype(np.float64)
        R = ScipyRot.from_rotvec(w).as_matrix()
        w2 = np.array(lie.so3_log(jnp.asarray(R)))
        R2 = ScipyRot.from_rotvec(w2).as_matrix()
        np.testing.assert_allclose(R2, R, atol=1e-4)


def test_so3_exp_small_angle(rng):
    w = rand_w(rng, scale=1e-6).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    R_ref = ScipyRot.from_rotvec(w.astype(np.float64)).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)


def test_right_jacobian_finite_difference(rng):
    # Exp(w + dw) ~ Exp(w) Exp(Jr(w) dw)
    w = rand_w(rng, n=16, scale=1.0).astype(np.float64)
    dw = rng.randn(16, 3) * 1e-6
    Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(w)))
    lhs = ScipyRot.from_rotvec(w + dw).as_matrix()
    inc = np.einsum("nij,nj->ni", Jr, dw)
    rhs = ScipyRot.from_rotvec(w).as_matrix() @ ScipyRot.from_rotvec(inc).as_matrix()
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)


def test_right_jacobian_inverse(rng):
    w = rand_w(rng, n=16, scale=1.0).astype(np.float64)
    J = np.asarray(lie.so3_right_jacobian(jnp.asarray(w)))
    Jinv = np.asarray(lie.so3_right_jacobian_inv(jnp.asarray(w)))
    eye = np.broadcast_to(np.eye(3), J.shape)
    np.testing.assert_allclose(J @ Jinv, eye, atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.randn(32, 6).astype(np.float64)
    R, t = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(R, t))
    np.testing.assert_allclose(xi2, xi, atol=1e-6)


def test_se3_compose_inverse(rng):
    xi = rng.randn(8, 6)
    R, t = lie.se3_exp(jnp.asarray(xi))
    Ri, ti = lie.se3_inverse(R, t)
    Rc, tc = lie.se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-6)


def test_sim3_exp_sigma_zero_matches_se3(rng):
    xi6 = rng.randn(16, 6).astype(np.float64)
    xi7 = np.concatenate([xi6, np.zeros((16, 1))], axis=-1)
    s, R, t = lie.sim3_exp(jnp.asarray(xi7))
    R2, t2 = lie.se3_exp(jnp.asarray(xi6))
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-9)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-9)


def test_sim3_compose_apply(rng):
    a = rng.randn(8, 7) * 0.5
    b = rng.randn(8, 7) * 0.5
    X = rng.randn(8, 3)
    sa, Ra, ta = lie.sim3_exp(jnp.asarray(a))
    sb, Rb, tb = lie.sim3_exp(jnp.asarray(b))
    sc, Rc, tc = lie.sim3_compose(sa, Ra, ta, sb, Rb, tb)
    lhs = lie.sim3_apply(sc, Rc, tc, jnp.asarray(X))
    rhs = lie.sim3_apply(sa, Ra, ta, lie.sim3_apply(sb, Rb, tb, jnp.asarray(X)))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_sim3_inverse(rng):
    a = rng.randn(8, 7) * 0.5
    X = rng.randn(8, 3)
    s, R, t = lie.sim3_exp(jnp.asarray(a))
    si, Ri, ti = lie.sim3_inverse(s, R, t)
    back = lie.sim3_apply(si, Ri, ti, lie.sim3_apply(s, R, t, jnp.asarray(X)))
    np.testing.assert_allclose(np.asarray(back), X, atol=1e-5)


def test_quat_roundtrip(rng):
    q = rng.randn(64, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(lie.quat_to_rot(jnp.asarray(q)))
    R_ref = ScipyRot.from_quat(q).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)
    q2 = np.array(lie.rot_to_quat(jnp.asarray(R)))
    R2 = ScipyRot.from_quat(q2).as_matrix()
    np.testing.assert_allclose(R2, R_ref, atol=1e-6)


def test_normalize_rotation(rng):
    w = rand_w(rng, n=8)
    R = np.asarray(lie.so3_exp(jnp.asarray(w))) + rng.randn(8, 3, 3) * 1e-3
    Rn = np.asarray(lie.normalize_rotation(jnp.asarray(R)))
    eye = np.broadcast_to(np.eye(3), Rn.shape)
    np.testing.assert_allclose(Rn @ np.swapaxes(Rn, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(Rn), 1.0, atol=1e-5)


def test_grad_safe_at_identity():
    """jacfwd/grad through exp/log/right-jacobian at the origin must be
    finite (the double-where pattern; a NaN here poisons whole GN solves)."""
    import jax

    for fn in (lie.so3_exp, lie.so3_right_jacobian, lie.so3_right_jacobian_inv):
        J = jax.jacfwd(fn)(jnp.zeros(3))
        assert np.isfinite(np.asarray(J)).all(), fn.__name__
    J = jax.jacfwd(lambda w: lie.so3_log(lie.so3_exp(w)))(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(J), np.eye(3), atol=1e-9)
    J = jax.jacfwd(lie.se3_exp)(jnp.zeros(6))
    assert all(np.isfinite(np.asarray(j)).all() for j in J)
    # log near (but not at) identity as well
    w = jnp.asarray(np.array([1e-6, -2e-6, 1.5e-6]))
    J = jax.jacfwd(lambda w: lie.so3_log(lie.so3_exp(w)))(w)
    np.testing.assert_allclose(np.asarray(J), np.eye(3), atol=1e-5)

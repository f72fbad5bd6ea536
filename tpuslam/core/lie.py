"""Batched Lie-group operations on SO(3) / SE(3) / Sim(3).

TPU-native replacement for the reference's scattered rotation math
(ref: src/ImuTypes.cc:153-220 ExpSO3/LogSO3/RightJacobianSO3,
 Thirdparty/g2o/g2o/types/se3quat.h, sim3.h, src/Converter.cc).

All functions are pure jnp, broadcast over arbitrary leading batch dims,
and are safe under jit/vmap/grad. Rotations are 3x3 matrices; SE(3) is the
pair (R, t); Sim(3) the triple (s, R, t). Small-angle branches use
jnp.where with Taylor expansions (no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so(3) hat operator: w [...,3] -> skew matrix [...,3,3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: [...,3,3] -> [...,3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w):
    """Rodrigues formula, exp: so(3) [...,3] -> SO(3) [...,3,3].

    Matches reference ExpSO3 (src/ImuTypes.cc ~ header ImuTypes.h:270)
    including the small-angle Taylor branch. Grad-safe at w=0: sqrt only
    sees values bounded away from zero (double-where pattern), so jacfwd/
    grad through exp at the origin is exact, not NaN.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    W = hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """log: SO(3) [...,3,3] -> so(3) [...,3].

    Matches reference LogSO3 (ImuTypes.h:272). Handles theta near 0 and pi.
    Grad-safe at the identity (sqrt/atan2 only see values bounded away from
    the singular point; the Taylor branch is a polynomial in sin^2 theta).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    w_skew = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    s2 = jnp.sum(w_skew * w_skew, axis=-1)           # = sin^2 theta
    small = cos_t > 1.0 - 1e-7
    near_pi = cos_t < -1.0 + 5e-7
    s2_safe = jnp.where(small | near_pi, 1.0, s2)
    sin_t = jnp.sqrt(s2_safe)
    theta_gen = jnp.arctan2(sin_t, cos_t)
    # generic: w = theta / sin(theta) * w_skew; small: Taylor in s2
    scale = jnp.where(
        small, 1.0 + s2 / 6.0 + 3.0 * s2 * s2 / 40.0, theta_gen / sin_t
    )
    w_generic = scale[..., None] * w_skew
    # theta for the near-pi branch (arccos kept away from +-1 when unused)
    theta = jnp.arccos(jnp.where(near_pi, jnp.maximum(cos_t, -1.0), 0.0))
    # near pi: axis from diagonal of (R + I)/2 = aa^T(1-cos)+..., use largest diag
    B = (R + jnp.swapaxes(R, -1, -2)) * 0.5  # symmetric part
    d = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((d - cos_t[..., None]) / jnp.where(jnp.abs(1.0 - cos_t) < 1e-12, 1.0, (1.0 - cos_t))[..., None], 0.0, 1.0)
    axis2_safe = jnp.where(near_pi[..., None], jnp.maximum(axis2, 1e-12), 1.0)
    axis_abs = jnp.sqrt(axis2_safe)
    # signs from off-diagonal symmetric products relative to the dominant axis
    k = jnp.argmax(axis_abs, axis=-1)

    def sign_fix(axis_abs, B, k):
        s01 = jnp.sign(B[..., 0, 1])
        s02 = jnp.sign(B[..., 0, 2])
        s12 = jnp.sign(B[..., 1, 2])
        nz = lambda s: jnp.where(s == 0, 1.0, s)
        # dominant = 0: signs (+, s01, s02); dominant = 1: (s01, +, s12); dominant = 2: (s02, s12, +)
        a0 = jnp.stack([jnp.ones_like(s01), nz(s01), nz(s02)], axis=-1)
        a1 = jnp.stack([nz(s01), jnp.ones_like(s01), nz(s12)], axis=-1)
        a2 = jnp.stack([nz(s02), nz(s12), jnp.ones_like(s01)], axis=-1)
        sel = jnp.stack([a0, a1, a2], axis=-2)  # [...,3,3]
        signs = jnp.take_along_axis(sel, k[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
        return axis_abs * signs

    axis_pi = sign_fix(axis_abs, B, k)
    # Global sign: align with the skew part sin(theta)*axis (nonzero for
    # theta < pi; at exactly pi both signs are valid).
    dot = jnp.sum(axis_pi * w_skew, axis=-1, keepdims=True)
    axis_pi = jnp.where(dot < 0, -axis_pi, axis_pi)
    w_pi = theta[..., None] * axis_pi
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def so3_right_jacobian(w):
    """Right Jacobian of SO(3) (ref: RightJacobianSO3, ImuTypes.h:274)."""
    theta2 = jnp.sum(w * w, axis=-1)
    W = hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    safe_t3 = safe_t2 * theta
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / safe_t3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - b[..., None, None] * W + c[..., None, None] * W2


def so3_right_jacobian_inv(w):
    """Inverse right Jacobian (ref: InverseRightJacobianSO3, ImuTypes.h:276)."""
    theta2 = jnp.sum(w * w, axis=-1)
    W = hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    # 1/t^2 - (1+cos t)/(2 t sin t) ; Taylor: 1/12 + t^2/720
    c = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / safe_t2
        - (1.0 + jnp.cos(theta)) / (2.0 * theta * jnp.sin(theta) + 1e-30),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + c[..., None, None] * W2


def normalize_rotation(R):
    """Project near-rotation onto SO(3) via SVD (ref: NormalizeRotation ImuTypes.h:278)."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    fix = jnp.concatenate(
        [jnp.ones(R.shape[:-2] + (2,), R.dtype), det[..., None]], axis=-1
    )
    return (U * fix[..., None, :]) @ Vt


# ---------------------------------------------------------------------------
# SE(3): pairs (R [...,3,3], t [...,3]); Twc maps camera->world etc.
# ---------------------------------------------------------------------------


def se3_exp(xi):
    """exp: se(3) [...,6] (rho, phi) -> (R, t). Uses V(phi) @ rho."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    # V = I + b*W + c*W2 with b=(1-cos)/t^2, c=(t-sin)/t^3  (left Jacobian)
    theta2 = jnp.sum(phi * phi, axis=-1)
    W = hat(phi)
    W2 = W @ W
    small = theta2 < _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    safe_t3 = safe_t2 * theta
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / safe_t3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_log(R, t):
    """log: SE(3) -> [...,6] (rho, phi)."""
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, axis=-1)
    W = hat(phi)
    W2 = W @ W
    small = theta2 < _EPS
    safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe)
    # V^{-1} = I - W/2 + c*W2, c = (1 - t*cos(t/2)/(2 sin(t/2)))/t^2
    half = theta * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / (jnp.sin(half) + 1e-30)) / safe,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), W.shape)
    Vinv = eye - 0.5 * W + cot_term[..., None, None] * W2
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb): apply b then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_apply(R, t, X):
    """Transform points X [...,3]."""
    return jnp.einsum("...ij,...j->...i", R, X) + t


def se3_matrix(R, t):
    """Pack to 4x4 homogeneous matrices."""
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T):
    return T[..., :3, :3], T[..., :3, 3]


# ---------------------------------------------------------------------------
# Sim(3): triples (s [...], R [...,3,3], t [...,3]).  (ref: g2o sim3.h)
# ---------------------------------------------------------------------------


def sim3_apply(s, R, t, X):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, X) + t


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """(sa,Ra,ta) * (sb,Rb,tb)."""
    return (
        sa * sb,
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
    )


def sim3_exp(xi):
    """exp: sim(3) [...,7] (rho, phi, sigma) -> (s, R, t).

    Layout matches g2o Sim3 (rotation, translation, scale) generator order
    rho(3), phi(3), sigma(1).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    W = hat(phi)
    W2 = W @ W
    # W(sigma, theta) per Strasdat: A*I + B*W + C*W^2 coefficient form
    eps_s = jnp.abs(sigma) < 1e-6
    eps_t = theta < 1e-6
    sig_safe = jnp.where(eps_s, 1.0, sigma)
    t_safe = jnp.where(eps_t, 1.0, theta)
    A = jnp.where(eps_s, 1.0 + sigma / 2.0, (s - 1.0) / sig_safe)
    # B,C generic (sigma!=0, theta!=0)
    a_ = s * jnp.sin(theta)
    b_ = s * jnp.cos(theta)
    c2 = theta2 + sigma * sigma
    c2_safe = jnp.where(c2 < 1e-12, 1.0, c2)
    B_gen = (a_ * sigma + (1.0 - b_) * theta) / (t_safe * c2_safe)
    C_gen = (A - ((b_ - 1.0) * sigma + a_ * theta) / c2_safe) / jnp.where(eps_t, 1.0, theta2)
    # sigma==0 limits
    B_s0 = jnp.where(eps_t, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(t_safe)) / jnp.where(eps_t, 1.0, theta2))
    C_s0 = jnp.where(eps_t, 1.0 / 6.0 - theta2 / 120.0, (t_safe - jnp.sin(t_safe)) / jnp.where(eps_t, 1.0, theta2 * t_safe))
    # theta==0, sigma!=0 limits
    B_t0 = jnp.where(eps_s, 0.5, (sig_safe * s - s + 1.0) / (sig_safe * sig_safe))
    C_t0 = jnp.where(
        eps_s, 1.0 / 6.0, (0.5 * sig_safe * sig_safe * s + s - 1.0 - sig_safe * s) / (sig_safe ** 3)
    )
    B = jnp.where(eps_s, B_s0, jnp.where(eps_t, B_t0, B_gen))
    C = jnp.where(eps_s, C_s0, jnp.where(eps_t, C_t0, C_gen))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    Wmat = A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", Wmat, rho)
    return s, R, t


def _sim3_W(phi, sigma, dtype):
    """The Sim(3) 'V' matrix W(sigma, theta) with t = W rho (shared by
    sim3_exp / sim3_log)."""
    s = jnp.exp(sigma)
    theta2 = jnp.sum(phi * phi, axis=-1)
    W = hat(phi)
    W2 = W @ W
    eps_s = jnp.abs(sigma) < 1e-6
    eps_t = theta2 < 1e-12
    sig_safe = jnp.where(eps_s, 1.0, sigma)
    t2_safe = jnp.where(eps_t, 1.0, theta2)
    theta = jnp.sqrt(t2_safe)
    A = jnp.where(eps_s, 1.0 + sigma / 2.0, (s - 1.0) / sig_safe)
    a_ = s * jnp.sin(theta)
    b_ = s * jnp.cos(theta)
    c2 = theta2 + sigma * sigma
    c2_safe = jnp.where(c2 < 1e-12, 1.0, c2)
    B_gen = (a_ * sigma + (1.0 - b_) * theta) / (theta * c2_safe)
    C_gen = (A - ((b_ - 1.0) * sigma + a_ * theta) / c2_safe) / t2_safe
    B_s0 = jnp.where(eps_t, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2_safe)
    C_s0 = jnp.where(eps_t, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (t2_safe * theta))
    B_t0 = jnp.where(eps_s, 0.5, (sig_safe * s - s + 1.0) / (sig_safe * sig_safe))
    C_t0 = jnp.where(
        eps_s, 1.0 / 6.0, (0.5 * sig_safe * sig_safe * s + s - 1.0 - sig_safe * s) / (sig_safe ** 3)
    )
    B = jnp.where(eps_s, B_s0, jnp.where(eps_t, B_t0, B_gen))
    C = jnp.where(eps_s, C_s0, jnp.where(eps_t, C_t0, C_gen))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), W.shape)
    return A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * W2


def sim3_log(s, R, t):
    """log: Sim(3) -> [...,7] (rho, phi, sigma). Inverse of sim3_exp."""
    phi = so3_log(R)
    sigma = jnp.log(s)
    Wmat = _sim3_W(phi, sigma, R.dtype)
    rho = jnp.linalg.solve(Wmat, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def quat_to_rot(q):
    """Quaternion [...,4] (x,y,z,w — TUM trajectory order) -> rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = jnp.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def rot_to_quat(R):
    """Rotation matrix -> quaternion [...,4] (x,y,z,w), w >= 0.

    Branch-free Shepperd method via jnp.where over the four cases.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # case w: tr largest
    sw = safe_sqrt(1.0 + tr) * 2.0
    qw0 = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, 0.25 * sw], -1)
    sx = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    qx0 = jnp.stack([0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], -1)
    sy = safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    qy0 = jnp.stack([(m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy, (m02 - m20) / sy], -1)
    sz = safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    qz0 = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz, (m10 - m01) / sz], -1)

    cond_w = (tr > 0.0)[..., None]
    cond_x = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond_y = (m11 >= m22)[..., None]
    q = jnp.where(cond_w, qw0, jnp.where(cond_x, qx0, jnp.where(cond_y, qy0, qz0)))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., 3:4] < 0, -q, q)

"""Reprojection residuals and analytic Jacobians (mono + stereo).

Replaces g2o's edge types (ref: Thirdparty/g2o/g2o/types/types_six_dof_expmap.h,
src/OptimizableTypes.h:31-144, src/G2oTypes.h:339-491) with batched closed
forms. Pose convention: Tcw = (R, t), camera = R @ X_world + t. The update is
LEFT-multiplicative like g2o's VertexSE3Expmap::oplusImpl:
    Tcw' = exp(xi) * Tcw,   xi = (rho, phi)
so  dXc/d rho = I,  dXc/d phi = -hat(Xc),  dXc/dX_world = R.

Stereo residual is (uL, vL, uR) with uR = uL - bf/z (ref:
EdgeStereoSE3ProjectXYZOnlyPose::cam_project). Mono residuals are padded to 3
components with a zero third row so mono/stereo share one batched pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.lie import hat


def project_residuals(R, t, X, uvr, is_stereo, fx, fy, cx, cy, bf):
    """Pinhole residuals+Jacobians for one pose, batched over observations.

    R [...,3,3], t [...,3] (broadcast against X's batch — a single pose or
    one pose per observation); X [N,3] world points; uvr [N,3] measured
    (u, v, uR) (uR ignored for mono rows); is_stereo [N] bool.

    Returns r [N,3], J_pose [N,3,6], J_point [N,3,3], z [N] (camera depth).
    Third residual row is zeroed for mono observations.
    """
    Xc = jnp.einsum("...ij,...j->...i", R, X) + t
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    ur = u - bf * inv_z
    smask = is_stereo.astype(u.dtype)
    r = jnp.stack(
        [u - uvr[..., 0], v - uvr[..., 1], (ur - uvr[..., 2]) * smask], axis=-1
    )
    zeros = jnp.zeros_like(x)
    # d(u,v,ur)/dXc
    du = jnp.stack([fx * inv_z, zeros, -fx * x * inv_z2], axis=-1)
    dv = jnp.stack([zeros, fy * inv_z, -fy * y * inv_z2], axis=-1)
    dur = du + jnp.stack([zeros, zeros, bf * inv_z2], axis=-1)
    Jproj = jnp.stack([du, dv, dur * smask[..., None]], axis=-2)  # [N,3,3]
    # dXc/d(rho,phi) = [I | -hat(Xc)]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), Xc.shape + (3,))
    dX_dxi = jnp.concatenate([eye, -hat(Xc)], axis=-1)  # [N,3,6]
    J_pose = Jproj @ dX_dxi
    J_point = Jproj @ R
    return r, J_pose, J_point, z


def obs_chi2(r, inv_sigma2, is_stereo):
    """Per-observation chi2 with per-level information (ref: Optimizer.cc
    setInformation(I * invSigma2))."""
    n = jnp.sum(r * r, axis=-1)
    return n * inv_sigma2

"""Reprojection residuals and analytic Jacobians, generic over the camera.

Replaces g2o's edge types (ref: Thirdparty/g2o/g2o/types/types_six_dof_expmap.h,
src/OptimizableTypes.h:31-196, src/G2oTypes.h:339-491) with batched closed
forms. Like the reference — which projects EVERY visual edge through the
`GeometricCamera` interface so fisheye optimizes through its true model —
all solvers here take a static `CamSpec` describing the projection:

  * ``pinhole``: (u, v, uR) residuals, uR = uL - bf/z for stereo rows
    (ref: EdgeStereoSE3ProjectXYZOnlyPose::cam_project). Mono rows are
    padded with a zero third component so mono/stereo share one pipeline.
  * ``kb8``: Kannala-Brandt theta-polynomial projection; 2D residuals
    only (a fisheye rig has no common image plane, so the reference
    models the right camera as a SECOND mono camera rigidly attached by
    Trl — EdgeSE3ProjectXYZOnlyPoseToBody, OptimizableTypes.h:59 —
    rather than a uR disparity row). Observations flagged ``is_right``
    are projected through the right camera after the fixed Trl.

Pose convention: Tcw = (R, t), camera = R @ X_world + t. The update is
LEFT-multiplicative like g2o's VertexSE3Expmap::oplusImpl:
    Tcw' = exp(xi) * Tcw,   xi = (rho, phi)
so  dXc/d rho = I,  dXc/d phi = -hat(Xc),  dXc/dX_world = R.

`CamSpec` is a frozen (hashable) dataclass of Python floats: it is a
STATIC argument to the jitted solvers, so each camera rig compiles once
and the pinhole fast path is byte-identical to the pre-generic code.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.lie import hat
from ..cameras.kb8 import kb8_jac, kb8_project


@dataclasses.dataclass(frozen=True)
class CamSpec:
    """Static camera description for optimization residuals.

    kind='pinhole': k/k2/Trl unused (intrinsics ride in the fx..bf scalar
    arguments that every solver already takes).
    kind='kb8': ``k`` = left (k0..k3); for a stereo rig ``k2`` = right
    camera (fx2, fy2, cx2, cy2, k20..k23) and ``Trl`` = 12 row-major
    floats of the right-from-left [R|t] (ref Tracking.cc:95-134 parses
    Camera2.* + Tlr; we store the inverse, matching mTrl in
    OptimizableTypes.h:59).
    """

    kind: str = "pinhole"
    k: tuple = ()
    k2: tuple = ()
    Trl: tuple = ()

    def right_rt(self, dtype):
        T = jnp.asarray(self.Trl, dtype).reshape(3, 4)
        return T[:, :3], T[:, 3]


PINHOLE = CamSpec()


def make_kb8_spec(cam, cam2=None, Trl=None) -> CamSpec:
    """Build a CamSpec from KannalaBrandt8 camera object(s).

    Trl: [3,4] or [4,4] right-from-left extrinsics (numpy)."""
    k2 = ()
    trl = ()
    if cam2 is not None:
        k2 = tuple(cam2.full_params)
    if Trl is not None:
        import numpy as np

        T = np.asarray(Trl, np.float64)
        trl = tuple(T[:3, :4].reshape(-1).tolist())
    return CamSpec(kind="kb8", k=tuple(cam.full_params)[4:], k2=k2, Trl=trl)


def cam_uv_jac(Xc, is_stereo, fx, fy, cx, cy, bf, cam: CamSpec = PINHOLE,
               is_right=None):
    """Project camera-frame points and differentiate wrt Xc.

    Xc [...,3] points in the LEFT camera frame; is_stereo [...] bool
    (pinhole only — selects the uR row). Returns
      uvr  [...,3] predicted (u, v, uR) — third row 0 for mono/kb8,
      Jproj [...,3,3] d(uvr)/dXc (third row zeroed where unused),
      z    [...] depth used for the positivity gate (right-camera depth
           for rig observations — ref isDepthPositive on the projecting
           camera).
    """
    dtype = Xc.dtype
    if cam.kind == "pinhole":
        x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        inv_z = 1.0 / zs
        inv_z2 = inv_z * inv_z
        u = fx * x * inv_z + cx
        v = fy * y * inv_z + cy
        ur = u - bf * inv_z
        smask = is_stereo.astype(dtype)
        uvr = jnp.stack([u, v, ur * smask], axis=-1)
        zeros = jnp.zeros_like(x)
        du = jnp.stack([fx * inv_z, zeros, -fx * x * inv_z2], axis=-1)
        dv = jnp.stack([zeros, fy * inv_z, -fy * y * inv_z2], axis=-1)
        dur = du + jnp.stack([zeros, zeros, bf * inv_z2], axis=-1)
        Jproj = jnp.stack([du, dv, dur * smask[..., None]], axis=-2)
        return uvr, Jproj, z

    assert cam.kind == "kb8", cam.kind
    kl = (fx, fy, cx, cy) + tuple(cam.k)
    uv_l = kb8_project(kl, Xc)
    J_l = kb8_jac(kl, Xc)
    z_l = Xc[..., 2]
    if cam.Trl:
        Rrl, trl = cam.right_rt(dtype)
        Xr = jnp.einsum("ij,...j->...i", Rrl, Xc) + trl
        uv_r = kb8_project(tuple(cam.k2), Xr)
        J_r = kb8_jac(tuple(cam.k2), Xr) @ Rrl  # chain rule through the rig
        right = is_right if is_right is not None else jnp.zeros(
            Xc.shape[:-1], bool
        )
        rm = right[..., None]
        uv = jnp.where(rm, uv_r, uv_l)
        Jp2 = jnp.where(rm[..., None], J_r, J_l)
        z = jnp.where(right, Xr[..., 2], z_l)
    else:
        uv, Jp2, z = uv_l, J_l, z_l
    # third row: scaled-inverse-depth measurement bf/z for observations
    # flagged is_stereo (features whose depth was triangulated across the
    # rig). The pinhole stereo row uR = uL - bf/z pins metric scale the
    # same way; here the pure bf/z part is kept because fisheye cameras
    # share no common image plane for a disparity. Noise scaling matches
    # the disparity row (sigma ~ pixel sigma), so inv_sigma2 applies
    # unchanged. (The reference instead adds right-camera mono edges via
    # Trl — OptimizableTypes.h:59 — which pins scale equivalently; those
    # are available here through is_right when right obs are tracked.)
    zs_l = jnp.where(jnp.abs(z_l) < 1e-6, 1e-6, z_l)
    inv_zl = 1.0 / zs_l
    smask = is_stereo.astype(dtype)
    d_row = (bf * inv_zl * smask)[..., None]
    uvr = jnp.concatenate([uv, d_row], axis=-1)
    zeros = jnp.zeros_like(z_l)
    J_d = jnp.stack([zeros, zeros, -bf * inv_zl * inv_zl * smask],
                    axis=-1)[..., None, :]
    Jproj = jnp.concatenate([Jp2, J_d], axis=-2)
    return uvr, Jproj, z


def cam_residual(Xc, uvr, is_stereo, fx, fy, cx, cy, bf,
                 cam: CamSpec = PINHOLE, is_right=None):
    """(r [N,3], Jproj [N,3,3] = dr/dXc, z [N]) from camera-frame points
    and measured (u, v, uR). Third row zeroed for mono/kb8 rows."""
    pred, Jproj, z = cam_uv_jac(Xc, is_stereo, fx, fy, cx, cy, bf, cam,
                                is_right)
    # zero unused rows of the measurement too (mono third row is garbage).
    # kb8 stereo rows measure bf/z_meas in uvr[...,2] (see cam_uv_jac).
    meas_mask = jnp.ones_like(pred).at[..., 2].set(
        is_stereo.astype(pred.dtype)
    )
    r = (pred - uvr * meas_mask) * meas_mask
    return r, Jproj, z


def project_residuals(R, t, X, uvr, is_stereo, fx, fy, cx, cy, bf,
                      cam: CamSpec = PINHOLE, is_right=None):
    """Residuals+Jacobians for one pose, batched over observations.

    R [...,3,3], t [...,3] (broadcast against X's batch — a single pose or
    one pose per observation); X [N,3] world points; uvr [N,3] measured
    (u, v, uR) (uR ignored for mono rows); is_stereo [N] bool; cam is the
    static camera spec (is_right [N] bool flags rig right-camera
    observations for kb8 stereo).

    Returns r [N,3], J_pose [N,3,6], J_point [N,3,3], z [N] (depth in the
    projecting camera). Unused residual rows are zeroed.
    """
    Xc = jnp.einsum("...ij,...j->...i", R, X) + t
    r, Jproj, z = cam_residual(Xc, uvr, is_stereo, fx, fy, cx, cy, bf,
                               cam, is_right)
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

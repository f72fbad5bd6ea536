"""Kannala-Brandt 4-coefficient equidistant fisheye model.

Ref parity: src/CameraModels/KannalaBrandt8.cpp — theta-polynomial
projection, Newton inversion for unprojection (precision 1e-6), analytic
Jacobians. params = [fx, fy, cx, cy, k0, k1, k2, k3].

The Newton loop runs a fixed iteration count (10, matching the reference's
convergence precision) so it is trace-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import CameraModel


def kb8_project(params, Xc):
    """Functional KB8 projection for use inside jit'd solvers.

    params: 8-tuple (fx, fy, cx, cy, k0, k1, k2, k3) — python floats or
    traced scalars; Xc [...,3] camera-frame points -> [...,2] pixels.
    (ref: KannalaBrandt8.cpp project — theta-polynomial equidistant
    model.)
    """
    fx, fy, cx, cy, k0, k1, k2, k3 = params
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    d = theta * (1.0 + t2 * (k0 + t2 * (k1 + t2 * (k2 + t2 * k3))))
    inv_r = 1.0 / jnp.where(r < 1e-9, 1e-9, r)
    sx = jnp.where(r < 1e-9, 0.0, d * x * inv_r)
    sy = jnp.where(r < 1e-9, 0.0, d * y * inv_r)
    return jnp.stack([fx * sx + cx, fy * sy + cy], axis=-1)


def kb8_jac(params, Xc):
    """Functional analytic 2x3 Jacobian d(uv)/dXc (ref:
    KannalaBrandt8.cpp projectJac)."""
    fx, fy, cx, cy, k0, k1, k2, k3 = params
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(jnp.maximum(r2, 1e-18))
    R2 = jnp.maximum(r2 + z * z, 1e-18)
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    f = theta * (1.0 + t2 * (k0 + t2 * (k1 + t2 * (k2 + t2 * k3))))
    fp = 1.0 + t2 * (3 * k0 + t2 * (5 * k1 + t2 * (7 * k2 + t2 * 9 * k3)))
    dt_dx = x * z / (R2 * r)
    dt_dy = y * z / (R2 * r)
    dt_dz = -r / R2
    inv_r = 1.0 / r
    inv_r3 = inv_r * inv_r * inv_r
    du_dx = fx * (fp * dt_dx * x * inv_r + f * (y * y) * inv_r3)
    du_dy = fx * (fp * dt_dy * x * inv_r - f * x * y * inv_r3)
    du_dz = fx * fp * dt_dz * x * inv_r
    dv_dx = fy * (fp * dt_dx * y * inv_r - f * x * y * inv_r3)
    dv_dy = fy * (fp * dt_dy * y * inv_r + f * (x * x) * inv_r3)
    dv_dz = fy * fp * dt_dz * y * inv_r
    row0 = jnp.stack([du_dx, du_dy, du_dz], axis=-1)
    row1 = jnp.stack([dv_dx, dv_dy, dv_dz], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def kb8_unproject(params, uv, iters: int = 10):
    """Functional Newton inversion (ref: KannalaBrandt8.cpp unproject,
    'precision 1e-6'). Returns [...,3] z=1 rays."""
    fx, fy, cx, cy, k0, k1, k2, k3 = params
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    d = jnp.sqrt(mx * mx + my * my)
    theta = d
    for _ in range(iters):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (k0 + t2 * (k1 + t2 * (k2 + t2 * k3)))) - d
        fp = 1.0 + t2 * (3 * k0 + t2 * (5 * k1 + t2 * (7 * k2 + t2 * 9 * k3)))
        theta = theta - f / jnp.where(jnp.abs(fp) < 1e-9, 1e-9, fp)
    scale = jnp.where(d < 1e-9, 1.0, jnp.tan(theta) / jnp.where(d < 1e-9, 1.0, d))
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


class KannalaBrandt8(CameraModel):
    kind = "kb8"

    def __init__(self, params, width, height, lapping=None):
        p = np.asarray(params, np.float32).ravel()
        super().__init__(p[:4], width, height)
        self.k = p[4:8].astype(np.float32)
        # lapping area [begin, end] in pixels for fisheye-stereo matching
        # (ref: KannalaBrandt8.h:95 mvLappingArea)
        self.lapping = (0, width) if lapping is None else (int(lapping[0]), int(lapping[1]))

    @property
    def spec(self):
        from ..solve.reproj import CamSpec

        return CamSpec(kind="kb8", k=tuple(float(v) for v in self.k))

    @property
    def full_params(self):
        """Static 8-tuple (fx, fy, cx, cy, k0..k3) for the functional API
        (what solve/reproj.py's CamSpec carries)."""
        return tuple(float(v) for v in self.params[:4]) + tuple(
            float(v) for v in self.k
        )

    def project(self, Xc):
        return kb8_project(self.full_params, Xc)

    def project_np(self, Xc):
        """Host (numpy) KB8 projection — the forward model is closed form
        (theta polynomial), so the host orchestration paths avoid a device
        round trip per call."""
        fx, fy, cx, cy, k0, k1, k2, k3 = self.full_params
        Xc = np.asarray(Xc)
        x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
        r = np.sqrt(x * x + y * y)
        theta = np.arctan2(r, z)
        t2 = theta * theta
        d = theta * (1.0 + t2 * (k0 + t2 * (k1 + t2 * (k2 + t2 * k3))))
        inv_r = 1.0 / np.where(r < 1e-9, 1e-9, r)
        sx = np.where(r < 1e-9, 0.0, d * x * inv_r)
        sy = np.where(r < 1e-9, 0.0, d * y * inv_r)
        return np.stack([fx * sx + cx, fy * sy + cy], axis=-1)

    def unproject(self, uv, iters: int = 10):
        return kb8_unproject(self.full_params, uv, iters)

    def project_jac(self, Xc):
        return kb8_jac(self.full_params, Xc)

"""Stereo rectification: undistort-rectify maps + bilinear remap.

Replaces the reference stereo drivers' cv::initUndistortRectifyMap +
cv::remap stage (ref: Examples/Stereo-Inertial/stereo_inertial_euroc.cc:
92-96 builds M1l/M2l/M1r/M2r from the LEFT./RIGHT. {K,D,R,P} YAML blocks
parsed at src/Tracking.cc:274-295, then remaps every frame).

The maps are built once on host (numpy); the per-frame remap is a single
jit'd gather on device, so rectification rides the same dispatch stream as
extraction.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def build_rectify_map(K, D, R, P, height: int, width: int):
    """Source-pixel lookup map for a rectified image, matching
    cv2.initUndistortRectifyMap semantics: for every rectified pixel,
    project its ray back through R^-1, re-apply the radial-tangential
    distortion D = (k1, k2, p1, p2[, k3]), and map through the RAW
    intrinsics K. Returns (map_x, map_y) float32 [H, W]."""
    K = np.asarray(K, np.float64)
    D = np.asarray(D, np.float64).reshape(-1)
    R = np.asarray(R, np.float64)
    P = np.asarray(P, np.float64)
    k1, k2, p1, p2 = D[0], D[1], D[2], D[3]
    k3 = D[4] if len(D) > 4 else 0.0
    fxp, fyp = P[0, 0], P[1, 1]
    cxp, cyp = P[0, 2], P[1, 2]
    v, u = np.mgrid[0:height, 0:width].astype(np.float64)
    x = (u - cxp) / fxp
    y = (v - cyp) / fyp
    ones = np.ones_like(x)
    ray = np.stack([x, y, ones], -1) @ np.linalg.inv(R).T
    xn = ray[..., 0] / ray[..., 2]
    yn = ray[..., 1] / ray[..., 2]
    r2 = xn * xn + yn * yn
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
    map_x = (K[0, 0] * xd + K[0, 2]).astype(np.float32)
    map_y = (K[1, 1] * yd + K[1, 2]).astype(np.float32)
    return map_x, map_y


@jax.jit
def remap_bilinear(img, map_x, map_y):
    """Bilinear sample img at (map_x, map_y); out-of-bounds -> 0
    (cv2.remap BORDER_CONSTANT)."""
    H, W = img.shape
    img = img.astype(jnp.float32)
    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    ax = map_x - x0
    ay = map_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    inb = (map_x >= 0) & (map_x <= W - 1) & (map_y >= 0) & (map_y <= H - 1)

    def at(yi, xi):
        return img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]

    val = (
        at(y0i, x0i) * (1 - ax) * (1 - ay)
        + at(y0i, x0i + 1) * ax * (1 - ay)
        + at(y0i + 1, x0i) * (1 - ax) * ay
        + at(y0i + 1, x0i + 1) * ax * ay
    )
    return jnp.where(inb, val, 0.0)


class StereoRectifier:
    """Holds the four maps; __call__ rectifies an (img_l, img_r) pair."""

    def __init__(self, left: dict, right: dict, height: int, width: int):
        """left/right: dicts with K, D, R, P (the YAML LEFT./RIGHT. blocks;
        per-side height/width may override the output size)."""
        self.maps_l = build_rectify_map(
            left["K"], left["D"], left["R"], left["P"], height, width)
        self.maps_r = build_rectify_map(
            right["K"], right["D"], right["R"], right["P"], height, width)

    def __call__(self, img_l, img_r):
        ml, mr = self.maps_l, self.maps_r
        out_l = remap_bilinear(jnp.asarray(img_l), jnp.asarray(ml[0]),
                               jnp.asarray(ml[1]))
        out_r = remap_bilinear(jnp.asarray(img_r), jnp.asarray(mr[0]),
                               jnp.asarray(mr[1]))
        return np.asarray(out_l), np.asarray(out_r)

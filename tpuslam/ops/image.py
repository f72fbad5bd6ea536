"""Image primitives: separable Gaussian blur, pyramid construction.

TPU-native replacement for the reference's cv::GaussianBlur(7,7,2,2) and
cv::resize pyramid (ref: src/ORBextractor.cc:1114, 1152-1178 ComputePyramid).
Everything is f32, NHWC-free (plain [H,W] grayscale), jit-friendly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel1d(ksize: int = 7, sigma: float = 2.0) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with reflect padding on [H, W] f32.

    Shift-and-add formulation: each 1D pass is a weighted sum of `ksize`
    statically-shifted copies — pure VPU elementwise work that XLA fuses,
    instead of a channels=1 convolution (which maps terribly onto the MXU
    and cost ~5 ms/frame across the pyramid)."""
    k = gaussian_kernel1d(ksize, sigma)
    r = ksize // 2
    h, w = img.shape
    p = jnp.pad(img, ((0, 0), (r, r)), mode="reflect")
    x = sum(float(k[i]) * jax.lax.slice(p, (0, i), (h, i + w))
            for i in range(ksize))
    p = jnp.pad(x, ((r, r), (0, 0)), mode="reflect")
    x = sum(float(k[i]) * jax.lax.slice(p, (i, 0), (i + h, w))
            for i in range(ksize))
    return x


def pyramid_shapes(h: int, w: int, n_levels: int, scale: float):
    """Static per-level (h, w) list, floor-rounded like cv::resize."""
    shapes = []
    for l in range(n_levels):
        s = 1.0 / (scale ** l)
        shapes.append((int(round(h * s)), int(round(w * s))))
    return shapes


def build_pyramid(img, n_levels: int, scale: float):
    """[H,W] f32 -> list of per-level images (static shapes).

    Level l is resized from level l-1 (cascaded, like the reference's
    ComputePyramid) with bilinear interpolation.
    """
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale)
    levels = [img]
    for l in range(1, n_levels):
        prev = levels[-1]
        levels.append(
            jax.image.resize(prev, shapes[l], method="bilinear")
        )
    return levels

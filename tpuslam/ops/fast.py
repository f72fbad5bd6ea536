"""FAST-9/16 corner detection as pure vector ops (VPU-shaped).

TPU-native replacement for cv::FAST as used by the reference extractor
(ref: src/ORBextractor.cc:808-840). Instead of per-pixel branchy scanning,
the whole image is processed as 16 statically-shifted planes; the
"9 contiguous of 16" arc test and the FAST score (max threshold that keeps
the pixel a corner) are computed with log-depth windowed min/max reductions.

Score definition matches OpenCV: V = max over arcs of min |I_arc - I_p|,
which is exactly the largest threshold at which the corner survives.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Bresenham circle radius 3, clockwise from 12 o'clock (OpenCV order)
CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)  # (dx, dy)


def _shifted_planes(img):
    """[H,W] -> [16,H,W] where plane k is I(x+dx_k, y+dy_k); border pixels
    are garbage and must be masked by the caller (3px margin)."""
    h, w = img.shape
    p = jnp.pad(img, 3, mode="edge")
    planes = [
        jax.lax.dynamic_slice(p, (3 + int(dy), 3 + int(dx)), (h, w))
        for dx, dy in CIRCLE
    ]
    return jnp.stack(planes, axis=0)


def _window9_reduce(x, op):
    """Windowed reduce of length 9 over the ring axis 0 (len 16).

    x: [16,H,W]. Returns [16,H,W] where out[r] = op over x[r..r+8 mod 16].
    log-depth: win1(=1) -> 2 -> 4 -> 8 -> 9.
    """
    ext = jnp.concatenate([x, x[:8]], axis=0)  # [24,...]
    w2 = op(ext[:-1], ext[1:])      # [23], window 2
    w4 = op(w2[:-2], w2[2:])        # [21], window 4
    w8 = op(w4[:-4], w4[4:])        # [17], window 8
    w9 = op(w8[:-1], ext[8:])       # [16], window 9 = window8 at r  + x[r+8]
    return w9


def fast_score(img):
    """FAST-9/16 score map [H,W] f32 (0 where not a corner at any threshold).

    score = max over the 16 arcs of min(diff) for bright arcs and
    min(-diff) for dark arcs; a pixel is a FAST corner at threshold t
    iff score > t.
    """
    planes = _shifted_planes(img)
    diff = planes - img[None]
    bright = _window9_reduce(diff, jnp.minimum).max(axis=0)
    dark = _window9_reduce(-diff, jnp.minimum).max(axis=0)
    score = jnp.maximum(bright, dark)
    score = jnp.maximum(score, 0.0)
    # mask 3px border
    h, w = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(valid, score, 0.0)


def nms3x3(score):
    """3x3 non-max suppression: keep score where it equals the local max.

    Ties within a 3x3 window are broken towards the lexicographically first
    pixel (top-left), avoiding duplicate adjacent corners on plateaus.
    """
    h, w = score.shape
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    is_max = score >= m
    # plateau tie-break: add a tiny index-based epsilon before comparing
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    eps = (-(ys * w + xs)).astype(score.dtype) * 1e-7
    s2 = jnp.where(score > 0, score + eps, score)
    m2 = jax.lax.reduce_window(s2, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    is_max = s2 >= m2
    return jnp.where(is_max, score, 0.0)


def cell_threshold_gate(score, ini_th: float, min_th: float, cell: int = 32):
    """Reference cell semantics (ORBextractor.cc:808-840): detect per 30px
    cell with iniTh; if a cell yields nothing, retry with minTh. Vectorized:
    in cells with any corner >= ini_th keep only those; elsewhere keep
    corners >= min_th.
    """
    h, w = score.shape
    ph = (-h) % cell
    pw = (-w) % cell
    sp = jnp.pad(score, ((0, ph), (0, pw)))
    cells = sp.reshape((h + ph) // cell, cell, (w + pw) // cell, cell)
    cell_max = cells.max(axis=(1, 3))
    has_ini = jnp.repeat(jnp.repeat(cell_max >= ini_th, cell, 0), cell, 1)[:h, :w]
    keep = jnp.where(has_ini, score >= ini_th, score >= min_th)
    return jnp.where(keep, score, 0.0)

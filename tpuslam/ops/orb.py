"""ORB feature extraction: pyramid FAST + oriented BRIEF, fully batched.

TPU-native replacement for the reference ORBextractor (src/ORBextractor.cc):
  - 8-level pyramid, scale 1.2 (ComputePyramid, :1152)
  - per-cell FAST with ini/min thresholds (ComputeKeyPointsOctTree, :763)
  - quadtree spatial distribution (DistributeOctTree, :537) re-expressed as
    per-cell top-1 + per-level top-K by response — a static-shape,
    TPU-shaped equivalent that preserves spatial uniformity
  - intensity-centroid orientation (IC_Angle, :75)
  - rBRIEF 256-pair descriptors on the blurred image (computeOrbDescriptor,
    :106). The reference uses OpenCV's learned pattern; we generate our own
    deterministic Gaussian pattern (BRIEF-style, sigma = patch/5) since the
    whole stack is self-consistent — descriptors never have to be
    bit-compatible with OpenCV.

Output is a fixed-capacity FeatureSet (struct-of-arrays + validity mask).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from .image import build_pyramid, gaussian_blur
from .fast import fast_score, nms3x3, cell_threshold_gate
from .patch_pallas import extract_patches

HALF_PATCH = 15  # IC-angle circular patch radius (ref: ORBextractor.cc:70 PATCH_SIZE 31)
DESC_R = 18      # descriptor patch radius: 13*sqrt(2) ~ 18.4 rounded in
PAD = DESC_R + 1


def _make_pattern(seed: int = 42, n_bits: int = 256, sigma: float = 6.2):
    """Deterministic BRIEF pattern: [n_bits, 2, 2] int32 (pairs of (dx,dy)),
    Gaussian-distributed, clipped to radius 13 so any rotation stays within
    the DESC_R patch."""
    rs = np.random.RandomState(seed)
    pts = np.clip(np.round(rs.randn(n_bits, 2, 2) * sigma), -13, 13).astype(np.int32)
    return pts


PATTERN = _make_pattern()

# Steered BRIEF via quantized orientations (the ORB paper's own design:
# the pattern is pre-rotated in 2pi/30 increments and looked up — we use 32
# bins for alignment). Each bin's sampling becomes a {-1,0,+1} matrix over
# the flattened patch, so descriptor extraction for ALL keypoints is ONE
# MXU matmul (patches [K, side^2] @ LUT [side^2, B*256]) instead of
# K x 512 random in-patch gathers (which cost ~6 ms/frame on TPU).
N_ANGLE_BINS = 32


def _make_desc_lut() -> np.ndarray:
    """Per-bin sampling matrices with BILINEAR sub-pixel taps.

    Rounding the rotated sample coordinates to integer pixels (the obvious
    LUT construction) makes neighboring bins differ by whole-pixel jumps,
    so a descriptor changes brutally when the noisy IC angle crosses a bin
    boundary. Bilinear taps make each pair's sampling continuous in the
    rotation angle; combined with the bin LERP in
    _descriptors_from_patches the effective sampling is smooth, matching
    the stability of the reference's float sin/cos rotation
    (ORBextractor.cc:106 GET_VALUE)."""
    side = 2 * DESC_R + 1
    B = N_ANGLE_BINS
    lut = np.zeros((side * side, B * 256), np.float32)
    for b in range(B):
        ang = 2.0 * np.pi * b / B
        c, s = np.cos(ang), np.sin(ang)
        rx = PATTERN[..., 0] * c - PATTERN[..., 1] * s     # [256, 2] float
        ry = PATTERN[..., 0] * s + PATTERN[..., 1] * c
        cols = b * 256 + np.arange(256)
        for pt, sign in ((1, 1.0), (0, -1.0)):             # + v1, - v0
            x = rx[:, pt] + DESC_R
            y = ry[:, pt] + DESC_R
            x0 = np.floor(x).astype(int)
            y0 = np.floor(y).astype(int)
            fx_ = x - x0
            fy_ = y - y0
            for dy, dx, w in (
                (0, 0, (1 - fy_) * (1 - fx_)),
                (0, 1, (1 - fy_) * fx_),
                (1, 0, fy_ * (1 - fx_)),
                (1, 1, fy_ * fx_),
            ):
                flat = (y0 + dy) * side + (x0 + dx)
                np.add.at(lut, (flat, cols), sign * w)
    return lut


_DESC_LUT = _make_desc_lut()

# circular mask and coordinate grids for IC angle
_yy, _xx = np.mgrid[-HALF_PATCH : HALF_PATCH + 1, -HALF_PATCH : HALF_PATCH + 1]
_CIRC_MASK = (_xx ** 2 + _yy ** 2 <= HALF_PATCH ** 2).astype(np.float32)
_IC_X = (_xx * _CIRC_MASK).astype(np.float32)
_IC_Y = (_yy * _CIRC_MASK).astype(np.float32)


@dataclasses.dataclass
class OrbConfig:
    n_features: int = 1000
    n_levels: int = 8
    scale: float = 1.2
    ini_th: float = 20.0
    min_th: float = 7.0
    cell: int = 16          # selection cell (px)
    th_cell: int = 32       # ini/min threshold cell (ref uses 30px windows)

    def level_budgets(self):
        f = 1.0 / self.scale
        w = np.array([f ** l for l in range(self.n_levels)])
        n = np.floor(self.n_features * w / w.sum()).astype(int)
        n[-1] += self.n_features - n.sum()
        return [int(v) for v in n]

    def level_scales(self):
        return [self.scale ** l for l in range(self.n_levels)]


def _select_level_keypoints(score, budget: int, cell: int):
    """Per-cell top-1 then top-`budget` by response. Returns (xy[K,2] i32,
    resp[K]) with resp==0 marking invalid slots."""
    h, w = score.shape
    ph, pw = (-h) % cell, (-w) % cell
    sp = jnp.pad(score, ((0, ph), (0, pw)))
    hc, wc = (h + ph) // cell, (w + pw) // cell
    cells = sp.reshape(hc, cell, wc, cell).transpose(0, 2, 1, 3).reshape(hc * wc, cell * cell)
    cmax = cells.max(axis=1)
    carg = cells.argmax(axis=1).astype(jnp.int32)
    cy = carg // cell + (jnp.arange(hc * wc, dtype=jnp.int32) // wc) * cell
    cx = carg % cell + (jnp.arange(hc * wc, dtype=jnp.int32) % wc) * cell
    k = min(budget, hc * wc)
    top, idx = jax.lax.top_k(cmax, k)
    xy = jnp.stack([cx[idx], cy[idx]], axis=-1)
    resp = jnp.where(top > 0, top, 0.0)
    if k < budget:  # pad to the static budget
        xy = jnp.pad(xy, ((0, budget - k), (0, 0)))
        resp = jnp.pad(resp, (0, budget - k))
    return xy, resp


def _level_patches(blur_padded, xy):
    """One gather per level: [K, 37, 37] descriptor-radius patches (the
    31x31 IC-angle window sits at offset +3 inside). On TPU this is the
    scalar-prefetch DMA kernel (ops/patch_pallas.py; see its module
    docstring for the measured comparison vs the XLA gather)."""
    yx0 = jnp.stack([xy[:, 1], xy[:, 0]], axis=-1) + (PAD - DESC_R)
    return extract_patches(blur_padded, yx0, 2 * DESC_R + 1)


def _ic_angles_from_patches(p37):
    """Intensity-centroid angle (rad) from [K,37,37] patches
    (ref: ORBextractor.cc:75 IC_Angle, as two mask contractions)."""
    off = DESC_R - HALF_PATCH
    n = 2 * HALF_PATCH + 1
    inner = p37[:, off : off + n, off : off + n]
    # HIGHEST precision: the default bf16 matmul truncation perturbs the
    # moments enough to rotate descriptors ~1.7e-3 rad vs the exact sum
    m10 = jnp.einsum("kij,ij->k", inner, jnp.asarray(_IC_X),
                     precision=jax.lax.Precision.HIGHEST)
    m01 = jnp.einsum("kij,ij->k", inner, jnp.asarray(_IC_Y),
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.arctan2(m01, m10)


def _descriptors_from_patches(patches, angles):
    """rBRIEF bits [K,256] uint8 via the quantized-rotation LUT matmul
    (steered BRIEF, ref computeOrbDescriptor ORBextractor.cc:106; the
    2pi/30-quantized pre-rotated pattern is the original ORB formulation).

    diff[k, b, f] = v1 - v0 of pair f under rotation bin b. The keypoint's
    diff is LERPed between its two neighboring bins before thresholding:
    hard nearest-bin selection makes descriptors jump when the (noisy)
    IC angle crosses a bin boundary — measured median Hamming distance of
    true correspondences is ~9 within a bin but ~45 across a bin flip,
    and ~1/3 of adjacent-frame pairs flip. Interpolation makes bits vary
    continuously with angle like the reference's float sin/cos rotation."""
    B = N_ANGLE_BINS
    lut = jnp.asarray(_DESC_LUT, jnp.bfloat16)
    diff = jnp.dot(patches.astype(jnp.bfloat16), lut,
                   preferred_element_type=jnp.float32)     # [K, B*256]
    diff = diff.reshape(-1, B, 256)
    a = angles / (2.0 * np.pi / B)
    b0 = jnp.floor(a)
    frac = (a - b0).astype(diff.dtype)
    b0 = jnp.mod(b0.astype(jnp.int32), B)
    b1 = jnp.mod(b0 + 1, B)
    # bin LERP as a one-hot contraction — take_along_axis would be a
    # per-row gather (a sequential while-loop on TPU); this is one fused
    # multiply-reduce on the VPU
    bins = jnp.arange(B, dtype=jnp.int32)
    w = (1.0 - frac[:, None]) * (bins[None, :] == b0[:, None]) + frac[
        :, None
    ] * (bins[None, :] == b1[:, None])
    sel = jnp.einsum("kb,kbf->kf", w.astype(diff.dtype), diff)
    return (sel > 0).astype(jnp.uint8)


def _descriptors(blur_padded, xy, angles):
    """rBRIEF bits [K,256] uint8 from the blurred, padded level image."""
    p = _level_patches(blur_padded, xy)
    return _descriptors_from_patches(p.reshape(p.shape[0], -1), angles)


def pack_bits(bits):
    """[...,256] {0,1} -> [...,8] uint32 (little-endian within each word)."""
    b = bits.astype(jnp.uint32).reshape(bits.shape[:-1] + (8, 32))
    pows = jnp.asarray((1 << np.arange(32, dtype=np.uint64)).astype(np.uint32))
    return jnp.sum(b * pows, axis=-1, dtype=jnp.uint32)


def _extract_impl(img, cfg: OrbConfig, ini_th: float, min_th: float):
    levels = build_pyramid(img.astype(jnp.float32), cfg.n_levels, cfg.scale)
    budgets = cfg.level_budgets()
    scales = cfg.level_scales()
    out = {"xy": [], "resp": [], "angle": [], "octave": [], "size": []}
    patches = []
    for l, (im, budget, sc) in enumerate(zip(levels, budgets, scales)):
        score = fast_score(im)
        score = cell_threshold_gate(score, ini_th, min_th, cell=cfg.th_cell)
        score = nms3x3(score)
        # keep keypoints whose descriptor patch fits: margin EDGE=16 like the
        # reference EDGE_THRESHOLD=19 minus the 3px FAST border already gone
        h, w = im.shape
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        margin = HALF_PATCH + 1
        ok = (ys >= margin) & (ys < h - margin) & (xs >= margin) & (xs < w - margin)
        score = jnp.where(ok, score, 0.0)
        xy, resp = _select_level_keypoints(score, budget, cfg.cell)
        blur = gaussian_blur(im)
        pad_blur = jnp.pad(blur, PAD, mode="edge")
        # IC angle on the BLURRED image: the reference uses the raw level
        # (ORBextractor.cc:1114 computes descriptors on blurred, angles on
        # raw), but on weakly-structured patches the raw-image moments are
        # noise-dominated and the angle jitters frame-to-frame, which
        # rotates the whole descriptor; blurring stabilizes it measurably.
        p37 = _level_patches(pad_blur, xy)
        ang = _ic_angles_from_patches(p37)
        patches.append(p37.reshape(p37.shape[0], -1))
        out["xy"].append(xy.astype(jnp.float32) * sc)
        out["resp"].append(resp)
        out["angle"].append(ang)
        out["octave"].append(jnp.full((budget,), l, jnp.int32))
        out["size"].append(jnp.full((budget,), 31.0 * sc, jnp.float32))
    res = {k: jnp.concatenate(v, axis=0) for k, v in out.items()}
    # one LUT matmul for every level's keypoints (MXU; see _make_desc_lut)
    res["bits"] = _descriptors_from_patches(
        jnp.concatenate(patches, axis=0), res["angle"])
    res["valid"] = res["resp"] > 0
    res["packed"] = pack_bits(res["bits"])
    return res


class OrbExtractor:
    """Builds a jit'd extractor for a fixed image size + config.

    extract(img) -> dict:
      xy [N,2] f32 level-0 pixel coords; resp [N]; angle [N] rad;
      octave [N] i32; size [N]; valid [N] bool; bits [N,256] u8;
      packed [N,8] u32.   N == cfg.n_features.
    """

    # compiled programs shared across instances (a new System must not
    # recompile extraction: the programs depend only on (H, W, config))
    _CACHE: dict = {}

    def __init__(self, height: int, width: int, cfg: OrbConfig | None = None):
        self.cfg = cfg or OrbConfig()
        self.height, self.width = height, width
        key = (height, width, dataclasses.astuple(self.cfg))
        if key not in OrbExtractor._CACHE:
            cfg_ = self.cfg

            def _impl(img, ini_th, min_th):
                return _extract_impl(img, cfg_, ini_th, min_th)

            # batched variant: both stereo images in ONE dispatch
            # (replaces the reference's L/R extraction thread pair,
            # src/Frame.cc:109-112 — on TPU the batch dimension
            # parallelizes instead of threads)
            OrbExtractor._CACHE[key] = (
                jax.jit(functools.partial(_extract_impl, cfg=cfg_)),
                jax.jit(jax.vmap(_impl, in_axes=(0, None, None))),
            )
        self._fn, self._fn_batch = OrbExtractor._CACHE[key]

    def __call__(self, img, ini_th=None, min_th=None) -> dict[str, Any]:
        assert img.shape == (self.height, self.width)
        return self._fn(
            img,
            ini_th=float(ini_th if ini_th is not None else self.cfg.ini_th),
            min_th=float(min_th if min_th is not None else self.cfg.min_th),
        )

    def extract_pair(self, img_l, img_r, ini_th=None, min_th=None):
        """One kernel launch over a [2, H, W] batch; returns (out_l, out_r)
        dicts with the same fields as __call__."""
        batch = jnp.stack([jnp.asarray(img_l, jnp.float32),
                           jnp.asarray(img_r, jnp.float32)])
        out = self._fn_batch(
            batch,
            float(ini_th if ini_th is not None else self.cfg.ini_th),
            float(min_th if min_th is not None else self.cfg.min_th),
        )
        out_l = {k: v[0] for k, v in out.items()}
        out_r = {k: v[1] for k, v in out.items()}
        return out_l, out_r

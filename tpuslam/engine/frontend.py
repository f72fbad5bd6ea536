"""Frame construction: ORB extraction + undistortion + normalized coords.

Replaces the reference Frame constructors (src/Frame.cc:88/192/275) —
the device does extraction in one jit'd dispatch; host keeps numpy views.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..cameras.base import CameraModel
from ..map.store import FrameFeatures
from ..ops.orb import OrbExtractor, OrbConfig


class Frontend:
    def __init__(self, camera: CameraModel, orb_cfg: OrbConfig,
                 bf: float = 0.0):
        self.camera = camera
        self.extractor = OrbExtractor(camera.height, camera.width, orb_cfg)
        self.orb_cfg = orb_cfg
        self.bf = bf
        self.scale_factors = orb_cfg.scale ** np.arange(orb_cfg.n_levels)

    def _extract_raw(self, img):
        return self.extractor(jnp.asarray(img, jnp.float32))

    def process_stereo(self, img_l, img_r) -> FrameFeatures:
        """Stereo frame: extract both images, row-banded stereo match for
        per-feature depth (ref: stereo Frame ctor Frame.cc:88 + L/R
        extraction threads :109-112 + ComputeStereoMatches :802)."""
        from ..ops.stereo import (depth_from_disparity, sad_refine_pyramid,
                                  stereo_match)

        # both images through ONE batched extraction dispatch (replaces the
        # reference's L/R std::thread pair, Frame.cc:109-112)
        out_l, out_r = self.extractor.extract_pair(img_l, img_r)
        f = self._features_from(out_l)
        u_r, disp, ok = stereo_match(
            jnp.asarray(f.bits), out_r["bits"],
            jnp.asarray(f.xy), out_r["xy"],
            jnp.asarray(f.octave), out_r["octave"],
            jnp.asarray(f.valid), out_r["valid"],
            jnp.asarray(self.scale_factors.astype(np.float32)),
            0.3, float(self.camera.fx),
        )
        # SAD sub-pixel refinement + median-SAD outlier filter
        # (ref: Frame.cc:869-975 — thDist = 1.5 * 1.4 * median)
        u_r, sad, ok = sad_refine_pyramid(
            jnp.asarray(img_l, jnp.float32), jnp.asarray(img_r, jnp.float32),
            jnp.asarray(f.xy), jnp.asarray(f.octave), u_r, ok,
            n_levels=self.orb_cfg.n_levels, scale=float(self.orb_cfg.scale))
        okn = np.asarray(ok)
        sadn = np.asarray(sad)
        if okn.any():
            th = 1.5 * 1.4 * np.median(sadn[okn])
            okn = okn & (sadn < th)
        u_rn = np.asarray(u_r)
        disp = f.xy[:, 0] - u_rn
        okn = okn & (disp > 1e-3)
        z = np.asarray(depth_from_disparity(jnp.asarray(disp), self.bf))
        f.depth = np.where(okn, z, -1.0)
        f.u_right = np.where(okn, u_rn, -1.0)
        return f

    def process_stereo_fisheye(self, img_l, img_r, camera_r, R_rl, t_rl):
        """Fisheye (KB8) stereo frame: BF ratio matching within the lapping
        areas + two-ray triangulation for per-feature depth (ref: fisheye
        Frame ctor Frame.cc:1034, ComputeStereoFishEyeMatches :1128 —
        BFMatcher knn + Lowe 0.7 — and KannalaBrandt8::TriangulateMatches
        KannalaBrandt8.cpp:334 with reprojection/parallax gates).

        R_rl, t_rl: right<-left extrinsic. Depth is stored, and u_right
        carries the scaled-inverse-depth measurement bf/z that forms the
        third residual row of KB8 stereo observations (solve/reproj.py
        cam_uv_jac) — the scale anchor the reference gets from its
        right-camera edges."""
        import jax
        from ..ops import match as M
        from ..ops.twoview import triangulate_batch

        f = self.process(img_l)
        out_r = self._extract_raw(img_r)
        xy_r = np.asarray(out_r["xy"])
        valid_r = np.asarray(out_r["valid"])
        bits_r = np.asarray(out_r["bits"])
        lap_l = self.camera.lapping if hasattr(self.camera, "lapping") else \
            (0, self.camera.width)
        lap_r = camera_r.lapping if hasattr(camera_r, "lapping") else \
            (0, camera_r.width)
        in_lap_l = (f.xy[:, 0] >= lap_l[0]) & (f.xy[:, 0] <= lap_l[1])
        in_lap_r = (xy_r[:, 0] >= lap_r[0]) & (xy_r[:, 0] <= lap_r[1])
        mask = (f.valid & in_lap_l)[:, None] & (valid_r & in_lap_r)[None, :]
        midx, _ = M.match_padded(
            f.bits, bits_r, mask, max_dist=M.TH_HIGH, nn_ratio=0.7)
        il = np.nonzero(midx >= 0)[0]
        depth = np.full(f.n, -1.0)
        if len(il):
            ir = midx[il]
            rays_r = np.asarray(camera_r.unproject(jnp.asarray(xy_r[ir])))
            x1 = f.norm_xy[il]
            x2 = rays_r[:, :2] / np.maximum(rays_r[:, 2:3], 1e-9)
            X = np.asarray(triangulate_batch(
                jnp.asarray(np.eye(3)), jnp.zeros(3),
                jnp.asarray(np.asarray(R_rl, np.float64)),
                jnp.asarray(np.asarray(t_rl, np.float64)),
                jnp.asarray(x1), jnp.asarray(x2)))
            Xr = X @ np.asarray(R_rl).T + np.asarray(t_rl)
            # gates (ref TriangulateMatches): cheirality, parallax,
            # reprojection in both cameras
            uv_l = self.camera.project_np(X)
            uv_r2 = np.asarray(camera_r.project(jnp.asarray(Xr)))
            e_l = np.sum((uv_l - f.und_xy[il]) ** 2, 1)
            e_r = np.sum((uv_r2 - xy_r[ir]) ** 2, 1)
            r1 = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-9)
            O2 = -np.asarray(R_rl).T @ np.asarray(t_rl)
            v2 = X - O2[None]
            v2 = v2 / np.maximum(np.linalg.norm(v2, axis=1, keepdims=True), 1e-9)
            cosp = np.sum(r1 * v2, 1)
            # parallax gate scaled for a short stereo baseline: reject only
            # near-degenerate rays (depth >> baseline still has usable
            # parallax; 0.9998 is the mono-init threshold, too strict here)
            ok = (X[:, 2] > 0.05) & (Xr[:, 2] > 0.05) & (e_l < 5.991) \
                & (e_r < 5.991) & (cosp < 0.99998)
            depth[il[ok]] = X[ok, 2]
        f.depth = depth
        # only flag features as stereo when bf is calibrated: with bf == 0
        # every depth-valid feature would get u_right = 0 >= 0 and a
        # degenerate zero third residual row under the looser stereo chi2
        f.u_right = np.where((depth > 0) & (self.bf > 0),
                             self.bf / np.maximum(depth, 1e-6), -1.0)
        return f

    def process_rgbd(self, img, depth_map,
                     depth_factor: float = 1.0) -> FrameFeatures:
        """RGB-D frame (ref: RGB-D Frame ctor Frame.cc:192 +
        ComputeStereoFromRGBD :983)."""
        from ..ops.stereo import rgbd_to_stereo

        f = self.process(img)
        z, u_r = rgbd_to_stereo(f.xy, np.asarray(depth_map), self.bf,
                                depth_factor)
        f.depth = np.where(z > 0, z, -1.0)
        f.u_right = np.where(z > 0, u_r, -1.0)
        return f

    def process(self, img) -> FrameFeatures:
        out = self.extractor(jnp.asarray(img, jnp.float32))
        return self._features_from(out)

    def _features_from(self, out) -> FrameFeatures:
        xy = np.asarray(out["xy"])
        und = self.camera.undistort_points(jnp.asarray(xy)) if hasattr(
            self.camera, "undistort_points"
        ) else jnp.asarray(xy)
        rays = self.camera.unproject(und)
        und = np.asarray(und)
        norm = np.asarray(rays)[..., :2]
        return FrameFeatures(
            xy=xy,
            und_xy=und,
            norm_xy=norm,
            octave=np.asarray(out["octave"]),
            angle=np.asarray(out["angle"]),
            response=np.asarray(out["resp"]),
            bits=np.asarray(out["bits"]),
            packed=np.asarray(out["packed"]),
            valid=np.asarray(out["valid"]),
        )

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

    def process_stereo(self, img_l, img_r) -> FrameFeatures:
        """Stereo frame: extract both images, row-banded stereo match for
        per-feature depth (ref: stereo Frame ctor Frame.cc:88 + L/R
        extraction threads :109-112 + ComputeStereoMatches :802)."""
        from ..ops.stereo import depth_from_disparity, stereo_match

        f = self.process(img_l)
        out_r = self.extractor(jnp.asarray(img_r, jnp.float32))
        u_r, disp, ok = stereo_match(
            jnp.asarray(f.bits), out_r["bits"],
            jnp.asarray(f.xy), out_r["xy"],
            jnp.asarray(f.octave), out_r["octave"],
            jnp.asarray(f.valid), out_r["valid"],
            jnp.asarray(self.scale_factors.astype(np.float32)),
            0.3, float(self.camera.fx),
        )
        z = depth_from_disparity(disp, self.bf)
        okn = np.asarray(ok)
        f.depth = np.where(okn, np.asarray(z), -1.0)
        f.u_right = np.where(okn, np.asarray(u_r), -1.0)
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

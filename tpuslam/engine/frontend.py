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
    def __init__(self, camera: CameraModel, orb_cfg: OrbConfig):
        self.camera = camera
        self.extractor = OrbExtractor(camera.height, camera.width, orb_cfg)
        self.orb_cfg = orb_cfg

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

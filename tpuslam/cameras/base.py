"""Camera model interface — vectorized project/unproject/Jacobian.

TPU-native analogue of the reference's GeometricCamera virtual interface
(ref: include/CameraModels/GeometricCamera.h:58-96). All methods are pure
functions over batched arrays so they can live inside jit'd kernels; the
class only carries static calibration parameters (baked in at trace time).
"""

from __future__ import annotations

import numpy as np


class CameraModel:
    """Base: subclasses implement project / unproject / project_jac."""

    kind = "base"

    def __init__(self, params, width: int, height: int):
        self.params = np.asarray(params, dtype=np.float32)
        self.width = int(width)
        self.height = int(height)

    # fx, fy, cx, cy are always the first four parameters
    @property
    def fx(self):
        return float(self.params[0])

    @property
    def fy(self):
        return float(self.params[1])

    @property
    def cx(self):
        return float(self.params[2])

    @property
    def cy(self):
        return float(self.params[3])

    def K(self):
        return np.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]], dtype=np.float32
        )

    @property
    def spec(self):
        """Static CamSpec for the optimization residuals (solve/reproj.py)
        — the analogue of handing the reference's g2o edges a
        GeometricCamera pointer. Pinhole solvers take intrinsics via the
        fx..bf scalars, so the base spec carries no parameters."""
        from ..solve.reproj import PINHOLE

        return PINHOLE

    def project(self, Xc):
        """[...,3] camera-frame points -> [...,2] pixels."""
        raise NotImplementedError

    def project_np(self, Xc):
        """Host (numpy, f64) projection for the mapping/tracking host
        paths: a small projection is ~µs on host but a full dispatch +
        fetch round trip (~2x tunnel RTT) on an attached accelerator —
        the host orchestration must not pay that per call site."""
        import jax.numpy as jnp  # default: route through the device impl
        return np.asarray(self.project(jnp.asarray(Xc)))

    def unproject(self, uv):
        """[...,2] pixels -> [...,3] unit-depth rays (z=1 normalized)."""
        raise NotImplementedError

    def project_jac(self, Xc):
        """d(uv)/d(Xc): [...,2,3]."""
        raise NotImplementedError

"""System facade — the public API.

Mirrors the reference System (include/System.h:85-189): constructor wires
tracker + local mapper (+ loop closer when present), TrackMonocular/
TrackStereo/TrackRGBD entry points, trajectory export in TUM format,
Shutdown, state queries.
"""

from __future__ import annotations

import enum

import numpy as np

from ..core import lie
from ..map.store import SlamMap
from .config import SlamConfig
from .local_mapping import LocalMapper
from .tracking import Tracker, State
import jax.numpy as jnp


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2
    IMU_MONOCULAR = 3
    IMU_STEREO = 4


class System:
    def __init__(self, camera, cfg: SlamConfig | None = None,
                 sensor: Sensor = Sensor.MONOCULAR):
        self.cfg = cfg or SlamConfig()
        self.camera = camera
        self.sensor = sensor
        self.map = SlamMap(self.cfg.orb.n_features)
        self.local_mapper = LocalMapper(camera, self.cfg, self.map)
        self.tracker = Tracker(
            camera, self.cfg, self.map, self.local_mapper,
            sensor="mono" if sensor == Sensor.MONOCULAR else "stereo",
        )

    # ------------------------------------------------------------------ API
    def track_monocular(self, img, timestamp: float):
        """Returns Tcw 4x4 (or None before initialization)
        (ref: System::TrackMonocular System.cc:352)."""
        frame = self.tracker.track(img, timestamp)
        if frame.R is None:
            return None
        T = np.eye(4)
        T[:3, :3] = frame.R
        T[:3, 3] = frame.t
        return T

    def get_tracking_state(self):
        return self.tracker.state

    def shutdown(self):
        pass  # synchronous engine: nothing to join

    # ------------------------------------------------------------ trajectory
    def trajectory_tum(self):
        """[(t, x, y, z, qx, qy, qz, qw)] camera-to-world per tracked frame
        (ref format: System::SaveTrajectoryTUM System.cc:514)."""
        rows = []
        for (t, R, tr, ref_kf, lost) in self.tracker.trajectory:
            Rwc, twc = lie.se3_inverse(jnp.asarray(R), jnp.asarray(tr))
            q = np.asarray(lie.rot_to_quat(Rwc))
            p = np.asarray(twc)
            rows.append((t, p[0], p[1], p[2], q[0], q[1], q[2], q[3]))
        return rows

    def save_trajectory_tum(self, path: str):
        with open(path, "w") as fh:
            for row in self.trajectory_tum():
                fh.write(" ".join(f"{v:.9f}" for v in row) + "\n")

    def keyframe_trajectory_tum(self):
        rows = []
        m = self.map
        for k in m.valid_kf_ids():
            Rwc, twc = lie.se3_inverse(jnp.asarray(m.kf_R[k]), jnp.asarray(m.kf_t[k]))
            q = np.asarray(lie.rot_to_quat(Rwc))
            p = np.asarray(twc)
            rows.append((m.kf_time[k], p[0], p[1], p[2], q[0], q[1], q[2], q[3]))
        return rows

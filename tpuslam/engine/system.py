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
                 sensor: Sensor = Sensor.MONOCULAR, imu_calib=None,
                 vocab=None, bf: float = 0.0, async_mapping: bool = False,
                 camera2=None, Tlr=None):
        """vocab: a place.BinaryVocabulary; enables loop closing and BoW
        relocalization (ref: System ctor loads ORBvoc, System.cc:85).
        bf: fx * baseline in pixels (ref Camera.bf) for stereo/RGB-D.
        async_mapping: run local mapping + loop closing on a worker thread
        (the reference's LocalMapping/LoopClosing threads; visual-only).
        camera2/Tlr: the right camera of a fisheye (KB8) stereo rig and
        the left<-right extrinsic 4x4 (ref Camera2.* + Tlr YAML keys,
        src/Tracking.cc:95-134) — enables the fisheye stereo path."""
        self.cfg = cfg or SlamConfig()
        self.camera = camera
        self.camera2 = camera2
        self.sensor = sensor
        use_imu = sensor in (Sensor.IMU_MONOCULAR, Sensor.IMU_STEREO)
        if use_imu and imu_calib is None:
            raise ValueError("inertial sensor requires imu_calib")
        self.map = SlamMap(self.cfg.orb.n_features)
        mono = sensor in (Sensor.MONOCULAR, Sensor.IMU_MONOCULAR)
        self.local_mapper = LocalMapper(
            camera, self.cfg, self.map,
            imu_calib=imu_calib if use_imu else None, mono=mono, bf=bf,
        )
        self.loop_closer = None
        if vocab is not None:
            from .loop_closing import LoopCloser
            self.loop_closer = LoopCloser(
                camera, self.cfg, self.map, vocab,
                fix_scale=not mono or use_imu,
                local_mapper=self.local_mapper,
            )
            self.local_mapper.loop_closer = self.loop_closer
        self.async_mapper = None
        mapper_for_tracker = self.local_mapper
        closer_for_tracker = self.loop_closer
        if async_mapping:
            # inertial sensors are supported: the tracker re-syncs its
            # bias/velocity state from the last KF whenever the worker
            # bumps map_version (the reference's UpdateFrameIMU handshake,
            # src/Tracking.cc:2993 — see Tracker._sync_imu_from_map)
            from ..parallel.async_mapping import AsyncMapper
            self.async_mapper = AsyncMapper(
                self.local_mapper, self.loop_closer, self.map.lock)
            mapper_for_tracker = self.async_mapper
            closer_for_tracker = None  # the worker thread runs it
        self.tracker = Tracker(
            camera, self.cfg, self.map, mapper_for_tracker,
            sensor="mono" if mono else "stereo",
            imu_calib=imu_calib if use_imu else None,
            loop_closer=closer_for_tracker, bf=bf,
            camera2=camera2, Tlr=Tlr,
        )

    # ------------------------------------------------------------------ API
    def track_monocular(self, img, timestamp: float, imu=None):
        """Returns Tcw 4x4 (or None before initialization)
        (ref: System::TrackMonocular System.cc:352; imu batch per frame as
        in the mono-inertial drivers src/main_vi.cpp:174)."""
        frame = self.tracker.track(img, timestamp, imu=imu)
        if frame.R is None:
            return None
        T = np.eye(4)
        T[:3, :3] = frame.R
        T[:3, 3] = frame.t
        return T

    def track_stereo(self, img_left, img_right, timestamp: float, imu=None):
        """ref: System::TrackStereo (System.cc:228)."""
        frame = self.tracker.track(img_left, timestamp, imu=imu,
                                   img_right=img_right)
        if frame.R is None:
            return None
        T = np.eye(4)
        T[:3, :3] = frame.R
        T[:3, 3] = frame.t
        return T

    def track_rgbd(self, img, depth, timestamp: float, imu=None):
        """ref: System::TrackRGBD (System.cc:294)."""
        frame = self.tracker.track(img, timestamp, imu=imu, depth=depth)
        if frame.R is None:
            return None
        T = np.eye(4)
        T[:3, :3] = frame.R
        T[:3, 3] = frame.t
        return T

    def get_tracking_state(self):
        return self.tracker.state

    def get_tracked_map_points(self):
        """Per-feature map-point ids of the last frame, -1 = untracked
        (ref: System::GetTrackedMapPoints System.h:170)."""
        f = self.tracker.last_frame
        if f is None or f.mp is None:
            return np.full(0, -1, np.int32)
        return f.mp.copy()

    def get_tracked_keypoints_un(self):
        """Undistorted keypoints of the last frame
        (ref: System::GetTrackedKeyPointsUn System.h:171)."""
        f = self.tracker.last_frame
        if f is None:
            return np.zeros((0, 2))
        return f.feats.und_xy.copy()

    # --------------------------------------------------------------- modes
    def activate_localization_mode(self):
        """Freeze the map: tracking-only, no keyframe insertion
        (ref: System::ActivateLocalizationMode System.h:122 sets
        Tracking::mbOnlyTracking and pauses LocalMapping)."""
        self.tracker.only_tracking = True

    def deactivate_localization_mode(self):
        """ref: System::DeactivateLocalizationMode (System.h:124)."""
        self.tracker.only_tracking = False

    def reset(self):
        """Clear the whole Atlas and tracker state
        (ref: System::Reset System.h:131 -> Tracking::Reset)."""
        self.tracker.reset()

    def reset_active_map(self):
        """ref: System::ResetActiveMap (System.h:132)."""
        self.tracker.reset_active_map()

    def change_dataset(self):
        """Multi-session runs: the next frame opens a new Atlas map (young
        maps reset in place); place recognition can merge the sessions
        later (ref: System::ChangeDataset System.h:178, used between
        sequences in the EuRoC multi-session drivers)."""
        self.tracker._force_new_map = True
        self.tracker.velocity = None

    def shutdown(self):
        """ref: System::Shutdown (System.cc:487) — settle the tracking
        pipeline and join worker threads (async mapper + background GBA)."""
        self.tracker._flush_pipeline()
        self.tracker.last_frame = (self.tracker._last_completed
                                   or self.tracker.last_frame)
        if self.async_mapper is not None:
            self.async_mapper.shutdown()
        if self.loop_closer is not None:
            self.loop_closer.wait_gba()

    # ------------------------------------------------------------ trajectory
    def _ref_pose(self, ref_kf: int):
        """Current world pose of a (possibly culled) reference KF: walk the
        spanning tree composing stored cull-time relatives
        (ref: System::SaveTrajectoryTUM System.cc:525-540 Trw chain)."""
        m = self.map
        Ra = np.eye(3)
        ta = np.zeros(3)
        k = ref_kf
        while k >= 0 and not m.kf_valid[k] and m.kf_tcp[k] is not None:
            Rcp, tcp = m.kf_tcp[k]
            ta = Ra @ tcp + ta          # T_acc = T_acc * Tcp
            Ra = Ra @ Rcp
            k = int(m.kf_parent[k])
        if k < 0 or not m.kf_valid[k]:
            return None
        return Ra @ m.kf_R[k], Ra @ m.kf_t[k] + ta

    def trajectory_tum(self):
        """[(t, x, y, z, qx, qy, qz, qw)] camera-to-world per tracked frame
        (ref format: System::SaveTrajectoryTUM System.cc:514). Relative
        poses are composed with the reference KF's CURRENT pose."""
        rows = []
        for (t, Rcr, tcr, ref_kf, lost) in self.tracker.trajectory:
            ref = self._ref_pose(ref_kf)
            if ref is None:
                continue
            Rr, tr_ = ref
            R = Rcr @ Rr
            tt = Rcr @ tr_ + tcr
            Rwc, twc = lie.se3_inverse(jnp.asarray(R), jnp.asarray(tt))
            q = np.asarray(lie.rot_to_quat(Rwc))
            p = np.asarray(twc)
            rows.append((t, p[0], p[1], p[2], q[0], q[1], q[2], q[3]))
        return rows

    def save_trajectory_tum(self, path: str):
        with open(path, "w") as fh:
            for row in self.trajectory_tum():
                fh.write(" ".join(f"{v:.9f}" for v in row) + "\n")

    def save_trajectory_euroc(self, path: str):
        """EuRoC format: timestamp[ns] x y z qw qx qy qz
        (ref: System::SaveTrajectoryEuRoC System.cc:607)."""
        with open(path, "w") as fh:
            for (t, x, y, z, qx, qy, qz, qw) in self.trajectory_tum():
                fh.write(f"{int(round(t * 1e9))} {x:.9f} {y:.9f} {z:.9f} "
                         f"{qw:.9f} {qx:.9f} {qy:.9f} {qz:.9f}\n")

    def save_trajectory_kitti(self, path: str):
        """KITTI format: 12 entries of the 3x4 Twc matrix per line
        (ref: System::SaveTrajectoryKITTI System.cc:782)."""
        with open(path, "w") as fh:
            for (t, Rcr, tcr, ref_kf, lost) in self.tracker.trajectory:
                ref = self._ref_pose(ref_kf)
                if ref is None:
                    continue
                Rr, tr_ = ref
                R = Rcr @ Rr
                tt = Rcr @ tr_ + tcr
                Rwc = R.T
                twc = -Rwc @ tt
                row = np.concatenate([Rwc, twc[:, None]], axis=1).reshape(-1)
                fh.write(" ".join(f"{v:.9e}" for v in row) + "\n")

    def save_debug_data(self, path: str):
        """Session/IMU-init debug dump as JSON
        (ref: System::SaveDebugData System.cc:836-889 writes the IMU-init
        internals + per-stage LBA info; here: init/VIBA events with bias
        trajectories, loop closures, map counters, stage timings)."""
        import json
        from ..utils.timing import GLOBAL_TIMER

        m = self.map
        data = dict(
            imu_events=list(getattr(self.local_mapper, "debug_events", [])),
            loops_closed=(self.loop_closer.n_loops_closed
                          if self.loop_closer else 0),
            keyframes=int(len(m.valid_kf_ids(all_maps=True))),
            map_points=int(m.mp_valid[: m.n_mp].sum()),
            maps=[int(x) for x in m.map_ids()],
            imu_initialized=bool(m.imu_initialized),
            tracking_state=self.tracker.state.name,
            stage_ms=GLOBAL_TIMER.summary(),
        )
        with open(path, "w") as fh:
            json.dump(data, fh, indent=1)

    # ---------------------------------------------------------- checkpointing
    def save_checkpoint(self, path: str):
        from ..map.checkpoint import save_map

        save_map(self.map, path)

    def load_checkpoint(self, path: str):
        from ..map.checkpoint import load_map

        load_map(self.map, path)

    def keyframe_trajectory_tum(self):
        rows = []
        m = self.map
        for k in m.valid_kf_ids():
            Rwc, twc = lie.se3_inverse(jnp.asarray(m.kf_R[k]), jnp.asarray(m.kf_t[k]))
            q = np.asarray(lie.rot_to_quat(Rwc))
            p = np.asarray(twc)
            rows.append((m.kf_time[k], p[0], p[1], p[2], q[0], q[1], q[2], q[3]))
        return rows

    def save_keyframe_trajectory_tum(self, path: str):
        """ref: System::SaveKeyFrameTrajectoryTUM (System.cc:574)."""
        with open(path, "w") as fh:
            for row in self.keyframe_trajectory_tum():
                fh.write(" ".join(f"{v:.9f}" for v in row) + "\n")

    def save_keyframe_trajectory_euroc(self, path: str):
        """ref: System::SaveKeyFrameTrajectoryEuRoC (System.cc:730)."""
        with open(path, "w") as fh:
            for (t, x, y, z, qx, qy, qz, qw) in self.keyframe_trajectory_tum():
                fh.write(f"{int(round(t * 1e9))} {x:.9f} {y:.9f} {z:.9f} "
                         f"{qw:.9f} {qx:.9f} {qy:.9f} {qz:.9f}\n")

"""Tracking engine: the per-frame front end state machine.

Replaces the reference Tracking (src/Tracking.cc:829 Track() and friends):
  - monocular initialization via two-view reconstruction (:1460, :1550)
  - motion-model / reference-KF tracking (:1879, :1750)
  - local-map tracking (:1974) with frustum culling (:2358)
  - keyframe decision (:2089) and creation (:2228)
  - RECENTLY_LOST / LOST handling and state machine (Tracking.h:101-109)

Host orchestration + a handful of batched device dispatches per frame
(extract, hamming-match, pose-GN).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..core import lie
from ..map.store import SlamMap, FrameFeatures
from ..ops import match as M
from ..ops import twoview as TV
from ..solve import ba as B
from ..solve.pose_opt_dispatch import pose_optimize_best as pose_optimize
from .config import SlamConfig
from .frontend import Frontend


class State(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    RECENTLY_LOST = 3
    LOST = 4


@dataclass
class Frame:
    feats: FrameFeatures
    time: float
    frame_id: int
    R: np.ndarray | None = None  # Tcw
    t: np.ndarray | None = None
    mp: np.ndarray | None = None  # [N] mp id per feature (-1 none)
    v: np.ndarray | None = None   # world velocity of the body (inertial)
    bg: np.ndarray | None = None  # per-frame bias estimate (inertial)
    ba: np.ndarray | None = None

    def center(self):
        return -self.R.T @ self.t


class Tracker:
    def __init__(self, camera, cfg: SlamConfig, slam_map: SlamMap,
                 local_mapper=None, sensor="mono", imu_calib=None,
                 loop_closer=None, bf: float = 0.0,
                 camera2=None, Tlr=None):
        """camera2/Tlr: right camera + left<-right extrinsics of a fisheye
        (KB8) stereo rig (ref: Tracking ctor Camera2.* + Tlr parsing,
        src/Tracking.cc:95-134). When set, stereo frames route through the
        lapping-area fisheye matcher instead of the rectified row-banded
        one, and all solvers project through the KB8 model."""
        self.camera = camera
        self.cfg = cfg
        self.map = slam_map
        self.bf = bf
        self.frontend = Frontend(camera, cfg.orb, bf=bf)
        self.camera2 = camera2
        if camera2 is not None:
            Tlr = np.asarray(Tlr if Tlr is not None else np.eye(4), np.float64)
            # Tlr maps right-cam coords into the left frame (ref yaml
            # comment: 'from right camera to left'); the frontend
            # triangulator needs Trl (right<-left)
            R_lr, t_lr = Tlr[:3, :3], Tlr[:3, 3]
            self.R_rl = R_lr.T
            self.t_rl = -R_lr.T @ t_lr
        else:
            self.R_rl = self.t_rl = None
        # solvers see left-camera observations only (fisheye right features
        # are consumed by depth triangulation, not as residuals), so the
        # left camera's spec covers every solve
        self.camspec = camera.spec
        self.local_mapper = local_mapper
        self.loop_closer = loop_closer
        self.sensor = sensor
        self.state = State.NO_IMAGES_YET
        self.velocity = None  # [4x4-equiv (R, t)] of Tcl (cur from last)
        self.last_frame: Frame | None = None
        self.init_frame: Frame | None = None
        self.ref_kf = -1
        self.last_kf = -1
        self.frames_since_kf = 0
        self.frame_id = 0
        self.trajectory = []  # (time, R, t, ref_kf, lost)
        self.n_inliers = 0
        self.sf = self.map.scale_factors
        self.inv_sigma2 = (1.0 / self.sf ** 2).astype(np.float64)
        # --- inertial state (ref: Tracking's IMU members, Tracking.h)
        self.imu_calib = imu_calib
        self.use_imu = imu_calib is not None
        self.imu_since_kf: list = []   # raw samples [t,w,a] since last KF
        self.bg = np.zeros(3)
        self.ba = np.zeros(3)
        self.map_version_seen = 0
        self.lost_since = 0.0
        # marginalization prior for VI frame tracking
        # (ref: Frame::mpcpi ConstraintPoseImu; None => anchor at last KF)
        self.prior: dict | None = None
        self._pre_frame = None  # preint (last frame -> current), set per frame
        # localization-only mode (ref: mbOnlyTracking, ActivateLocalization-
        # Mode System.h:122): track against the frozen map, no KF insertion
        self.only_tracking = False
        # ref: Tracking::mbVO — in localization mode, true when the frame
        # tracks mostly temporary visual-odometry points (few map matches)
        self.vo_mode = False
        # set by System.change_dataset (ref System.h:178): next frame starts
        # a fresh Atlas map / resets a young one
        self._force_new_map = False
        # fused on-device tracking (track_device.py): one dispatch + one
        # fetch per frame. Applies to pinhole mono/stereo visual tracking in
        # the OK state; everything else (init, reloc, VI, fisheye, RGB-D)
        # uses the host path below.
        self.fused_enabled = True
        self._fused = None
        # pipelined fused tracking: the in-flight (frame, device out,
        # min_req) tuple — completed when the NEXT frame is dispatched
        self._pending = None
        self._last_completed = None

    # ------------------------------------------------------------------ util
    def _project(self, R, t, X):
        Xc = X @ R.T + t
        uv = self.camera.project_np(Xc)
        return uv, Xc[:, 2], Xc

    def _pose_opt(self, R0, t0, frame: Frame, mp_ids, X_by_feat=None,
                  valid_by_feat=None):
        """Run motion-only optimization over the frame's current matches.
        Shapes are bucketed so the jit program is reused across frames.
        Stereo features (u_right >= 0) contribute 3-dim residuals
        (ref: PoseOptimization stereo edges Optimizer.cc:975).

        X_by_feat/valid_by_feat: optional per-feature 3D positions + mask
        overriding the map lookup — serves temporary visual-odometry
        points that are not map points (localization mode)."""
        from ..utils.pad import bucket, pad_to

        if valid_by_feat is not None:
            sel = np.nonzero(valid_by_feat)[0]
        else:
            sel = np.nonzero(mp_ids >= 0)[0]
        n = len(sel)
        if n < 3:
            return R0, t0, np.zeros(0, bool), sel
        nb = bucket(n, 256)
        if X_by_feat is not None:
            X = pad_to(X_by_feat[sel], nb)
        else:
            X = pad_to(self.map.mp_pos[mp_ids[sel]], nb)
        und = frame.feats.und_xy[sel]
        if frame.feats.u_right is not None:
            ur = frame.feats.u_right[sel]
            stereo = ur >= 0
        else:
            ur = np.zeros(n)
            stereo = np.zeros(n, bool)
        uvr = pad_to(np.concatenate([und, ur[:, None]], 1), nb)
        st = pad_to(stereo, nb, False)
        inv_s2 = pad_to(self.inv_sigma2[frame.feats.octave[sel]], nb)
        valid = np.zeros(nb, bool)
        valid[:n] = True
        Rf, tf, inl, chi2 = pose_optimize(
            jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), jnp.asarray(uvr),
            jnp.asarray(inv_s2), jnp.asarray(st), jnp.asarray(valid),
            self.camera.fx, self.camera.fy, self.camera.cx, self.camera.cy,
            self.bf, cam=self.camspec,
        )
        return np.asarray(Rf), np.asarray(tf), np.asarray(inl)[:n], sel

    def _pose_opt_vi(self, frame: Frame, mp_ids):
        """Visual-inertial frame optimization (ref: TrackLocalMap's
        PoseInertialOptimizationLastKeyFrame Optimizer.cc:7479 /
        ...LastFrame :7874). Anchor = last KF right after a map update,
        else = last frame constrained by the marginalization prior
        (ConstraintPoseImu); the solve returns the next frame's prior.

        Returns (inliers, sel) and writes pose/vel/bias into `frame`;
        None if the inertial chain isn't usable this frame (caller falls
        back to visual-only pose optimization)."""
        from ..solve.pose_inertial import pose_inertial_solve
        from ..utils.pad import bucket, pad_to
        from .inertial import preintegrate_window

        m = self.map
        calib = self.imu_calib
        last = self.last_frame
        use_kf_anchor = (
            self.prior is None
            or m.map_version != self.map_version_seen
            or self.frames_since_kf == 0
        )
        if use_kf_anchor:
            kf = self.last_kf
            if kf < 0 or not m.kf_valid[kf]:
                return None
            t0 = float(m.kf_time[kf])
            if frame.time <= t0:
                return None
            bg1, ba1 = m.kf_bg[kf].copy(), m.kf_ba[kf].copy()
            bg0, ba0 = bg1, ba1          # integration bias of the window
            pre, _ = preintegrate_window(
                self.imu_since_kf, t0, frame.time, bg1, ba1, calib)
            R1, p1 = calib.body_from_cam(m.kf_R[kf], m.kf_t[kf])
            v1 = m.kf_vel[kf].copy()
            prior_H = np.zeros((15, 15))
            anchor_fixed = True
        else:
            if last is None or last.v is None or self._pre_frame is None:
                return None
            pre = self._pre_frame     # integrated at (self.bg, self.ba)
            bg0, ba0 = self.bg.copy(), self.ba.copy()
            bg1, ba1 = last.bg, last.ba
            if bg1 is None:
                bg1, ba1 = self.bg, self.ba
            R1, p1 = calib.body_from_cam(last.R, last.t)
            v1 = last.v
            prior_H = self.prior["H"]
            anchor_fixed = False
        dT = max(float(pre["dT"]), 1e-6)
        from ..imu.preintegration import information_from_cov
        info9 = np.asarray(information_from_cov(
            jnp.asarray(np.asarray(pre["C"])[:9, :9].astype(np.float64))))
        _, _, wg2, wa2 = calib.discrete_cov()
        # visual observations
        sel = np.nonzero(mp_ids >= 0)[0]
        n = len(sel)
        if n < 3:
            return None
        nb = bucket(n, 256)
        X = pad_to(m.mp_pos[mp_ids[sel]], nb)
        und = frame.feats.und_xy[sel]
        if frame.feats.u_right is not None:
            ur = frame.feats.u_right[sel]
            stereo = ur >= 0
        else:
            ur = np.zeros(n)
            stereo = np.zeros(n, bool)
        uvr = pad_to(np.concatenate([und, ur[:, None]], 1), nb)
        st = pad_to(stereo, nb, False)
        inv_s2 = pad_to(self.inv_sigma2[frame.feats.octave[sel]], nb)
        valid = np.zeros(nb, bool)
        valid[:n] = True
        # frame initial state (from the current visual/IMU estimate)
        R2, p2 = calib.body_from_cam(frame.R, frame.t)
        v2 = frame.v if frame.v is not None else v1
        pr = self.prior if not anchor_fixed else None
        out = pose_inertial_solve(
            jnp.asarray(R1), jnp.asarray(p1), jnp.asarray(v1),
            jnp.asarray(bg1), jnp.asarray(ba1),
            jnp.asarray(R2), jnp.asarray(p2), jnp.asarray(v2),
            jnp.asarray(self.bg), jnp.asarray(self.ba),
            jnp.asarray(X), jnp.asarray(uvr), jnp.asarray(inv_s2),
            jnp.asarray(st), jnp.asarray(valid),
            jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float64)),
                         dict(pre)),
            jnp.asarray(info9),
            jnp.asarray(bg0), jnp.asarray(ba0),
            1.0 / (wg2 * dT), 1.0 / (wa2 * dT),
            jnp.asarray(prior_H),
            jnp.asarray(pr["R"]) if pr else jnp.asarray(R1),
            jnp.asarray(pr["p"]) if pr else jnp.asarray(p1),
            jnp.asarray(pr["v"]) if pr else jnp.asarray(v1),
            jnp.asarray(pr["bg"]) if pr else jnp.asarray(bg1),
            jnp.asarray(pr["ba"]) if pr else jnp.asarray(ba1),
            anchor_fixed,
            jnp.asarray(calib.Rcb), jnp.asarray(calib.tcb),
            self.camera.fx, self.camera.fy, self.camera.cx, self.camera.cy,
            self.bf, cam=self.camspec,
        )
        Rb, pb, vb, bgf, baf, inl, H15, _ = out
        Rb, pb = np.asarray(Rb), np.asarray(pb)
        if not np.all(np.isfinite(Rb)) or not np.all(np.isfinite(pb)):
            return None
        frame.R, frame.t = calib.cam_from_body(Rb, pb)
        frame.v = np.asarray(vb)
        frame.bg = np.asarray(bgf)
        frame.ba = np.asarray(baf)
        self.bg, self.ba = frame.bg.copy(), frame.ba.copy()
        self.prior = dict(H=np.asarray(H15), R=Rb, p=pb, v=frame.v,
                          bg=frame.bg, ba=frame.ba)
        self.map_version_seen = m.map_version
        return np.asarray(inl)[:n], sel

    # ------------------------------------------------------------------ main
    def track(self, img, time: float, imu=None, img_right=None, depth=None):
        """imu: [N,7] samples (t, wx, wy, wz, ax, ay, az) since the last
        frame (ref: System::TrackMonocular vImuMeas + GrabImuData).
        img_right: right image (stereo); depth: depth map (RGB-D)."""
        from ..utils.timing import GLOBAL_TIMER as T

        if self.use_imu and imu is not None and len(imu):
            self.imu_since_kf.extend(np.asarray(imu, np.float64).tolist())
        # --- IMU sanity guards (ref: Tracking.cc:854-891 timestamp-jump
        # handling; LocalMapping.cc:138-145 bad-IMU map reset)
        if self.use_imu and self.map.bad_imu:
            self.map.bad_imu = False
            from ..utils.verbose import print_mess
            print_mess("[tracking] bad IMU stream: resetting active map")
            self.reset_active_map()
        if (self.last_frame is not None
                and not self._force_new_map  # dataset boundary is expected
                and self.state not in (State.NO_IMAGES_YET,
                                       State.NOT_INITIALIZED)):
            dt_jump = time - self.last_frame.time
            if dt_jump < 0:
                # timestamps went backwards: broken stream -> reset the
                # active map (ref Tracking.cc:861-868)
                from ..utils.verbose import print_mess
                print_mess("[tracking] timestamp went backwards: reset")
                self.reset_active_map()
            elif self.use_imu and dt_jump > 1.0:
                # >1 s sensor gap: the preintegration bridge is unusable.
                # With a mature inertial map spawn a fresh Atlas map, else
                # reset in place (ref Tracking.cc:869-890: CreateMapInAtlas
                # when IMU initialized, ResetActiveMap otherwise)
                from ..utils.verbose import print_mess
                print_mess(f"[tracking] {dt_jump:.2f}s sensor gap")
                if self.map.imu_initialized and self.map.inertial_ba1:
                    self._force_new_map = True
                else:
                    self.reset_active_map()
                self.imu_since_kf = []
        # fused on-device path: extraction happens INSIDE the fused step,
        # so try it before the host extraction
        fused_ok = (
            self.fused_enabled
            and self.state == State.OK
            and not self._force_new_map
            and not self.use_imu
            and self.camera2 is None
            and depth is None
            and self.camspec.kind == "pinhole"
            and self.last_frame is not None
            and self.last_frame.mp is not None
        )
        frame = Frame(None, time, self.frame_id)
        self.frame_id += 1
        ran = False
        if self._pending is not None and not (
                fused_ok and self.cfg.tracking.pipelined):
            # leaving the pipelined path (state change / sensor change):
            # settle the in-flight frame first
            self._flush_pipeline()
            self.last_frame = self._last_completed or self.last_frame
        if fused_ok and self.cfg.tracking.pipelined:
            # locking is staged INSIDE (dispatch + result-apply under the
            # map lock, the ~25 ms device fetch outside it) so the mapping
            # worker's per-stage lock takes interleave with tracking
            # instead of waiting out the fetch every frame
            with T.stage("track_fused"):
                res = self._track_fused_pipelined(frame, img, img_right)
            if res is not None:
                ran = True
                self.last_frame = self._last_completed or self.last_frame
                return frame
        if fused_ok and not ran:
            with self.map.lock:
                with T.stage("track_fused"):
                    res = self._track_fused(frame, img, img_right)
                if res is not None:
                    ran = True
                    if res:
                        self._post_track_ok(frame)
                    else:
                        # fused ran but failed: reuse its extraction for
                        # the host fallback (motion model, wide windows,
                        # RECENTLY_LOST handling)
                        frame.R = frame.t = None
                        frame.mp = None
                        with T.stage("track"):
                            self._track_frame(frame)
        # visual-INERTIAL fused path (round 5): the one-dispatch visual
        # step runs with the IMU-predicted pose, then ONE pose-inertial
        # solve refines on the fused associations — 3-4 device dispatches
        # per frame instead of the host path's ~10 (ref per-frame chain:
        # PreintegrateIMU Tracking.cc:909 -> PredictStateIMU :669 ->
        # TrackLocalMap with PoseInertialOptimization* Optimizer.cc:
        # 7479/7874)
        vi_fused_ok = (
            not ran
            and self.fused_enabled
            and self.state == State.OK
            and not self._force_new_map
            and self.use_imu
            and self.map.imu_initialized
            and self.camera2 is None
            and depth is None
            and self.camspec.kind == "pinhole"
            and self.last_frame is not None
            and self.last_frame.mp is not None
            and self.last_frame.R is not None
        )
        if vi_fused_ok:
            with self.map.lock:
                self._sync_imu_from_map()
                with T.stage("track_fused_vi"):
                    res = self._track_fused_vi(frame, img, img_right)
                if res is not None:
                    ran = True
                    if res:
                        self._post_track_ok(frame)
                    else:
                        # fall back to the host state machine with the
                        # already-extracted features
                        frame.R = frame.t = None
                        frame.mp = None
                        with T.stage("track"):
                            self._track_frame(frame)
        if not ran:
            if frame.feats is None:
                with T.stage("extract"):
                    if img_right is not None and self.camera2 is not None:
                        frame.feats = self.frontend.process_stereo_fisheye(
                            img, img_right, self.camera2, self.R_rl,
                            self.t_rl)
                    elif img_right is not None:
                        frame.feats = self.frontend.process_stereo(
                            img, img_right)
                    elif depth is not None:
                        frame.feats = self.frontend.process_rgbd(
                            img, depth, self.cfg.depth_map_factor)
                    else:
                        frame.feats = self.frontend.process(img)
            # extraction ran lock-free; the state machine holds the map lock
            # (ref: Track() under Map::mMutexMapUpdate, Tracking.cc:921)
            with self.map.lock:
                if self._force_new_map and self.state not in (
                        State.NO_IMAGES_YET, State.NOT_INITIALIZED):
                    # dataset boundary (ref: ChangeDataset -> timestamp-jump
                    # handling Tracking.cc:854-891): always open a fresh
                    # Atlas map — the old session stays and can be merged
                    # back later
                    self._force_new_map = False
                    self.map.create_new_map()
                    self._reset_tracker_state()
                if self.state in (State.NO_IMAGES_YET, State.NOT_INITIALIZED):
                    with T.stage("initialize"):
                        if self.sensor == "mono":
                            self._initialize_mono(frame)
                        else:
                            self._initialize_stereo(frame)
                else:
                    self._sync_imu_from_map()
                    with T.stage("track"):
                        self._track_frame(frame)
        # trajectory log: store pose RELATIVE to the reference KF so later
        # map updates (BA, gravity-align/rescale, loop correction) apply to
        # logged frames too (ref: Tracking.cc:1327-1347 mlRelativeFramePoses)
        if frame.R is not None and self.ref_kf >= 0:
            m = self.map
            Rr, tr_ = m.kf_R[self.ref_kf], m.kf_t[self.ref_kf]
            Rcr = frame.R @ Rr.T
            tcr = frame.t - Rcr @ tr_
            self.trajectory.append(
                (time, Rcr, tcr, self.ref_kf, self.state != State.OK)
            )
        self.last_frame = frame
        return frame

    # ---------------------------------------------------------------- inertial
    def _sync_imu_from_map(self):
        """Async-mapping handshake (ref: Tracking::UpdateFrameIMU,
        src/Tracking.cc:2993): when the mapping worker has advanced the map
        (IMU init, VIBA, gravity align/rescale, loop correction — all bump
        map_version), pull fresh bias/velocity state from the last KF
        before tracking this frame. The marginalization prior and the
        constant-velocity model are stale in the new frame."""
        m = self.map
        if (not self.use_imu or m.map_version == self.map_version_seen
                or self.last_kf < 0 or not m.kf_valid[self.last_kf]):
            return
        self.bg = m.kf_bg[self.last_kf].copy()
        self.ba = m.kf_ba[self.last_kf].copy()
        self.prior = None
        self.velocity = None
        last = self.last_frame
        if m.imu_initialized and last is not None and last.R is not None:
            # the world frame may have been re-scaled/rotated: rebase the
            # last frame's pose/velocity by IMU-predicting from the last
            # KF's (transformed) state (ref Tracking.cc:3010-3040 —
            # mLastFrame.SetImuPoseVelocity from mpLastKeyFrame + preint)
            t0 = float(m.kf_time[self.last_kf])
            if last.time > t0 + 1e-9:
                from ..imu.preintegration import predict_state
                from .inertial import preintegrate_window

                pre, _ = preintegrate_window(
                    self.imu_since_kf, t0, last.time, self.bg, self.ba,
                    self.imu_calib)
                if float(pre["dT"]) > 0:
                    Rwb, p = self.imu_calib.body_from_cam(
                        m.kf_R[self.last_kf], m.kf_t[self.last_kf])
                    Rwb2, p2, v2 = predict_state(
                        jnp.asarray(Rwb), jnp.asarray(p),
                        jnp.asarray(m.kf_vel[self.last_kf]),
                        jax.tree.map(
                            lambda x: jnp.asarray(np.asarray(x, np.float64)),
                            pre))
                    last.R, last.t = self.imu_calib.cam_from_body(
                        np.asarray(Rwb2), np.asarray(p2))
                    last.v = np.asarray(v2)
            else:
                last.R = m.kf_R[self.last_kf].copy()
                last.t = m.kf_t[self.last_kf].copy()
                last.v = m.kf_vel[self.last_kf].copy()

    def _predict_imu(self, frame: Frame):
        """IMU dead-reckoning from the last frame's body state
        (ref: Tracking::PredictStateIMU Tracking.cc:669). Returns
        (R0, t0, v_pred) camera pose prediction or None."""
        from ..imu.preintegration import predict_state
        from .inertial import preintegrate_window

        last = self.last_frame
        self._pre_frame = None
        if (not self.use_imu or not self.map.imu_initialized
                or last is None or last.R is None or last.v is None):
            return None
        pre, _ = preintegrate_window(
            self.imu_since_kf, last.time, frame.time, self.bg, self.ba,
            self.imu_calib)
        if float(pre["dT"]) <= 0:
            return None
        self._pre_frame = pre
        Rwb, p = self.imu_calib.body_from_cam(last.R, last.t)
        Rwb2, p2, v2 = predict_state(
            jnp.asarray(Rwb), jnp.asarray(p), jnp.asarray(last.v),
            jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float64)), pre))
        Rcw, tcw = self.imu_calib.cam_from_body(np.asarray(Rwb2),
                                                np.asarray(p2))
        return Rcw, tcw, np.asarray(v2)

    # ---------------------------------------------------------------- init
    def _initialize_mono(self, frame: Frame):
        cfg = self.cfg.tracking
        n_feat = frame.feats.n
        if self.init_frame is None or frame.feats.valid.sum() < cfg.min_matches_init:
            if frame.feats.valid.sum() >= cfg.min_matches_init:
                self.init_frame = frame
                self.state = State.NOT_INITIALIZED
            return
        ref = self.init_frame
        # SearchForInitialization: window 100, ratio 0.9. (The reference
        # restricts to level 0 but extracts 2-5x features at init,
        # Tracking.cc:206-212; with a single budget all levels match.)
        mask = (
            M.window_mask_np(ref.feats.xy, frame.feats.xy, cfg.init_window)
            & ref.feats.valid[:, None]
            & frame.feats.valid[None, :]
        )
        midx, _ = M.match_padded(
            ref.feats.bits, frame.feats.bits, mask,
            max_dist=M.TH_LOW, nn_ratio=cfg.nn_ratio_init,
            ang_a=ref.feats.angle, ang_b=frame.feats.angle,
        )
        matched = np.nonzero(midx >= 0)[0]
        if len(matched) < cfg.min_matches_init:
            self.init_frame = frame  # restart with current as reference
            return
        x1 = np.zeros((n_feat, 2))
        x2 = np.zeros((n_feat, 2))
        valid = np.zeros(n_feat, bool)
        x1[matched] = ref.feats.norm_xy[matched]
        x2[matched] = frame.feats.norm_xy[midx[matched]]
        valid[matched] = True
        out = TV.reconstruct_two_views(
            jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(valid),
            jax.random.PRNGKey(0),
        )
        if not bool(out["success"]):
            return
        good = np.asarray(out["good"])
        R21 = np.asarray(out["R21"])
        t21 = np.asarray(out["t21"])
        X = np.asarray(out["X"])
        # scale so median depth (in cam1) = 1 (ref: CreateInitialMapMonocular
        # :1607 invMedianDepth)
        med = np.median(X[good][:, 2])
        X = X / med
        t21 = t21 / med
        # build map: KF0 identity, KF1 (R21, t21)
        m = self.map
        kf0 = m.add_keyframe(np.eye(3), np.zeros(3), ref.feats, ref.time,
                             ref.frame_id)
        kf1 = m.add_keyframe(R21, t21, frame.feats, frame.time, frame.frame_id)
        frame.mp = np.full(n_feat, -1, np.int32)
        for i in np.nonzero(good & valid)[0]:
            j = midx[i]
            mp = m.add_point(X[i], kf0, int(i))
            m.add_observation(mp, kf1, int(j))
            m.update_point_stats(mp)
            frame.mp[j] = mp
        m.update_connections(kf0)
        m.update_connections(kf1)
        # full BA on the initial map (ref: GlobalBundleAdjustemnt(20))
        self._initial_ba(kf0, kf1)
        if self.use_imu:
            from .inertial import preintegrate_window
            m.kf_prev[kf1] = kf0
            pre, raw = preintegrate_window(
                self.imu_since_kf, ref.time, frame.time, self.bg, self.ba,
                self.imu_calib)
            m.kf_preint[kf1] = pre
            m.kf_imu[kf1] = raw
            self.imu_since_kf = [s for s in self.imu_since_kf
                                 if s[0] > frame.time - 1e-12]
        frame.R = m.kf_R[kf1].copy()
        frame.t = m.kf_t[kf1].copy()
        self.ref_kf = kf1
        self.last_kf = kf1
        self.velocity = None
        self.state = State.OK
        self.frames_since_kf = 0
        if self.local_mapper is not None:
            self.local_mapper.on_new_keyframe(kf0)
            self.local_mapper.on_new_keyframe(kf1)
        if self.loop_closer is not None:
            self.loop_closer.on_new_keyframe(kf0)
            self.loop_closer.on_new_keyframe(kf1)

    def _initial_ba(self, kf0, kf1):
        m = self.map
        obs_kf, obs_pt, uvr, inv_s2 = [], [], [], []
        mp_ids = m.valid_mp_ids()
        remap = {int(j): i for i, j in enumerate(mp_ids)}
        for j in mp_ids:
            for kf, slot in m.mp_obs[j].items():
                obs_kf.append(0 if kf == kf0 else 1)
                obs_pt.append(remap[int(j)])
                uvr.append([*m.kf_feats[kf].und_xy[slot], 0.0])
                inv_s2.append(self.inv_sigma2[m.kf_feats[kf].octave[slot]])
        if not obs_kf:
            return
        n_obs = len(obs_kf)
        Rf, tf, Xf, _, _ = B.ba_solve_np(
            np.stack([m.kf_R[kf0], m.kf_R[kf1]]),
            np.stack([m.kf_t[kf0], m.kf_t[kf1]]),
            m.mp_pos[mp_ids],
            np.array(obs_kf, np.int32), np.array(obs_pt, np.int32),
            np.array(uvr), np.array(inv_s2),
            np.zeros(n_obs, bool), np.ones(n_obs, bool),
            np.array([True, False]),
            self.camera.fx, self.camera.fy, self.camera.cx, self.camera.cy, 0.0,
            n_iters=20, cam=self.camspec,
        )
        m.kf_R[kf1] = Rf[1]
        m.kf_t[kf1] = tf[1]
        m.mp_pos[mp_ids] = Xf
        for j in mp_ids:
            m.update_point_stats(int(j))

    # ------------------------------------------------------------ stereo init
    def _initialize_stereo(self, frame: Frame):
        """ref: StereoInitialization (Tracking.cc:1351) — first frame with
        enough features becomes a KF; map points spring from stereo depth."""
        if frame.feats.valid.sum() < self.cfg.tracking.min_stereo_init_features:
            return
        if self.use_imu and self.sensor != "mono":
            # stereo-inertial init needs measured acceleration beyond
            # gravity — a static rig makes gravity/bias unobservable
            # (ref Tracking.cc:1363-1368 'not enough acceleration').
            # Divergence: the reference thresholds the norm of the
            # preintegrated acceleration delta; here the std of |a| over
            # the window serves the same purpose on raw samples.
            if len(self.imu_since_kf) < 10:
                return
            a = np.asarray(self.imu_since_kf)[:, 4:7]
            if np.std(np.linalg.norm(a, axis=1)) < 0.25:
                from ..utils.verbose import print_mess
                print_mess("[tracking] stereo-IMU init: not enough "
                           "acceleration, waiting")
                return
        m = self.map
        frame.R = np.eye(3)
        frame.t = np.zeros(3)
        frame.mp = np.full(frame.feats.n, -1, np.int32)
        kf = m.add_keyframe(frame.R, frame.t, frame.feats, frame.time,
                            frame.frame_id)
        n_pts = self._spawn_stereo_points(kf, frame, max_new=10 ** 9)
        if n_pts < 100:
            m.kf_valid[kf] = False
            return
        m.update_connections(kf)
        self.ref_kf = kf
        self.last_kf = kf
        self.velocity = None
        self.state = State.OK
        self.frames_since_kf = 0
        if self.use_imu:
            m.kf_prev[kf] = -1
        if self.local_mapper is not None:
            self.local_mapper.on_new_keyframe(kf)
        if self.loop_closer is not None:
            self.loop_closer.on_new_keyframe(kf)

    def _spawn_stereo_points(self, kf: int, frame: Frame, max_new=100):
        """Create map points from stereo/RGB-D depth for unmatched features
        (ref: CreateNewKeyFrame close-point spawning Tracking.cc:2270-2330).
        Points closer than th_depth x baseline first; up to max_new."""
        f = frame.feats
        if f.depth is None:
            return 0
        m = self.map
        cam = self.camera
        free = (frame.mp < 0) & f.valid & (f.depth > 0)
        order = np.argsort(np.where(free, f.depth, np.inf))
        th = self.cfg.th_depth * (self.bf / cam.fx)
        n = 0
        Rwc = frame.R.T
        Ow = -Rwc @ frame.t
        for i in order:
            if not free[i]:
                break
            z = f.depth[i]
            if z <= 0 or (n >= max_new and z > th):
                break
            # back-project through the camera model: norm_xy is the z=1
            # unprojected ray, so this is exact for pinhole AND fisheye
            # (ref: UnprojectStereoFishEye Frame.cc:1245)
            nx, ny = f.norm_xy[i]
            Xc = np.array([nx * z, ny * z, z])
            Xw = Rwc @ Xc + Ow
            mp = m.add_point(Xw, kf, int(i))
            frame.mp[i] = mp
            n += 1
        return n

    # ------------------------------------------------------------ fused path
    def _flush_pipeline(self):
        """Complete (or discard) the in-flight pipelined step so the
        tracker state is consistent before a mode change/fallback."""
        if self._pending is None:
            return
        pend_frame, out, min_req = self._pending
        self._pending = None
        fetched = self._fused.fetch_results(out)  # lock-free
        with self.map.lock:
            n_inl = self._fused.complete(out, pend_frame, fetched=fetched)
            self.n_inliers = n_inl
            self._finish_completed(pend_frame, n_inl, min_req)

    def _finish_completed(self, frame: Frame, n_inl: int, min_req: int):
        """Bookkeeping for a pipeline-completed frame: trajectory log,
        state machine, KF decision (what the synchronous path does inline
        in track())."""
        if n_inl >= min_req:
            self._post_track_ok(frame)
        else:
            self.state = State.RECENTLY_LOST
            self.lost_since = frame.time
        if frame.R is not None and self.ref_kf >= 0:
            m = self.map
            Rr, tr_ = m.kf_R[self.ref_kf], m.kf_t[self.ref_kf]
            Rcr = frame.R @ Rr.T
            tcr = frame.t - Rcr @ tr_
            self.trajectory.append(
                (frame.time, Rcr, tcr, self.ref_kf,
                 self.state != State.OK))
        self._last_completed = frame

    def _track_fused_pipelined(self, frame: Frame, img, img_right):
        """Pipelined fused tracking (cfg.tracking.pipelined): dispatch the
        CURRENT frame's step against the device-resident pose chain, then
        complete the PREVIOUS frame (its device->host copies streamed
        while this frame's upload/dispatch went out). One frame of
        latency; sustained throughput ~2x the synchronous mode through a
        tunneled backend. Returns None when the pipeline can't run (caller
        falls back to the synchronous/host path)."""
        from .track_device import FusedTracker

        if self._fused is None:
            self._fused = FusedTracker(self)
        ft = self._fused
        self._last_completed = None
        # local map vote from the last COMPLETED frame's matches
        vote_frame = self.last_frame
        if vote_frame is None or vote_frame.mp is None or \
                vote_frame.R is None:
            return None
        with self.map.lock:
            ok_map = ft.build_local_map(vote_frame.mp)
            if ok_map:
                min_req = self.cfg.tracking.min_inliers_local \
                    if self.frames_since_kf > 0 else 15
                if self._pending is not None:
                    pose_in = self._pending[1]["pose"]
                else:
                    pose_in = np.concatenate([
                        np.asarray(self.last_frame.R, np.float32).ravel(),
                        np.asarray(self.last_frame.t, np.float32),
                        np.float32([0.0])])
                out = ft.dispatch(img, img_right, pose_in, min_req)
                pend = self._pending
                self._pending = (frame, out, min_req)
        if not ok_map:
            self._flush_pipeline()
            return None
        if pend is not None:
            pend_frame, pend_out, pend_req = pend
            fetched = ft.fetch_results(pend_out)  # lock-free: mapping
            # stages interleave with this ~25 ms wait
            with self.map.lock:
                n_inl = ft.complete(pend_out, pend_frame, fetched=fetched)
                self.n_inliers = n_inl
                self._finish_completed(pend_frame, n_inl, pend_req)
                if self.state != State.OK:
                    # the in-flight step rode a failed pose: discard it
                    # and let the host path retake over on the next frame
                    self._pending = None
        return True

    def _track_fused_vi(self, frame: Frame, img, img_right):
        """Visual-inertial fused tracking: IMU-predict the pose (host +
        two small dispatches), run the one-dispatch fused visual step
        seeded at the prediction, then refine with ONE pose-inertial
        solve over the fused associations (solve/pose_inertial.py — the
        marginalization-prior chain is maintained exactly as in the host
        path). Returns True (tracked), False (too few inliers — caller
        falls back with the extracted features), None (can't run)."""
        from .track_device import FusedTracker

        if self._fused is None:
            self._fused = FusedTracker(self)
        ft = self._fused
        last = self.last_frame
        pred = self._predict_imu(frame)
        if pred is None:
            return None
        if not ft.build_local_map(last.mp):
            return None
        R0, t0, v_pred = pred
        min_req = self.cfg.tracking.min_inliers_local \
            if self.frames_since_kf > 0 else 15
        frame.v = v_pred
        n_inl = ft.track(img, img_right, frame, R0, t0, min_req)
        if n_inl < max(min_req // 2, 10):
            self.n_inliers = n_inl
            return False
        vi = self._pose_opt_vi(frame, frame.mp)
        if vi is None:
            # inertial chain unusable this frame: the fused visual pose
            # stands (same as the host path's visual fallback)
            self.n_inliers = n_inl
            return n_inl >= min_req
        inl, sel = vi
        frame.mp[sel[~inl]] = -1
        self.n_inliers = int(inl.sum())
        return self.n_inliers >= min_req

    def _track_fused(self, frame: Frame, img, img_right):
        """One-dispatch tracking via track_device.FusedTracker.

        Returns True (tracked), False (ran but too few inliers — caller
        falls back to the host path with the already-extracted features),
        or None (no usable local map — caller runs the full host path)."""
        from .track_device import FusedTracker

        if self._fused is None:
            self._fused = FusedTracker(self)
        ft = self._fused
        last = self.last_frame
        if not ft.build_local_map(last.mp):
            return None
        min_req = self.cfg.tracking.min_inliers_local \
            if self.frames_since_kf > 0 else 15
        n_inl = ft.track(img, img_right, frame, last.R, last.t, min_req)
        self.n_inliers = n_inl
        return n_inl >= min_req

    def _post_track_ok(self, frame: Frame, pred=None):
        """Shared post-tracking bookkeeping: velocity state, motion model,
        KF decision (ref: Track() after TrackLocalMap, Tracking.cc:1239+)."""
        cfg = self.cfg.tracking
        self.state = State.OK
        if frame.bg is not None:
            pass  # VI solve already estimated velocity
        elif pred is not None:
            dt = frame.time - self.last_frame.time
            p_pred = -pred[0].T @ pred[1]
            corr = (frame.center() - p_pred) / dt if dt > 0 else 0.0
            frame.v = pred[2] + corr
        elif self.last_frame.R is not None:
            dt = frame.time - self.last_frame.time
            if dt > 0:
                frame.v = (frame.center() - self.last_frame.center()) / dt
        # motion model velocity: Tcl = Tcw_cur * Twc_last
        Rl = self.last_frame.R.T
        tl = -Rl @ self.last_frame.t
        Rv = frame.R @ Rl
        tv = frame.R @ tl + frame.t
        self.velocity = (Rv, tv)
        self.frames_since_kf += 1
        if not self.only_tracking and self._need_new_keyframe(frame):
            self._create_keyframe(frame)

    # -------------------------------------------------------------- tracking
    def _track_frame(self, frame: Frame):
        cfg = self.cfg.tracking
        ok = False
        pred = self._predict_imu(frame)
        if self.state == State.OK:
            # Pose prediction: IMU else LAST POSE. The constant-velocity
            # extrapolation of the reference (Tracking.cc:1887) is NOT
            # used for vision-only tracking: extrapolated init error is
            # 2e_t - e_{t-1}, and because window-gated association
            # retains a fraction of the init bias, the closed loop's
            # characteristic root sits on the unit circle — measured as
            # x2-3 pose-error growth PER FRAME (f32 and f64 alike, any
            # trajectory/scene). Init at the last solved pose makes the
            # loop a plain contraction: the same 30-frame sequence went
            # from 39 m divergence to 14 mm max error. IMU prediction is
            # physically grounded (no feedback through vision) and keeps
            # full extrapolation.
            if pred is not None:
                R0, t0, v_pred = pred
            else:
                R0, t0 = self.last_frame.R, self.last_frame.t
            if self.only_tracking and self.vo_mode:
                # riding VO points in an unmapped region: try to relocate
                # into the map each frame, else keep dead-reckoning on
                # temporary points (ref Tracking.cc:1027-1047)
                ok = self._relocalize(frame)
                if ok:
                    self.vo_mode = False
                else:
                    ok = self._track_motion_model(frame, R0, t0)
                    if ok:
                        # still on VO points: no local map to track
                        self.frames_since_kf += 1
                        self.velocity = None
                        return ok
                if not ok:
                    # reloc and VO motion model both failed
                    self.state = State.RECENTLY_LOST
                    self.lost_since = frame.time
                    if frame.R is None and self.last_frame.R is not None:
                        frame.R = self.last_frame.R.copy()
                        frame.t = self.last_frame.t.copy()
                    if frame.mp is None:
                        frame.mp = np.full(frame.feats.n, -1, np.int32)
                    return False
            # DESCRIPTOR-FIRST association (reference-KF match), with the
            # window-gated motion model as the fallback. The reference
            # prefers the motion model for CPU speed (Tracking.cc:980);
            # on TPU the dense Hamming matrix is computed either way, and
            # window-gated association is pose-DEPENDENT: with per-frame
            # association inherited through windows centered on the
            # drifted prediction, chi2-pruned true matches never return
            # and the tracked set ratchets onto a drift-consistent subset
            # (measured: x2-3 pose-error growth per frame against a
            # STATIC map, both f32 and f64; descriptor-first association
            # holds the same scene at a bounded ~2 cm).
            ok = self._track_reference_kf(frame, R0, t0)
            if not ok:
                ok = self._track_motion_model(frame, R0, t0)
        elif self.state == State.RECENTLY_LOST:
            if pred is not None:
                # ref Tracking.cc:1017-1047: with an initialized IMU the
                # RECENTLY_LOST frame rides the prediction and RETRIES
                # full local-map tracking directly (no BoW reloc needed
                # while dead-reckoning stays accurate) — reloc-only here
                # permanently lost the map the moment one frame failed
                # while moving into unmapped territory
                frame.R, frame.t, frame.v = pred
                frame.mp = np.full(frame.feats.n, -1, np.int32)
                ok = self._track_local_map(frame)
            if not ok:
                ok = self._relocalize(frame)
            if not ok and pred is not None:
                # IMU dead-reckoning while recently lost (ref :1017-1047)
                frame.R, frame.t, frame.v = pred
        if ok and self.only_tracking and self.vo_mode:
            # the frame just slid onto VO points (motion-model fallback
            # set vo_mode): skip local-map tracking, stay OK
            # (ref: !mbVO gate before TrackLocalMap, Tracking.cc:1161)
            self.frames_since_kf += 1
            self.velocity = None
            return ok
        if ok:
            ok = self._track_local_map(frame)
        if ok:
            self._post_track_ok(frame, pred=pred)
        else:
            if self.state == State.OK:
                self.state = State.RECENTLY_LOST
                self.lost_since = frame.time
            elif self.state == State.RECENTLY_LOST and \
                    frame.time - self.lost_since > cfg.time_recently_lost:
                self.state = State.LOST
            # keep predicted pose for the trajectory
            if frame.R is None and self.last_frame.R is not None:
                frame.R = self.last_frame.R.copy()
                frame.t = self.last_frame.t.copy()
            if frame.mp is None:
                frame.mp = np.full(frame.feats.n, -1, np.int32)
            if self.state == State.LOST:
                self._handle_lost()
        return ok

    def _handle_lost(self):
        """ref: Tracking.cc:1053-1058 + CreateMapInAtlas (:1689) — with a
        mature map, spawn a fresh Atlas map and re-initialize; place
        recognition later merges it back. Young maps are reset in place."""
        m = self.map
        if len(m.valid_kf_ids()) >= 10:
            m.create_new_map()
            self._reset_tracker_state()
        else:
            self.reset_active_map()

    def reset_active_map(self):
        """ref: Tracking::ResetActiveMap (Tracking.cc:2857) — drop the
        active map's KFs/MPs and restart initialization in place."""
        m = self.map
        with m.lock:
            for k in m.valid_kf_ids():
                for slot in np.nonzero(m.kf_mp[k] >= 0)[0]:
                    mp = int(m.kf_mp[k, slot])
                    if m.mp_valid[mp]:
                        m.set_bad_point(mp)
                m.kf_valid[k] = False
                if self.loop_closer is not None:
                    self.loop_closer.on_kf_erased(k)
        self._reset_tracker_state()

    def reset(self):
        """ref: Tracking::Reset (Tracking.cc:2792) — clear every Atlas map
        and all tracker state."""
        m = self.map
        with m.lock:
            for k in m.valid_kf_ids(all_maps=True):
                m.kf_valid[k] = False
                if self.loop_closer is not None:
                    self.loop_closer.on_kf_erased(k)
            m.mp_valid[: m.n_mp] = False
            m.create_new_map()
            m.imu_initialized = False
            m.map_version += 1
        self._reset_tracker_state()
        self.last_frame = None
        self.trajectory = []
        self.bg = np.zeros(3)
        self.ba = np.zeros(3)
        self.frame_id = 0

    def _reset_tracker_state(self):
        self.state = State.NO_IMAGES_YET
        self.init_frame = None
        self.velocity = None
        self.ref_kf = -1
        self.last_kf = -1
        self.imu_since_kf = []
        self.frames_since_kf = 0
        self.prior = None

    def _track_motion_model(self, frame: Frame, R0, t0):
        """ref: TrackWithMotionModel (Tracking.cc:1879) — project last
        frame's map points from the predicted pose (constant-velocity or
        IMU prediction). In localization mode, stereo/RGB-D frames spawn
        TEMPORARY visual-odometry points from the last frame's depth for
        unmatched features (ref: UpdateLastFrame temporal points,
        Tracking.cc:1249-1270) so tracking survives unmapped regions."""
        cfg = self.cfg.tracking
        last = self.last_frame
        last_mp = np.array(
            [self.map.resolve_replaced(int(j)) if j >= 0 else -1 for j in last.mp],
            np.int32,
        )
        sel = np.nonzero(last_mp >= 0)[0]
        n_real = len(sel)
        vo_X = np.zeros((0, 3))
        if (self.only_tracking and self.sensor != "mono"
                and last.feats.depth is not None and last.R is not None):
            d = last.feats.depth
            free = (last_mp < 0) & last.feats.valid & (d > 0)
            cand = np.nonzero(free)[0]
            if len(cand):
                order = cand[np.argsort(d[cand])]
                th = self.cfg.th_depth * (self.bf / self.camera.fx) \
                    if self.bf > 0 else np.inf
                close = order[d[order] < th][:100]
                if len(close) < 20:  # spawn at least some (ref 100 cap)
                    close = order[:100]
                if len(close):
                    nx = last.feats.norm_xy[close]
                    zc = d[close]
                    Xc = np.stack([nx[:, 0] * zc, nx[:, 1] * zc, zc], 1)
                    Rwc = last.R.T
                    vo_X = Xc @ Rwc.T + (-Rwc @ last.t)[None]
                    sel = np.concatenate([sel, close])
        if len(sel) < 10:
            return False
        mp_ids = last_mp[sel]  # -1 rows are VO points
        Xall = np.concatenate(
            [self.map.mp_pos[last_mp[sel[:n_real]]], vo_X], 0)
        uv, z, _ = self._project(R0, t0, Xall)
        radius = (
            cfg.motion_model_radius * self.sf[last.feats.octave[sel]]
        )
        for th_mult in (1.0, 2.0):  # widen once if too few (ref :1928)
            mask = (
                M.window_mask_np(uv, frame.feats.xy, radius * th_mult)
                & (z > 0)[:, None]
                & frame.feats.valid[None, :]
                & M.level_mask_np(last.feats.octave[sel], frame.feats.octave, 1, 1)
            )
            midx, _ = M.match_padded(
                last.feats.bits[sel], frame.feats.bits, mask, max_dist=M.TH_HIGH,
                ang_a=last.feats.angle[sel], ang_b=frame.feats.angle,
            )
            if (midx >= 0).sum() >= cfg.min_matches_motion:
                break
        if (midx >= 0).sum() < cfg.min_matches_motion:
            return False
        frame.mp = np.full(frame.feats.n, -1, np.int32)
        rows = np.nonzero(midx >= 0)[0]
        real = rows[mp_ids[rows] >= 0]
        frame.mp[midx[real]] = mp_ids[real]
        # per-feature positions: map points AND temporary VO points
        X_feat = np.zeros((frame.feats.n, 3))
        vmask = np.zeros(frame.feats.n, bool)
        X_feat[midx[rows]] = Xall[rows]
        vmask[midx[rows]] = True
        Rf, tf, inl, osel = self._pose_opt(
            R0, t0, frame, frame.mp, X_by_feat=X_feat, valid_by_feat=vmask)
        frame.R, frame.t = Rf, tf
        # drop outlier matches
        frame.mp[osel[~inl]] = -1
        self.n_inliers = int(inl.sum())
        if self.only_tracking:
            # ref: mbVO = few MAP matches — the frame rides VO points
            inl_map = int((frame.mp[osel[inl]] >= 0).sum())
            self.vo_mode = inl_map < 10
        return self.n_inliers >= cfg.min_inliers_motion

    def _track_reference_kf(self, frame: Frame, R0=None, t0=None):
        """ref: TrackReferenceKeyFrame (Tracking.cc:1750) — descriptor match
        against the reference KF's map-point features. Associations are
        window-FREE (pure descriptor + ratio test), so they carry no
        feedback from the predicted pose; R0/t0 only initialize the
        optimizer."""
        cfg = self.cfg.tracking
        m = self.map
        kf = self.ref_kf
        if kf < 0:
            return False
        kf_mp = m.kf_mp[kf].copy()
        for i, j in enumerate(kf_mp):
            if j >= 0:
                kf_mp[i] = m.resolve_replaced(int(j))
        sel = np.nonzero(kf_mp >= 0)[0]
        if len(sel) < 10:
            return False
        mask = (
            m.kf_feats[kf].valid[sel][:, None] & frame.feats.valid[None, :]
        )
        midx, _ = M.match_padded(
            m.kf_feats[kf].bits[sel], frame.feats.bits, mask,
            max_dist=M.TH_LOW, nn_ratio=cfg.nn_ratio_ref_kf,
            ang_a=m.kf_feats[kf].angle[sel], ang_b=frame.feats.angle,
        )
        if (midx >= 0).sum() < 15:
            return False
        frame.mp = np.full(frame.feats.n, -1, np.int32)
        ok = midx >= 0
        frame.mp[midx[ok]] = kf_mp[sel[ok]]
        if R0 is None:
            R0 = self.last_frame.R
            t0 = self.last_frame.t
        Rf, tf, inl, osel = self._pose_opt(R0, t0, frame, frame.mp)
        frame.R, frame.t = Rf, tf
        frame.mp[osel[~inl]] = -1
        self.n_inliers = int(inl.sum())
        return self.n_inliers >= cfg.min_inliers_motion

    def _relocalize(self, frame: Frame):
        """Relocalization: BoW candidates + PnP RANSAC when a vocabulary is
        wired (ref: Tracking::Relocalization Tracking.cc:2626 —
        DetectRelocalizationCandidates + SearchByBoW + MLPnP RANSAC +
        PoseOptimization), falling back to the reference-KF neighborhood."""
        if self.ref_kf < 0:
            self.state = State.LOST
            return False
        kfs = [self.ref_kf] + self.map.best_covisible(self.ref_kf, 5)
        for kf in kfs:
            self.ref_kf = kf
            if self._track_reference_kf(frame):
                return True
        if self.loop_closer is not None:
            return self._relocalize_bow(frame)
        return False

    def _relocalize_bow(self, frame: Frame):
        from ..solve.pnp import pnp_ransac
        from ..utils.pad import bucket, pad_to

        lc = self.loop_closer
        m = self.map
        word, node, bow = lc.vocab.transform(frame.feats.bits,
                                             frame.feats.valid)
        cands = lc.db.detect_relocalization_candidates(
            bow, lambda k: m.best_covisible(k, 10))
        for kf, _score in cands:
            if not m.kf_valid[kf]:
                continue
            fk = m.kf_feats[kf]
            nk = lc.kf_nodes.get(kf)
            has = m.kf_mp[kf] >= 0
            mask = (has & fk.valid)[:, None] & frame.feats.valid[None, :]
            if nk is not None:
                mask = mask & (nk[:, None] == node[None, :])
            midx, _ = M.match_padded(
                fk.bits, frame.feats.bits, mask, max_dist=M.TH_LOW,
                nn_ratio=0.75, ang_a=fk.angle, ang_b=frame.feats.angle)
            ia = np.nonzero(midx >= 0)[0]
            if len(ia) < 15:
                continue
            mp = m.kf_mp[kf, ia]
            ok = mp >= 0
            ia, mp = ia[ok], mp[ok]
            slots = midx[ia]
            n = len(ia)
            nb = bucket(n, 64)
            X = pad_to(m.mp_pos[mp], nb)
            xy = pad_to(frame.feats.norm_xy[slots], nb)
            is2 = pad_to(self.inv_sigma2[frame.feats.octave[slots]], nb)
            vmask = np.zeros(nb, bool)
            vmask[:n] = True
            res = pnp_ransac(
                jnp.asarray(X), jnp.asarray(xy), jnp.asarray(is2),
                jnp.asarray(vmask), jax.random.PRNGKey(frame.frame_id),
                n_hyp=256, focal2=float(self.camera.fx) ** 2)
            if int(res["n_inliers"]) < 10:
                continue
            frame.mp = np.full(frame.feats.n, -1, np.int32)
            inl = np.asarray(res["inliers"])[:n]
            frame.mp[slots[inl]] = mp[inl]
            Rf, tf, pin, osel = self._pose_opt(
                np.asarray(res["R"]), np.asarray(res["t"]), frame, frame.mp)
            frame.R, frame.t = Rf, tf
            frame.mp[osel[~pin]] = -1
            self.n_inliers = int(pin.sum())
            if self.n_inliers >= 15:
                self.ref_kf = kf
                return True
        return False

    # ------------------------------------------------------------- local map
    def _track_local_map(self, frame: Frame):
        cfg = self.cfg.tracking
        m = self.map
        # K1: KFs observing current map points; pick new ref_kf = max overlap
        counts: dict[int, int] = {}
        for j in frame.mp[frame.mp >= 0]:
            for kf in m.mp_obs[int(j)]:
                counts[kf] = counts.get(kf, 0) + 1
        if not counts:
            # no associations yet (IMU-predicted RECENTLY_LOST retry):
            # fall back to the last keyframe's neighborhood (ref
            # UpdateLocalKeyFrames last-KF fallback, Tracking.cc:2526)
            anchor = self.last_kf if (self.last_kf >= 0
                                      and m.kf_valid[self.last_kf]) \
                else self.ref_kf
            if anchor < 0 or not m.kf_valid[anchor]:
                return False
            k1 = [anchor]
        else:
            k1 = sorted(counts, key=counts.get, reverse=True)
        self.ref_kf = k1[0]
        local_kfs = list(k1)
        seen = set(local_kfs)
        for kf in k1[:10]:  # K2: neighbors (ref caps local window at 80)
            for o in m.best_covisible(kf, 10):
                if o not in seen and len(local_kfs) < 80:
                    seen.add(o)
                    local_kfs.append(o)
        # all local points (the full candidate set is rebuilt every pass)
        ids = np.unique(m.kf_mp[local_kfs])
        ids = ids[ids >= 0]
        ids = ids[m.mp_valid[ids]]
        min_req = cfg.min_inliers_local if self.frames_since_kf > 0 else 15

        def search_and_opt(radius_mult: float, count_stats: bool):
            """One projection-search + pose-opt pass at the frame's current
            pose; fills only FREE slots of frame.mp. Returns (inl, osel)."""
            cur_set = set(int(j) for j in frame.mp[frame.mp >= 0])
            cand = np.array([j for j in ids if int(j) not in cur_set],
                            np.int32)
            if len(cand):
                X = m.mp_pos[cand]
                uv, z, _ = self._project(frame.R, frame.t, X)
                Ow = -frame.R.T @ frame.t
                vdir = X - Ow[None]
                dist = np.linalg.norm(vdir, axis=1)
                cosv = np.sum(vdir * m.mp_normal[cand], 1) / np.maximum(
                    dist, 1e-9)
                in_img = (
                    (z > 0)
                    & (uv[:, 0] >= 0) & (uv[:, 0] < self.camera.width)
                    & (uv[:, 1] >= 0) & (uv[:, 1] < self.camera.height)
                    & (dist >= 0.8 * m.mp_min_dist[cand])
                    & (dist <= 1.2 * m.mp_max_dist[cand])
                    & (cosv > 0.5)
                )  # ref: Frame::isInFrustum (:483)
                if count_stats:
                    m.mp_visible[cand[in_img]] += 1
                cand = cand[in_img]
                uv = uv[in_img]
                dist = dist[in_img]
                cosv = cosv[in_img]
            if len(cand):
                pred = m.predict_scale(dist, cand)
                radius = np.where(
                    cosv > 0.998, cfg.local_map_radius_tight,
                    cfg.local_map_radius
                ) * self.sf[pred] * radius_mult
                free = frame.mp < 0  # only fill unmatched feature slots
                mask = (
                    M.window_mask_np(uv, frame.feats.xy, radius)
                    & (frame.feats.valid & free)[None, :]
                    & M.level_mask_np(pred, frame.feats.octave, 1, 0)
                )
                # ratio test only when best/second share a pyramid level
                # (ref: SearchByProjection ORBmatcher.cc:130
                # bestLevel==bestLevel2 gate)
                midx, _ = M.match_padded(
                    m.mp_bits[cand], frame.feats.bits, mask,
                    max_dist=M.TH_HIGH, nn_ratio=cfg.nn_ratio_local,
                    oct_b=frame.feats.octave, ratio_same_octave=True,
                )
                ok = midx >= 0
                frame.mp[midx[ok]] = cand[ok]
            vi = None
            if self.use_imu and m.imu_initialized:
                vi = self._pose_opt_vi(frame, frame.mp)
            if vi is not None:
                inl, osel = vi
            else:
                Rf, tf, inl, osel = self._pose_opt(
                    frame.R, frame.t, frame, frame.mp)
                frame.R, frame.t = Rf, tf
            self.n_inliers = int(inl.sum())
            return inl, osel

        # Pass 1: inherited motion-model associations + local fill-in.
        inl, osel = search_and_opt(1.0, count_stats=False)
        if self.n_inliers < 2 * min_req:
            # weak: widen the window from the refined pose once (ref widens
            # SearchByProjection th the same way — th=5 after reloc, th=2
            # retry in TrackWithMotionModel, Tracking.cc:2377-2392)
            frame.mp[osel[~inl]] = -1
            inl, osel = search_and_opt(3.0, count_stats=False)
        # FULL RE-ASSOCIATION, iterated to a fixed point. Inherited
        # associations are sticky: an inlier pruned by one frame's chi2
        # gate never returned (motion-model matching only re-feeds
        # SURVIVORS), so the match set shrank monotonically toward the
        # subset consistent with the drift direction — a survivor-bias
        # ratchet, measured at x2-3 error growth PER FRAME against a
        # STATIC map. Rebuilding every association from the full local
        # map makes the per-frame estimate conditionally independent
        # given the pose and lets pruned points return; because the
        # associations are built at a pose that itself came from biased
        # matches, the (associate -> solve) map is iterated until the
        # pose stops moving (one pass is measurably not a fixed point).
        for it in range(3):
            t_before = frame.t.copy()
            frame.mp = np.full(frame.feats.n, -1, np.int32)
            inl, osel = search_and_opt(1.0, count_stats=(it == 2))
            if np.linalg.norm(frame.t - t_before) < 1e-4:
                if it < 2:  # stats not counted yet this frame
                    m.mp_visible[frame.mp[frame.mp >= 0]] += 1
                break
        inlier_ids = frame.mp[osel[inl]]
        m.mp_found[inlier_ids] += 1
        frame.mp[osel[~inl]] = -1
        self.n_inliers = int(inl.sum())
        if self.n_inliers >= min_req and self.only_tracking:
            self.vo_mode = False  # back on the map (ref mbVO=false)
        return self.n_inliers >= min_req

    # -------------------------------------------------------------- keyframes
    def _need_new_keyframe(self, frame: Frame):
        """ref: NeedNewKeyFrame (Tracking.cc:2089) — c1a/c1b + c2.

        ref_matches counts the reference KF's WELL-OBSERVED points only
        (ref: mpReferenceKF->TrackedMapPoints(nMinObs=3),
        Tracking.cc:2113) — counting every matched slot overstates the
        baseline and delays c2 until tracking has already degraded.
        KF starvation is the entry to the association ratchet: the frame
        keeps tracking an aging map whose projection windows drift off
        the true matches (measured: 9 starved frames turned a 2 mm pose
        error into 2 m)."""
        cfg = self.cfg.tracking
        m = self.map
        if self.ref_kf < 0:
            return False
        min_obs = 3 if len(m.valid_kf_ids()) > 2 else 1
        mp = m.kf_mp[self.ref_kf]
        mp = mp[mp >= 0]
        ref_matches = int(sum(
            1 for j in mp
            if m.mp_valid[int(j)] and len(m.mp_obs[int(j)]) >= min_obs))
        # stereo/RGB-D use the tighter 0.75 ratio (ref Tracking.cc:2182
        # thRefRatio = 0.75 for non-mono sensors)
        ratio = cfg.kf_ref_ratio if self.sensor == "mono" else \
            min(cfg.kf_ref_ratio, 0.75)
        c1a = self.frames_since_kf >= cfg.max_frames_between_kf
        c1b = self.frames_since_kf >= cfg.min_frames_between_kf
        c2 = (
            self.n_inliers < ref_matches * ratio
            and self.n_inliers > cfg.min_kf_inliers
        )
        return (c1a or (c1b and c2)) and self.n_inliers > cfg.min_kf_inliers

    def _create_keyframe(self, frame: Frame):
        from ..utils.timing import GLOBAL_TIMER as T

        m = self.map
        from .track_device import DeviceFeatures
        if isinstance(frame.feats, DeviceFeatures):
            # KF features live in the host map store (matching, BoW,
            # triangulation all read them) — materialize once here
            with T.stage("kf.materialize"):
                frame.feats = frame.feats.materialize()
        with T.stage("kf.create"):
            kf = self._create_keyframe_inner(frame)
        return kf

    def _create_keyframe_inner(self, frame: Frame):
        m = self.map
        kf = m.add_keyframe(
            frame.R, frame.t, frame.feats, frame.time, frame.frame_id,
            mp_assign=frame.mp,
        )
        if self.sensor != "mono":
            self._spawn_stereo_points(kf, frame, max_new=100)
        m.update_connections(kf)
        if self.use_imu:
            self._attach_kf_inertial(kf, frame)
        self.ref_kf = kf
        self.last_kf = kf
        self.frames_since_kf = 0
        if self.local_mapper is not None:
            self.local_mapper.on_new_keyframe(kf)
            if self.loop_closer is not None:
                if self.loop_closer.on_new_keyframe(kf):
                    # loop closed: poses/points rewritten; the constant-
                    # velocity model is stale
                    self.velocity = None
            # poses may have moved during local BA: refresh frame pose
            frame.R = m.kf_R[kf].copy()
            frame.t = m.kf_t[kf].copy()
            if self.use_imu:
                self._refresh_inertial_state(kf, frame)

    def _attach_kf_inertial(self, kf: int, frame: Frame):
        """Store the preintegration from the previous KF + raw window
        (ref: Tracking::CreateNewKeyFrame keeps mpImuPreintegratedFromLastKF,
        Tracking.cc:2247-2248 temporal chain mPrevKF/mNextKF)."""
        from .inertial import preintegrate_window

        m = self.map
        prev = self.last_kf
        m.kf_prev[kf] = prev
        m.kf_vel[kf] = frame.v if frame.v is not None else 0.0
        m.kf_bg[kf] = self.bg
        m.kf_ba[kf] = self.ba
        m.kf_bg0[kf] = self.bg
        m.kf_ba0[kf] = self.ba
        if prev >= 0:
            t0 = float(m.kf_time[prev])
            pre, raw = preintegrate_window(
                self.imu_since_kf, t0, frame.time, self.bg, self.ba,
                self.imu_calib)
            m.kf_preint[kf] = pre
            m.kf_imu[kf] = raw
        # drop samples already integrated into a KF window
        self.imu_since_kf = [s for s in self.imu_since_kf
                             if s[0] > frame.time - 1e-12]

    def _refresh_inertial_state(self, kf: int, frame: Frame):
        """After mapping (IMU init may have rescaled the map, inertial BA
        refines biases): pull the KF's state back into the tracker
        (ref: Tracking::UpdateFrameIMU Tracking.cc:2993)."""
        m = self.map
        self.bg = m.kf_bg[kf].copy()
        self.ba = m.kf_ba[kf].copy()
        # mapping may have moved the anchor state: drop the marginalization
        # prior, the next frame re-anchors at this KF (ref: mbMapUpdated
        # switch in TrackLocalMap, Tracking.cc:2004-2010)
        self.prior = None
        if m.imu_initialized:
            frame.v = m.kf_vel[kf].copy()
        if m.map_version != self.map_version_seen:
            # world frame changed (gravity align / rescale): constant-
            # velocity motion model is invalid
            self.map_version_seen = m.map_version
            self.velocity = None

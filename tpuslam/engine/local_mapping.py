"""Local mapping: triangulation, fusion, local BA, culling.

Replaces the reference LocalMapping thread (src/LocalMapping.cc): in this
engine the mapper runs synchronously per keyframe from the tracker (the
async/sharded execution lives in parallel/ — versioned snapshots replace
mMutexMapUpdate).

Pipeline per new KF (ref: LocalMapping::Run :67-276):
  ProcessNewKeyFrame -> MapPointCulling (:341) -> CreateNewMapPoints (:383)
  -> SearchInNeighbors fuse (:729) -> local BA (Optimizer.cc:1699)
  -> KeyFrameCulling (:935).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import lie
from ..map.store import SlamMap
from ..ops import match as M
from ..ops.twoview import triangulate_batch
from ..solve import ba as B
from .config import SlamConfig


class LocalMapper:
    def __init__(self, camera, cfg: SlamConfig, slam_map: SlamMap,
                 imu_calib=None, mono: bool = True, bf: float = 0.0):
        self.camera = camera
        self.camspec = camera.spec
        self.cfg = cfg
        self.map = slam_map
        self.bf = bf
        self.recent_points: list[tuple[int, int]] = []  # (mp, created_at_kf)
        self.sf = slam_map.scale_factors
        self.inv_sigma2 = 1.0 / self.sf ** 2
        self.imu_calib = imu_calib
        self.mono = mono
        self.imu_init_time: float | None = None
        self.viba_stage = 0  # 0: pre-init, 1: init done, 2: VIBA1, 3: VIBA2
        self._last_refine = -1e9
        # BA interruption hook (ref: mbAbortBA LocalMapping.cc:103,283 — a
        # freshly queued KF interrupts a running local BA). The async
        # mapper points this at its queue's non-empty check.
        self.abort_check = None
        # debug-dump records (ref: System::SaveDebugData IMU-init internals,
        # System.cc:836-889): (event, t, n_kfs, bg, ba)
        self.debug_events: list[dict] = []

    def _record(self, event: str, t_now: float):
        from ..utils.verbose import Level, print_mess

        m = self.map
        chain = m.temporal_chain()
        last = chain[-1] if chain else -1
        self.debug_events.append(dict(
            event=event, t=t_now, n_kfs=len(chain),
            bg=(m.kf_bg[last].tolist() if last >= 0 else None),
            ba=(m.kf_ba[last].tolist() if last >= 0 else None),
        ))
        print_mess(f"[local_mapping] {event} t={t_now:.3f} kfs={len(chain)}",
                   Level.NORMAL)

    # ------------------------------------------------------------------ main
    def on_new_keyframe(self, kf: int):
        from ..utils.timing import GLOBAL_TIMER as T

        m = self.map
        # ProcessNewKeyFrame: refresh stats of points seen by this KF
        for j in np.unique(m.kf_mp[kf]):
            if j >= 0:
                m.update_point_stats(int(j))
        m.update_connections(kf)
        self._cull_recent_points(kf)
        if m.n_kf >= 2:
            with T.stage("triangulate"):
                created = self._create_new_points(kf)
            with T.stage("fuse"):
                self._fuse_neighbors(kf)
            with T.stage("local_ba"):
                if m.imu_initialized:
                    self._local_inertial_ba(kf)
                else:
                    self._local_ba(kf)
            with T.stage("kf_culling"):
                self._cull_keyframes(kf)
        if self.imu_calib is not None:
            with T.stage("imu_stage"):
                self._imu_stage(kf)

    # ---------------------------------------------------------------- inertial
    def _imu_stage(self, kf: int):
        """IMU-init state machine (ref: LocalMapping.cc:162-221 —
        InitializeIMU, then VIBA1 @5s, VIBA2 @15s)."""
        from .inertial import full_inertial_ba, run_imu_init

        m = self.map
        icfg = self.cfg.inertial
        chain = m.temporal_chain()
        if not chain:
            return
        t_now = float(m.kf_time[kf])
        span = t_now - float(m.kf_time[chain[0]])
        if not m.imu_initialized:
            if len(chain) < icfg.init_min_kfs or span < icfg.init_min_span:
                return
            if run_imu_init(m, self.imu_calib, mono=self.mono,
                            prior_g=icfg.prior_g1, prior_a=icfg.prior_a1):
                full_inertial_ba(
                    m, self.camera, self.imu_calib, self.inv_sigma2,
                    prior_g=icfg.prior_g1, prior_a=icfg.prior_a1)
                self.imu_init_time = t_now
                self.viba_stage = 1
                self._record("imu_init", t_now)
            return
        elapsed = t_now - self.imu_init_time
        if self.viba_stage == 1 and elapsed > icfg.viba1_time:
            full_inertial_ba(
                m, self.camera, self.imu_calib, self.inv_sigma2,
                prior_g=icfg.prior_g2, prior_a=icfg.prior_a2)
            m.inertial_ba1 = True
            self.viba_stage = 2
            self._record("viba1", t_now)
        elif self.viba_stage == 2 and elapsed > icfg.viba2_time:
            full_inertial_ba(
                m, self.camera, self.imu_calib, self.inv_sigma2,
                prior_g=0.0, prior_a=0.0)
            m.inertial_ba2 = True
            self.viba_stage = 3
            self._record("viba2", t_now)
        elif self.viba_stage < 3 and elapsed < icfg.scale_refine_until \
                and t_now - self._last_refine > icfg.scale_refine_period:
            # periodic JOINT full VI BA + (mono) inertial-only scale/gravity
            # refinement while the estimate is young (ref: LocalMapping.cc
            # :208-219 ScaleRefinement schedule). The joint solve matters:
            # correlated visual rotation drift reads as a scale change to
            # the poses-fixed refinement, so refinement alone biases the
            # map; full BA corrects the rotations it rides on.
            self._last_refine = t_now
            full_inertial_ba(
                m, self.camera, self.imu_calib, self.inv_sigma2,
                prior_g=icfg.prior_g2, prior_a=icfg.prior_a2)
            if self.mono:
                run_imu_init(m, self.imu_calib, mono=True, opt_bias=False)

    def _local_inertial_ba(self, kf: int):
        from .inertial import local_inertial_ba

        # until VIBA2 declares biases converged, keep zero-mean priors on:
        # with gentle motion a free accel bias absorbs the scale/gravity
        # signal (ref keeps priorA=1e5 until the 15s FIBA, LocalMapping.cc)
        icfg = self.cfg.inertial
        pg, pa = (0.0, 0.0) if self.map.inertial_ba2 else (
            icfg.prior_g2, icfg.prior_a2)
        local_inertial_ba(
            self.map, kf, self.camera, self.imu_calib, self.inv_sigma2,
            window=icfg.local_window, prior_g=pg, prior_a=pa)

    # ------------------------------------------------------------- culling
    def _cull_recent_points(self, kf: int):
        """ref: MapPointCulling (LocalMapping.cc:341)."""
        m = self.map
        keep = []
        for mp, born in self.recent_points:
            if not m.mp_valid[mp]:
                continue
            age = kf - born
            ratio = m.mp_found[mp] / max(m.mp_visible[mp], 1)
            if ratio < self.cfg.mapping.recent_cull_found_ratio:
                m.set_bad_point(mp)
            elif age >= 2 and len(m.mp_obs[mp]) <= 2:
                m.set_bad_point(mp)
            elif age >= 3:
                pass  # graduates
            else:
                keep.append((mp, born))
        self.recent_points = keep

    def _cull_keyframes(self, kf: int):
        """ref: KeyFrameCulling (LocalMapping.cc:935) — a local KF is
        redundant if >=90% of its points are seen by >=3 other KFs at the
        same or finer scale. Inertial mode protects the temporal chain:
        the last Nd KFs are never culled and a cull may not open a time
        gap > 0.5s (ref :949-961 Nd=21 window, :1019 time-gap rules)."""
        m = self.map
        inertial = self.imu_calib is not None
        protected: set[int] = set()
        if inertial:
            chain = m.temporal_chain()
            protected = set(chain[-21:])
        for cand in m.best_covisible(kf):
            if cand == 0 or not m.kf_valid[cand]:
                continue
            if inertial:
                if cand in protected or not m.imu_initialized:
                    continue
                prev = int(m.kf_prev[cand])
                nxts = np.nonzero(m.kf_prev[: m.n_kf] == cand)[0]
                if prev < 0 or len(nxts) != 1:
                    continue
                if m.kf_time[nxts[0]] - m.kf_time[prev] > 0.5:
                    continue
            slots = np.nonzero(m.kf_mp[cand] >= 0)[0]
            if len(slots) == 0:
                continue
            n_red = m.redundancy(cand, min_obs=3)
            if n_red > self.cfg.mapping.culling_redundancy * len(slots):
                self._erase_keyframe(cand)

    def _erase_keyframe(self, cand: int):
        m = self.map
        if getattr(self, "loop_closer", None) is not None:
            self.loop_closer.on_kf_erased(cand)
        for slot in np.nonzero(m.kf_mp[cand] >= 0)[0]:
            m.erase_observation(int(m.kf_mp[cand, slot]), cand)
        for o in list(m.covis[cand]):
            m.covis[o].pop(cand, None)
        m.covis[cand] = {}
        m.kf_valid[cand] = False
        # store pose relative to parent for trajectory recovery
        # (ref: KeyFrame::SetBadFlag mTcp)
        parent = int(m.kf_parent[cand])
        if parent >= 0:
            Rp, tp = m.kf_R[parent], m.kf_t[parent]
            Rcp = m.kf_R[cand] @ Rp.T
            tcp = m.kf_t[cand] - Rcp @ tp
            m.kf_tcp[cand] = (Rcp, tcp)
        # splice temporal (inertial) chain: next KF inherits prev
        nxt = np.nonzero(m.kf_prev[: m.n_kf] == cand)[0]
        for c in nxt:
            m.kf_prev[c] = m.kf_prev[cand]
            m.kf_preint[c] = None  # stale; rebuilt from raw if needed
            if m.kf_imu[c] is not None and m.kf_imu[cand] is not None:
                w1, a1, dt1 = m.kf_imu[cand]
                w2, a2, dt2 = m.kf_imu[c]
                m.kf_imu[c] = (
                    np.concatenate([w1, w2]), np.concatenate([a1, a2]),
                    np.concatenate([dt1, dt2]),
                )
        # reparent children (spanning tree)
        for c in np.nonzero(m.kf_parent[: m.n_kf] == cand)[0]:
            m.kf_parent[c] = m.kf_parent[cand]

    # -------------------------------------------------------- triangulation
    def _create_new_points(self, kf: int):
        """ref: CreateNewMapPoints (LocalMapping.cc:383)."""
        m = self.map
        cfg = self.cfg.mapping
        cam = self.camera
        neighbors = m.best_covisible(kf, cfg.n_triangulate_neighbors)
        R1, t1 = m.kf_R[kf], m.kf_t[kf]
        O1 = m.kf_center(kf)
        f1 = m.kf_feats[kf]
        free1 = (m.kf_mp[kf] < 0) & f1.valid
        n_created = 0
        for kn in neighbors:
            R2, t2 = m.kf_R[kn], m.kf_t[kn]
            O2 = m.kf_center(kn)
            baseline = np.linalg.norm(O2 - O1)
            med_depth = self._median_depth(kn)
            if med_depth <= 0 or baseline / med_depth < cfg.min_baseline_depth_ratio:
                continue
            f2 = m.kf_feats[kn]
            free2 = (m.kf_mp[kn] < 0) & f2.valid
            # fundamental matrix F12 from relative pose (normalized coords ->
            # essential; in pixels via K): ref ComputeF12 (LocalMapping.cc)
            R12 = R1 @ R2.T
            t12 = -R12 @ t2 + t1
            E12 = np.asarray(lie.hat(jnp.asarray(t12))) @ R12
            if self.camspec.kind == "kb8":
                # fisheye: no common image plane for a pixel F-matrix —
                # gate on the essential matrix in NORMALIZED ray coords
                # (the camera-generic equivalent of the reference's KB8
                # epipolarConstrain, KannalaBrandt8.cpp:202). Thresholds
                # scale from pixels to normalized units by 1/fx.
                x1h = np.concatenate([f1.norm_xy, np.ones((f1.n, 1))], 1)
                lines = x1h @ E12
                emask = M.epipolar_mask_np(
                    f2.norm_xy, lines, f2.octave,
                    self.sf ** 2 / float(cam.fx) ** 2,
                )
            else:
                Kinv = np.linalg.inv(cam.K().astype(np.float64))
                F12 = Kinv.T @ E12 @ Kinv
                # epipolar lines for kf features in kn image: l2 = F12^T x1
                x1h = np.concatenate([f1.und_xy, np.ones((f1.n, 1))], 1)
                lines = x1h @ F12  # [N,3] lines in image 2
                emask = M.epipolar_mask_np(
                    f2.und_xy, lines, f2.octave, self.sf ** 2
                )
            mask = emask & free1[:, None] & free2[None, :]
            # NO ratio test here: the reference's SearchForTriangulation
            # gates on dist<TH_LOW + epipolar only (ORBmatcher.cc:1061-1085)
            midx, _ = M.match_padded(
                f1.bits, f2.bits, mask,
                max_dist=M.TH_LOW,
                ang_a=f1.angle, ang_b=f2.angle,
            )
            i1 = np.nonzero(midx >= 0)[0]
            if len(i1) == 0:
                continue
            i2 = midx[i1]
            X = np.asarray(
                triangulate_batch(
                    jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2),
                    jnp.asarray(t2), jnp.asarray(f1.norm_xy[i1]),
                    jnp.asarray(f2.norm_xy[i2]),
                )
            )
            # gates (ref LocalMapping.cc:470-720): parallax, cheirality,
            # reprojection chi2, scale consistency
            r1 = X - O1[None]
            r2 = X - O2[None]
            d1 = np.linalg.norm(r1, axis=1)
            d2 = np.linalg.norm(r2, axis=1)
            cosp = np.sum(r1 * r2, 1) / np.maximum(d1 * d2, 1e-12)
            Xc1 = X @ R1.T + t1
            Xc2 = X @ R2.T + t2
            uv1 = np.asarray(cam.project(jnp.asarray(Xc1)))
            uv2 = np.asarray(cam.project(jnp.asarray(Xc2)))
            e1 = ((uv1 - f1.und_xy[i1]) ** 2).sum(1) / self.sf[f1.octave[i1]] ** 2
            e2 = ((uv2 - f2.und_xy[i2]) ** 2).sum(1) / self.sf[f2.octave[i2]] ** 2
            ratio_d = d1 / np.maximum(d2, 1e-9)
            ratio_oct = (
                self.sf[f1.octave[i1]] / self.sf[f2.octave[i2]]
            )
            ok = (
                (cosp < 0.9998)
                & (Xc1[:, 2] > 0)
                & (Xc2[:, 2] > 0)
                & (e1 < 5.991)
                & (e2 < 5.991)
                & (ratio_d < ratio_oct * 1.5 * self.sf[1])
                & (ratio_d * 1.5 * self.sf[1] > ratio_oct)
            )
            for a, b in zip(i1[ok], i2[ok]):
                if m.kf_mp[kf, a] >= 0 or m.kf_mp[kn, b] >= 0:
                    continue
                mp = m.add_point(X[np.nonzero(i1 == a)[0][0]], kf, int(a))
                m.add_observation(mp, kn, int(b))
                m.update_point_stats(mp)
                self.recent_points.append((mp, kf))
                n_created += 1
            free1 = (m.kf_mp[kf] < 0) & f1.valid
        m.update_connections(kf)
        return n_created

    def _median_depth(self, kf: int):
        m = self.map
        ids = m.kf_mp[kf][m.kf_mp[kf] >= 0]
        if len(ids) == 0:
            return -1.0
        Xc = m.mp_pos[ids] @ m.kf_R[kf].T + m.kf_t[kf]
        return float(np.median(Xc[:, 2]))

    # ---------------------------------------------------------------- fusion
    def _fuse_neighbors(self, kf: int):
        """ref: SearchInNeighbors (LocalMapping.cc:729) + ORBmatcher::Fuse."""
        m = self.map
        targets = m.best_covisible(kf, 10)
        second = set()
        for kn in targets:
            for o in m.best_covisible(kn, 5):
                if o != kf and o not in targets:
                    second.add(o)
        targets = list(targets) + list(second)
        own = np.unique(m.kf_mp[kf])
        own = own[own >= 0]
        for kn in targets:
            self._fuse_into(kn, own)
        # reverse: fuse neighbor points into kf
        nbr_pts = np.unique(m.kf_mp[targets]) if targets else np.zeros(0, int)
        nbr_pts = nbr_pts[nbr_pts >= 0]
        self._fuse_into(kf, nbr_pts)
        for j in np.unique(m.kf_mp[kf]):
            if j >= 0:
                m.update_point_stats(int(j))
        m.update_connections(kf)

    def _fuse_into(self, kf: int, mp_ids):
        """Project mp_ids into kf; merge with existing or claim free slots."""
        m = self.map
        cam = self.camera
        mp_ids = np.array([j for j in mp_ids if m.mp_valid[j]], np.int32)
        if len(mp_ids) == 0:
            return
        R, t = m.kf_R[kf], m.kf_t[kf]
        X = m.mp_pos[mp_ids]
        Xc = X @ R.T + t
        uv = np.asarray(cam.project(jnp.asarray(Xc)))
        Ow = m.kf_center(kf)
        dist = np.linalg.norm(X - Ow[None], axis=1)
        cosv = np.sum((X - Ow[None]) * m.mp_normal[mp_ids], 1) / np.maximum(dist, 1e-9)
        ok = (
            (Xc[:, 2] > 0)
            & (uv[:, 0] >= 0) & (uv[:, 0] < cam.width)
            & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
            & (dist >= 0.8 * m.mp_min_dist[mp_ids])
            & (dist <= 1.2 * m.mp_max_dist[mp_ids])
            & (cosv > 0.5)
        )
        mp_ids = mp_ids[ok]
        if len(mp_ids) == 0:
            return
        uv = uv[ok]
        pred = m.predict_scale(dist[ok], mp_ids)
        f = m.kf_feats[kf]
        mask = (
            M.window_mask_np(uv, f.xy, self.cfg.mapping.fuse_radius * self.sf[pred])
            & f.valid[None, :]
            & M.level_mask_np(pred, f.octave, 1, 1)
        )
        midx, _ = M.match_padded(
            m.mp_bits[mp_ids], f.bits, mask, max_dist=M.TH_LOW,
        )
        for a in np.nonzero(midx >= 0)[0]:
            mp = int(mp_ids[a])
            slot = int(midx[a])
            existing = int(m.kf_mp[kf, slot])
            if existing >= 0:
                if existing != mp and m.mp_valid[existing]:
                    # keep the one with more observations (ref: Fuse)
                    if len(m.mp_obs[existing]) > len(m.mp_obs[mp]):
                        m.replace_point(mp, existing)
                    else:
                        m.replace_point(existing, mp)
            else:
                m.add_observation(mp, kf, slot)

    # ---------------------------------------------------------------- localBA
    def _local_ba(self, kf: int):
        """ref: Optimizer::LocalBundleAdjustment (Optimizer.cc:1699):
        window = covisible KFs of kf; points they see; fixed frontier =
        other KFs observing those points; 5+10 LM schedule with chi2 pruning."""
        window = [kf] + self.map.best_covisible(kf)
        window_ba(self.map, self.camera, self.camspec, self.inv_sigma2,
                  self.bf, window, n_iters=self.cfg.mapping.local_ba_iters,
                  abort_check=self.abort_check)


def window_ba(m: SlamMap, camera, camspec, inv_sigma2, bf, window,
              n_iters: int = 15, abort_check=None, fixed_kfs=None):
    """Local BA over an EXPLICIT keyframe window (the reusable core of
    Optimizer::LocalBundleAdjustment, Optimizer.cc:1699; also serves the
    merge weld-area BA, Optimizer.cc:6255 via LoopClosing.cc:1722):
    optimizes `window` poses + the points they see; other observers form
    the fixed frontier; 5-iteration robust phase, chi2 prune, then
    `n_iters` more; outlier observations erased afterwards.

    abort_check: optional callable polled between the two LM phases (the
    reference's mbAbortBA interruption, LocalMapping.cc:103,283) — if it
    returns True the second phase is skipped.
    fixed_kfs: KFs to include in the problem but hold FIXED beyond the
    frontier (the merge weld BA fixes the whole merge-map side — ref
    LoopClosing.cc:1722 passes vpMergeConnectedKFs as the fixed set).
    """
    cam = camera
    fixed_kfs = set(int(k) for k in (fixed_kfs or ()))
    window = sorted(set(int(k) for k in window)
                    - fixed_kfs)  # dedup; fixed side handled below
    window = [k for k in window if m.kf_valid[k]]
    wset = set(window)
    pts = np.unique(m.kf_mp[window]) if window else np.zeros(0, int)
    pts = pts[pts >= 0]
    pts = pts[m.mp_valid[pts]]
    if len(pts) < 10 or len(window) < 2:
        return
    frontier = set(k for k in fixed_kfs if m.kf_valid[k])
    for j in pts:
        for okf in m.mp_obs[int(j)]:
            if okf not in wset:
                frontier.add(okf)
    kf_list = window + sorted(frontier)
    kf_index = {k: i for i, k in enumerate(kf_list)}
    fixed = np.zeros(len(kf_list), bool)
    fixed[len(window):] = True
    if len(frontier) == 0:
        # gauge: fix ONLY the oldest KF (ref: LocalBundleAdjustment sets
        # fixed solely for the map-origin KF, Optimizer.cc:1797
        # vSE3->setFixed(pKF->mnId==pMap->GetInitKFid())). Fixing a
        # second pose would pin an early two-KF baseline — i.e. the
        # (possibly drifted) early map scale — into every later solve;
        # with one fixed pose the mono scale gauge is handled by LM
        # damping and BA can still reconcile early/late scale.
        fixed[kf_index[min(window)]] = True
    pt_index = {int(j): i for i, j in enumerate(pts)}
    obs_kf, obs_pt, uvr, inv_s2, obs_ref, stereo = [], [], [], [], [], []
    for j in pts:
        for okf, slot in m.mp_obs[int(j)].items():
            f = m.kf_feats[okf]
            obs_kf.append(kf_index[okf])
            obs_pt.append(pt_index[int(j)])
            ur = f.u_right[slot] if f.u_right is not None else -1.0
            uvr.append([f.und_xy[slot, 0], f.und_xy[slot, 1],
                        ur if ur >= 0 else 0.0])
            stereo.append(ur >= 0)
            inv_s2.append(inv_sigma2[f.octave[slot]])
            obs_ref.append((int(j), okf))
    obs_kf = np.array(obs_kf, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    uvr = np.array(uvr)
    inv_s2 = np.array(inv_s2)
    stereo = np.array(stereo, bool)
    chi2_th = np.where(stereo, 7.815, 5.991)
    # phase 1 (5 it robust), prune, phase 2 (ref :2048,:2121)
    Rf, tf, Xf, chi2, posz = B.ba_solve_np(
        m.kf_R[kf_list], m.kf_t[kf_list], m.mp_pos[pts],
        obs_kf, obs_pt, uvr, inv_s2, stereo, np.ones(len(obs_kf), bool),
        fixed, cam.fx, cam.fy, cam.cx, cam.cy, bf, n_iters=5,
        cam=camspec,
    )
    good = (chi2 <= chi2_th) & posz
    if abort_check is None or not abort_check():
        Rf, tf, Xf, chi2, posz = B.ba_solve_np(
            Rf, tf, Xf, obs_kf, obs_pt, uvr, inv_s2, stereo, good,
            fixed, cam.fx, cam.fy, cam.cx, cam.cy, bf, cam=camspec,
            n_iters=n_iters,
        )
    # write back
    for i in np.nonzero(~fixed)[0]:
        m.kf_R[kf_list[i]] = Rf[i]
        m.kf_t[kf_list[i]] = tf[i]
    m.mp_pos[pts] = Xf
    # erase observations that remain outliers (ref :2259-2290)
    bad = (chi2 > chi2_th) | ~posz
    for o in np.nonzero(bad)[0]:
        j, okf = obs_ref[o]
        if m.mp_valid[j]:
            m.erase_observation(j, okf)
    for j in pts:
        if m.mp_valid[int(j)]:
            m.update_point_stats(int(j))

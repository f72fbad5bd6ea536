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

from ..map.store import SlamMap
from ..ops import match as M
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
        self._devk = None

    @property
    def devk(self):
        """Device-side fuse/triangulation kernels + KF feature cache
        (map_device.py), built lazily on first keyframe."""
        if self._devk is None:
            from .map_device import MapDeviceKernels
            self._devk = MapDeviceKernels(
                self.camera, self.sf, self.cfg.mapping.fuse_radius,
                len(self.sf))
        return self._devk

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
    def on_new_keyframe(self, kf: int, lock=None):
        """One mapping step for a new KF.

        lock: when the async worker passes the map lock, it is acquired
        PER STAGE instead of across the whole step, so the tracker's
        brief per-frame lock takes interleave between stages instead of
        stalling for the full mapping step (the reference's mapping
        thread likewise holds mMutexMapUpdate only for short mutation
        sections, not across the g2o solves)."""
        import contextlib

        from ..utils.timing import GLOBAL_TIMER as T

        hold = (lambda: lock) if lock is not None else \
            (lambda: contextlib.nullcontext())
        m = self.map
        with hold():
            # ProcessNewKeyFrame: refresh stats of points seen by this KF
            m.update_point_stats_batch(np.unique(m.kf_mp[kf]))
            m.update_connections(kf)
            self._cull_recent_points(kf)
        if m.n_kf >= 2:
            with T.stage("triangulate"):
                self._create_new_points(kf, hold=hold)
            with T.stage("fuse"):
                self._fuse_neighbors(kf, hold=hold)
            with T.stage("local_ba"):
                # interrupt discipline, SENSOR-AWARE: with the scale
                # anchored (stereo/RGB-D depth, or an initialized IMU)
                # a queue backlog defers local BA entirely — the
                # reference's discipline (LocalMapping::Run :103,283
                # runs BA only when no KF waits). On a scale-FREE map
                # (mono before IMU init) the robust 5-iteration first
                # phase always runs and only the second phase aborts:
                # under a compute-bound feed a full skip starves visual
                # BA and the mono scale drifts until IMU init can't fit
                # a single s (measured: 7x region-to-region spread).
                backlog = (self.abort_check is not None
                           and self.abort_check())
                scale_anchored = self.bf > 0 or m.imu_initialized
                if backlog and scale_anchored:
                    pass
                elif m.imu_initialized:
                    self._local_inertial_ba(kf, hold=hold)
                else:
                    self._local_ba(kf, hold=hold)
            with T.stage("kf_culling"), hold():
                self._cull_keyframes(kf)
        if self.imu_calib is not None:
            with T.stage("imu_stage"), hold():
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
                            prior_g=icfg.prior_g1, prior_a=icfg.prior_a1,
                            vis_rot_sigma=icfg.init_vis_rot_sigma,
                            vis_pos_sigma=icfg.init_vis_pos_sigma,
                            max_logs_sigma=icfg.init_max_logs_sigma):
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

    def _local_inertial_ba(self, kf: int, hold=None):
        import contextlib

        from .inertial import local_inertial_ba

        if hold is None:
            hold = lambda: contextlib.nullcontext()
        # until VIBA2 declares biases converged, keep zero-mean priors on:
        # with gentle motion a free accel bias absorbs the scale/gravity
        # signal (ref keeps priorA=1e5 until the 15s FIBA, LocalMapping.cc)
        icfg = self.cfg.inertial
        pg, pa = (0.0, 0.0) if self.map.inertial_ba2 else (
            icfg.prior_g2, icfg.prior_a2)
        local_inertial_ba(
            self.map, kf, self.camera, self.imu_calib, self.inv_sigma2,
            window=icfg.local_window, prior_g=pg, prior_a=pa, hold=hold)

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
        if self._devk is not None:
            self._devk.cache.drop(cand)
        if getattr(self, "loop_closer", None) is not None:
            self.loop_closer.on_kf_erased(cand)
        # trajectory-recovery anchor: the STRONGEST SURVIVING COVISIBLE
        # (snapshot before the covis maps are cleared). The temporal
        # spanning-tree parent can be seconds away, and later BA deforms
        # the map non-rigidly between here and there — measured up to
        # 0.76 map units of recovery error anchoring at the parent, vs
        # millimetric with the top covisible (which moves WITH the
        # culled KF's neighborhood under any later correction).
        anchor = int(m.kf_parent[cand])
        best_w = 0
        for o, w in m.covis[cand].items():
            if m.kf_valid[o] and o != cand and w > best_w:
                anchor, best_w = int(o), int(w)
        for slot in np.nonzero(m.kf_mp[cand] >= 0)[0]:
            m.erase_observation(int(m.kf_mp[cand, slot]), cand)
        for o in list(m.covis[cand]):
            m.covis[o].pop(cand, None)
        m.covis[cand] = {}
        m.kf_valid[cand] = False
        # store pose relative to the anchor for trajectory recovery
        # (ref: KeyFrame::SetBadFlag mTcp)
        parent = int(m.kf_parent[cand])
        if anchor >= 0:
            Rp, tp = m.kf_R[anchor], m.kf_t[anchor]
            Rcp = m.kf_R[cand] @ Rp.T
            tcp = m.kf_t[cand] - Rcp @ tp
            m.kf_tcp[cand] = (Rcp, tcp)
            # the recovery walk follows kf_parent: point the culled
            # node's own parent at the anchor (children were already
            # reparented to the original parent below, so the live
            # spanning tree is unaffected)
            m.kf_parent[cand] = anchor
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
    def _create_new_points(self, kf: int, hold=None):
        """ref: CreateNewMapPoints (LocalMapping.cc:383).

        TPU-shaped: ALL neighbors' candidate matches go through ONE device
        dispatch (map_device.make_tri_kernel) — the epipolar masks are
        computed ON DEVICE from per-neighbor fundamental/essential
        matrices against the device-cached KF features (the round-4 host
        version shipped the dense [N, T*N] mask per call, megabytes
        through a bandwidth-limited tunnel); the per-match two-view
        triangulation + gates run in vectorized numpy. One-to-one
        resolution across the concatenated columns gives each new feature
        its single best triangulation partner over the whole neighborhood
        (the serial reference lets the first neighbor claim,
        ORBmatcher::SearchForTriangulation per pair).

        hold: optional lock-context factory (async worker) — the map lock
        is held for the READ/snapshot and the INSERT sections only; the
        device match and the host SVD/gates run lock-free on the snapshot
        (the reference likewise searches/triangulates without
        mMutexMapUpdate and mutates under per-object mutexes)."""
        import contextlib

        if hold is None:
            hold = lambda: contextlib.nullcontext()
        m = self.map
        cfg = self.cfg.mapping
        cam = self.camera
        kb8 = self.camspec.kind == "kb8"
        Fms, free2_l, sig2_l, used = [], [], [], []
        pose_snap = {}
        with hold():
            neighbors = m.best_covisible(kf, cfg.n_triangulate_neighbors)
            R1, t1 = m.kf_R[kf].copy(), m.kf_t[kf].copy()
            O1 = m.kf_center(kf)
            f1 = m.kf_feats[kf]
            free1 = (m.kf_mp[kf] < 0) & f1.valid
            if not free1.any():
                m.update_connections(kf)
                return 0
            for kn in neighbors:
                R2, t2 = m.kf_R[kn].copy(), m.kf_t[kn].copy()
                O2 = m.kf_center(kn)
                baseline = np.linalg.norm(O2 - O1)
                med_depth = self._median_depth(kn)
                if med_depth <= 0 or \
                        baseline / med_depth < cfg.min_baseline_depth_ratio:
                    continue
                pose_snap[kn] = (R2, t2)
                f2 = m.kf_feats[kn]
                free2_l.append((m.kf_mp[kn] < 0) & f2.valid)
                # essential from relative pose (ref ComputeF12,
                # LocalMapping.cc)
                R12 = R1 @ R2.T
                t12 = -R12 @ t2 + t1
                E12 = np.array([[0, -t12[2], t12[1]],
                                [t12[2], 0, -t12[0]],
                                [-t12[1], t12[0], 0]]) @ R12
                if kb8:
                    # fisheye: no common image plane for a pixel F-matrix —
                    # gate on the essential matrix in NORMALIZED ray coords
                    # (camera-generic equivalent of KB8 epipolarConstrain,
                    # KannalaBrandt8.cpp:202); thresholds scale by 1/fx.
                    Fms.append(E12.astype(np.float32))
                    sig2_l.append(
                        3.84 * self.sf[f2.octave] ** 2 / float(cam.fx) ** 2)
                else:
                    Kinv = np.linalg.inv(cam.K().astype(np.float64))
                    Fms.append((Kinv.T @ E12 @ Kinv).astype(np.float32))
                    sig2_l.append(3.84 * self.sf[f2.octave] ** 2)
                used.append(kn)
        if not used:
            with hold():
                m.update_connections(kf)
            return 0
        n2 = f1.n  # per-neighbor feature count (fixed extractor budget)
        # NO ratio test: the reference's SearchForTriangulation gates on
        # dist<TH_LOW + epipolar only (ORBmatcher.cc:1061-1085); rotation
        # histogram + one-to-one run inside the kernel
        from ..utils.timing import GLOBAL_TIMER as _T
        with _T.stage("tri.kernel"):
            midx, _ = self.devk.tri_match(
                m, kf, free1, used, np.stack(Fms), np.stack(free2_l), kb8,
                np.stack(sig2_l).astype(np.float32))
        r1 = np.nonzero(midx >= 0)[0]
        if len(r1) == 0:
            with hold():
                m.update_connections(kf)
            return 0
        t_idx = midx[r1] // n2
        i2 = midx[r1] % n2
        i1 = r1
        kns = np.asarray(used)[t_idx]
        R2s = np.stack([pose_snap[int(k)][0] for k in kns])
        t2s = np.stack([pose_snap[int(k)][1] for k in kns])
        # two-view DLT triangulation, vectorized on host (M ~ hundreds)
        P1 = np.concatenate([R1, t1[:, None]], 1)
        P2 = np.concatenate([R2s, t2s[:, :, None]], 2)  # [M,3,4]
        x1 = f1.norm_xy[i1]
        f2cat_norm = np.stack([m.kf_feats[k].norm_xy for k in used])
        f2cat_und = np.stack([m.kf_feats[k].und_xy for k in used])
        f2cat_oct = np.stack([m.kf_feats[k].octave for k in used])
        x2 = f2cat_norm[t_idx, i2]
        A = np.stack([
            x1[:, 0, None] * P1[2][None] - P1[0][None],
            x1[:, 1, None] * P1[2][None] - P1[1][None],
            x2[:, 0, None] * P2[:, 2] - P2[:, 0],
            x2[:, 1, None] * P2[:, 2] - P2[:, 1],
        ], axis=1)  # [M,4,4]
        _, _, Vt = np.linalg.svd(A)
        Xh = Vt[:, -1]
        X = Xh[:, :3] / np.where(np.abs(Xh[:, 3:]) < 1e-12, 1e-12, Xh[:, 3:])
        # gates (ref LocalMapping.cc:470-720): parallax, cheirality,
        # reprojection chi2, scale consistency
        O2s = -np.einsum("mij,mi->mj", R2s, t2s)
        r1 = X - O1[None]
        r2 = X - O2s
        d1 = np.linalg.norm(r1, axis=1)
        d2 = np.linalg.norm(r2, axis=1)
        cosp = np.sum(r1 * r2, 1) / np.maximum(d1 * d2, 1e-12)
        Xc1 = X @ R1.T + t1
        Xc2 = np.einsum("mij,mj->mi", R2s, X) + t2s
        uv1 = cam.project_np(Xc1)
        uv2 = cam.project_np(Xc2)
        oct2 = f2cat_oct[t_idx, i2]
        e1 = ((uv1 - f1.und_xy[i1]) ** 2).sum(1) / self.sf[f1.octave[i1]] ** 2
        e2 = ((uv2 - f2cat_und[t_idx, i2]) ** 2).sum(1) / self.sf[oct2] ** 2
        ratio_d = d1 / np.maximum(d2, 1e-9)
        ratio_oct = self.sf[f1.octave[i1]] / self.sf[oct2]
        ok = (
            (cosp < 0.9998)
            & (Xc1[:, 2] > 0)
            & (Xc2[:, 2] > 0)
            & (e1 < 5.991)
            & (e2 < 5.991)
            & (ratio_d < ratio_oct * 1.5 * self.sf[1])
            & (ratio_d * 1.5 * self.sf[1] > ratio_oct)
        )
        n_created = 0
        with hold():
            for w in np.nonzero(ok)[0]:
                a, b, kn = int(i1[w]), int(i2[w]), int(kns[w])
                if m.kf_mp[kf, a] >= 0 or m.kf_mp[kn, b] >= 0 \
                        or not m.kf_valid[kn]:
                    continue
                mp = m.add_point(X[w], kf, a)
                m.add_observation(mp, kn, b)
                m.update_point_stats(mp)
                self.recent_points.append((mp, kf))
                n_created += 1
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
    def _fuse_neighbors(self, kf: int, hold=None):
        """ref: SearchInNeighbors (LocalMapping.cc:729) + ORBmatcher::Fuse.

        TPU-shaped: both directions (this KF's points into every neighbor;
        the neighborhood's points into this KF) are ONE device dispatch
        each (map_device.make_fuse_kernel) — per-target frustum / window /
        scale masks are computed ON DEVICE against the device-cached KF
        features (the round-4 host version shipped a [T*N, P] dense mask,
        ~30 MB per keyframe through the tunnel).

        hold: optional lock-context factory — snapshot + merge sections
        run under the map lock, the kernel runs lock-free."""
        import contextlib

        if hold is None:
            hold = lambda: contextlib.nullcontext()
        from ..utils.timing import GLOBAL_TIMER as T

        m = self.map
        with T.stage("fuse.snap"), hold():
            targets = m.best_covisible(kf, 10)
            second = set()
            for kn in targets:
                for o in m.best_covisible(kn, 5):
                    if o != kf and o not in targets:
                        second.add(o)
            targets = [k for k in list(targets) + list(second)
                       if m.kf_valid[k]][:32]  # one fixed kernel bucket
            own = np.unique(m.kf_mp[kf])
            own = own[own >= 0]
            own = own[m.mp_valid[own]]
            snap_fwd = (self.devk.fuse_snapshot(m, targets, own)
                        if len(own) and targets else None)
            nbr_pts = (np.unique(m.kf_mp[targets]) if targets
                       else np.zeros(0, int))
            nbr_pts = nbr_pts[nbr_pts >= 0]
            nbr_pts = nbr_pts[m.mp_valid[nbr_pts]]
            # chunk at the kernel's fixed 4096-point bucket
            rev_chunks = [nbr_pts[i:i + 4096]
                          for i in range(0, len(nbr_pts), 4096)]
            snaps_rev = [self.devk.fuse_snapshot(m, [kf], c)
                         for c in rev_chunks]
        if snap_fwd is not None:
            with T.stage("fuse.kernel"):
                bf, bd = self.devk.fuse_run(snap_fwd)
            with T.stage("fuse.merge"), hold():
                self._merge_candidates(targets, own, bf)
        for chunk, snap_rev in zip(rev_chunks, snaps_rev):
            with T.stage("fuse.kernel"):
                bf, bd = self.devk.fuse_run(snap_rev)
            with T.stage("fuse.merge"), hold():
                self._merge_candidates([kf], chunk, bf)
        with T.stage("fuse.stats"), hold():
            m.update_point_stats_batch(np.unique(m.kf_mp[kf]))
            m.update_connections(kf)

    def _merge_candidates(self, targets, mp_ids, best_feat):
        """Apply fuse results: per (target KF, point) best feature — merge
        with the slot's existing point or claim a free slot
        (ORBmatcher::Fuse semantics, ORBmatcher.cc:1403: each projected
        point keeps its single best feature; slot conflicts resolve by
        observation count via Replace). Runs under the map lock;
        staleness-guarded against cull/replace during the kernel."""
        m = self.map
        ti, pi = np.nonzero(best_feat >= 0)
        for t_i, p in zip(ti, pi):
            kn = targets[int(t_i)]
            if not m.kf_valid[kn]:
                continue
            slot = int(best_feat[t_i, p])
            mp = int(mp_ids[p])
            if not m.mp_valid[mp]:
                continue
            existing = int(m.kf_mp[kn, slot])
            if existing >= 0:
                if existing != mp and m.mp_valid[existing]:
                    # keep the one with more observations (ref: Fuse)
                    if len(m.mp_obs[existing]) > len(m.mp_obs[mp]):
                        m.replace_point(mp, existing)
                    else:
                        m.replace_point(existing, mp)
            else:
                m.add_observation(mp, kn, slot)

    def _fuse_into(self, kf: int, mp_ids):
        """Project mp_ids into kf and merge (also the loop-correction weld
        fuse, ref SearchAndFuse LoopClosing.cc:2159). Caller holds the map
        lock."""
        m = self.map
        mp_ids = np.asarray(mp_ids, np.int64)
        mp_ids = mp_ids[mp_ids >= 0]
        mp_ids = mp_ids[m.mp_valid[mp_ids]]
        if len(mp_ids) == 0 or not m.kf_valid[kf]:
            return
        snap = self.devk.fuse_snapshot(m, [kf], mp_ids)
        bf, _ = self.devk.fuse_run(snap)
        self._merge_candidates([kf], mp_ids, bf)

    # ---------------------------------------------------------------- localBA
    def _local_ba(self, kf: int, hold=None):
        """ref: Optimizer::LocalBundleAdjustment (Optimizer.cc:1699):
        window = covisible KFs of kf; points they see; fixed frontier =
        other KFs observing those points; 5+10 LM schedule with chi2 pruning."""
        window = [kf] + self.map.best_covisible(kf)
        window_ba(self.map, self.camera, self.camspec, self.inv_sigma2,
                  self.bf, window, n_iters=self.cfg.mapping.local_ba_iters,
                  abort_check=self.abort_check, hold=hold)


def window_ba(m: SlamMap, camera, camspec, inv_sigma2, bf, window,
              n_iters: int = 15, abort_check=None, fixed_kfs=None,
              hold=None):
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
    hold: optional lock-context factory — assembly and write-back run
    under the map lock, the LM solves run lock-free on the snapshot (the
    reference holds no map mutex across the g2o iterations either;
    write-back takes it, Optimizer.cc:2215).
    """
    import contextlib

    if hold is None:
        hold = lambda: contextlib.nullcontext()
    cam = camera
    fixed_kfs = set(int(k) for k in (fixed_kfs or ()))
    with hold():
        snap = _window_ba_assemble(m, inv_sigma2, window, fixed_kfs)
    if snap is None:
        return
    (window, kf_list, kf_index, fixed, pts, obs_kf, obs_pt, uvr, inv_s2,
     stereo, obs_j, obs_okf, R0s, t0s, X0s) = snap
    chi2_th = np.where(stereo, 7.815, 5.991)
    # phase 1 (5 it robust), prune, phase 2 (ref :2048,:2121) — solves on
    # the SNAPSHOT, no lock held
    Rf, tf, Xf, chi2, posz = B.ba_solve_np(
        R0s, t0s, X0s,
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
    with hold():
        # write back (staleness-guarded: culled KFs/points are skipped)
        for i in np.nonzero(~fixed)[0]:
            if m.kf_valid[kf_list[i]]:
                m.kf_R[kf_list[i]] = Rf[i]
                m.kf_t[kf_list[i]] = tf[i]
        live = m.mp_valid[pts]
        m.mp_pos[pts[live]] = Xf[live]
        # erase observations that remain outliers (ref :2259-2290)
        bad = (chi2 > chi2_th) | ~posz
        for o in np.nonzero(bad)[0]:
            j, okf = int(obs_j[o]), int(obs_okf[o])
            if m.mp_valid[j]:
                m.erase_observation(j, okf)
        m.update_point_stats_batch(pts)
        # map changed: the tracker's inertial prior / cached tensors must
        # rebase (ref: LocalBundleAdjustment -> Map::IncreaseChangeIndex,
        # read by Tracking's mbMapUpdated / UpdateFrameIMU handshake)
        m.map_version += 1


def _window_ba_assemble(m, inv_sigma2, window, fixed_kfs):
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
    # vectorized per-KF observation assembly (one numpy pass per keyframe
    # row instead of a Python walk over every observation dict)
    pt_row = np.full(int(pts.max()) + 1, -1, np.int32)
    pt_row[pts] = np.arange(len(pts), dtype=np.int32)
    obs_kf_l, obs_pt_l, uvr_l, is2_l, st_l, oj_l, okf_l = \
        [], [], [], [], [], [], []
    for k in kf_list:
        row = m.kf_mp[k]
        slots = np.nonzero((row >= 0) & (row <= pts.max()))[0]
        rows = pt_row[row[slots]]
        ok = rows >= 0
        slots, rows = slots[ok], rows[ok]
        if len(slots) == 0:
            continue
        f = m.kf_feats[k]
        ur = (f.u_right[slots] if f.u_right is not None
              else np.full(len(slots), -1.0))
        obs_kf_l.append(np.full(len(slots), kf_index[k], np.int32))
        obs_pt_l.append(rows)
        uvr_l.append(np.concatenate(
            [f.und_xy[slots], np.where(ur >= 0, ur, 0.0)[:, None]], 1))
        is2_l.append(inv_sigma2[f.octave[slots]])
        st_l.append(ur >= 0)
        oj_l.append(row[slots])
        okf_l.append(np.full(len(slots), k, np.int64))
    if not obs_kf_l:
        return
    obs_kf = np.concatenate(obs_kf_l)
    obs_pt = np.concatenate(obs_pt_l)
    uvr = np.concatenate(uvr_l)
    inv_s2 = np.concatenate(is2_l)
    stereo = np.concatenate(st_l)
    obs_j = np.concatenate(oj_l)
    obs_okf = np.concatenate(okf_l)
    return (window, kf_list, kf_index, fixed, pts, obs_kf, obs_pt, uvr,
            inv_s2, stereo, obs_j, obs_okf,
            m.kf_R[kf_list].copy(), m.kf_t[kf_list].copy(),
            m.mp_pos[pts].copy())

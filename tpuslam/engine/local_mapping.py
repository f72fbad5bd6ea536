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
            with T.stage("fuse"), hold():
                self._fuse_neighbors(kf)
            with T.stage("local_ba"):
                if m.imu_initialized:
                    with hold():
                        self._local_inertial_ba(kf)
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
    def _create_new_points(self, kf: int, hold=None):
        """ref: CreateNewMapPoints (LocalMapping.cc:383).

        TPU-shaped: ALL neighbors' candidate matches go through ONE masked
        matcher dispatch (columns = concatenated neighbor features, masks
        block-built on host), and the per-match two-view triangulation +
        gates run in vectorized numpy — the serial per-neighbor loop cost
        ~3 device round trips x 20 neighbors through a tunneled backend.
        One-to-one resolution across the concatenated columns gives each
        new feature its single best triangulation partner over the whole
        neighborhood (the serial reference lets the first neighbor claim,
        ORBmatcher::SearchForTriangulation per pair).

        hold: optional lock-context factory (async worker) — the map lock
        is held for the READ/mask-build and the INSERT sections only; the
        device match and the host SVD/gates run lock-free on the snapshot
        (the reference likewise searches/triangulates without
        mMutexMapUpdate and mutates under per-object mutexes)."""
        import contextlib

        if hold is None:
            hold = lambda: contextlib.nullcontext()
        m = self.map
        cfg = self.cfg.mapping
        cam = self.camera
        with hold():
            neighbors = m.best_covisible(kf, cfg.n_triangulate_neighbors)
            R1, t1 = m.kf_R[kf].copy(), m.kf_t[kf].copy()
            O1 = m.kf_center(kf)
            f1 = m.kf_feats[kf]
            free1 = (m.kf_mp[kf] < 0) & f1.valid
        sel1 = np.nonzero(free1)[0]  # mask rows only for FREE features
        if len(sel1) == 0:
            with hold():
                m.update_connections(kf)
            return 0
        Kinv = np.linalg.inv(cam.K().astype(np.float64))
        x1h_und = np.concatenate(
            [f1.und_xy[sel1], np.ones((len(sel1), 1))], 1).astype(np.float32)
        x1h_nrm = np.concatenate(
            [f1.norm_xy[sel1], np.ones((len(sel1), 1))], 1).astype(np.float32)
        masks, bits_l, ang_l, used = [], [], [], []
        pose_snap = {}
        with hold():
          for kn in neighbors:
            R2, t2 = m.kf_R[kn].copy(), m.kf_t[kn].copy()
            O2 = m.kf_center(kn)
            baseline = np.linalg.norm(O2 - O1)
            med_depth = self._median_depth(kn)
            if med_depth <= 0 or baseline / med_depth < cfg.min_baseline_depth_ratio:
                continue
            pose_snap[kn] = (R2, t2)
            f2 = m.kf_feats[kn]
            free2 = (m.kf_mp[kn] < 0) & f2.valid
            # essential from relative pose (ref ComputeF12, LocalMapping.cc)
            R12 = R1 @ R2.T
            t12 = -R12 @ t2 + t1
            E12 = np.array([[0, -t12[2], t12[1]],
                            [t12[2], 0, -t12[0]],
                            [-t12[1], t12[0], 0]]) @ R12
            if self.camspec.kind == "kb8":
                # fisheye: no common image plane for a pixel F-matrix —
                # gate on the essential matrix in NORMALIZED ray coords
                # (camera-generic equivalent of KB8 epipolarConstrain,
                # KannalaBrandt8.cpp:202); thresholds scale by 1/fx.
                emask = M.epipolar_mask_np(
                    f2.norm_xy.astype(np.float32),
                    x1h_nrm @ E12.astype(np.float32), f2.octave,
                    self.sf ** 2 / float(cam.fx) ** 2,
                )
            else:
                F12 = (Kinv.T @ E12 @ Kinv).astype(np.float32)
                emask = M.epipolar_mask_np(
                    f2.und_xy.astype(np.float32), x1h_und @ F12, f2.octave,
                    self.sf ** 2
                )
            masks.append(emask & free2[None, :])
            bits_l.append(f2.bits)
            ang_l.append(f2.angle)
            used.append(kn)
        if not masks:
            with hold():
                m.update_connections(kf)
            return 0
        n2 = f1.n  # per-neighbor feature count (fixed extractor budget)
        # NO ratio test: the reference's SearchForTriangulation gates on
        # dist<TH_LOW + epipolar only (ORBmatcher.cc:1061-1085)
        midx, _ = M.match_padded(
            f1.bits[sel1], np.concatenate(bits_l, 0),
            np.concatenate(masks, 1), max_dist=M.TH_LOW,
            ang_a=f1.angle[sel1], ang_b=np.concatenate(ang_l),
        )
        r1 = np.nonzero(midx >= 0)[0]
        if len(r1) == 0:
            with hold():
                m.update_connections(kf)
            return 0
        t_idx = midx[r1] // n2
        i2 = midx[r1] % n2
        i1 = sel1[r1]
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
    def _fuse_neighbors(self, kf: int):
        """ref: SearchInNeighbors (LocalMapping.cc:729) + ORBmatcher::Fuse.

        TPU-shaped: the forward direction (this KF's points into every
        neighbor) is ONE masked matcher dispatch — rows are the
        concatenated target features, columns the own points; per-target
        frustum/window/scale gates are block-built on host. The serial
        per-target loop cost one dispatch x ~30 targets."""
        m = self.map
        targets = m.best_covisible(kf, 10)
        second = set()
        for kn in targets:
            for o in m.best_covisible(kn, 5):
                if o != kf and o not in targets:
                    second.add(o)
        targets = [k for k in list(targets) + list(second) if m.kf_valid[k]]
        own = np.unique(m.kf_mp[kf])
        own = own[own >= 0]
        own = own[m.mp_valid[own]]
        if len(own) and targets:
            self._fuse_batched(targets, own)
        # reverse: fuse neighbor points into kf (one more dispatch)
        nbr_pts = np.unique(m.kf_mp[targets]) if targets else np.zeros(0, int)
        nbr_pts = nbr_pts[nbr_pts >= 0]
        self._fuse_into(kf, nbr_pts)
        m.update_point_stats_batch(np.unique(m.kf_mp[kf]))
        m.update_connections(kf)

    def _fuse_batched(self, targets, mp_ids):
        """Project mp_ids into EVERY target KF with one matcher dispatch;
        merge duplicates / claim free slots (ORBmatcher::Fuse semantics,
        ORBmatcher.cc:1403)."""
        m = self.map
        cam = self.camera
        X = m.mp_pos[mp_ids]
        P = len(mp_ids)
        masks, bits_rows = [], []
        for kn in targets:
            R, t = m.kf_R[kn], m.kf_t[kn]
            Xc = X @ R.T + t
            uv = cam.project_np(Xc)
            Ow = m.kf_center(kn)
            vdir = X - Ow[None]
            dist = np.linalg.norm(vdir, axis=1)
            cosv = np.sum(vdir * m.mp_normal[mp_ids], 1) / np.maximum(
                dist, 1e-9)
            okp = (
                (Xc[:, 2] > 0)
                & (uv[:, 0] >= 0) & (uv[:, 0] < cam.width)
                & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
                & (dist >= 0.8 * m.mp_min_dist[mp_ids])
                & (dist <= 1.2 * m.mp_max_dist[mp_ids])
                & (cosv > 0.5)
            )
            f = m.kf_feats[kn]
            sel = np.nonzero(okp)[0]  # window math on in-frustum subset
            block = np.zeros((f.n, P), bool)
            if len(sel):
                pred = m.predict_scale(np.maximum(dist[sel], 1e-9),
                                       mp_ids[sel])
                mask_pn = (
                    M.window_mask_np(
                        uv[sel].astype(np.float32),
                        f.xy.astype(np.float32),
                        (self.cfg.mapping.fuse_radius
                         * self.sf[pred]).astype(np.float32))
                    & f.valid[None, :]
                    & M.level_mask_np(pred, f.octave, 1, 1)
                )  # [P', N]
                block[:, sel] = mask_pn.T
            masks.append(block)  # rows = target features
            bits_rows.append(f.bits)
        big_mask = np.concatenate(masks, 0)        # [T*N, P]
        big_bits = np.concatenate(bits_rows, 0)    # [T*N, 256]
        midx, mdist = M.match_padded(
            big_bits, m.mp_bits[mp_ids], big_mask, max_dist=M.TH_LOW,
            one_to_one=False,
        )
        n_feat = m.kf_feats[targets[0]].n
        rows = np.nonzero(midx >= 0)[0]
        # per-(target, point) dedup: keep the best-distance feature (the
        # reference projects each point and keeps its single best feature)
        best: dict[tuple, tuple] = {}
        for r in rows:
            t_i = int(r // n_feat)
            slot = int(r % n_feat)
            p = int(midx[r])
            key = (t_i, p)
            d = int(mdist[r])
            if key not in best or d < best[key][0]:
                best[key] = (d, slot)
        for (t_i, p), (_, slot) in best.items():
            kn = targets[t_i]
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
        """Project mp_ids into kf; merge with existing or claim free slots."""
        m = self.map
        cam = self.camera
        mp_ids = np.array([j for j in mp_ids if m.mp_valid[j]], np.int32)
        if len(mp_ids) == 0:
            return
        R, t = m.kf_R[kf], m.kf_t[kf]
        X = m.mp_pos[mp_ids]
        Xc = X @ R.T + t
        uv = cam.project_np(Xc)
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

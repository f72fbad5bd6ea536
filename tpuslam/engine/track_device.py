"""Fused on-device tracking step: the whole per-frame hot path in ONE
dispatch + ONE fetch.

Round-3's measured System bottleneck was not kernel time but HOST
round-trips: `Tracker._track_frame` ran ~10-20 separate device dispatches
per frame (extract, several match_padded calls, up to 5 pose solves), each
followed by a value fetch. Per-frame latency was therefore dominated by
dispatch/fetch round-trips (≈25 ms each through the axon tunnel), not by
the ≈2 ms of actual TPU work — the reference has no such boundary because
its CPU threads share memory (src/Tracking.cc:829 Track() runs in-process).

The TPU-native fix (VERDICT r3 item 1): keep the LOCAL MAP device-resident
and fuse the whole chain

    extract(L,R) -> stereo depth -> reference-KF descriptor match
    -> pose LM -> [project local map -> masked window match -> pose LM] x3

into one jit program with static shapes. The host keeps the state machine,
the KF decision, and the map store; per frame it uploads two images + the
(bucketed) local-map tensors and fetches one small result struct:
pose, per-point feature association, inlier/visible/found masks.

Semantics mirror engine/tracking.py's host path (which remains the
fallback for relocalization, initialization, VI and fisheye):
  - reference-KF pass: ref Tracking::TrackReferenceKeyFrame
    (src/Tracking.cc:1750) — descriptor-only match, ratio + rotation
    consistency, motion-only pose optimization.
  - local-map passes: ref Tracking::TrackLocalMap (:1974) with
    SearchLocalPoints frustum gates (:2358 / Frame::isInFrustum :483) and
    SearchByProjection same-octave ratio gating (ORBmatcher.cc:130);
    full re-association iterated 3x to the fixed point (see
    engine/tracking.py's survivor-bias analysis), with one conditional
    window widening (ref widens th the same way, Tracking.cc:2377-2392).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import match as M
from ..ops.hamming import hamming_matrix
from ..ops.orb import OrbConfig, _extract_impl
from ..utils.pad import bucket, pad_to


def _pose_solver():
    """Pallas fused LM on TPU backends, XLA elsewhere (same semantics —
    see solve/pose_opt_dispatch.py)."""
    from ..solve.pose_opt_dispatch import _tpu_backend

    if _tpu_backend():
        from ..solve.pose_opt_pallas import pose_optimize_fused
        return pose_optimize_fused
    from ..solve.pose_opt import pose_optimize
    return pose_optimize


def make_fused_step(camera, orb_cfg: OrbConfig, tcfg, n_levels: int,
                    scale: float, bf: float, stereo: bool,
                    n_passes: int = 3, sad: str = "pyramid"):
    """Build the jittable fused tracking step for one camera/config.

    Returned callable signature (all device arrays, f32 unless noted):
      step(imgs [2,H,W] (or [1,H,W] mono),
           mapGeo [P,8] (X | normal | min_dist | max_dist) — one packed
           upload, mapBits [P,256] u8, mapValid [P] bool,
           refBits [N,256] u8, refMeta [N,2] (angle, map row or -1),
           R0 [3,3], t0 [3], min_req2 i32)   # widen threshold (2*min_req)
    ->  dict(R, t, assoc [N] i32 map row per feature or -1,
             found [P] bool, visible [P] bool, n_inliers i32, feats {...})

    Compiled once per (image size, P bucket); P is the local-map bucket.
    Inputs are PACKED into few arrays: per-frame host->device traffic is
    the dominant cost through a tunneled backend, and each separate array
    is a separate transfer.
    """
    sf = jnp.asarray((scale ** np.arange(n_levels)).astype(np.float32))
    inv_s2 = 1.0 / sf ** 2
    log_sf = float(np.log(scale))
    solver = _pose_solver()
    fx, fy = float(camera.fx), float(camera.fy)
    cx, cy = float(camera.cx), float(camera.cy)
    W, H = float(camera.width), float(camera.height)
    f32 = jnp.float32

    def extract(imgs):
        if stereo:
            from ..ops.stereo import sad_refine_pyramid, stereo_match

            out = jax.vmap(
                lambda im: _extract_impl(im, orb_cfg, orb_cfg.ini_th,
                                         orb_cfg.min_th))(imgs.astype(f32))
            fl = {k: v[0] for k, v in out.items()}
            fr = {k: v[1] for k, v in out.items()}
            u_r, disp, ok = stereo_match(
                fl["bits"], fr["bits"], fl["xy"], fr["xy"],
                fl["octave"], fr["octave"], fl["valid"], fr["valid"],
                sf, 0.3, fx)
            if sad == "pyramid":
                from ..ops.stereo import sad_refine_pyramid as sad_fn
                u_r, sadv, ok = sad_fn(
                    imgs[0].astype(f32), imgs[1].astype(f32), fl["xy"],
                    fl["octave"], u_r, ok, n_levels=n_levels, scale=scale)
            else:  # level-0 SAD: cheaper gathers, same parabola refine
                from ..ops.stereo import sad_refine as sad_fn
                u_r, sadv, ok = sad_fn(
                    imgs[0].astype(f32), imgs[1].astype(f32), fl["xy"],
                    u_r, ok)
            # median-SAD outlier filter (ref Frame.cc:931-975): masked
            # median over the ok set, th = 1.5 * 1.4 * median
            big = jnp.where(ok, sadv, jnp.inf)
            n_ok = jnp.maximum(jnp.sum(ok), 1)
            med = jnp.sort(big)[jnp.clip(n_ok // 2, 0, sadv.shape[0] - 1)]
            ok = ok & (sadv < 1.5 * 1.4 * med)
            disp = fl["xy"][:, 0] - u_r
            ok = ok & (disp > 1e-3)
            z = jnp.where(ok, bf / jnp.maximum(disp, 1e-9), -1.0)
            fl["u_right"] = jnp.where(ok, u_r, -1.0)
            fl["depth"] = z
            return fl
        f = _extract_impl(imgs[0].astype(f32), orb_cfg, orb_cfg.ini_th,
                          orb_cfg.min_th)
        f["u_right"] = jnp.full((f["xy"].shape[0],), -1.0, f32)
        f["depth"] = jnp.full((f["xy"].shape[0],), -1.0, f32)
        return f

    def pose_opt(R, t, Xrows, uvr_rows, is2_rows, stereo_rows, valid_rows,
                 n_rounds=4):
        """Intermediate passes run a SHORT LM schedule (2 rounds): their
        pose only seeds the next re-association, so the full 4x10
        robust-reclassification schedule (ref Optimizer.cc:854) is spent
        once, on the final pass — the chain is latency-bound (the whole
        solve is sequential on device)."""
        return solver(R, t, Xrows, uvr_rows, is2_rows, stereo_rows,
                      valid_rows, fx, fy, cx, cy, bf, n_rounds=n_rounds)

    def step(imgs, mapGeo, mapBits, mapValid, refBits, refMeta, pose_in,
             min_req2v):
        # pose_in [13]: R0 (9, row-major) | t0 (3) | ignored — the SAME
        # layout as the output "pose", so the pipelined mode chains the
        # previous step's device output straight in without a fetch.
        # min_req2v [1]: widen threshold (uploaded only when it changes).
        R0 = pose_in[:9].reshape(3, 3)
        t0 = pose_in[9:12]
        min_req2 = min_req2v[0].astype(jnp.int32)
        mapX = mapGeo[:, 0:3]
        mapNormal = mapGeo[:, 3:6]
        mapMind = mapGeo[:, 6]
        mapMaxd = mapGeo[:, 7]
        refAng = refMeta[:, 0]
        refRow = refMeta[:, 1].astype(jnp.int32)
        feats = extract(imgs)
        xy = feats["xy"]
        # undistort + normalized coords on device (host _features_from)
        if getattr(camera, "has_distortion", lambda: False)():
            und = camera.undistort_points(xy)
        else:
            und = xy
        norm = jnp.stack([(und[:, 0] - cx) / fx, (und[:, 1] - cy) / fy], -1)
        feats["und_xy"] = und
        feats["norm_xy"] = norm
        fvalid = feats["valid"]
        N = xy.shape[0]
        P = mapX.shape[0]
        uvr_feat = jnp.concatenate(
            [und, jnp.maximum(feats["u_right"], 0.0)[:, None]], -1)
        st_feat = feats["u_right"] >= 0
        is2_feat = inv_s2[feats["octave"]]

        # ---- pass A: reference-KF descriptor match (window-free)
        dist_ref = hamming_matrix(refBits, feats["bits"])
        mask_ref = (refRow >= 0)[:, None] & fvalid[None, :]
        idx, best, second = M.masked_best2(dist_ref, mask_ref)
        ok = (best <= M.TH_LOW) & (
            best.astype(f32) < tcfg.nn_ratio_ref_kf * second.astype(f32))
        ok = M.rotation_consistency(refAng, jnp.take(feats["angle"], idx), ok)
        idx, ok = M.resolve_duplicates(idx, best, ok, N)
        # per-feature association with the matched map row
        # out-of-range sentinel N + mode="drop" discards non-matches
        assocA = jnp.full((N,), -1, jnp.int32).at[
            jnp.where(ok, idx, N)].set(refRow, mode="drop")
        avalidA = assocA >= 0
        XA = mapX[jnp.clip(assocA, 0, P - 1)]
        R1, t1, _, _ = pose_opt(R0, t0, XA, uvr_feat, is2_feat,
                                st_feat & avalidA, avalidA, n_rounds=2)

        # ---- local-map passes: hamming matrix is pose-independent ->
        # compute once, re-mask per pass
        dist_map = hamming_matrix(mapBits, feats["bits"])
        oct_b = feats["octave"]

        def local_pass(R, t, radius_mult, n_rounds=4):
            Xc = mapX @ R.T + t
            z = Xc[:, 2]
            uv = camera.project(Xc)
            Ow = -R.T @ t
            vdir = mapX - Ow[None]
            d = jnp.linalg.norm(vdir, axis=1)
            cosv = jnp.sum(vdir * mapNormal, 1) / jnp.maximum(d, 1e-9)
            in_img = (
                (z > 0)
                & (uv[:, 0] >= 0) & (uv[:, 0] < W)
                & (uv[:, 1] >= 0) & (uv[:, 1] < H)
                & (d >= 0.8 * mapMind) & (d <= 1.2 * mapMaxd)
                & (cosv > 0.5) & mapValid
            )  # ref Frame::isInFrustum (:483)
            ratio = mapMaxd / jnp.maximum(d, 1e-9)
            pred = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_sf)
            pred = jnp.clip(pred, 0, n_levels - 1).astype(jnp.int32)
            radius = jnp.where(cosv > 0.998, tcfg.local_map_radius_tight,
                               tcfg.local_map_radius) * sf[pred] * radius_mult
            mask = (
                M.window_mask(uv, xy, radius)
                & in_img[:, None] & fvalid[None, :]
                & M.level_mask(pred, oct_b, 1, 0)
            )
            idx, best, idx2, second = M.masked_best2_idx(dist_map, mask)
            same_oct = jnp.take(oct_b, idx) == jnp.take(oct_b, idx2)
            ok = (best <= M.TH_HIGH) & (
                (~same_oct)
                | (best.astype(f32) < tcfg.nn_ratio_local * second.astype(f32)))
            idx, ok = M.resolve_duplicates(idx, best, ok, N)
            # rows -> features scatter (one-to-one after resolve)
            assoc = jnp.full((N,), -1, jnp.int32).at[
                jnp.where(ok, idx, N)].set(
                    jnp.arange(P, dtype=jnp.int32), mode="drop")
            avalid = assoc >= 0
            Xr = mapX[jnp.clip(assoc, 0, P - 1)]
            R2, t2, inl_f, _ = pose_opt(R, t, Xr, uvr_feat, is2_feat,
                                        st_feat & avalid, avalid,
                                        n_rounds=n_rounds)
            return R2, t2, assoc, inl_f & avalid, in_img

        R2, t2, assoc, inl_f, in_img = local_pass(
            R1, t1, jnp.asarray(1.0, f32),
            n_rounds=2 if n_passes > 1 else 4)
        if n_passes > 1:
            n1 = jnp.sum(inl_f)
            # conditional widen (ref widens SearchByProjection th when weak)
            widen = (n1 < min_req2).astype(f32) * 2.0 + 1.0
            R2, t2, assoc, inl_f, in_img = local_pass(
                R2, t2, widen, n_rounds=2 if n_passes > 2 else 4)
        if n_passes > 2:
            R2, t2, assoc, inl_f, in_img = local_pass(
                R2, t2, jnp.asarray(1.0, f32))

        # per-row "found" flag (map-point indexed) for host counters:
        # row matched by some feature AND that feature is an inlier
        found = jnp.zeros((P,), bool).at[
            jnp.where(assoc >= 0, assoc, P)].set(inl_f, mode="drop")
        # outputs packed into THREE arrays (fetch RPC count matters):
        #   pose_f32 [13] = R (9) | t (3) | n_inliers
        #   assoc    [N]  = map row per feature (-1 none/outlier)
        #   rowflags [2P] = visible | found
        return dict(
            pose=jnp.concatenate([
                R2.reshape(-1), t2,
                jnp.sum(inl_f).astype(f32)[None]]),
            assoc=jnp.where(inl_f, assoc, -1),   # feature -> map row
            rowflags=jnp.concatenate([in_img, found]),
            feats=feats,
        )

    return jax.jit(step)


class DeviceFeatures:
    """Lazy feature holder for the fused path: device arrays stay on chip;
    a numpy FrameFeatures is materialized only when the host needs it
    (keyframe creation, host-path fallback)."""

    def __init__(self, dev: dict):
        self.dev = dev
        self._np = None
        self.n = int(dev["xy"].shape[0])

    def __getattr__(self, name):
        # transparent host fallback: any FrameFeatures field access
        # materializes the numpy view (host tracking paths, KF creation)
        if name.startswith("_") or name in ("dev", "n"):
            raise AttributeError(name)
        return getattr(self.materialize(), name)

    def start_host_copy(self):
        """Begin streaming the feature arrays device->host so a later
        materialize() finds the copies done (keyframe creation runs on the
        tracking thread; the ~40 ms blocking fetch it used to pay is
        overlapped with the next frame's pipeline instead). The 256-byte
        unpacked descriptors are NOT shipped — they are reconstructed from
        `packed` on host (3x smaller transfer)."""
        for k in ("xy", "und_xy", "norm_xy", "octave", "angle", "resp",
                  "packed", "valid", "u_right", "depth"):
            try:
                self.dev[k].copy_to_host_async()
            except Exception:
                pass

    def materialize(self):
        from ..map.store import FrameFeatures

        if self._np is None:
            (xy, und, norm, octv, ang, resp, packed, valid, ur,
             dep) = jax.device_get((
                 self.dev["xy"], self.dev["und_xy"], self.dev["norm_xy"],
                 self.dev["octave"], self.dev["angle"], self.dev["resp"],
                 self.dev["packed"], self.dev["valid"],
                 self.dev["u_right"], self.dev["depth"]))
            ur = np.asarray(ur, np.float64)
            dep = np.asarray(dep, np.float64)
            packed = np.asarray(packed, np.uint32)
            # reconstruct the {0,1}-byte descriptor view from the packed
            # words (little-endian per ops/orb.pack_bits)
            bits = (
                (packed[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1
            ).astype(np.uint8).reshape(packed.shape[0], 256)
            self._np = FrameFeatures(
                xy=np.asarray(xy, np.float64),
                und_xy=np.asarray(und, np.float64),
                norm_xy=np.asarray(norm, np.float64),
                octave=np.asarray(octv, np.int32),
                angle=np.asarray(ang, np.float64),
                response=np.asarray(resp, np.float64),
                bits=bits,
                packed=packed,
                valid=np.asarray(valid, bool),
                depth=dep if (dep > 0).any() else None,
                u_right=ur if (ur >= 0).any() else None,
            )
        return self._np


class FusedTracker:
    """Host orchestrator of the fused step: owns the device-resident local
    map (rebuilt per frame from last frame's covisibility vote — numpy
    gather + async upload, no fetch) and the reference-KF block."""

    P_BASE = 2048

    def __init__(self, tracker):
        self.tr = tracker
        self.map = tracker.map
        cfg = tracker.cfg
        self._steps: dict = {}
        self._stereo = tracker.sensor != "mono"
        self._make = functools.partial(
            make_fused_step, tracker.camera, cfg.orb, cfg.tracking,
            cfg.orb.n_levels, cfg.orb.scale, tracker.bf,
            n_passes=cfg.tracking.fused_passes,
            sad=cfg.tracking.fused_sad)
        self.ids = np.zeros(0, np.int64)
        self._cache_key = None
        self._min_req_dev = None
        self._min_req_val = None

    # compiled step programs shared across System instances (keyed by the
    # full static configuration — a fresh System must not recompile)
    _CACHE: dict = {}

    def _step_for(self, Pb: int, stereo: bool):
        cam = self.tr.camera
        cfg = self.tr.cfg
        import dataclasses as dc
        key = (
            Pb, stereo, type(cam).__name__, tuple(map(float, cam.params)),
            tuple(map(float, getattr(cam, "dist", []))),
            cam.width, cam.height, float(self.tr.bf),
            dc.astuple(cfg.orb),
            cfg.tracking.fused_passes, cfg.tracking.fused_sad,
            cfg.tracking.nn_ratio_ref_kf, cfg.tracking.nn_ratio_local,
            cfg.tracking.local_map_radius, cfg.tracking.local_map_radius_tight,
        )
        if key not in FusedTracker._CACHE:
            FusedTracker._CACHE[key] = self._make(stereo)
        return FusedTracker._CACHE[key]

    def build_local_map(self, frame_mp: np.ndarray):
        """K1/K2 covisibility vote from the LAST frame's matches (host; ref
        Tracking::UpdateLocalKeyFrames :2472). Returns False if no usable
        local map (caller falls back to the host path).

        The device tensors are CACHED across frames: between map mutations
        (KF insertion, mapping, loop/GBA, gravity align — tracked by the
        (n_kf, n_mp, map_version) key) the local map is bitwise identical,
        so the upload (≈1 MB through the tunnel) is skipped entirely."""
        from ..utils.timing import GLOBAL_TIMER as T

        m = self.map
        counts: dict[int, int] = {}
        for j in frame_mp[frame_mp >= 0]:
            j = m.resolve_replaced(int(j))
            if j < 0:
                continue
            for kf in m.mp_obs[j]:
                counts[kf] = counts.get(kf, 0) + 1
        if not counts:
            return False
        k1 = sorted(counts, key=counts.get, reverse=True)
        self.tr.ref_kf = k1[0]
        key = (k1[0], m.n_kf, m.n_mp, m.map_version)
        if key == self._cache_key:
            return True
        with T.stage("fused.rebuild"):
            return self._rebuild(k1, key)

    def _rebuild(self, k1, key):
        m = self.map
        local_kfs = list(k1)
        seen = set(local_kfs)
        for kf in k1[:10]:
            for o in m.best_covisible(kf, 10):
                if o not in seen and len(local_kfs) < 80:
                    seen.add(o)
                    local_kfs.append(o)
        ids = np.unique(m.kf_mp[local_kfs])
        ids = ids[ids >= 0]
        ids = ids[m.mp_valid[ids]]
        if len(ids) < 30:
            return False
        self.ids = ids
        P = len(ids)
        Pb = bucket(P, self.P_BASE)
        f32 = np.float32
        geo = np.concatenate([
            m.mp_pos[ids], m.mp_normal[ids],
            m.mp_min_dist[ids, None], m.mp_max_dist[ids, None]], 1)
        self.mapGeo = jnp.asarray(pad_to(geo.astype(f32), Pb))
        self.mapBits = jnp.asarray(pad_to(m.mp_bits[ids], Pb))
        valid = np.zeros(Pb, bool)
        valid[:P] = True
        self.mapValid = jnp.asarray(valid)
        # reference-KF block: slot descriptors/angles + map row per slot
        kf = self.tr.ref_kf
        fk = m.kf_feats[kf]
        kf_mp = m.kf_mp[kf, : fk.n].copy()
        for i, j in enumerate(kf_mp):
            if j >= 0:
                kf_mp[i] = m.resolve_replaced(int(j))
        # global mp id -> local row
        row_of = np.full(int(ids.max()) + 2, -1, np.int32)
        row_of[ids] = np.arange(P, dtype=np.int32)
        ref_row = np.where(
            (kf_mp >= 0) & (kf_mp <= ids.max()), row_of[np.maximum(kf_mp, 0)],
            -1)
        self.refBits = jnp.asarray(fk.bits)
        self.refMeta = jnp.asarray(
            np.stack([fk.angle, ref_row.astype(np.float64)], 1).astype(f32))
        self.Pb = Pb
        self._cache_key = key
        return True

    def _min_req2(self, min_req: int):
        v = 2 * min_req
        if self._min_req_dev is None or self._min_req_val != v:
            self._min_req_dev = jnp.asarray(np.float32([v]))
            self._min_req_val = v
        return self._min_req_dev

    def dispatch(self, img_l, img_r, pose_in, min_req: int):
        """Enqueue the fused step; returns the device output dict (host
        copies of the small outputs start streaming immediately).
        pose_in: [13] f32 — a previous step's device "pose" output
        (pipelined chain) or a host-packed array."""
        from ..utils.timing import GLOBAL_TIMER as T

        step = self._step_for(self.Pb, self._stereo)
        with T.stage("fused.upload"):
            # ship u8 (the native camera format): the image transfer is
            # the largest per-frame host->device payload, and a tunneled
            # backend is bandwidth-bound on it (measured: 2.9 MB f32 pair
            # ≈ 55 ms vs 0.7 MB u8 ≈ 14 ms). The extractor casts to f32
            # on device.
            def to_u8(im):
                im = np.asarray(im)
                if im.dtype == np.uint8:
                    return im
                return np.clip(np.round(im), 0, 255).astype(np.uint8)

            if img_r is None:
                imgs = to_u8(img_l)[None]
            else:
                imgs = np.stack([to_u8(img_l), to_u8(img_r)])
            imgs = jnp.asarray(imgs)
        with T.stage("fused.dispatch"):
            if not isinstance(pose_in, jax.Array):
                pose_in = jnp.asarray(np.asarray(pose_in, np.float32))
            out = step(
                imgs, self.mapGeo, self.mapBits, self.mapValid,
                self.refBits, self.refMeta, pose_in,
                self._min_req2(min_req))
            out["ids"] = self.ids  # snapshot (rebuilds swap self.ids)
            # start the device->host copies NOW so the fetch at completion
            # time overlaps the NEXT frame's execution (pipelined mode)
            for k in ("pose", "assoc", "rowflags"):
                try:
                    out[k].copy_to_host_async()
                except Exception:
                    pass
            # also stream the feature arrays (~120 KB with packed
            # descriptors): if this frame becomes a keyframe, its
            # materialize() finds the copies already landed instead of
            # paying a blocking ~40 ms fetch on the tracking thread
            for k in ("xy", "und_xy", "norm_xy", "octave", "angle",
                      "resp", "packed", "valid", "u_right", "depth"):
                try:
                    out["feats"][k].copy_to_host_async()
                except Exception:
                    pass
        return out

    def fetch_results(self, out):
        """Block for the step's small outputs (device_get releases the
        GIL; callers run this OUTSIDE the map lock so the mapping worker
        is not stalled behind a ~25 ms tunnel fetch every frame)."""
        from ..utils.timing import GLOBAL_TIMER as T

        with T.stage("fused.fetch"):
            return jax.device_get(
                (out["pose"], out["assoc"], out["rowflags"]))

    def complete(self, out, frame, fetched=None):
        """Fetch the step's results; fill frame.{R,t,mp,feats} and update
        map counters (map access — callers hold the map lock for this
        part). Returns n_inliers."""
        m = self.map
        pose, assoc, rowflags = (fetched if fetched is not None
                                 else self.fetch_results(out))
        ids = out["ids"]
        Pb = rowflags.shape[0] // 2
        visible = rowflags[:Pb]
        found = rowflags[Pb:]
        n_inl = pose[12]
        frame.R = np.asarray(pose[:9], np.float64).reshape(3, 3)
        frame.t = np.asarray(pose[9:12], np.float64)
        frame.feats = DeviceFeatures(out["feats"])
        P = len(ids)
        frame.mp = np.full(assoc.shape[0], -1, np.int32)
        okf = (assoc >= 0) & (assoc < P)
        frame.mp[okf] = ids[assoc[okf]]
        # cached tensors can outlive a culled/replaced point by a frame
        # (async mapping): drop stale ids
        stale = (frame.mp >= 0) & ~m.mp_valid[np.maximum(frame.mp, 0)]
        frame.mp[stale] = -1
        vis_ids = ids[visible[:P]]
        fnd_ids = ids[found[:P]]
        m.mp_visible[vis_ids[m.mp_valid[vis_ids]]] += 1
        m.mp_found[fnd_ids[m.mp_valid[fnd_ids]]] += 1
        return int(n_inl)

    def track(self, img_l, img_r, frame, R0, t0, min_req: int):
        """Synchronous fused step (dispatch + complete)."""
        pose_in = np.concatenate([
            np.asarray(R0, np.float32).ravel(),
            np.asarray(t0, np.float32), np.float32([0.0])])
        out = self.dispatch(img_l, img_r, pose_in, min_req)
        return self.complete(out, frame)

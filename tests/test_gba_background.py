"""Background GBA with staged corrections (VERDICT r3 item 3; ref:
RunGlobalBundleAdjustment LoopClosing.cc:2430-2650 — GBA runs in a
transient thread, results are staged via mTcwGBA and propagated through
the spanning tree to KFs/MPs created DURING the solve), the merge
weld-window BA (item 2; ref MergeLocal weld-area LocalBundleAdjustment
LoopClosing.cc:1676-1722 / Optimizer.cc:6255), and the local-BA abort
hook (ref mbAbortBA LocalMapping.cc:103,283)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.cameras import Pinhole
from tpuslam.core import lie
from tpuslam.engine.config import LoopConfig, SlamConfig
from tpuslam.engine.local_mapping import LocalMapper, window_ba
from tpuslam.engine.loop_closing import LoopCloser
from tpuslam.map.store import FrameFeatures, SlamMap
from tpuslam.place import train_vocabulary

FX = FY = 250.0
CX = CY = 180.0
W = H = 360


def _project(Rcw, tcw, X):
    Xc = X @ Rcw.T + tcw
    uv = np.stack([FX * Xc[:, 0] / Xc[:, 2] + CX,
                   FY * Xc[:, 1] / Xc[:, 2] + CY], 1)
    return uv, Xc[:, 2]


def _feats(uv, z, bits, n_slots):
    n = len(uv)
    pad = n_slots - n
    uvp = np.concatenate([uv, np.zeros((pad, 2))])
    return FrameFeatures(
        xy=uvp.copy(), und_xy=uvp.copy(),
        norm_xy=np.concatenate(
            [(uv - [CX, CY]) / [FX, FY], np.zeros((pad, 2))]),
        octave=np.zeros(n_slots, np.int32), angle=np.zeros(n_slots),
        response=np.ones(n_slots),
        bits=np.concatenate([bits, np.zeros((pad, 256), np.uint8)]),
        packed=np.zeros((n_slots, 8), np.uint32),
        valid=np.concatenate([(z > 0.2), np.zeros(pad, bool)]),
    )


def _make_noisy_map(rng, n_kf=5, P=80, noise_pose=0.02, noise_pt=0.02):
    """A small map whose poses/points carry noise GBA can remove."""
    X = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P),
                  rng.uniform(4, 9, P)], 1)
    bits = (rng.rand(P, 256) > 0.5).astype(np.uint8)
    m = SlamMap(n_feat=P)
    mp_of = {}
    gt = []
    for k in range(n_kf):
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.03 * k, 0.0])))
        t = np.array([0.1 * k, 0.0, 0.0])
        gt.append((R, t))
        uv, z = _project(R, t, X)
        f = _feats(uv, z, bits, P)
        Rn = np.asarray(
            lie.so3_exp(jnp.asarray(rng.randn(3) * (noise_pose if k else 0.0)))
        ) @ R
        tn = t + (rng.randn(3) * noise_pose if k else 0.0)
        kf = m.add_keyframe(Rn, tn, f, float(k), k)
        for j in range(P):
            if z[j] <= 0.2:
                continue
            if j not in mp_of:
                mp_of[j] = m.add_point(X[j] + rng.randn(3) * noise_pt, kf, j)
            else:
                m.add_observation(mp_of[j], kf, j)
        m.update_connections(kf)
    return m, X, bits, mp_of, gt


@pytest.fixture()
def closer():
    def make(m, background=True):
        rng = np.random.RandomState(3)
        vocab = train_vocabulary(
            (rng.rand(120, 256) > 0.5).astype(np.uint8), k=5, L=2, iters=3)
        cfg = SlamConfig(loop=LoopConfig(background_gba=background))
        cam = Pinhole([FX, FY, CX, CY], W, H)
        lm = LocalMapper(cam, cfg, m)
        lc = LoopCloser(cam, cfg, m, vocab, local_mapper=lm)
        return lc
    return make


def test_gba_staged_propagation(closer):
    """KFs + MPs created DURING the GBA ride their snapshot ancestor's
    correction (the mTcwGBA staging semantics)."""
    rng = np.random.RandomState(0)
    m, X, bits, mp_of, gt = _make_noisy_map(rng)
    lc = closer(m)
    snap = lc._snapshot_gba(fix_kf=0)
    assert snap is not None
    # "during GBA": a new KF (child of the last snapshot KF) + a new MP
    parent = int(snap["kfs"][-1])
    R_new = m.kf_R[parent].copy()
    t_new = m.kf_t[parent] + np.array([0.05, 0.0, 0.0])
    f = _feats(np.zeros((1, 2)), np.ones(1), np.zeros((1, 256), np.uint8),
               m.n_feat)
    knew = m.add_keyframe(R_new, t_new, f, 99.0, 99)
    m.kf_parent[knew] = parent
    X_new = np.array([0.5, 0.5, 6.0])
    jnew = m.add_point(X_new, knew, 0)
    # relative pose to the parent BEFORE the apply
    Rrel = R_new @ m.kf_R[parent].T
    trel = t_new - Rrel @ m.kf_t[parent]
    solved = lc._solve_gba(snap)
    assert solved is not None
    lc._apply_gba(snap, solved)
    # snapshot KFs took the solved values
    i = list(snap["kfs"]).index(parent)
    np.testing.assert_allclose(m.kf_R[parent], solved[0][i], atol=1e-12)
    # the new KF preserved its relative pose to the (corrected) parent
    np.testing.assert_allclose(
        m.kf_R[knew], Rrel @ m.kf_R[parent], atol=1e-9)
    np.testing.assert_allclose(
        m.kf_t[knew], Rrel @ m.kf_t[parent] + trel, atol=1e-9)
    # the new MP rode its anchor's correction (camera-frame invariant)
    Xc_before = R_new @ X_new + t_new
    Xc_after = m.kf_R[knew] @ m.mp_pos[jnew] + m.kf_t[knew]
    np.testing.assert_allclose(Xc_after, Xc_before, atol=1e-9)


def test_gba_background_matches_sync(closer):
    """The background thread's staged apply must equal the synchronous
    solve when no mutations happen in between."""
    rng = np.random.RandomState(1)
    m1, *_ = _make_noisy_map(rng)
    rng = np.random.RandomState(1)
    m2, *_ = _make_noisy_map(rng)
    lc_bg = closer(m1, background=True)
    lc_sync = closer(m2, background=False)
    lc_bg._launch_gba(fix_kf=0)
    lc_sync._launch_gba(fix_kf=0)
    lc_bg.wait_gba()
    for k in m1.valid_kf_ids():
        np.testing.assert_allclose(m1.kf_R[k], m2.kf_R[k], atol=1e-10)
        np.testing.assert_allclose(m1.kf_t[k], m2.kf_t[k], atol=1e-10)
    np.testing.assert_allclose(
        m1.mp_pos[: m1.n_mp], m2.mp_pos[: m2.n_mp], atol=1e-10)


def test_gba_abort_discards(closer):
    """An aborted GBA must leave the map untouched (ref: mbStopGBA)."""
    rng = np.random.RandomState(2)
    m, *_ = _make_noisy_map(rng)
    lc = closer(m, background=False)
    snap = lc._snapshot_gba(fix_kf=0)
    import threading
    snap["abort"] = threading.Event()
    snap["abort"].set()
    before = m.kf_R[: m.n_kf].copy()
    assert lc._solve_gba(snap) is None
    np.testing.assert_allclose(m.kf_R[: m.n_kf], before)


def test_window_ba_abort_skips_second_phase(monkeypatch):
    """abort_check=True must skip the second LM phase (one solver call)."""
    rng = np.random.RandomState(4)
    m, *_ = _make_noisy_map(rng)
    cam = Pinhole([FX, FY, CX, CY], W, H)
    inv_s2 = 1.0 / m.scale_factors ** 2
    calls = []
    import tpuslam.engine.local_mapping as L
    orig = L.B.ba_solve_np

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(L.B, "ba_solve_np", counting)
    window_ba(m, cam, cam.spec, inv_s2, 0.0, list(m.valid_kf_ids()),
              abort_check=lambda: True)
    assert len(calls) == 1
    calls.clear()
    window_ba(m, cam, cam.spec, inv_s2, 0.0, list(m.valid_kf_ids()),
              abort_check=lambda: False)
    assert len(calls) == 2


def test_merge_weld_ba_without_gba():
    """Atlas merge with run_gba=False: the weld-window BA alone must clean
    the seam (VERDICT r3 item 2 'done' gate) — revisit pose corrected and
    weld-area reprojection residuals small."""
    rng = np.random.RandomState(5)
    P = 90
    Xa = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P),
                   rng.uniform(4, 9, P)], 1)
    bits_a = (rng.rand(P, 256) > 0.5).astype(np.uint8)
    vocab = train_vocabulary(bits_a, k=6, L=3, iters=4)
    m = SlamMap(n_feat=P)
    cfg = SlamConfig(loop=LoopConfig(
        min_kfs=4, min_bow_matches=15, min_ransac_inliers=12,
        min_sim3_inliers=15, min_proj_matches=20, run_gba=False,
        min_refine_matches=20))
    cam = Pinhole([FX, FY, CX, CY], W, H)
    lm = LocalMapper(cam, cfg, m)
    lc = LoopCloser(cam, cfg, m, vocab, fix_scale=False, local_mapper=lm)
    lm.loop_closer = lc
    noise = lambda b: b ^ (rng.rand(*b.shape) < 0.02)
    # map 0: four KFs on set A
    reg = {}
    poses = []
    for k in range(4):
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.02 * k, 0.0])))
        t = np.array([0.05 * k, 0.0, 0.0])
        poses.append((R, t))
        uv, z = _project(R, t, Xa)
        f = _feats(uv, z, noise(bits_a).astype(np.uint8), P)
        kf = m.add_keyframe(R, t, f, float(k), k)
        for j in range(P):
            if z[j] <= 0.2:
                continue
            if j not in reg:
                reg[j] = m.add_point(Xa[j], kf, j)
            else:
                m.add_observation(reg[j], kf, j)
        m.update_connections(kf)
        lc.on_new_keyframe(kf)
    # tracking loss -> new Atlas map revisiting set A with drift
    m.create_new_map()
    drift_R = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.04, 0.03])))
    drift_t = np.array([0.4, -0.3, 0.5])
    mp_dup = {}
    Xdup = np.zeros_like(Xa)
    closed = []
    kf_re = None
    R_true = t_true = None
    for r, (Rr, tr_) in enumerate(poses[:3]):
        R_true, t_true = Rr, tr_
        R_drift = drift_R @ Rr
        t_drift = drift_R @ tr_ + drift_t
        if r == 0:
            uv, z = _project(Rr, tr_, Xa)
        else:
            uv, z = _project(R_drift, t_drift, Xdup)
        f = _feats(uv, z, noise(bits_a).astype(np.uint8), P)
        kf_re = m.add_keyframe(R_drift, t_drift, f, 10.0 + r, 10 + r)
        Rwc = R_drift.T
        Ow = -Rwc @ t_drift
        for j in range(P):
            if z[j] <= 0.2:
                continue
            if j in mp_dup and m.mp_valid[m.resolve_replaced(mp_dup[j])]:
                m.add_observation(m.resolve_replaced(mp_dup[j]), kf_re, j)
                continue
            ray = Rwc @ np.array([(uv[j, 0] - CX) / FX * z[j],
                                  (uv[j, 1] - CY) / FY * z[j], z[j]])
            mp_dup[j] = m.add_point(Ow + ray, kf_re, j)
            Xdup[j] = Ow + ray
        m.update_connections(kf_re)
        closed.append(lc.on_new_keyframe(kf_re))
    assert closed[-1], "merge did not fire"
    assert len(m.map_ids()) == 1, "maps not merged"
    # NO GBA ran (run_gba=False) — the weld BA alone must fix the seam
    R_err = m.kf_R[kf_re] @ R_true.T
    ang = np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
    assert ang < 0.03, ang
    assert np.linalg.norm(m.kf_t[kf_re] - t_true) < 0.1
    # weld-area reprojection residuals (seam quality): median chi2 of the
    # revisit KF's observations against its (corrected) pose
    errs = []
    for slot in np.nonzero(m.kf_mp[kf_re] >= 0)[0]:
        j = int(m.kf_mp[kf_re, slot])
        Xc = m.kf_R[kf_re] @ m.mp_pos[j] + m.kf_t[kf_re]
        if Xc[2] <= 0:
            continue
        uv = np.array([FX * Xc[0] / Xc[2] + CX, FY * Xc[1] / Xc[2] + CY])
        errs.append(np.sum((uv - m.kf_feats[kf_re].und_xy[slot]) ** 2))
    assert np.median(errs) < 2.0, np.median(errs)

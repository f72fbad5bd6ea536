"""Inertial-map GBA routing (VERDICT r4 item 3): on an IMU-initialized
map the loop closer's GBA must be the FullInertialBA (ref
RunGlobalBundleAdjustment routes to FullInertialBA(7 it) when IMU is
initialized, LoopClosing.cc:2437-2440 / Optimizer.cc:420), and the apply
stage must propagate velocities/biases along with the poses
(mVwbGBA-style staging, LoopClosing.cc:2476-2530)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.cameras import Pinhole
from tpuslam.core import lie
from tpuslam.engine.config import LoopConfig, SlamConfig
from tpuslam.engine.local_mapping import LocalMapper
from tpuslam.engine.loop_closing import LoopCloser
from tpuslam.map.store import FrameFeatures
from tpuslam.place import train_vocabulary

from test_engine_vi import FX, FY, CX, CY, _build_map

pytestmark = pytest.mark.slow


def _make_closer(m, calib):
    rng = np.random.RandomState(3)
    vocab = train_vocabulary(
        (rng.rand(120, 256) > 0.5).astype(np.uint8), k=5, L=2, iters=3)
    cfg = SlamConfig(loop=LoopConfig(background_gba=False))
    cam = Pinhole([FX, FY, CX, CY], 400, 400)
    lm = LocalMapper(cam, cfg, m, imu_calib=calib, mono=True)
    return LoopCloser(cam, cfg, m, vocab, local_mapper=lm)


def test_inertial_gba_routes_and_stages(rng):
    m, calib, kfs, Xw, times, tr = _build_map(rng)
    m.imu_initialized = True
    m.inertial_ba1 = m.inertial_ba2 = True
    gtR = m.kf_R[kfs].copy()
    gtT = m.kf_t[kfs].copy()
    gtV = m.kf_vel[kfs].copy()
    # perturb everything but the first KF
    for k in kfs[1:]:
        dR = np.asarray(lie.so3_exp(jnp.asarray(rng.randn(3) * 0.01)))
        m.kf_R[k] = dR @ m.kf_R[k]
        m.kf_t[k] = m.kf_t[k] + rng.randn(3) * 0.02
        m.kf_vel[k] = m.kf_vel[k] + rng.randn(3) * 0.05
    pts = m.valid_mp_ids()
    m.mp_pos[pts] += rng.randn(len(pts), 3) * 0.02

    lc = _make_closer(m, calib)
    snap = lc._snapshot_gba(fix_kf=kfs[0])
    assert snap is not None
    assert snap.get("kind") == "vi"      # FullInertialBA, not visual BA

    # a KF created DURING the solve (staging semantics): child of last
    parent = kfs[-1]
    R_new = m.kf_R[parent].copy()
    t_new = m.kf_t[parent] + np.array([0.05, 0.0, 0.0])
    P = m.n_feat
    f = FrameFeatures(
        xy=np.zeros((P, 2)), und_xy=np.zeros((P, 2)),
        norm_xy=np.zeros((P, 2)), octave=np.zeros(P, np.int32),
        angle=np.zeros(P), response=np.ones(P),
        bits=np.zeros((P, 256), np.uint8),
        packed=np.zeros((P, 8), np.uint32), valid=np.zeros(P, bool))
    knew = m.add_keyframe(R_new, t_new, f, 99.0, 99)
    m.kf_parent[knew] = parent
    v_new = np.array([0.3, -0.1, 0.2])
    m.kf_vel[knew] = v_new.copy()
    parent_R_old = m.kf_R[parent].copy()

    solved = lc._solve_gba_vi(snap, n_iters=21)
    assert solved is not None
    assert len(solved) == 6              # poses + points + vel/bg/ba
    lc._apply_gba(snap, solved)

    # poses/velocities recovered toward ground truth
    assert np.abs(m.kf_R[kfs] - gtR).max() < 5e-3
    assert np.abs(m.kf_t[kfs] - gtT).max() < 1e-2
    assert np.abs(m.kf_vel[kfs] - gtV).max() < 6e-2
    # biases pulled toward the true zero, not absorbing the perturbation
    assert np.abs(m.kf_bg[kfs]).max() < 2e-3
    assert np.abs(m.kf_ba[kfs]).max() < 1e-1
    # the during-solve KF rode its parent: velocity rotated by the
    # parent's world correction (linear part R_new^T R_old)
    expect_v = m.kf_R[parent].T @ parent_R_old @ v_new
    np.testing.assert_allclose(m.kf_vel[knew], expect_v, atol=1e-9)


def test_inertial_gba_gravity_preserved(rng):
    """Post-GBA the world stays gravity-aligned: the solve must not tilt
    the (fixed-first-KF-anchored) chain — check velocity consistency with
    finite differences of positions over the chain."""
    m, calib, kfs, Xw, times, tr = _build_map(rng)
    m.imu_initialized = True
    for k in kfs[1:]:
        m.kf_t[k] = m.kf_t[k] + rng.randn(3) * 0.02
    lc = _make_closer(m, calib)
    snap = lc._snapshot_gba(fix_kf=kfs[0])
    solved = lc._solve_gba_vi(snap, n_iters=14)
    lc._apply_gba(snap, solved)
    # camera centers move along the GT trajectory; velocity ~ dP/dt
    for a, b in zip(kfs[2:-1], kfs[3:]):
        pa = -m.kf_R[a].T @ m.kf_t[a]
        pb = -m.kf_R[b].T @ m.kf_t[b]
        dt = float(m.kf_time[b] - m.kf_time[a])
        v_fd = (pb - pa) / dt
        v_avg = 0.5 * (m.kf_vel[a] + m.kf_vel[b])
        assert np.linalg.norm(v_fd - v_avg) < 0.12, (a, b)

"""Engine-level VI window BA consistency: perfect map + perfect IMU must be
a fixed point; perturbed states must recover. Exercises the full assembler
(map store -> window_inertial_ba -> write-back), not just the solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuslam.cameras import Pinhole
from tpuslam.engine.inertial import window_inertial_ba
from tpuslam.imu import preintegration as PI
from tpuslam.io.synthetic import SyntheticSequence
from tpuslam.map.store import FrameFeatures, SlamMap

pytestmark = pytest.mark.slow  # multi-minute renderer+engine e2e

FX = FY = 300.0
CX = CY = 200.0


class _Cam:
    fx, fy, cx, cy = FX, FY, CX, CY
    width, height = 400, 400
    # the engine's solvers are camera-generic since the KB8 work: they
    # take the static CamSpec from camera.spec (solve/reproj.py)
    from tpuslam.solve.reproj import PINHOLE as spec


def _build_map(rng, K=8, P=60, fps=4.0):
    seq = SyntheticSequence(n_frames=K, fps=fps, imu_rate=400.0)
    tr = seq.traj
    times = seq.timestamps()
    m = SlamMap(n_feat=P)
    calib = PI.ImuCalib(noise_gyro=1e-4, noise_acc=1e-3, walk_gyro=1e-6,
                        walk_acc=1e-5, freq=400.0)
    mid = K // 2
    Rwb_mid = tr.pose_cw(times[mid])[0].T
    p_mid = tr.pos(times[mid])
    Xc = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P),
                   rng.uniform(3, 8, P)], 1)
    Xw = Xc @ Rwb_mid.T + p_mid
    kfs = []
    for k in range(K):
        Rcw, tcw = tr.pose_cw(times[k])
        Xck = Xw @ Rcw.T + tcw
        uv = np.stack([FX * Xck[:, 0] / Xck[:, 2] + CX,
                       FY * Xck[:, 1] / Xck[:, 2] + CY], 1)
        f = FrameFeatures(
            xy=uv.copy(), und_xy=uv.copy(), norm_xy=Xck[:, :2] / Xck[:, 2:3],
            octave=np.zeros(P, np.int32), angle=np.zeros(P),
            response=np.ones(P), bits=np.zeros((P, 256), np.uint8),
            packed=np.zeros((P, 8), np.uint32), valid=Xck[:, 2] > 0.2,
        )
        kf = m.add_keyframe(Rcw, tcw, f, times[k], k)
        kfs.append(kf)
        m.kf_vel[kf] = tr.vel(times[k])
    for j in range(P):
        mp = m.add_point(Xw[j], kfs[0], j)
        for k in kfs[1:]:
            m.add_observation(mp, k, j)
    for kf in kfs:
        m.update_connections(kf)
    # preintegrations
    for a, b in zip(kfs[:-1], kfs[1:]):
        ts, ws, accs = seq.imu_between(times[a], times[b])
        dts = np.diff(np.concatenate([[times[a]], ts]))
        ng2, na2, wg2, wa2 = calib.discrete_cov()
        pre = PI.preintegrate(
            jnp.asarray(ws), jnp.asarray(accs), jnp.asarray(dts),
            jnp.zeros(3), jnp.zeros(3), ng2, na2, wg2, wa2)
        m.kf_preint[b] = jax.tree.map(np.asarray, pre)
        m.kf_imu[b] = (ws, accs, dts)
        m.kf_prev[b] = a
    return m, calib, kfs, Xw, times, tr


def test_perfect_state_is_fixed_point(rng):
    m, calib, kfs, Xw, times, tr = _build_map(rng)
    R0 = m.kf_R[kfs].copy()
    t0 = m.kf_t[kfs].copy()
    v0 = m.kf_vel[kfs].copy()
    window_inertial_ba(
        m, _Cam(), calib, np.ones(8), opt_kfs=kfs, fixed_kfs=[],
        n_iters=8, fix_first=True)
    assert np.abs(m.kf_R[kfs] - R0).max() < 1e-4
    assert np.abs(m.kf_t[kfs] - t0).max() < 1e-3
    assert np.abs(m.kf_vel[kfs] - v0).max() < 1e-2
    assert np.abs(m.kf_bg[kfs]).max() < 1e-4
    assert np.abs(m.kf_ba[kfs]).max() < 1e-2


def test_recovers_perturbed_window(rng):
    from tpuslam.core import lie

    m, calib, kfs, Xw, times, tr = _build_map(rng)
    gtR = m.kf_R[kfs].copy()
    gtT = m.kf_t[kfs].copy()
    gtV = m.kf_vel[kfs].copy()
    for k in kfs[1:]:
        dR = np.asarray(lie.so3_exp(jnp.asarray(rng.randn(3) * 0.01)))
        m.kf_R[k] = dR @ m.kf_R[k]
        m.kf_t[k] = m.kf_t[k] + rng.randn(3) * 0.03
        m.kf_vel[k] = m.kf_vel[k] + rng.randn(3) * 0.05
    window_inertial_ba(
        m, _Cam(), calib, np.ones(8), opt_kfs=kfs, fixed_kfs=[],
        n_iters=25, fix_first=True)
    assert np.abs(m.kf_R[kfs] - gtR).max() < 2e-3
    # 8e-3: the round-5 split landmark/state damping trades a little
    # tail convergence on this problem for f32 flat-direction safety
    assert np.abs(m.kf_t[kfs] - gtT).max() < 8e-3
    assert np.abs(m.kf_vel[kfs] - gtV).max() < 5e-2
    # biases must NOT absorb the perturbation (true bias is zero)
    assert np.abs(m.kf_bg[kfs]).max() < 1e-3
    assert np.abs(m.kf_ba[kfs]).max() < 5e-2


def test_temporal_window_with_fixed_predecessor(rng):
    """Window solve with a fixed temporal predecessor (the local-mapping
    configuration) keeps the predecessor frozen and stays at GT."""
    m, calib, kfs, Xw, times, tr = _build_map(rng)
    gtR = m.kf_R[kfs].copy()
    opt = kfs[2:]
    fixed = kfs[:2]
    window_inertial_ba(
        m, _Cam(), calib, np.ones(8), opt_kfs=opt, fixed_kfs=fixed,
        n_iters=8, fix_first=False)
    np.testing.assert_allclose(m.kf_R[fixed], gtR[:2], atol=1e-12)
    assert np.abs(m.kf_R[kfs] - gtR).max() < 1e-4
    assert np.abs(m.kf_bg[opt]).max() < 1e-4

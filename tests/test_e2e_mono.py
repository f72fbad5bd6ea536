"""End-to-end monocular SLAM on a synthetic rendered sequence.

The round-1 gate (SURVEY.md §7 step 7): mono init, motion-model tracking,
local-map tracking, KF insertion, triangulation, local BA, culling —
trajectory accuracy checked by scaled ATE (the reference's own metric).
"""

import numpy as np
import pytest

from tpuslam.cameras import Pinhole
from tpuslam.engine import System
from tpuslam.engine.config import SlamConfig
from tpuslam.engine.tracking import State
from tpuslam.eval.ate import ate_rmse
from tpuslam.io.synthetic import SyntheticSequence
from tpuslam.ops.orb import OrbConfig

pytestmark = pytest.mark.slow  # multi-minute renderer+engine e2e


@pytest.fixture(scope="module")
def slam_run():
    seq = SyntheticSequence(n_frames=28, fps=10, speed=0.5)
    cam = Pinhole([seq.fx, seq.fy, seq.cx, seq.cy], seq.width, seq.height)
    cfg = SlamConfig(orb=OrbConfig(n_features=600))
    slam = System(cam, cfg)
    for i in range(seq.n_frames):
        slam.track_monocular(seq.frame(i), i / seq.fps)
    return seq, slam


def test_tracking_survives(slam_run):
    seq, slam = slam_run
    assert slam.get_tracking_state() == State.OK
    assert slam.map.kf_valid[: slam.map.n_kf].sum() >= 3
    assert slam.map.mp_valid[: slam.map.n_mp].sum() > 100


def test_trajectory_accuracy(slam_run):
    seq, slam = slam_run
    traj = slam.trajectory_tum()
    assert len(traj) >= 8  # tracked frames after init
    est = np.array([[r[1], r[2], r[3]] for r in traj])
    gt = []
    for r in traj:
        Rcw, tcw = seq.gt_pose_cw(r[0])
        gt.append(-Rcw.T @ tcw)
    gt = np.array(gt)
    rmse, scale = ate_rmse(est, gt, with_scale=True)
    traveled = np.linalg.norm(gt[-1] - gt[0])
    assert traveled > 0.3
    # Gate calibration: on this 28-frame 376x240 clip the converged
    # pipeline lands at 0.015-0.08 scaled ATE depending on which early
    # map forms (measured across eps-level image perturbations); broken
    # runs (scale incoherence, tracking divergence) land at 0.25-0.4.
    # 0.10 (~7% of the ~1.4 m path) separates the two populations with
    # margin on both sides.
    assert rmse < 0.10


def test_map_consistency(slam_run):
    """Observation structure invariants: kf_mp and mp_obs are inverse maps."""
    seq, slam = slam_run
    m = slam.map
    for j in m.valid_mp_ids():
        for kf, slot in m.mp_obs[int(j)].items():
            assert m.kf_mp[kf, slot] == j
            assert m.kf_valid[kf]
    for k in m.valid_kf_ids():
        slots = np.nonzero(m.kf_mp[k] >= 0)[0]
        for s in slots:
            j = int(m.kf_mp[k, s])
            assert m.mp_valid[j]
            assert m.mp_obs[j].get(int(k)) == s


def test_keyframe_trajectory_export(slam_run, tmp_path):
    seq, slam = slam_run
    p = tmp_path / "traj.txt"
    slam.save_trajectory_tum(str(p))
    rows = np.loadtxt(p)
    assert rows.shape[1] == 8
    # quaternions normalized
    np.testing.assert_allclose(np.linalg.norm(rows[:, 4:], axis=1), 1.0, atol=1e-6)

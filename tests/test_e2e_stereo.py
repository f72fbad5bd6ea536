"""End-to-end stereo SLAM on a synthetic rendered sequence (SURVEY.md §7
step 9 gate): stereo init from depth, metric scale without alignment."""

import numpy as np
import pytest

from tpuslam.cameras import Pinhole
from tpuslam.engine import System
from tpuslam.engine.config import SlamConfig, TrackingConfig
from tpuslam.engine.system import Sensor
from tpuslam.engine.tracking import State
from tpuslam.eval.ate import ate_rmse
from tpuslam.io.synthetic import SyntheticSequence
from tpuslam.ops.orb import OrbConfig

pytestmark = pytest.mark.slow  # multi-minute renderer+engine e2e


@pytest.fixture(scope="module")
def stereo_run():
    seq = SyntheticSequence(n_frames=25, fps=10, speed=0.5, baseline=0.1)
    cam = Pinhole([seq.fx, seq.fy, seq.cx, seq.cy], seq.width, seq.height)
    cfg = SlamConfig(
        orb=OrbConfig(n_features=700),
        tracking=TrackingConfig(min_stereo_init_features=200),
    )
    bf = seq.fx * seq.baseline
    slam = System(cam, cfg, sensor=Sensor.STEREO, bf=bf)
    times = seq.timestamps()
    for i in range(seq.n_frames):
        slam.track_stereo(seq.frame(i), seq.frame(i, right=True), times[i])
    return seq, slam


def test_stereo_tracks(stereo_run):
    seq, slam = stereo_run
    assert slam.get_tracking_state() == State.OK
    assert len(slam.map.valid_kf_ids()) >= 2
    assert slam.map.mp_valid[: slam.map.n_mp].sum() > 100


def test_stereo_metric_scale(stereo_run):
    """Stereo gives metric scale: Horn alignment scale must be ~1 and the
    unscaled ATE small (the reference's stereo claim)."""
    seq, slam = stereo_run
    traj = slam.trajectory_tum()
    assert len(traj) >= 15
    est = np.array([[r[1], r[2], r[3]] for r in traj])
    gt = []
    for r in traj:
        Rcw, tcw = seq.gt_pose_cw(r[0])
        gt.append(-Rcw.T @ tcw)
    gt = np.array(gt)
    rmse_s, scale = ate_rmse(est, gt, with_scale=True)
    assert abs(scale - 1.0) < 0.03, scale
    rmse, _ = ate_rmse(est, gt, with_scale=False)
    assert rmse < 0.05, rmse


def test_stereo_depths_sane(stereo_run):
    """Per-feature stereo depths from the row-banded matcher agree with the
    map's triangulated structure (sanity on the depth pipeline)."""
    seq, slam = stereo_run
    m = slam.map
    k = m.valid_kf_ids()[0]
    f = m.kf_feats[k]
    assert f.depth is not None
    have = f.depth > 0
    assert have.sum() > 50
    # robust statistics: the bulk of depths within the room (descriptor
    # mismatches at tiny disparity produce far outliers, pruned later by
    # BA chi2 like the reference's median filter)
    d = f.depth[have]
    assert 0.5 < np.median(d) < 8.0
    assert (d < 15.0).mean() > 0.8
    assert (d > 0.3).mean() > 0.9

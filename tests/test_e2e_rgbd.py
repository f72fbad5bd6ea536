"""End-to-end RGB-D SLAM on a synthetic rendered sequence with exact
depth (VERDICT r3 item 7 — the third sensor path gated like mono/stereo):
stereo-from-depth initialization (ref: RGB-D Frame ctor Frame.cc:192 +
ComputeStereoFromRGBD :983), metric scale without alignment."""

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
def rgbd_run():
    seq = SyntheticSequence(n_frames=25, fps=10, speed=0.5)
    cam = Pinhole([seq.fx, seq.fy, seq.cx, seq.cy], seq.width, seq.height)
    cfg = SlamConfig(
        orb=OrbConfig(n_features=700),
        tracking=TrackingConfig(min_stereo_init_features=200),
    )
    bf = seq.fx * 0.08  # virtual baseline (ref Camera.bf for RGB-D yaml)
    slam = System(cam, cfg, sensor=Sensor.RGBD, bf=bf)
    times = seq.timestamps()
    for i in range(seq.n_frames):
        img, depth = seq.frame_rgbd(i)
        slam.track_rgbd(img, depth, times[i])
    return seq, slam


def test_rgbd_tracks(rgbd_run):
    seq, slam = rgbd_run
    assert slam.get_tracking_state() == State.OK
    assert len(slam.map.valid_kf_ids()) >= 2
    assert slam.map.mp_valid[: slam.map.n_mp].sum() > 100


def test_rgbd_metric_scale(rgbd_run):
    """Depth gives metric scale directly: Horn scale ~1 and small
    unscaled ATE (the reference's RGB-D claim)."""
    seq, slam = rgbd_run
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


def test_rgbd_depths_match_render(rgbd_run):
    """Map-point depths agree with the renderer's exact depth at the
    anchor KF (the stereo-from-depth unprojection is metric)."""
    seq, slam = rgbd_run
    m = slam.map
    kf = int(m.valid_kf_ids()[0])
    f = m.kf_feats[kf]
    assert f.depth is not None
    ids = m.kf_mp[kf]
    slots = np.nonzero(ids >= 0)[0]
    R, t = m.kf_R[kf], m.kf_t[kf]
    errs = []
    for s in slots[:200]:
        j = int(ids[s])
        if not m.mp_valid[j]:
            continue
        z_map = (R @ m.mp_pos[j] + t)[2]
        if f.depth[s] > 0:
            errs.append(abs(z_map - f.depth[s]) / f.depth[s])
    assert len(errs) > 50
    assert np.median(errs) < 0.05, np.median(errs)


def test_rgbd_to_stereo_unit():
    """rgbd_to_stereo unit semantics (no renderer, fast): depth lookup at
    rounded pixel, u_r = u - bf/z, invalid depth -> -1."""
    from tpuslam.ops.stereo import rgbd_to_stereo

    depth = np.zeros((10, 10), np.float32)
    depth[5, 5] = 2.0
    xy = np.array([[5.2, 4.9], [1.0, 1.0]])
    z, u_r = rgbd_to_stereo(xy, depth, bf=10.0, depth_factor=1.0)
    assert z[0] == pytest.approx(2.0)
    assert u_r[0] == pytest.approx(5.2 - 10.0 / 2.0)
    assert z[1] == 0.0 and u_r[1] == -1.0

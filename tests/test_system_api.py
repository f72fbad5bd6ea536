"""Public-API surface parity: localization mode, resets, ChangeDataset,
tracked-state queries, KF-trajectory savers (ref include/System.h:122-183)."""

import numpy as np
import pytest

from tpuslam.cameras import Pinhole
from tpuslam.engine import System
from tpuslam.engine.config import SlamConfig, TrackingConfig
from tpuslam.engine.system import Sensor
from tpuslam.engine.tracking import State
from tpuslam.io.synthetic import SyntheticSequence
from tpuslam.ops.orb import OrbConfig

pytestmark = pytest.mark.slow  # full-System module fixture, ~10 min


def _make(n_frames=16):
    seq = SyntheticSequence(n_frames=n_frames, fps=10, speed=0.5,
                            baseline=0.1)
    cam = Pinhole([seq.fx, seq.fy, seq.cx, seq.cy], seq.width, seq.height)
    cfg = SlamConfig(orb=OrbConfig(n_features=700),
                     tracking=TrackingConfig(min_stereo_init_features=200))
    slam = System(cam, cfg, sensor=Sensor.STEREO, bf=seq.fx * seq.baseline)
    return seq, slam


@pytest.fixture(scope="module")
def driven():
    seq, slam = _make()
    for i in range(10):
        slam.track_stereo(seq.frame(i), seq.frame(i, right=True), i / 10.0)
    return seq, slam


def test_tracked_state_queries(driven):
    seq, slam = driven
    mp = slam.get_tracked_map_points()
    kp = slam.get_tracked_keypoints_un()
    assert len(mp) == len(kp) > 0
    assert (mp >= 0).sum() > 30          # last frame tracks map points
    assert np.isfinite(kp).all()


def test_localization_mode_freezes_map(driven):
    """Map frozen AND pose quality maintained (VERDICT r3 item 9 gate:
    assert pose, not just freeze)."""
    from tpuslam.eval.ate import ate_rmse

    seq, slam = driven
    n_kf_before = len(slam.map.valid_kf_ids())
    n_mp_before = int(slam.map.mp_valid[: slam.map.n_mp].sum())
    slam.activate_localization_mode()
    for i in range(10, 16):
        slam.track_stereo(seq.frame(i), seq.frame(i, right=True), i / 10.0)
    assert slam.get_tracking_state() == State.OK
    assert len(slam.map.valid_kf_ids()) == n_kf_before
    assert int(slam.map.mp_valid[: slam.map.n_mp].sum()) <= n_mp_before
    # pose quality through the frozen-map stretch
    traj = [r for r in slam.trajectory_tum() if r[0] >= 1.0]
    est = np.array([[r[1], r[2], r[3]] for r in traj])
    gt = []
    for r in traj:
        Rcw, tcw = seq.gt_pose_cw(r[0])
        gt.append(-Rcw.T @ tcw)
    rmse, _ = ate_rmse(est, np.array(gt), with_scale=False)
    assert rmse < 0.06, rmse
    slam.deactivate_localization_mode()


def test_localization_mode_vo_points():
    """Driving INTO an unmapped region in localization mode: tracking
    survives on temporary visual-odometry points spawned from stereo
    depth (ref: Tracking.cc:980-1010,1249-1270 mbVO + temporal points)
    instead of going LOST the moment map points leave the frustum."""
    seq, slam = _make(n_frames=26)
    # map only the first 8 frames, then freeze
    for i in range(8):
        slam.track_stereo(seq.frame(i), seq.frame(i, right=True), i / 10.0)
    assert slam.get_tracking_state() == State.OK
    slam.activate_localization_mode()
    states = []
    for i in range(8, 26):
        slam.track_stereo(seq.frame(i), seq.frame(i, right=True), i / 10.0)
        states.append(slam.get_tracking_state())
    # tracking survived well past the mapped region
    n_ok = sum(1 for s in states if s == State.OK)
    assert n_ok >= 12, (n_ok, states)
    # and the VO-point mode actually engaged at some point
    assert slam.tracker.vo_mode or n_ok == len(states), states


def test_keyframe_trajectory_savers(driven, tmp_path):
    _, slam = driven
    p1 = tmp_path / "kf_tum.txt"
    p2 = tmp_path / "kf_euroc.txt"
    slam.save_keyframe_trajectory_tum(str(p1))
    slam.save_keyframe_trajectory_euroc(str(p2))
    rows1 = p1.read_text().strip().split("\n")
    rows2 = p2.read_text().strip().split("\n")
    assert len(rows1) == len(rows2) == len(slam.map.valid_kf_ids())
    assert len(rows1[0].split()) == 8
    # EuRoC rows: integer-ns stamp + qw-first quaternion
    int(rows2[0].split()[0])


def test_change_dataset_spawns_map():
    seq, slam = _make()
    for i in range(12):
        slam.track_stereo(seq.frame(i), seq.frame(i, right=True), i / 10.0)
    assert slam.get_tracking_state() == State.OK
    old_map = slam.map.current_map_id
    n_kf_old = len(slam.map.valid_kf_ids())
    assert n_kf_old >= 3
    slam.change_dataset()
    # second "session": same scene replayed with a time offset
    for i in range(12):
        slam.track_stereo(seq.frame(i), seq.frame(i, right=True),
                          100.0 + i / 10.0)
    assert slam.map.current_map_id != old_map
    assert slam.get_tracking_state() == State.OK
    # the first session's KFs survive in the Atlas
    all_kfs = slam.map.valid_kf_ids(all_maps=True)
    cur_kfs = slam.map.valid_kf_ids()
    assert len(all_kfs) > len(cur_kfs)


def test_reset_clears_everything():
    seq, slam = _make()
    for i in range(10):
        slam.track_stereo(seq.frame(i), seq.frame(i, right=True), i / 10.0)
    assert len(slam.map.valid_kf_ids()) >= 3
    slam.reset()
    assert slam.get_tracking_state() == State.NO_IMAGES_YET
    assert len(slam.map.valid_kf_ids(all_maps=True)) == 0
    assert len(slam.trajectory_tum()) == 0
    # system is reusable after reset
    for i in range(10):
        slam.track_stereo(seq.frame(i), seq.frame(i, right=True), i / 10.0)
    assert slam.get_tracking_state() == State.OK
    assert len(slam.map.valid_kf_ids()) >= 3

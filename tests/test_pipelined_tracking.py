"""Pipelined fused tracking (tracking.pipelined=True — the bench/serving
configuration): same trajectory quality as the synchronous mode at one
frame of latency, and clean failure/recovery when tracking breaks
mid-sequence (the in-flight step must be settled, not leaked)."""

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

pytestmark = pytest.mark.slow  # renderer + engine e2e


def _build(pipelined):
    seq = SyntheticSequence(n_frames=22, fps=10, speed=0.5, baseline=0.1)
    cam = Pinhole([seq.fx, seq.fy, seq.cx, seq.cy], seq.width, seq.height)
    cfg = SlamConfig(
        orb=OrbConfig(n_features=700),
        tracking=TrackingConfig(min_stereo_init_features=200,
                                pipelined=pipelined))
    slam = System(cam, cfg, sensor=Sensor.STEREO, bf=seq.fx * seq.baseline)
    return seq, slam


def test_pipelined_matches_sync_quality():
    seq, slam = _build(True)
    times = seq.timestamps()
    for i in range(seq.n_frames):
        slam.track_stereo(seq.frame(i), seq.frame(i, right=True), times[i])
    slam.shutdown()  # settles the in-flight frame
    assert slam.get_tracking_state() == State.OK
    traj = slam.trajectory_tum()
    assert len(traj) == seq.n_frames  # no frame lost to the pipeline
    est = np.array([[r[1], r[2], r[3]] for r in traj])
    gt = np.array([
        -(seq.gt_pose_cw(r[0])[0].T @ seq.gt_pose_cw(r[0])[1]) for r in traj])
    rmse, _ = ate_rmse(est, gt, with_scale=False)
    assert rmse < 0.05, rmse


def test_pipelined_loss_and_recovery():
    """Black frames mid-sequence: the pipeline must settle its in-flight
    step, fall to the host path, go RECENTLY_LOST, and recover on real
    frames — no stale pending state, no deadlock."""
    seq, slam = _build(True)
    times = seq.timestamps()
    black = np.zeros((seq.height, seq.width), np.float32)
    for i in range(10):
        slam.track_stereo(seq.frame(i), seq.frame(i, right=True), times[i])
    for k in range(2):
        slam.track_stereo(black, black, 1.0 + 0.1 * k)
    assert slam.tracker._pending is None  # pipeline settled on failure
    assert slam.get_tracking_state() in (State.RECENTLY_LOST, State.LOST)
    # recovery on real frames near the lost pose
    for i in range(10, 16):
        slam.track_stereo(seq.frame(i), seq.frame(i, right=True),
                          1.3 + (i - 10) / 10.0)
    slam.shutdown()
    assert slam.get_tracking_state() == State.OK

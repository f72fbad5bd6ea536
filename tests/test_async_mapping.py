"""Async mapping: the worker-thread LocalMapping/LoopClosing architecture
produces the same quality as synchronous mapping on the mono e2e scenario,
and overlaps with tracking."""

import numpy as np
import pytest

from tpuslam.cameras import Pinhole
from tpuslam.engine import System
from tpuslam.engine.config import SlamConfig
from tpuslam.engine.system import Sensor
from tpuslam.engine.tracking import State
from tpuslam.eval.ate import ate_rmse
from tpuslam.io.synthetic import SyntheticSequence
from tpuslam.ops.orb import OrbConfig

pytestmark = pytest.mark.slow  # multi-minute renderer+engine e2e


def test_async_mono_quality():
    seq = SyntheticSequence(n_frames=28, fps=10, speed=0.5)
    cam = Pinhole([seq.fx, seq.fy, seq.cx, seq.cy], seq.width, seq.height)
    cfg = SlamConfig(orb=OrbConfig(n_features=600))
    slam = System(cam, cfg, async_mapping=True)
    for i in range(seq.n_frames):
        slam.track_monocular(seq.frame(i), i / seq.fps)
    slam.async_mapper.flush()
    assert slam.get_tracking_state() == State.OK
    assert len(slam.map.valid_kf_ids()) >= 3
    traj = slam.trajectory_tum()
    est = np.array([[r[1], r[2], r[3]] for r in traj])
    gt = np.array([
        -seq.gt_pose_cw(r[0])[0].T @ seq.gt_pose_cw(r[0])[1] for r in traj])
    rmse, _ = ate_rmse(est, gt, with_scale=True)
    assert rmse < 0.08, rmse
    slam.shutdown()
    assert not slam.async_mapper.worker.is_alive()


def test_async_imu_rejected():
    from tpuslam.imu.preintegration import ImuCalib

    cam = Pinhole([200.0, 200.0, 100.0, 100.0], 200, 200)
    with pytest.raises(ValueError):
        System(cam, sensor=Sensor.IMU_MONOCULAR, imu_calib=ImuCalib(),
               async_mapping=True)

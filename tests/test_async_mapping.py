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


def test_async_mono_inertial_quality():
    """Async mapping with an INERTIAL sensor (VERDICT r3 item 5): the
    worker runs IMU init/VIBA/gravity-align off the tracking path; the
    tracker re-syncs bias/velocity and rebases the last frame whenever
    map_version advances (the reference's UpdateFrameIMU handshake,
    Tracking.cc:2993). Same gates as the sync VI e2e: IMU initializes,
    tracking survives, scale-aligned ATE bounded."""
    from tpuslam.engine.config import TrackingConfig
    from tpuslam.imu.preintegration import ImuCalib
    from tpuslam.io.synthetic import SyntheticSequence

    seq = SyntheticSequence(n_frames=55, fps=10, speed=0.5, imu_rate=200.0,
                            kind="vi_excite")
    cam = Pinhole([seq.fx, seq.fy, seq.cx, seq.cy], seq.width, seq.height)
    cfg = SlamConfig(orb=OrbConfig(n_features=600),
                     tracking=TrackingConfig(max_frames_between_kf=3))
    calib = ImuCalib(noise_gyro=1e-4, noise_acc=1e-3, walk_gyro=1e-6,
                     walk_acc=1e-5, freq=seq.imu_rate)
    slam = System(cam, cfg, sensor=Sensor.IMU_MONOCULAR, imu_calib=calib,
                  async_mapping=True)
    times = seq.timestamps()
    import time as _time
    for i in range(seq.n_frames):
        if i == 0:
            imu = None
        else:
            ts, ws, accs = seq.imu_between(times[i - 1], times[i])
            imu = np.column_stack([ts, ws, accs])
        # bounded backpressure: a real deployment runs at the camera's
        # frame period (the reference's whole real-time design assumes
        # mapping keeps pace, README.md:63 "powerful computer"); this
        # CPU-bound test otherwise free-runs frames and starves the
        # worker on the 2 shared cores, so the mono-VI init window sees
        # a map whose triangulation lags several keyframes
        waited = 0.0
        while slam.async_mapper.queue.qsize() > 2 and waited < 2.0:
            _time.sleep(0.02)
            waited += 0.02
        slam.track_monocular(seq.frame(i), times[i], imu=imu)
    slam.async_mapper.flush()
    assert slam.get_tracking_state() == State.OK
    assert slam.map.imu_initialized
    traj = slam.trajectory_tum()
    est = np.array([[r[1], r[2], r[3]] for r in traj])
    gt = np.array([
        -seq.gt_pose_cw(r[0])[0].T @ seq.gt_pose_cw(r[0])[1] for r in traj])
    rmse, _ = ate_rmse(est, gt, with_scale=True)
    assert rmse < 0.08, rmse
    slam.shutdown()

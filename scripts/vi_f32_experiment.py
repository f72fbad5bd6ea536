"""The 220-frame f32 visual-inertial experiment (PARITY.md known gap /
VERDICT r4 item 2): drive mono-VI (or stereo-VI) at DEPLOYED precision
(x64 OFF -> f32 end to end) over a long synthetic sequence and report
windowed drift. Round 4 measured divergence after ~8 s; the f32-robust
VI-solver work is done when this runs to the end with bounded ATE.

Usage:
  python scripts/vi_f32_experiment.py [--frames 220] [--cpu] [--stereo]
  (--cpu forces the CPU backend; default uses whatever jax picks — the
   axon TPU when tunneled.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--frames", type=int, default=220)
p.add_argument("--cpu", action="store_true")
p.add_argument("--stereo", action="store_true")
args = p.parse_args()

if args.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
assert not jax.config.read("jax_enable_x64")

import numpy as np  # noqa: E402

from tpuslam.cameras import Pinhole  # noqa: E402
from tpuslam.engine import System  # noqa: E402
from tpuslam.engine.config import SlamConfig, TrackingConfig  # noqa: E402
from tpuslam.engine.system import Sensor  # noqa: E402
from tpuslam.eval.ate import ate_rmse  # noqa: E402
from tpuslam.imu.preintegration import ImuCalib  # noqa: E402
from tpuslam.io.synthetic import SyntheticSequence  # noqa: E402
from tpuslam.ops.orb import OrbConfig  # noqa: E402

# speed 0.3: the synthetic room is 10 m long (io/synthetic.make_room)
# and the camera must stay inside it for the full 22 s (x = 1 + v t);
# at 0.5 m/s it passed through the far wall at t=18 and the frames went
# black — the round-4 "divergence" analysis partially measured that
seq = SyntheticSequence(n_frames=args.frames, fps=10, speed=0.3,
                        imu_rate=200.0, kind="vi_excite",
                        baseline=0.1 if args.stereo else 0.0)
cam = Pinhole([seq.fx, seq.fy, seq.cx, seq.cy], seq.width, seq.height)
cfg = SlamConfig(orb=OrbConfig(n_features=600),
                 tracking=TrackingConfig(max_frames_between_kf=3,
                                         min_stereo_init_features=200))
calib = ImuCalib(noise_gyro=1e-4, noise_acc=1e-3, walk_gyro=1e-6,
                 walk_acc=1e-5, freq=seq.imu_rate)
sensor = Sensor.IMU_STEREO if args.stereo else Sensor.IMU_MONOCULAR
slam = System(cam, cfg, sensor=sensor, imu_calib=calib,
              bf=seq.fx * seq.baseline if args.stereo else 0.0)
times = seq.timestamps()
t0 = time.perf_counter()
for i in range(seq.n_frames):
    if i == 0:
        imu = None
    else:
        ts, ws, accs = seq.imu_between(times[i - 1], times[i])
        imu = np.column_stack([ts, ws, accs])
    if args.stereo:
        slam.track_stereo(seq.frame(i), seq.frame(i, right=True), times[i],
                          imu=imu)
    else:
        slam.track_monocular(seq.frame(i), times[i], imu=imu)
    if i % 20 == 19:
        traj = slam.trajectory_tum()
        if len(traj) >= 10:
            est = np.array([[r[1], r[2], r[3]] for r in traj])
            gt = np.array([-(seq.gt_pose_cw(r[0])[0]).T
                           @ seq.gt_pose_cw(r[0])[1] for r in traj])
            rmse, scale = ate_rmse(est, gt, with_scale=True)
            print(f"frame {i + 1:4d} t={times[i]:6.2f}s "
                  f"state={slam.get_tracking_state().name:14s} "
                  f"ate={rmse:8.4f} scale={scale:6.3f} "
                  f"kfs={len(slam.map.valid_kf_ids())}", flush=True)
dt = time.perf_counter() - t0
traj = slam.trajectory_tum()
est = np.array([[r[1], r[2], r[3]] for r in traj])
gt = np.array([-(seq.gt_pose_cw(r[0])[0]).T @ seq.gt_pose_cw(r[0])[1]
               for r in traj])
rmse, scale = ate_rmse(est, gt, with_scale=True)
rmse_u, _ = ate_rmse(est, gt, with_scale=False)
print(f"\nFINAL: {seq.n_frames} frames in {dt:.1f}s "
      f"({seq.n_frames / dt:.1f} fps) state={slam.get_tracking_state().name}")
print(f"ATE scaled={rmse:.4f} (scale {scale:.3f})  unscaled={rmse_u:.4f} "
      f"kfs={len(slam.map.valid_kf_ids())} traj_rows={len(traj)}")
ok = (rmse < 0.15 and str(slam.get_tracking_state()).endswith("OK")
      and len(traj) > 0.9 * seq.n_frames)
print("RESULT:", "PASS" if ok else "FAIL")

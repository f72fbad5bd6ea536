"""Profile the FULL System.track_* path per stage (VERDICT r3 item 1).

Drives System.track_stereo over a synthetic rendered sequence and prints
the per-stage breakdown from utils/timing.py (the reference's SAVE_TIMES
analogue, src/Tracking.cc:311-315,406-414) plus whole-pipeline fps.

Usage:
  python scripts/profile_system.py [--frames 60] [--cpu] [--features 1024]
Rendering is pre-done outside the timed loop (the camera "hardware").
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--frames", type=int, default=60)
p.add_argument("--features", type=int, default=1024)
p.add_argument("--cpu", action="store_true")
p.add_argument("--repeat", type=int, default=1,
               help="re-run the tracking loop (warm jit) this many times")
p.add_argument("--async-mapping", action="store_true",
               help="run local mapping on the worker thread (bench config)")
p.add_argument("--pipelined", action="store_true",
               help="run the 1-frame pipelined fused mode (bench config)")
p.add_argument("--no-fused", action="store_true",
               help="disable the fused on-device tracking step")
args = p.parse_args()

if args.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

from tpuslam.cameras import Pinhole  # noqa: E402
from tpuslam.engine import System  # noqa: E402
from tpuslam.engine.config import SlamConfig, TrackingConfig  # noqa: E402
from tpuslam.engine.system import Sensor  # noqa: E402
from tpuslam.io.synthetic import SyntheticSequence  # noqa: E402
from tpuslam.ops.orb import OrbConfig  # noqa: E402
from tpuslam.utils.timing import GLOBAL_TIMER  # noqa: E402

if args.cpu:
    import jax
    jax.config.update("jax_platforms", "cpu")

seq = SyntheticSequence(n_frames=args.frames, fps=20, speed=0.5, baseline=0.1)
cam = Pinhole([seq.fx, seq.fy, seq.cx, seq.cy], seq.width, seq.height)
cfg = SlamConfig(
    orb=OrbConfig(n_features=args.features),
    tracking=TrackingConfig(min_stereo_init_features=200,
                            pipelined=args.pipelined),
)
bf = seq.fx * seq.baseline
times = seq.timestamps()
print("rendering frames...", flush=True)
frames = [(seq.frame(i), seq.frame(i, right=True)) for i in range(seq.n_frames)]

for rep in range(args.repeat):
    slam = System(cam, cfg, sensor=Sensor.STEREO, bf=bf,
                  async_mapping=args.async_mapping)
    if args.no_fused:
        slam.tracker.fused_enabled = False
    GLOBAL_TIMER.samples.clear()
    t0 = time.perf_counter()
    per_frame = []
    for i in range(seq.n_frames):
        f0 = time.perf_counter()
        slam.track_stereo(frames[i][0], frames[i][1], times[i])
        per_frame.append(time.perf_counter() - f0)
    if args.pipelined:
        slam.tracker._flush_pipeline()
    dt = time.perf_counter() - t0
    if args.async_mapping:
        slam.async_mapper.flush(raise_errors=True)
    n = seq.n_frames
    pf = np.array(per_frame)
    print(f"\n=== run {rep}: {n} frames in {dt:.2f}s = {n / dt:.1f} fps "
          f"(median {np.median(pf) * 1e3:.1f} ms, p90 {np.percentile(pf, 90) * 1e3:.1f} ms)")
    # steady-state (skip first 5 frames: compile + init)
    ss = pf[5:]
    print(f"    steady-state: {1.0 / np.mean(ss):.1f} fps "
          f"(mean {np.mean(ss) * 1e3:.1f} ms)")
    print(GLOBAL_TIMER.report())
    print(f"state={slam.get_tracking_state()}, kfs={len(slam.map.valid_kf_ids())}, "
          f"mps={int(slam.map.mp_valid[:slam.map.n_mp].sum())}")
    traj = slam.trajectory_tum()
    if traj:
        from tpuslam.eval.ate import ate_rmse
        est = np.array([[r[1], r[2], r[3]] for r in traj])
        gt = []
        for r in traj:
            Rcw, tcw = seq.gt_pose_cw(r[0])
            gt.append(-Rcw.T @ tcw)
        rmse, _ = ate_rmse(est, np.array(gt), with_scale=False)
        print(f"ATE (unscaled) = {rmse:.4f} m over {len(traj)} frames")
    if args.async_mapping:
        slam.shutdown()

"""Per-sensor System throughput rows (VERDICT r4 item 9): fisheye (KB8)
stereo, RGB-D, and mono-visual-inertial tracking measured on the real
device, against the reference's single 50 ms/frame budget for ALL sensor
types (src/Tracking.cc:348-533; config/eu.yaml:24 fps 20).

The DRIVER metric stays bench.py's stereo System row; this script records
the host-path sensors so their perf gap is measured, not unknown
(BASELINE.md per-sensor table). Prints one JSON line per sensor.

Usage: python bench_sensors.py [--frames 80] [--sensors rgbd,fisheye,vi]
"""

import argparse
import json
import sys
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--frames", type=int, default=80)
p.add_argument("--sensors", default="rgbd,fisheye,vi")
args = p.parse_args()

WARM = 8


def _report(name, per, slam):
    from tpuslam.engine.tracking import State

    steady = np.asarray(per[WARM:])
    fps = 1.0 / steady.mean()
    print(json.dumps({
        "metric": f"system_track_{name}_fps",
        "value": round(float(fps), 2),
        "unit": "frames/s",
        "vs_baseline": round(float(fps) / 20.0, 3),
        "median_ms": round(float(np.median(steady) * 1e3), 1),
        "state": slam.get_tracking_state().name,
        "kfs": len(slam.map.valid_kf_ids()),
    }), flush=True)


def bench_rgbd(n):
    from tpuslam.cameras import Pinhole
    from tpuslam.engine import System
    from tpuslam.engine.config import SlamConfig, TrackingConfig
    from tpuslam.engine.system import Sensor
    from tpuslam.io.synthetic import SyntheticSequence
    from tpuslam.ops.orb import OrbConfig

    seq = SyntheticSequence(n_frames=n, fps=20, speed=0.4)
    cam = Pinhole([seq.fx, seq.fy, seq.cx, seq.cy], seq.width, seq.height)
    cfg = SlamConfig(orb=OrbConfig(n_features=700),
                     tracking=TrackingConfig(min_stereo_init_features=200))
    frames = [seq.frame_rgbd(i) for i in range(n)]
    times = seq.timestamps()
    for _pass in range(2):  # pass 0 = compile warm
        slam = System(cam, cfg, sensor=Sensor.RGBD,
                      bf=cam.fx * 0.08)
        per = []
        for i in range(n):
            t0 = time.perf_counter()
            slam.track_rgbd(frames[i][0], frames[i][1], times[i])
            per.append(time.perf_counter() - t0)
    _report("rgbd_376x240_700feat", per, slam)


def bench_fisheye(n):
    from tpuslam.cameras import KannalaBrandt8
    from tpuslam.engine import System
    from tpuslam.engine.config import SlamConfig, TrackingConfig
    from tpuslam.engine.system import Sensor
    from tpuslam.io.synthetic import SyntheticSequence
    from tpuslam.ops.orb import OrbConfig

    KB_L = [95.0, 95.0, 128.0, 128.0,
            0.0034823894, 0.00071503485, -0.0020532361, 0.00020293674]
    KB_R = [94.8, 94.9, 127.6, 128.3,
            0.0034003171, 0.0017662782, -0.0026631257, 0.00032995174]
    cam = KannalaBrandt8(KB_L, 256, 256, lapping=(0, 255))
    cam2 = KannalaBrandt8(KB_R, 256, 256, lapping=(0, 255))
    baseline = 0.2
    Trl = np.eye(4)
    Trl[:3, 3] = [-baseline, 0.0, 0.0]
    seq = SyntheticSequence(n_frames=n, fps=20, speed=0.4,
                            camera=cam, camera2=cam2, Trl=Trl)
    cfg = SlamConfig(orb=OrbConfig(n_features=700),
                     tracking=TrackingConfig(min_stereo_init_features=150))
    frames = [(seq.frame(i), seq.frame(i, right=True)) for i in range(n)]
    times = seq.timestamps()
    for _pass in range(2):
        slam = System(cam, cfg, sensor=Sensor.STEREO,
                      bf=cam.fx * baseline, camera2=cam2,
                      Tlr=np.linalg.inv(Trl))
        per = []
        for i in range(n):
            t0 = time.perf_counter()
            slam.track_stereo(frames[i][0], frames[i][1], times[i])
            per.append(time.perf_counter() - t0)
    _report("fisheye_stereo_256x256_700feat", per, slam)


def bench_vi(n):
    from tpuslam.cameras import Pinhole
    from tpuslam.engine import System
    from tpuslam.engine.config import SlamConfig, TrackingConfig
    from tpuslam.engine.system import Sensor
    from tpuslam.imu.preintegration import ImuCalib
    from tpuslam.io.synthetic import SyntheticSequence
    from tpuslam.ops.orb import OrbConfig

    seq = SyntheticSequence(n_frames=n, fps=10, speed=0.3, imu_rate=200.0,
                            kind="vi_excite")
    cam = Pinhole([seq.fx, seq.fy, seq.cx, seq.cy], seq.width, seq.height)
    cfg = SlamConfig(orb=OrbConfig(n_features=600),
                     tracking=TrackingConfig(max_frames_between_kf=3))
    calib = ImuCalib(noise_gyro=1e-4, noise_acc=1e-3, walk_gyro=1e-6,
                     walk_acc=1e-5, freq=seq.imu_rate)
    frames = [np.asarray(seq.frame(i)) for i in range(n)]
    times = seq.timestamps()
    imus = [None]
    for i in range(1, n):
        ts, ws, accs = seq.imu_between(times[i - 1], times[i])
        imus.append(np.column_stack([ts, ws, accs]))
    for _pass in range(2):
        slam = System(cam, cfg, sensor=Sensor.IMU_MONOCULAR,
                      imu_calib=calib)
        per = []
        for i in range(n):
            t0 = time.perf_counter()
            slam.track_monocular(frames[i], times[i], imu=imus[i])
            per.append(time.perf_counter() - t0)
    _report("mono_vi_376x240_600feat", per, slam)


if __name__ == "__main__":
    todo = args.sensors.split(",")
    if "rgbd" in todo:
        bench_rgbd(args.frames)
    if "fisheye" in todo:
        bench_fisheye(args.frames)
    if "vi" in todo:
        bench_vi(args.frames)
    print("done", file=sys.stderr)

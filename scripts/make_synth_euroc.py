#!/usr/bin/env python
"""Render a synthetic sequence to disk in the EuRoC ASL layout.

Produces <out>/mav0/{cam0,cam1}/data.csv + data/<ns>.png, imu0/data.csv
and state_groundtruth_estimate0/data.csv (GT rows: t_ns, p, q_wxyz —
exactly the reference's format, evaluation/evaluate_ate_scale.py
protocol), plus a reference-style YAML. This gives the offline
environment a REAL on-disk dataset driven through the identical
run.py --dataset euroc --eval path the fetch script's data would use.

Usage: python scripts/make_synth_euroc.py <out_dir> [--frames N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--fps", type=float, default=10.0)
    ap.add_argument("--baseline", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--kind", default="vi_excite")
    args = ap.parse_args()

    import cv2
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tpuslam.core import lie
    import jax.numpy as jnp
    from tpuslam.io.synthetic import SyntheticSequence

    seq = SyntheticSequence(seed=args.seed, n_frames=args.frames,
                            fps=args.fps, speed=0.5,
                            baseline=args.baseline, kind=args.kind)
    mav = os.path.join(args.out, "mav0")
    for sub in ("cam0/data", "cam1/data", "imu0",
                "state_groundtruth_estimate0"):
        os.makedirs(os.path.join(mav, sub), exist_ok=True)

    cam_rows = []
    for i in range(seq.n_frames):
        t_ns = int(round(i / seq.fps * 1e9))
        name = f"{t_ns}.png"
        for c, right in (("cam0", False), ("cam1", True)):
            img = np.clip(seq.frame(i, right=right), 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(mav, c, "data", name), img)
        cam_rows.append((t_ns, name))
    for c in ("cam0", "cam1"):
        with open(os.path.join(mav, c, "data.csv"), "w") as fh:
            fh.write("#timestamp [ns],filename\n")
            for t_ns, name in cam_rows:
                fh.write(f"{t_ns},{name}\n")

    # IMU at 200 Hz over the whole span (ref imu0/data.csv columns:
    # t, w_xyz [rad/s], a_xyz [m/s^2])
    T = seq.n_frames / seq.fps
    ts, ws, accs = seq.imu_between(-1e-9, T)
    with open(os.path.join(mav, "imu0", "data.csv"), "w") as fh:
        fh.write("#timestamp [ns],w_RS_S_x,w_RS_S_y,w_RS_S_z,"
                 "a_RS_S_x,a_RS_S_y,a_RS_S_z\n")
        for t, w, a in zip(ts, ws, accs):
            fh.write(f"{int(round(t * 1e9))},{w[0]:.9f},{w[1]:.9f},"
                     f"{w[2]:.9f},{a[0]:.9f},{a[1]:.9f},{a[2]:.9f}\n")

    # GT in the reference format: t_ns, p_xyz, q_wxyz (camera-to-world)
    with open(os.path.join(mav, "state_groundtruth_estimate0",
                           "data.csv"), "w") as fh:
        fh.write("#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], "
                 "q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z []\n")
        for i in range(seq.n_frames):
            t = i / seq.fps
            Rcw, tcw = seq.gt_pose_cw(t)
            Rwc = Rcw.T
            p = -Rwc @ tcw
            q = np.asarray(lie.rot_to_quat(jnp.asarray(Rwc)))  # x,y,z,w
            fh.write(f"{int(round(t * 1e9))},{p[0]:.9f},{p[1]:.9f},"
                     f"{p[2]:.9f},{q[3]:.9f},{q[0]:.9f},{q[1]:.9f},"
                     f"{q[2]:.9f}\n")

    # reference-style YAML (pre-rectified pinhole pair, ideal IMU)
    yaml_path = os.path.join(args.out, "synth.yaml")
    with open(yaml_path, "w") as fh:
        fh.write(f"""%YAML:1.0
Camera.type: "PinHole"
Camera.fx: {seq.fx}
Camera.fy: {seq.fy}
Camera.cx: {seq.cx}
Camera.cy: {seq.cy}
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: {seq.width}
Camera.height: {seq.height}
Camera.fps: {seq.fps}
Camera.bf: {seq.fx * seq.baseline}
Camera.RGB: 0
ThDepth: 35.0
IMU.Frequency: 200
IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9e-5
IMU.AccWalk: 3.0e-3
ORBextractor.nFeatures: 700
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
    print(f"wrote {args.out}: {seq.n_frames} stereo frames + IMU + GT")
    print(f"run: python -m tpuslam.run --dataset euroc --path {args.out} "
          f"--settings {yaml_path} --sensor stereo --eval")


if __name__ == "__main__":
    main()

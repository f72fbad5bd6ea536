"""IO layer: dataset loaders, reference-YAML settings, trajectory formats,
map checkpoint round-trip, vocabulary persistence."""

import os

import numpy as np
import pytest

from tpuslam.io.settings import load_settings
from tpuslam.place import train_vocabulary
from tpuslam.place.store import load_vocabulary, save_vocabulary


def _write_euroc_tree(root, n=4, with_imu=True):
    import cv2

    cam = root / "mav0" / "cam0"
    (cam / "data").mkdir(parents=True)
    rows = ["#timestamp [ns],filename"]
    rng = np.random.RandomState(0)
    for i in range(n):
        ns = 1403636579763555584 + i * 50_000_000
        name = f"{ns}.png"
        img = (rng.rand(48, 64) * 255).astype(np.uint8)
        cv2.imwrite(str(cam / "data" / name), img)
        rows.append(f"{ns},{name}")
    (cam / "data.csv").write_text("\n".join(rows))
    if with_imu:
        imu = root / "mav0" / "imu0"
        imu.mkdir(parents=True)
        rows = ["#timestamp,..."]
        for i in range(n * 10):
            ns = 1403636579763555584 - 25_000_000 + i * 5_000_000
            rows.append(f"{ns},0.01,-0.02,0.03,0.1,0.2,9.7")
        (imu / "data.csv").write_text("\n".join(rows))


def test_euroc_loader(tmp_path):
    from tpuslam.io.datasets import load_euroc

    _write_euroc_tree(tmp_path)
    seq = load_euroc(str(tmp_path), with_imu=True)
    assert len(seq) == 4
    img = seq.frame(0)
    assert img.shape == (48, 64) and img.dtype == np.float32
    # frame-batch IMU slicing
    batch = seq.imu_between(float(seq.times[0]), float(seq.times[1]))
    assert batch is not None and batch.shape[1] == 7
    assert (batch[:, 0] > seq.times[0]).all()
    assert (batch[:, 0] <= seq.times[1] + 1e-12).all()


EUROC_YAML = """%YAML:1.0
Camera.type: "PinHole"
Camera.fx: 458.654
Camera.fy: 457.296
Camera.cx: 367.215
Camera.cy: 248.375
Camera.k1: -0.28340811
Camera.k2: 0.07395907
Camera.p1: 0.00019359
Camera.p2: 1.76187114e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20.0
Camera.bf: 47.90639384423901
ThDepth: 35.0
ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
IMU.Frequency: 200
IMU.NoiseGyro: 1.7e-04
IMU.NoiseAcc: 2.0e-03
IMU.GyroWalk: 1.9e-05
IMU.AccWalk: 3.0e-03
Tbc: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
         0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
         -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
         0.0, 0.0, 0.0, 1.0]
"""


def test_settings_euroc_yaml(tmp_path):
    p = tmp_path / "EuRoC.yaml"
    p.write_text(EUROC_YAML)
    st = load_settings(str(p))
    assert abs(st.camera.fx - 458.654) < 1e-4
    assert st.camera.width == 752
    assert abs(st.bf - 47.906) < 1e-2
    assert st.cfg.orb.n_features == 1200
    assert st.has_imu
    assert abs(st.imu_calib.freq - 200) < 1e-9
    assert st.Tbc.shape == (4, 4)
    assert abs(np.linalg.det(st.Tbc[:3, :3]) - 1.0) < 1e-6


def test_vocab_save_load(tmp_path, rng):
    descs = (rng.rand(800, 256) > 0.5).astype(np.uint8)
    v = train_vocabulary(descs, k=4, L=2, iters=3)
    path = tmp_path / "voc.npz"
    save_vocabulary(v, str(path))
    v2 = load_vocabulary(str(path))
    assert v2.k == v.k and v2.L == v.L
    q = descs[:50]
    valid = np.ones(50, bool)
    w1, n1, _ = v.transform(q, valid)
    w2, n2, _ = v2.transform(q, valid)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(n1, n2)


def test_checkpoint_roundtrip(tmp_path, rng):
    from tpuslam.map.checkpoint import load_map, save_map
    from tpuslam.map.store import FrameFeatures, SlamMap

    m = SlamMap(n_feat=8)
    f = FrameFeatures(
        xy=rng.rand(8, 2), und_xy=rng.rand(8, 2), norm_xy=rng.rand(8, 2),
        octave=np.zeros(8, np.int32), angle=np.zeros(8),
        response=np.ones(8), bits=np.zeros((8, 256), np.uint8),
        packed=np.zeros((8, 8), np.uint32), valid=np.ones(8, bool),
    )
    k0 = m.add_keyframe(np.eye(3), np.zeros(3), f, 0.0, 0)
    k1 = m.add_keyframe(np.eye(3), np.array([0.1, 0, 0]), f, 0.5, 5)
    mp = m.add_point(np.array([0.0, 0.0, 3.0]), k0, 2)
    m.add_observation(mp, k1, 3)
    m.update_connections(k1)
    path = str(tmp_path / "map.npz")
    save_map(m, path)
    m2 = SlamMap(n_feat=8)
    load_map(m2, path)
    assert m2.n_kf == 2 and m2.n_mp == 1
    np.testing.assert_allclose(m2.kf_t[k1], m.kf_t[k1])
    assert m2.mp_obs[mp] == m.mp_obs[mp]
    np.testing.assert_allclose(m2.kf_feats[k1].und_xy, f.und_xy)
    assert m2.kf_time[k1] == 0.5


def test_trajectory_formats(tmp_path):
    """All three writers produce parseable files with consistent poses."""
    import jax
    from tpuslam.cameras import Pinhole
    from tpuslam.engine import System
    from tpuslam.engine.tracking import Frame

    cam = Pinhole([200.0, 200.0, 100.0, 100.0], 200, 200)
    slam = System(cam)
    m = slam.map
    from tpuslam.map.store import FrameFeatures

    f = FrameFeatures(
        xy=np.zeros((4, 2)), und_xy=np.zeros((4, 2)), norm_xy=np.zeros((4, 2)),
        octave=np.zeros(4, np.int32), angle=np.zeros(4), response=np.ones(4),
        bits=np.zeros((4, 256), np.uint8), packed=np.zeros((4, 8), np.uint32),
        valid=np.ones(4, bool),
    )
    kf = m.add_keyframe(np.eye(3), np.zeros(3), f, 0.0, 0)
    R = np.eye(3)
    t = np.array([0.5, 0.0, 0.0])
    Rcr = R @ m.kf_R[kf].T
    tcr = t - Rcr @ m.kf_t[kf]
    slam.tracker.trajectory = [(1.5, Rcr, tcr, kf, False)]
    p_tum = tmp_path / "t.txt"
    p_eu = tmp_path / "e.txt"
    p_ki = tmp_path / "k.txt"
    slam.save_trajectory_tum(str(p_tum))
    slam.save_trajectory_euroc(str(p_eu))
    slam.save_trajectory_kitti(str(p_ki))
    tum = np.loadtxt(p_tum).reshape(-1, 8)
    assert tum.shape == (1, 8)
    np.testing.assert_allclose(tum[0, 1:4], [-0.5, 0, 0], atol=1e-9)
    eu = open(p_eu).read().split()
    assert eu[0] == str(int(1.5e9))
    ki = np.loadtxt(p_ki).reshape(-1, 12)
    T = ki[0].reshape(3, 4)
    np.testing.assert_allclose(T[:, :3], np.eye(3), atol=1e-9)
    np.testing.assert_allclose(T[:, 3], [-0.5, 0, 0], atol=1e-9)

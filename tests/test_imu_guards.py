"""IMU sanity / robustness guards (VERDICT r3 item 8; ref:
Tracking.cc:856-890 timestamp-jump handling, LocalMapping.cc:138-145
bad-IMU map reset, Tracking.cc:1363-1368 low-acceleration stereo-IMU init
refusal, LocalMapping.cc:1314 IMU-init scale gate). Fault injection at the
map/tracker level — no renderer, fast tier."""

import numpy as np
import pytest

from tpuslam.cameras import Pinhole
from tpuslam.engine import System
from tpuslam.engine.config import SlamConfig, TrackingConfig
from tpuslam.engine.system import Sensor
from tpuslam.engine.tracking import State
from tpuslam.imu.preintegration import ImuCalib
from tpuslam.ops.orb import OrbConfig


def _cam():
    return Pinhole([200.0, 200.0, 100.0, 75.0], 200, 150)


def _textured(rng):
    return (rng.rand(150, 200) * 255).astype(np.float32)


def test_backwards_timestamp_resets(rng):
    """A backwards timestamp resets the active map instead of feeding the
    state machine garbage (ref Tracking.cc:861-868)."""
    cam = _cam()
    slam = System(cam, SlamConfig(orb=OrbConfig(n_features=300)),
                  sensor=Sensor.MONOCULAR)
    tr = slam.tracker
    # fake a tracking state without running the pipeline
    img = _textured(rng)
    slam.track_monocular(img, 0.0)
    tr.state = State.OK
    from tpuslam.engine.tracking import Frame
    from tpuslam.map.store import FrameFeatures
    f = FrameFeatures(
        xy=np.zeros((4, 2)), und_xy=np.zeros((4, 2)),
        norm_xy=np.zeros((4, 2)), octave=np.zeros(4, np.int32),
        angle=np.zeros(4), response=np.ones(4),
        bits=np.zeros((4, 256), np.uint8), packed=np.zeros((4, 8), np.uint32),
        valid=np.ones(4, bool))
    tr.last_frame = Frame(f, 5.0, 1, R=np.eye(3), t=np.zeros(3),
                          mp=np.full(4, -1, np.int32))
    slam.track_monocular(img, 4.0)  # backwards
    assert tr.state in (State.NO_IMAGES_YET, State.NOT_INITIALIZED)


def test_imu_gap_spawns_or_resets(rng):
    """A >1 s gap in the sensor stream: with a mature inertial map the
    next frame opens a fresh Atlas map; an immature map resets in place
    (ref Tracking.cc:869-890)."""
    cam = _cam()
    calib = ImuCalib()
    slam = System(cam, SlamConfig(orb=OrbConfig(n_features=300)),
                  sensor=Sensor.IMU_MONOCULAR, imu_calib=calib)
    tr = slam.tracker
    img = _textured(rng)
    slam.track_monocular(img, 0.0, imu=np.zeros((0, 7)))
    # immature (no IMU init): gap resets in place
    tr.state = State.OK
    from tpuslam.engine.tracking import Frame
    from tpuslam.map.store import FrameFeatures
    f = FrameFeatures(
        xy=np.zeros((4, 2)), und_xy=np.zeros((4, 2)),
        norm_xy=np.zeros((4, 2)), octave=np.zeros(4, np.int32),
        angle=np.zeros(4), response=np.ones(4),
        bits=np.zeros((4, 256), np.uint8), packed=np.zeros((4, 8), np.uint32),
        valid=np.ones(4, bool))
    tr.last_frame = Frame(f, 1.0, 1, R=np.eye(3), t=np.zeros(3),
                          mp=np.full(4, -1, np.int32))
    slam.track_monocular(img, 3.0, imu=np.zeros((0, 7)))
    assert tr.state in (State.NO_IMAGES_YET, State.NOT_INITIALIZED)
    # mature inertial map: gap forces a NEW Atlas map (old one survives)
    tr.state = State.OK
    tr.last_frame = Frame(f, 10.0, 2, R=np.eye(3), t=np.zeros(3),
                          mp=np.full(4, -1, np.int32))
    slam.map.imu_initialized = True
    slam.map.inertial_ba1 = True
    map_before = slam.map.current_map_id
    slam.track_monocular(img, 13.0, imu=np.zeros((0, 7)))
    assert slam.map.current_map_id != map_before


def test_bad_imu_flag_resets_active_map(rng):
    """A degenerate IMU-init scale marks bad_imu; the next tracked frame
    resets the active map (ref LocalMapping.cc:138-145)."""
    cam = _cam()
    calib = ImuCalib()
    slam = System(cam, SlamConfig(orb=OrbConfig(n_features=300)),
                  sensor=Sensor.IMU_MONOCULAR, imu_calib=calib)
    tr = slam.tracker
    img = _textured(rng)
    slam.track_monocular(img, 0.0, imu=np.zeros((0, 7)))
    tr.state = State.OK
    slam.map.bad_imu = True
    slam.track_monocular(img, 0.1, imu=np.zeros((0, 7)))
    assert not slam.map.bad_imu
    assert tr.state in (State.NO_IMAGES_YET, State.NOT_INITIALIZED)


def test_imu_init_scale_gate(rng):
    """run_imu_init with a scale under 0.1 must refuse AND raise bad_imu
    (ref LocalMapping.cc:1314 + ScaleRefinement :1404)."""
    from tpuslam.engine import inertial as EI
    from tpuslam.map.store import SlamMap

    m = SlamMap(n_feat=8)
    m.bad_imu = False

    class FakeOut(dict):
        pass

    import tpuslam.engine.inertial as inertial_mod
    orig = inertial_mod.inertial_init_solve

    # monkeypatch the solver to report a degenerate scale
    def fake_solve(*a, **k):
        return dict(scale=np.float64(0.05), Rwg=np.eye(3),
                    v=np.zeros((3, 3)), bg=np.zeros(3), ba=np.zeros(3),
                    logs_sigma=np.float64(0.01))

    inertial_mod.inertial_init_solve = fake_solve
    try:
        # minimal 3-KF chain with preints so the code reaches the solve
        from tpuslam.map.store import FrameFeatures
        f = FrameFeatures(
            xy=np.zeros((8, 2)), und_xy=np.zeros((8, 2)),
            norm_xy=np.zeros((8, 2)), octave=np.zeros(8, np.int32),
            angle=np.zeros(8), response=np.ones(8),
            bits=np.zeros((8, 256), np.uint8),
            packed=np.zeros((8, 8), np.uint32), valid=np.ones(8, bool))
        from tpuslam.engine.inertial import preintegrate_window
        calib = ImuCalib()
        prev = -1
        for k in range(3):
            kf = m.add_keyframe(np.eye(3), np.array([0.1 * k, 0, 0]), f,
                                float(k) * 0.5, k)
            m.kf_prev[kf] = prev
            if prev >= 0:
                samples = [[0.5 * (k - 1) + 0.1 * i, 0, 0, 0, 0.2, 0, 9.81]
                           for i in range(1, 6)]
                pre, raw = preintegrate_window(
                    samples, 0.5 * (k - 1), 0.5 * k, np.zeros(3),
                    np.zeros(3), calib)
                m.kf_preint[kf] = pre
                m.kf_imu[kf] = raw
            prev = kf
        ok = EI.run_imu_init(m, calib, mono=True)
        assert not ok
        assert m.bad_imu
        assert not m.imu_initialized
    finally:
        inertial_mod.inertial_init_solve = orig


def test_stereo_imu_low_accel_refusal(rng):
    """Stereo-IMU initialization is refused while the accel stream shows
    no excitation (ref Tracking.cc:1363-1368)."""
    cam = _cam()
    calib = ImuCalib()
    cfg = SlamConfig(orb=OrbConfig(n_features=300),
                     tracking=TrackingConfig(min_stereo_init_features=1))
    slam = System(cam, cfg, sensor=Sensor.IMU_STEREO, imu_calib=calib,
                  bf=20.0)
    tr = slam.tracker
    img = _textured(rng)
    # constant-gravity samples: |a| std == 0 -> refuse init
    imu = np.array([[0.01 * i, 0, 0, 0, 0.0, 0.0, 9.81]
                    for i in range(1, 30)])
    slam.track_stereo(img, np.roll(img, 3, axis=1), 0.3, imu=imu)
    assert tr.state != State.OK
    assert len(slam.map.valid_kf_ids()) == 0

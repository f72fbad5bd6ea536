"""Reference-compatible YAML settings.

Parses the same keys the reference reads with cv::FileStorage in the
Tracking ctor (src/Tracking.cc:52-315): Camera.type/fx/fy/cx/cy/k1-k4/
p1/p2, Camera.bf, Camera.fps, ORBextractor.{nFeatures,scaleFactor,nLevels,
iniThFAST,minThFAST}, ThDepth, DepthMapFactor, Tbc,
IMU.{Frequency,NoiseGyro,NoiseAcc,GyroWalk,AccWalk} — so the reference's
EuRoC/TUM/KITTI YAMLs (and the fork's config/*.yaml) work unmodified.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..cameras import KannalaBrandt8, Pinhole
from ..engine.config import SlamConfig
from ..imu.preintegration import ImuCalib
from ..ops.orb import OrbConfig


def _strip_opencv_header(text: str) -> str:
    lines = text.splitlines()
    out = []
    for ln in lines:
        if ln.startswith("%YAML"):
            continue
        out.append(ln)
    return "\n".join(out)


def _parse_opencv_matrix(node):
    if isinstance(node, dict) and "data" in node:
        return np.array(node["data"], np.float64).reshape(
            int(node["rows"]), int(node["cols"]))
    return np.asarray(node, np.float64)


@dataclass
class Settings:
    camera: object
    cfg: SlamConfig
    bf: float
    fps: float
    imu_calib: ImuCalib | None
    Tbc: np.ndarray | None
    raw: dict
    rectification: dict | None = None  # {left: {K,D,R,P}, right: {...},
    #                                     height, width} (ref LEFT./RIGHT.)
    camera2: object | None = None      # fisheye rig right camera (Camera2.*)
    Tlr: np.ndarray | None = None      # left<-right 4x4 (ref Tlr)

    @property
    def has_imu(self):
        return self.imu_calib is not None

    def make_rectifier(self):
        """StereoRectifier from the LEFT./RIGHT. blocks, or None
        (ref: the stereo drivers' initUndistortRectifyMap stage)."""
        if self.rectification is None:
            return None
        from .rectify import StereoRectifier
        r = self.rectification
        return StereoRectifier(r["left"], r["right"], r["height"],
                               r["width"])


def load_settings(path: str, width: int | None = None,
                  height: int | None = None) -> Settings:
    import yaml

    class _CvLoader(yaml.SafeLoader):
        pass

    _CvLoader.add_constructor(
        "tag:yaml.org,2002:opencv-matrix",
        lambda loader, node: loader.construct_mapping(node, deep=True))

    with open(path) as fh:
        raw = yaml.load(_strip_opencv_header(fh.read()), Loader=_CvLoader)

    def get(key, default=None):
        return raw.get(key, default)

    cam_type = str(get("Camera.type", "PinHole"))
    fx = float(get("Camera.fx"))
    fy = float(get("Camera.fy"))
    cx = float(get("Camera.cx"))
    cy = float(get("Camera.cy"))
    w = int(get("Camera.width", width or 752))
    h = int(get("Camera.height", height or 480))
    if cam_type.lower() in ("kannalabrandt8", "kb8", "fisheye"):
        k = [float(get(f"Camera.k{i}", 0.0)) for i in (1, 2, 3, 4)]
        lap = None
        if get("Camera.lappingBegin") is not None:
            lap = (int(get("Camera.lappingBegin")),
                   int(get("Camera.lappingEnd", w)))
        camera = KannalaBrandt8([fx, fy, cx, cy, *k], w, h, lapping=lap)
    else:
        camera = Pinhole(
            [fx, fy, cx, cy], w, h,
            dist=[float(get("Camera.k1", 0.0)), float(get("Camera.k2", 0.0)),
                  float(get("Camera.p1", 0.0)), float(get("Camera.p2", 0.0)),
                  float(get("Camera.k3", 0.0))],
        )
    orb = OrbConfig(
        n_features=int(get("ORBextractor.nFeatures", 1000)),
        scale=float(get("ORBextractor.scaleFactor", 1.2)),
        n_levels=int(get("ORBextractor.nLevels", 8)),
        ini_th=float(get("ORBextractor.iniThFAST", 20)),
        min_th=float(get("ORBextractor.minThFAST", 7)),
    )
    cfg = SlamConfig(orb=orb)
    cfg.th_depth = float(get("ThDepth", get("Camera.ThDepth", 35.0)))
    dmf = float(get("DepthMapFactor", 1.0))
    cfg.depth_map_factor = dmf if dmf > 1e-6 else 1.0
    fps = float(get("Camera.fps", 30.0))
    cfg.tracking.max_frames_between_kf = int(round(fps))
    bf = float(get("Camera.bf", 0.0))
    imu_calib = None
    Tbc = None
    if get("IMU.Frequency") is not None:
        imu_calib = ImuCalib(
            noise_gyro=float(get("IMU.NoiseGyro", 1.7e-4)),
            noise_acc=float(get("IMU.NoiseAcc", 2e-3)),
            walk_gyro=float(get("IMU.GyroWalk", 1.9e-5)),
            walk_acc=float(get("IMU.AccWalk", 3e-3)),
            freq=float(get("IMU.Frequency", 200.0)),
        )
        if get("Tbc") is not None:
            Tbc = _parse_opencv_matrix(get("Tbc"))
            imu_calib.Tbc = Tbc
    # stereo rectification blocks (ref: Tracking.cc:274-295 LEFT./RIGHT.
    # {K, D, R, P, height, width} for non-prerectified stereo pairs)
    rect = None
    if get("LEFT.K") is not None and get("RIGHT.K") is not None:
        def side(prefix):
            return dict(
                K=_parse_opencv_matrix(get(f"{prefix}.K")),
                D=_parse_opencv_matrix(get(f"{prefix}.D")).reshape(-1),
                R=_parse_opencv_matrix(get(f"{prefix}.R")),
                P=_parse_opencv_matrix(get(f"{prefix}.P")),
            )
        rect = dict(
            left=side("LEFT"), right=side("RIGHT"),
            height=int(get("LEFT.height", h)),
            width=int(get("LEFT.width", w)),
        )
    # fisheye stereo rig: second KB8 camera + left<-right extrinsic
    # (ref: Tracking.cc:95-134 parses Camera2.*, Tlr, lapping areas for
    # the KannalaBrandt8 stereo configuration, e.g. TUM_512.yaml)
    camera2 = None
    Tlr = None
    if get("Camera2.fx") is not None:
        k2 = [float(get(f"Camera2.k{i}", 0.0)) for i in (1, 2, 3, 4)]
        lap2 = None
        if get("Camera2.lappingBegin") is not None:
            lap2 = (int(get("Camera2.lappingBegin")),
                    int(get("Camera2.lappingEnd", w)))
        camera2 = KannalaBrandt8(
            [float(get("Camera2.fx")), float(get("Camera2.fy")),
             float(get("Camera2.cx")), float(get("Camera2.cy")), *k2],
            w, h, lapping=lap2)
        if get("Tlr") is not None:
            T = _parse_opencv_matrix(get("Tlr"))
            Tlr = np.eye(4)
            Tlr[: T.shape[0], : T.shape[1]] = T
    return Settings(camera=camera, cfg=cfg, bf=bf, fps=fps,
                    imu_calib=imu_calib, Tbc=Tbc, raw=raw,
                    rectification=rect, camera2=camera2, Tlr=Tlr)

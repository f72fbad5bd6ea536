"""Engine configuration. Default thresholds mirror the reference
(ref: src/Tracking.cc ctor :40-316, ORBmatcher.cc:40-42, Optimizer.cc)."""

from __future__ import annotations

from dataclasses import dataclass, field

from ..ops.orb import OrbConfig


@dataclass
class TrackingConfig:
    # matching radii (px, scaled by pyramid level)
    init_window: float = 100.0           # SearchForInitialization window
    motion_model_radius: float = 15.0    # mono th (Tracking.cc:1914 th=15)
    local_map_radius: float = 4.0        # RadiusByViewingCos default
    local_map_radius_tight: float = 2.5  # cos > 0.998
    reloc_radius: float = 10.0
    # inlier thresholds
    min_matches_init: int = 100          # Tracking.cc:1508 (mono init)
    min_inliers_motion: int = 10
    min_matches_motion: int = 20
    min_inliers_local: int = 30          # TrackLocalMap gate (Tracking.cc:2060)
    # keyframe policy
    max_frames_between_kf: int = 10      # ~fps; ref mMaxFrames = fps
    min_frames_between_kf: int = 0
    kf_ref_ratio: float = 0.9            # mono thRefRatio (Tracking.cc:2180)
    min_kf_inliers: int = 15
    # matcher ratios (ORBmatcher ctor args across call sites)
    nn_ratio_init: float = 0.9
    nn_ratio_ref_kf: float = 0.7
    nn_ratio_local: float = 0.8
    nn_ratio_triangulate: float = 0.6


@dataclass
class MappingConfig:
    n_triangulate_neighbors: int = 20    # mono (LocalMapping.cc:387 nn=20)
    min_baseline_depth_ratio: float = 0.01  # LocalMapping.cc:440
    fuse_radius: float = 3.0
    culling_redundancy: float = 0.9      # KeyFrameCulling 90% rule
    local_ba_iters: int = 12
    recent_cull_found_ratio: float = 0.25


@dataclass
class SlamConfig:
    orb: OrbConfig = field(default_factory=OrbConfig)
    tracking: TrackingConfig = field(default_factory=TrackingConfig)
    mapping: MappingConfig = field(default_factory=MappingConfig)
    # stereo / rgbd
    th_depth: float = 35.0               # close/far stereo point gate (b x 35)
    depth_map_factor: float = 1.0

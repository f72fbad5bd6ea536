"""tpuslam — a TPU-native visual / visual-inertial SLAM engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of ORB-SLAM3
(reference: zhoujoey/ORB-SLAM3-Mac, surveyed in SURVEY.md). Not a port:
array-resident map state, batched device kernels, host-side orchestration.

Layout (maps SURVEY.md §2 component inventory):
  core/      SO3/SE3/Sim3 batched Lie ops, robust costs       (ref: ImuTypes.cc:270+, Converter.cc)
  cameras/   Pinhole + Kannala-Brandt8 vectorized models       (ref: CameraModels/*)
  ops/       Pallas/JAX kernels: pyramid, FAST, ORB, Hamming
             matching, stereo, triangulation, RANSAC           (ref: ORBextractor.cc, ORBmatcher.cc)
  imu/       preintegration as lax.scan                        (ref: ImuTypes.cc)
  solve/     GN/LM + blocked Schur BA, pose opt, pose graph    (ref: Optimizer.cc, g2o)
  map/       SoA keyframe/map-point store, covisibility, Atlas (ref: KeyFrame.cc, Map.cc, Atlas.cc)
  vocab/     binary BoW vocabulary + inverted index            (ref: Thirdparty/DBoW2)
  engine/    tracking / local mapping / loop closing / System  (ref: Tracking.cc, LocalMapping.cc, ...)
  parallel/  device mesh, sharded distributed BA               (new: jax collectives over ICI)
  io/        dataset loaders, trajectory writers, config       (ref: Examples/*, System.cc:514-833)
  eval/      ATE (Horn alignment) harness                      (ref: evaluation/evaluate_ate_scale.py)
"""

__version__ = "0.1.0"

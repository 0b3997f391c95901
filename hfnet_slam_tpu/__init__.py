"""TPU-native deep-feature SLAM framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of HFNet-SLAM
(reference: LiuLimingCode/HFNet_SLAM): monocular / stereo / RGB-D /
visual-inertial tracking driven by a unified HF-Net CNN (keypoints + 256-d
local descriptors + 4096-d NetVLAD global descriptor), MXU brute-force
descriptor matching in place of bag-of-words, multi-map Atlas management,
Sim3 loop closure, and the full bundle-adjustment stack as JAX
Gauss-Newton/LM on SE3/Sim3 manifolds with Schur-complement landmark
elimination.

Layout (TPU-first, not a translation of the reference's C++):
  lie.py          -- SO3/SE3/Sim3 exp/log/adjoint (replaces Thirdparty/Sophus)
  geometry/       -- camera models, triangulation, two-view init, Sim3/PnP solvers
  models/         -- HF-Net (MobileNetV2 + heads + NetVLAD) in pure JAX
  ops/            -- extraction post-processing + matching/retrieval MXU kernels
  imu/            -- IMU preintegration (lax.scan)
  optim/          -- factor-graph Gauss-Newton/LM engine (replaces g2o)
  slam/           -- frame/keyframe/map/atlas + tracking/mapping/loop-closing
  parallel/       -- device-mesh sharding for retrieval + distributed BA
  config/         -- YAML settings (reference-compatible)
  utils/          -- timing registry, trajectory IO
  evaluation/     -- ATE evaluation (Horn alignment)
"""

__version__ = "0.1.0"

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
  geometry/       -- cameras, triangulation, two-view init, IMU preintegration
  models/         -- HF-Net (MobileNetV2 + heads + NetVLAD) in pure JAX + fake
  ops/            -- extraction post-proc + matching/retrieval/stereo kernels
  optim/          -- GN/LM engines: pose, BA, Sim3, pose graph, PnP, inertial
  slam/           -- map/atlas + tracking/mapping/loop-closing/VI + facade
  parallel/       -- device-mesh sharding for retrieval + distributed BA
  native/         -- C++ host runtime (map bookkeeping) via ctypes
  utils/          -- YAML settings, timing registry, trajectory IO, datasets
  evaluation/     -- ATE evaluation (Horn alignment)
"""

__version__ = "0.1.0"

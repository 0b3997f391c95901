"""Run the monocular SLAM system on a synthetic scene and report ATE.

User-level example of the public API (the reference's Examples/Monocular
apps, but hermetic: a FakeExtractor observing a synthetic landmark field
replaces HF-Net + dataset). Prints per-segment progress and the final
scale-corrected ATE RMSE.

Usage:  python examples/run_synthetic.py [--frames N] [--scene browse|corridor]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from hfnet_slam_tpu.evaluation import ate
from hfnet_slam_tpu.geometry import cameras
from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
from hfnet_slam_tpu.slam.local_mapping import MapperConfig
from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
from hfnet_slam_tpu.slam.tracking import TrackerConfig


def browse_pose(i, radius=10.0, rate=0.010, bob=0.4):
    th = rate * i
    target = np.array([0.0, 0.0, radius])
    c = np.array([radius * np.sin(th), bob * np.sin(0.07 * i), radius - radius * np.cos(th)])
    fwd = target - c
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    R_wc = np.stack([right, np.cross(fwd, right), fwd], 1)
    return R_wc.T.astype(np.float32), (-R_wc.T @ c).astype(np.float32)


def corridor_pose(i, step=0.09, sway=0.3, yaw_amp=0.04):
    z = 1.0 + step * i
    x = sway * np.sin(0.08 * i)
    yaw = yaw_amp * np.sin(0.05 * i)
    cy, sy = np.cos(yaw), np.sin(yaw)
    R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    return R_wc.T.astype(np.float32), (-R_wc.T @ np.array([x, 0.0, z])).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--scene", choices=["browse", "corridor"], default="browse")
    ap.add_argument("--save-trajectory", default=None)
    args = ap.parse_args()

    cam = cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
    if args.scene == "browse":
        world = SyntheticWorld.cloud(seed=5, n_landmarks=1400, extent=16.0,
                                     center=(0, 0, 10.0), desc_dim=64)
        pose_fn = browse_pose
        init_par = 4.0
    else:
        world = SyntheticWorld.corridor(seed=3, n_landmarks=2600, length=25.0,
                                        width=7.0, height=5.0, desc_dim=64)
        pose_fn = corridor_pose
        init_par = 3.0

    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3, desc_noise=0.03,
                        max_landmarks_per_frame=480, seed=7)
    cfg = SystemConfig(
        k_max=256, m_max=16384, n_slots=512, desc_dim=64, gdesc_dim=64,
        tracker=TrackerConfig(local_mp_cap=2048, min_init_med_parallax_deg=init_par),
        mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                            tri_neighbors=5),
    )
    slam = SLAMSystem(cam, ext, cfg)

    est_c, gt_c = [], []
    for i in range(args.frames):
        R, t = pose_fn(i)
        state, Re, te = slam.track_monocular((R, t), timestamp=0.05 * i)
        if Re is not None:
            est_c.append(-Re.T @ te)
            gt_c.append(-R.T @ t)
        if i % 10 == 0:
            print(f"frame {i:3d}: state={state} inliers={slam.tracker.n_inliers} "
                  f"keyframes={int(slam.store.kf_valid.sum())} "
                  f"map_points={int(slam.store.mp_valid.sum())}")

    est_c, gt_c = np.asarray(est_c), np.asarray(gt_c)
    if len(est_c) < 5:
        print("TRACKING FAILED (too few tracked frames)")
        return 1
    err = ate.ate_rmse(est_c, gt_c, with_scale=True)
    path = np.linalg.norm(np.diff(gt_c, axis=0), axis=1).sum()
    print(f"tracked {len(est_c)}/{args.frames} frames | "
          f"ATE RMSE (scale-corrected): {err:.4f} m over {path:.1f} m path "
          f"({100 * err / max(path, 1e-9):.2f}%)")
    if args.save_trajectory:
        slam.save_trajectory(args.save_trajectory)
        print("trajectory (TUM format) ->", args.save_trajectory)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

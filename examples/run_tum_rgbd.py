"""Run RGB-D SLAM on a TUM-RGBD sequence and report ATE.

TPU-native counterpart of Examples/RGB-D/rgbd_tum
(/root/reference/Examples/RGB-D/rgbd_tum.cc + eval_tum_rgbd.sh +
evaluation/associate.py): rgb/depth pairs associate by timestamp
(utils/datasets.load_tum_rgbd), depth unprojection seeds metric map points.

Usage:
  python examples/run_tum_rgbd.py SEQ_DIR [--config cfg.yaml]
      [--weights w.npz] [--out traj.txt] [--gt groundtruth.txt]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seq_dir")
    ap.add_argument("--config",
                    default="/root/reference/Examples/RGB-D/TUM1.yaml")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--out", default="trajectory_rgbd_tum.txt")
    ap.add_argument("--gt", default=None)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hfnet_slam_tpu.models import hfnet
    from hfnet_slam_tpu.models.extractor import HFExtractor
    from hfnet_slam_tpu.slam.system import SLAMSystem
    from hfnet_slam_tpu.utils.datasets import load_tum_rgbd
    from hfnet_slam_tpu.utils.settings import Settings

    settings = Settings.from_yaml(args.config, sensor="rgbd")
    cam = settings.make_camera()
    seq = load_tum_rgbd(args.seq_dir, depth_factor=settings.depth_map_factor)
    n = len(seq) if not args.max_frames else min(args.max_frames, len(seq))
    print(f"sequence: {n} rgb-d frames @ {cam.width}x{cam.height}")

    if args.weights:
        params = hfnet.load_params(args.weights)
    else:
        print("WARNING: no --weights; random HF-Net (pipeline smoke only)")
        params = hfnet.init_params(jax.random.PRNGKey(0))

    extractor = HFExtractor(
        params, (cam.height, cam.width),
        n_features=settings.n_features, n_levels=settings.n_levels,
        scale_factor=settings.scale_factor, threshold=settings.threshold,
    )
    slam = SLAMSystem(cam, extractor, settings.make_system_config())

    for i in range(n):
        img = seq.image(i)
        depth = seq.depth(i)
        slam.track_rgbd(jnp.asarray(img), jnp.asarray(depth),
                        float(seq.timestamps[i]))
        if i % 50 == 0:
            print(f"frame {i}: state={slam.tracker.state} "
                  f"kfs={slam.store.kf_valid.sum()}")

    slam.save_trajectory(args.out)
    print(f"trajectory -> {args.out}")

    if args.gt and os.path.exists(args.gt):
        from hfnet_slam_tpu.evaluation import ate

        gt = np.loadtxt(args.gt)
        est = np.loadtxt(args.out)
        gi = np.clip(np.searchsorted(gt[:, 0], est[:, 0]), 0, len(gt) - 1)
        ok = np.abs(gt[gi, 0] - est[:, 0]) < 0.05
        err = ate.ate_rmse(est[ok, 1:4], gt[gi[ok], 1:4], with_scale=False)
        print(f"ATE RMSE (metric): {err:.4f} m over {ok.sum()} poses")


if __name__ == "__main__":
    main()

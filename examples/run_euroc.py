"""Run monocular SLAM on an EuRoC sequence and report ATE.

The TPU-native counterpart of the reference's Examples/Monocular/mono_euroc
(/root/reference/Examples/Monocular/mono_euroc.cc + eval_euroc.sh): load a
reference-compatible YAML config, stream the sequence through the HF-Net
extractor on the TPU, and write the TUM-format trajectory; if the vendored
ground truth is available, print Horn-aligned ATE RMSE.

Usage:
  python examples/run_euroc.py SEQ_DIR [--config cfg.yaml] [--weights w.npz]
      [--out traj.txt] [--gt GT.txt] [--max-frames N]

SEQ_DIR = .../MH_01_easy/mav0. Without --weights the extractor runs with
random weights (pipeline exercise only — descriptors are meaningless).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seq_dir")
    ap.add_argument("--config", default="/root/reference/Examples/Monocular/EuRoC.yaml")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--out", default="trajectory_tum.txt")
    ap.add_argument("--gt", default=None, help="TUM-format ground truth")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hfnet_slam_tpu.models import hfnet
    from hfnet_slam_tpu.models.extractor import HFExtractor
    from hfnet_slam_tpu.slam.system import SLAMSystem
    from hfnet_slam_tpu.utils.datasets import load_euroc
    from hfnet_slam_tpu.utils.settings import Settings
    from hfnet_slam_tpu.utils.timing import timings

    settings = Settings.from_yaml(args.config)
    cam = settings.make_camera()
    seq = load_euroc(args.seq_dir)
    n = len(seq) if not args.max_frames else min(args.max_frames, len(seq))
    print(f"sequence: {n} frames @ {cam.width}x{cam.height}")

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
    # async mapping worker: tracking overlaps local BA / loop closing like
    # the reference's thread trio (slam/pipeline.py)
    cfg = settings.make_system_config(async_mapping=True)
    slam = SLAMSystem(cam, extractor, cfg)

    import jax.numpy as jnp

    for i in range(n):
        with timings.section("frame_total"):
            with timings.section("load"):
                img = seq.image(i)
            st, R, t = slam.track_monocular(jnp.asarray(img), float(seq.timestamps[i]))
        if i % 50 == 0:
            kf = slam.store.kf_valid.sum()
            print(f"frame {i}: state={st} kfs={kf} mps={slam.store.mp_valid.sum()}")

    slam.finish()  # drain the async mapping queue
    slam.save_trajectory(args.out)
    print(f"trajectory -> {args.out}")
    print(timings.report())

    if args.gt and os.path.exists(args.gt):
        from hfnet_slam_tpu.evaluation import ate

        gt = np.loadtxt(args.gt)
        est = np.loadtxt(args.out)
        # associate by timestamp
        gi = np.searchsorted(gt[:, 0], est[:, 0])
        gi = np.clip(gi, 0, len(gt) - 1)
        ok = np.abs(gt[gi, 0] - est[:, 0]) < 0.05
        err = ate.ate_rmse(est[ok, 1:4], gt[gi[ok], 1:4], with_scale=True)
        print(f"ATE RMSE (scale-corrected): {err:.4f} m over {ok.sum()} poses")


if __name__ == "__main__":
    main()

"""Run MONO-INERTIAL SLAM on an EuRoC sequence and report ATE.

TPU-native counterpart of Examples/Monocular-Inertial/mono_inertial_euroc
(/root/reference/Examples/Monocular-Inertial/mono_inertial_euroc.cc +
eval_euroc.sh): per frame, the IMU rows in (t_prev, t] stream into the
tracker with the image; the staged IMU init (slam/vi.py) makes the map
metric, so ATE is also reported WITHOUT scale correction.

Usage:
  python examples/run_euroc_inertial.py SEQ_DIR [--config cfg.yaml]
      [--weights w.npz] [--out traj.txt] [--gt GT.txt] [--max-frames N]

SEQ_DIR = .../MH_01_easy/mav0 (needs imu0/data.csv).
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
                    default="/root/reference/Examples/Monocular-Inertial/EuRoC.yaml")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--out", default="trajectory_vi_tum.txt")
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
    from hfnet_slam_tpu.utils.datasets import load_euroc
    from hfnet_slam_tpu.utils.settings import Settings
    from hfnet_slam_tpu.utils.timing import timings

    settings = Settings.from_yaml(args.config, sensor="imu-monocular")
    cam = settings.make_camera()
    calib = settings.make_imu_calib()
    seq = load_euroc(args.seq_dir, with_imu=True)
    n = len(seq) if not args.max_frames else min(args.max_frames, len(seq))
    print(f"sequence: {n} frames @ {cam.width}x{cam.height} + IMU")

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
    slam = SLAMSystem(cam, extractor, settings.make_system_config(),
                      imu_calib=calib)

    t_prev = float(seq.timestamps[0]) - 1.0 / settings.fps
    for i in range(n):
        t = float(seq.timestamps[i])
        with timings.section("frame_total"):
            img = seq.image(i)
            imu = seq.imu_between(t_prev, t)
            slam.track_monocular_inertial(jnp.asarray(img), t, imu)
        t_prev = t
        if i % 50 == 0:
            st = slam.tracker.state
            print(f"frame {i}: state={st} kfs={slam.store.kf_valid.sum()} "
                  f"imu_init={slam.store.imu_initialized}")

    slam.save_trajectory(args.out)
    print(f"trajectory -> {args.out}")
    print(timings.report())

    if args.gt and os.path.exists(args.gt):
        from hfnet_slam_tpu.evaluation import ate

        gt = np.loadtxt(args.gt)
        est = np.loadtxt(args.out)
        gi = np.clip(np.searchsorted(gt[:, 0], est[:, 0]), 0, len(gt) - 1)
        ok = np.abs(gt[gi, 0] - est[:, 0]) < 0.05
        err_s = ate.ate_rmse(est[ok, 1:4], gt[gi[ok], 1:4], with_scale=True)
        err_m = ate.ate_rmse(est[ok, 1:4], gt[gi[ok], 1:4], with_scale=False)
        print(f"ATE RMSE: {err_m:.4f} m metric / {err_s:.4f} m scale-corrected "
              f"over {ok.sum()} poses")


if __name__ == "__main__":
    main()

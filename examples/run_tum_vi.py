"""Run monocular / mono-inertial SLAM on a TUM-VI sequence and report ATE.

TPU-native counterpart of Examples/Monocular/mono_tum_vi and
Examples/Monocular-Inertial/mono_inertial_tum_vi
(/root/reference/Examples/{Monocular,Monocular-Inertial}/*.cc +
eval_tum_vi.sh): the 512x512 fisheye stream goes through the
KannalaBrandt8 camera model (geometry/cameras.py kb8, the reference's
src/CameraModels/KannalaBrandt8.cpp), with the reference's own TUM-VI.yaml
as the config.

Usage:
  python examples/run_tum_vi.py SEQ_DIR [--imu] [--config cfg.yaml]
      [--weights w.npz] [--out traj.txt] [--gt GT.txt] [--max-frames N]

SEQ_DIR = .../dataset-room1_512_16/mav0 (TUM-VI ships the EuRoC mav0
layout; --imu needs imu0/data.csv). GT: mav0/mocap0/data.csv converted to
TUM format, or the dataset's vendored ground truth.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seq_dir")
    ap.add_argument("--imu", action="store_true",
                    help="mono-inertial mode (mono_inertial_tum_vi)")
    ap.add_argument("--stereo", action="store_true",
                    help="fisheye stereo(-inertial): needs Camera2.* + "
                    "Stereo.T_c1_c2 in the config (ops/stereo."
                    "match_stereo_fisheye; the reference core's mpCamera2 "
                    "path — it ships no stereo example config itself)")
    ap.add_argument("--config", default=None)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--out", default="trajectory_tumvi.txt")
    ap.add_argument("--gt", default=None, help="TUM-format ground truth")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.config is None:
        args.config = (
            "/root/reference/Examples/Monocular-Inertial/TUM-VI.yaml"
            if args.imu else "/root/reference/Examples/Monocular/TUM-VI.yaml")

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hfnet_slam_tpu.models import hfnet
    from hfnet_slam_tpu.models.extractor import HFExtractor
    from hfnet_slam_tpu.slam.system import SLAMSystem
    from hfnet_slam_tpu.utils.datasets import load_tum_vi
    from hfnet_slam_tpu.utils.settings import Settings
    from hfnet_slam_tpu.utils.timing import timings

    settings = Settings.from_yaml(
        args.config, sensor="imu-monocular" if args.imu else "monocular")
    cam = settings.make_camera()
    seq = load_tum_vi(args.seq_dir, with_imu=args.imu)
    seq_r = load_tum_vi(args.seq_dir, cam="cam1",
                        with_imu=False) if args.stereo else None
    n = len(seq) if not args.max_frames else min(args.max_frames, len(seq))
    print(f"sequence: {n} frames @ {cam.width}x{cam.height}"
          + (" + IMU" if args.imu else ""))

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
                      imu_calib=settings.make_imu_calib() if args.imu else None)

    t_prev = float(seq.timestamps[0]) - 1.0 / settings.fps
    for i in range(n):
        t = float(seq.timestamps[i])
        with timings.section("frame_total"):
            img = seq.image(i)
            if args.stereo and args.imu:
                slam.track_stereo_inertial(
                    jnp.asarray(img), jnp.asarray(seq_r.image(i)), t,
                    seq.imu_between(t_prev, t))
            elif args.stereo:
                slam.track_stereo(jnp.asarray(img),
                                  jnp.asarray(seq_r.image(i)), t)
            elif args.imu:
                slam.track_monocular_inertial(
                    jnp.asarray(img), t, seq.imu_between(t_prev, t))
            else:
                slam.track_monocular(jnp.asarray(img), t)
        t_prev = t
        if i % 50 == 0:
            print(f"frame {i}: state={slam.tracker.state} "
                  f"kfs={slam.store.kf_valid.sum()}")

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
        print(f"ATE RMSE: {err_m:.4f} m metric / {err_s:.4f} m "
              f"scale-corrected over {ok.sum()} poses")


if __name__ == "__main__":
    main()

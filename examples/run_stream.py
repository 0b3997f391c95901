"""Serve live SLAM over a socket (the reference's ROS node role,
Examples/ROS/HFNet_SLAM/src/ros_mono.cc) and optionally open the live
in-browser viewer.

    python examples/run_stream.py --port 7007 [--settings EuRoC.yaml]
                                  [--viewer] [--fake]

Any producer then connects and streams frames (see
hfnet_slam_tpu.utils.stream.StreamClient for the wire format):

    from hfnet_slam_tpu.utils.stream import StreamClient
    cli = StreamClient("127.0.0.1", 7007)
    result = cli.send_image(gray_u8, ts)          # {'state','R','t'}

With --fake the server runs a synthetic-world demo client in-process for
a quick self-contained smoke (no camera needed).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_system(args):
    from hfnet_slam_tpu.geometry import cameras
    from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig

    if args.settings:
        import jax

        from hfnet_slam_tpu.models import hfnet
        from hfnet_slam_tpu.models.extractor import HFExtractor
        from hfnet_slam_tpu.utils.settings import Settings

        s = Settings.from_yaml(args.settings)
        cam = s.make_camera()
        params = hfnet.init_params(jax.random.PRNGKey(0))
        ext = HFExtractor(params, (cam.height, cam.width),
                          n_features=s.n_features, n_levels=s.n_levels,
                          scale_factor=s.scale_factor)
        return SLAMSystem(cam, ext, s.make_system_config(async_mapping=True))
    # fake/demo config: pose-keyed synthetic extractor
    from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld

    cam = cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
    world = SyntheticWorld.cloud(seed=5, n_landmarks=1400, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=64)
    pose_ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                             desc_noise=0.03, max_landmarks_per_frame=480,
                             seed=7)

    def orbit_pose(i, radius=10.0, rate=0.01):
        target = np.array([0.0, 0.0, radius])
        th = rate * i
        c = np.array([radius * np.sin(th), 0.4 * np.sin(0.07 * i),
                      radius - radius * np.cos(th)])
        fwd = target - c
        fwd /= np.linalg.norm(fwd)
        right = np.cross([0, 1, 0], fwd)
        right /= np.linalg.norm(right)
        R_wc = np.stack([right, np.cross(fwd, right), fwd], 1)
        R = R_wc.T.astype(np.float32)
        return R, (-R @ c).astype(np.float32)

    class ImageKeyed:
        def __call__(self, image):
            i = int(image[0, 0]) * 256 + int(image[0, 1])
            return pose_ext(*orbit_pose(i))

    cfg = SystemConfig(k_max=128, m_max=8192, n_slots=512, desc_dim=64,
                       gdesc_dim=64)
    return SLAMSystem(cam, ImageKeyed(), cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7007)
    ap.add_argument("--settings", default=None,
                    help="reference YAML; omit for the synthetic demo")
    ap.add_argument("--viewer", action="store_true",
                    help="also start the live web viewer")
    ap.add_argument("--fake", action="store_true",
                    help="run a synthetic demo client in-process")
    ap.add_argument("--frames", type=int, default=200)
    args = ap.parse_args()

    from hfnet_slam_tpu.utils.stream import SLAMStreamServer, StreamClient

    system = build_system(args)
    server = SLAMStreamServer(system, host=args.host, port=args.port)
    print(f"SLAM stream server on {server.address[0]}:{server.address[1]}")
    if args.viewer:
        wv = system.start_webviewer()
        print(f"live viewer at {wv.url}")

    if args.fake:
        # generous timeout: the first frames pay one-off XLA compiles
        cli = StreamClient(*server.address, timeout=600.0)
        t0 = time.perf_counter()
        tracked = 0
        for i in range(args.frames):
            img = np.zeros((48, 64), np.uint8)
            img[0, 0], img[0, 1] = i // 256, i % 256
            r = cli.send_image(img, 0.05 * i)
            tracked += r["R"] is not None
        dt = time.perf_counter() - t0
        print(f"{args.frames} frames in {dt:.2f}s "
              f"({args.frames / dt:.1f} fps), {tracked} tracked, "
              f"final state {r['state']}")
        cli.close()
        server.close()
        system.shutdown()
        return 0
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        server.close()
        system.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

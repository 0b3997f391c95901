"""Live frame-stream frontend (utils/stream.py) — the ROS-node analogue
(reference Examples/ROS/HFNet_SLAM/src/ros_mono.cc / ros_rgbd.cc): a
socket client streams frames, the server drives SLAMSystem.track_* and
streams poses back."""
import numpy as np


def _orbit_pose(i, radius=10.0, rate=0.02):
    target = np.array([0.0, 0.0, radius])
    th = rate * i
    c = np.array([radius * np.sin(th), 0.0, radius - radius * np.cos(th)])
    fwd = target - c
    fwd /= np.linalg.norm(fwd)
    right = np.cross([0, 1, 0], fwd)
    right /= np.linalg.norm(right)
    R_wc = np.stack([right, np.cross(fwd, right), fwd], 1)
    R = R_wc.T.astype(np.float32)
    return R, (-R @ c).astype(np.float32)


class _ReplayExtractor:
    """Image-keyed fake: frame index is encoded in the image's first pixel
    pair; features come from the pose-keyed FakeExtractor at that index's
    ground-truth pose (the stream transports images, the SLAM math is
    already covered elsewhere)."""

    def __init__(self, ext):
        self.ext = ext

    def __call__(self, image):
        i = int(image[0, 0]) * 256 + int(image[0, 1])
        R, t = _orbit_pose(i)
        return self.ext(R, t)


def _frame_image(i, h=48, w=64):
    img = np.zeros((h, w), np.uint8)
    img[0, 0], img[0, 1] = i // 256, i % 256
    return img


def _make_system():
    from hfnet_slam_tpu.geometry import cameras
    from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
    from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig

    cam = cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
    world = SyntheticWorld.cloud(seed=5, n_landmarks=800, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=32)
    ext = FakeExtractor(world, cam, pad_to=256, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=256, seed=7)
    cfg = SystemConfig(k_max=32, m_max=4096, n_slots=256, desc_dim=32,
                       gdesc_dim=32, async_mapping=False, loop_closing=False)
    return SLAMSystem(cam, _ReplayExtractor(ext), cfg)


class TestStream:
    def test_mono_session_tracks_and_returns_poses(self):
        from hfnet_slam_tpu.utils.stream import SLAMStreamServer, StreamClient

        sysm = _make_system()
        srv = SLAMStreamServer(sysm)
        cli = StreamClient(*srv.address)
        try:
            results = [cli.send_image(_frame_image(i), 0.05 * i)
                       for i in range(25)]
            states = {r["state"] for r in results}
            assert states <= {"NOT_INITIALIZED", "OK", "RECENTLY_LOST",
                              "LOST"}
            tracked = [r for r in results if r["R"] is not None]
            assert len(tracked) >= 10  # init consumes the first frames
            # poses are well-formed rotations
            R = np.asarray(tracked[-1]["R"])
            assert np.allclose(R @ R.T, np.eye(3), atol=1e-4)
            assert sysm.tracker.state == 1  # OK
            # the estimated track curves like the orbit ground truth
            assert len(tracked[-1]["t"]) == 3
        finally:
            cli.close()
            srv.close()
            sysm.shutdown()

    def test_imu_rows_pass_through(self):
        """Mono-inertial headers reach track_monocular_inertial (vImuMeas
        plumbing); on a visual-only system the rows are accepted and the
        frame still tracks."""
        from hfnet_slam_tpu.utils.stream import SLAMStreamServer, StreamClient

        sysm = _make_system()
        seen = []
        orig = sysm.track_monocular_inertial

        def spy(img, ts, imu):
            seen.append(np.asarray(imu))
            return sysm.track_monocular(img, ts)

        sysm.track_monocular_inertial = spy
        srv = SLAMStreamServer(sysm)
        cli = StreamClient(*srv.address)
        try:
            imu = np.tile([0, 0, 9.81, 0, 0, 0, 0.005], (10, 1))
            r = cli.send_image(_frame_image(0), 0.0, imu=imu)
            assert r["state"] in ("NOT_INITIALIZED", "OK")
            assert len(seen) == 1 and seen[0].shape == (10, 7)
        finally:
            cli.close()
            srv.close()
            sysm.shutdown()

    def test_rgbd_pairing_and_bad_message(self):
        from hfnet_slam_tpu.utils.stream import SLAMStreamServer, StreamClient

        sysm = _make_system()
        calls = []
        sysm.track_rgbd = lambda img, d, ts: (calls.append((img, d, ts))
                                              or (0, None, None))
        srv = SLAMStreamServer(sysm)
        srv.set_rgbd(True)
        cli = StreamClient(*srv.address)
        try:
            depth = np.full((48, 64), 2.5, np.float32)
            r = cli.send_image(_frame_image(0), 0.1, depth=depth)
            assert r["state"] == "NOT_INITIALIZED" and r["R"] is None
            assert len(calls) == 1
            img, d, ts = calls[0]
            assert img.dtype == np.uint8 and d.dtype == np.float32
            assert ts == 0.1 and np.allclose(d, 2.5)
        finally:
            cli.close()
            srv.close()
            sysm.shutdown()

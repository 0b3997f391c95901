"""Settings (YAML config), timing registry, trajectory export, datasets.

Covers the reference's Settings class (src/Settings.cc), REGISTER_TIMES
instrumentation, System::SaveTrajectory{TUM,EuRoC,KITTI}, and the example
loaders — all hermetically from synthesized files.
"""
import os
import time

import numpy as np
import pytest

EUROC_YAML = """%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 1.76187114e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Camera.RGB: 1
IMU.T_b_c1: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [0.0, -1.0, 0.0, -0.02,
          1.0, 0.0, 0.0, -0.06,
          0.0, 0.0, 1.0, 0.01,
          0.0, 0.0, 0.0, 1.0]
IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9e-05
IMU.AccWalk: 3.0e-03
IMU.Frequency: 200.0
Extractor.type: "HFNetTPU"
Extractor.scaleFactor: 1.2
Extractor.nLevels: 4
Extractor.nFeatures: 675
Extractor.threshold: 0.01
loopClosing: 1
"""


class TestSettings:
    def _write(self, tmp_path, text=EUROC_YAML):
        p = tmp_path / "cfg.yaml"
        p.write_text(text)
        return p

    def test_parse_opencv_dialect(self, tmp_path):
        from hfnet_slam_tpu.utils.settings import Settings

        s = Settings.from_yaml(self._write(tmp_path))
        assert s.camera_type == "PinHole"
        assert abs(s.fx - 458.654) < 1e-6
        assert s.n_features == 675
        assert s.loop_closing
        assert s.T_b_c.shape == (4, 4)
        assert s.T_b_c[0, 1] == -1.0

    def test_make_camera_and_calib(self, tmp_path):
        from hfnet_slam_tpu.utils.settings import Settings

        s = Settings.from_yaml(self._write(tmp_path))
        cam = s.make_camera()
        assert cam.width == 752 and cam.height == 480
        calib = s.make_imu_calib()
        # noise scaled by sqrt(freq) (Tracking.cc:705-706)
        assert abs(float(calib.sigma_g) - 1.7e-4 * np.sqrt(200.0)) < 1e-9
        np.testing.assert_allclose(np.asarray(calib.Tbc_t), [-0.02, -0.06, 0.01])

    def test_make_system_config(self, tmp_path):
        from hfnet_slam_tpu.utils.settings import Settings

        s = Settings.from_yaml(self._write(tmp_path))
        cfg = s.make_system_config()
        assert cfg.loop_closing


class TestTiming:
    def test_sections_and_report(self):
        from hfnet_slam_tpu.utils.timing import TimingRegistry

        reg = TimingRegistry()
        for _ in range(3):
            with reg.section("stage_a"):
                time.sleep(0.002)
        st = reg.stats()["stage_a"]
        assert st[0] == 3 and st[1] >= 1.5  # n, mean ms
        assert "stage_a" in reg.report()


class TestTrajectory:
    def _traj(self):
        import jax.numpy as jnp

        from hfnet_slam_tpu import lie

        R = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.2, -0.1])))
        return [(0.0, np.eye(3), np.zeros(3)), (0.05, R, np.array([0.1, -0.2, 0.3]))]

    def test_tum_roundtrip(self, tmp_path):
        from hfnet_slam_tpu.utils import trajectory as TJ

        p = tmp_path / "t.txt"
        TJ.save(p, self._traj(), "tum")
        rows = np.loadtxt(p)
        assert rows.shape == (2, 8)
        np.testing.assert_allclose(np.linalg.norm(rows[:, 4:8], axis=1), 1.0, atol=1e-6)

    def test_kitti_shape(self, tmp_path):
        from hfnet_slam_tpu.utils import trajectory as TJ

        p = tmp_path / "k.txt"
        TJ.save(p, self._traj(), "kitti")
        rows = np.loadtxt(p)
        assert rows.shape == (2, 12)
        R = rows[1, :].reshape(3, 4)[:, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)

    def test_euroc_ns_timestamps(self, tmp_path):
        from hfnet_slam_tpu.utils import trajectory as TJ

        p = tmp_path / "e.txt"
        TJ.save(p, self._traj(), "euroc")
        first = p.read_text().splitlines()[1].split()[0]
        assert first == "50000000"


class TestDatasets:
    def _fake_euroc(self, tmp_path):
        cam = tmp_path / "mav0" / "cam0"
        (cam / "data").mkdir(parents=True)
        from PIL import Image

        lines = ["#ts,filename"]
        for i in range(3):
            ts = 1403636579763555584 + i * 50000000
            name = f"{ts}.png"
            Image.fromarray(np.zeros((8, 8), np.uint8)).save(cam / "data" / name)
            lines.append(f"{ts},{name}")
        (cam / "data.csv").write_text("\n".join(lines))
        imu = tmp_path / "mav0" / "imu0"
        imu.mkdir(parents=True)
        rows = ["#ts,wx,wy,wz,ax,ay,az"]
        for i in range(30):
            ts = 1403636579763555584 - 10000000 + i * 5000000
            rows.append(f"{ts},0.01,0.02,0.03,0.1,0.2,9.8")
        (imu / "data.csv").write_text("\n".join(rows))
        return tmp_path / "mav0"

    def test_load_euroc(self, tmp_path):
        from hfnet_slam_tpu.utils.datasets import load_euroc

        seq = load_euroc(self._fake_euroc(tmp_path), with_imu=True)
        assert len(seq) == 3
        assert seq.image(0).shape == (8, 8)
        assert seq.imu.shape[1] == 7
        # IMU ordering remapped to [t ax ay az wx wy wz]
        np.testing.assert_allclose(seq.imu[0, 1:4], [0.1, 0.2, 9.8])
        batch = seq.imu_between(seq.timestamps[0], seq.timestamps[1])
        assert batch.shape[1] == 7
        assert (batch[:, 6] > 0).all()
        assert abs(batch[:, 6].sum() - 0.05) < 0.011

    def test_associate(self):
        from hfnet_slam_tpu.utils.datasets import associate

        a = [(0.00, "a0"), (0.05, "a1"), (0.10, "a2")]
        b = [(0.001, "b0"), (0.052, "b1"), (0.30, "b2")]
        pairs = associate(a, b)
        assert len(pairs) == 2
        assert pairs[0][1] == "a0" and pairs[0][3] == "b0"


class TestViewer:
    def test_render_snapshot(self, tmp_path):
        from hfnet_slam_tpu.slam.map import MapStore
        from hfnet_slam_tpu.utils import viewer

        rng = np.random.default_rng(0)
        store = MapStore(k_max=8, m_max=128, n_slots=16, desc_dim=8, gdesc_dim=8)
        ids = store.add_points(rng.uniform(-2, 2, (60, 3)),
                               rng.standard_normal((60, 8)))
        for k in range(3):
            store.kf_valid[k] = True
            store.kf_t[k] = [0.2 * k, 0, 0]
            store.n_kf += 1
        store.kf_parent[1] = 0
        store.kf_parent[2] = 1
        store.loop_edges.append((0, 2))
        traj = [(0.05 * i, np.eye(3), np.array([0.1 * i, 0, 0.0]))
                for i in range(5)]
        p = tmp_path / "map.png"
        viewer.render(store, traj, p)
        assert p.exists() and p.stat().st_size > 10_000

    def test_live_viewer_stepping_and_render(self, tmp_path):
        """LiveViewer: step-by-step gating (Tracking::SetStepByStep,
        reference src/Viewer.cc:188-189) + periodic keyframe-triggered
        re-render."""
        import threading
        import time as _time

        from hfnet_slam_tpu.slam.map import MapStore
        from hfnet_slam_tpu.utils.viewer import LiveViewer

        store = MapStore(k_max=8, m_max=64, n_slots=16, desc_dim=8, gdesc_dim=8)
        lv = LiveViewer(out_path=str(tmp_path / "live.png"), every_kf=2)

        lv.set_step_by_step(True)
        passed = []

        def run():
            for _ in range(3):
                lv.on_frame(store, None)
                passed.append(1)

        th = threading.Thread(target=run, daemon=True)
        th.start()
        _time.sleep(0.2)
        assert passed == []  # blocked at the first frame
        lv.step(2)
        for _ in range(50):
            if len(passed) == 2:
                break
            _time.sleep(0.05)
        assert len(passed) == 2  # exactly two frames released
        lv.release()
        th.join(timeout=5)
        assert len(passed) == 3

        # keyframe-triggered re-render
        lv2 = LiveViewer(out_path=str(tmp_path / "live2.png"), every_kf=2)
        lv2.on_frame(store, None)
        assert lv2.renders == 0
        store.kf_valid[:2] = True
        lv2.on_frame(store, None)
        assert lv2.renders == 1
        assert (tmp_path / "live2.png").exists()


class TestLogAndChecksum:
    def test_leveled_logger(self, capsys):
        """Verbose::PrintMess semantics (reference include/System.h:48-73)."""
        import logging

        from hfnet_slam_tpu.utils import log

        records = []

        class Cap(logging.Handler):
            def emit(self, r):
                records.append(r.getMessage())

        h = Cap()
        log.logger.addHandler(h)
        try:
            log.set_level("quiet")
            log.print_mess("hidden", log.NORMAL)
            assert records == []
            log.set_level("normal")
            log.print_mess("shown", log.NORMAL)
            log.print_mess("hidden2", log.VERBOSE)
            assert records == ["shown"]
            log.set_level(log.DEBUG)
            log.print_mess("deep", log.DEBUG)
            assert records == ["shown", "deep"]
        finally:
            log.logger.removeHandler(h)
            log.set_level("quiet")

    def test_atlas_checksum_guard(self, tmp_path):
        """Atlas snapshots carry per-file MD5s; corruption is detected at
        load (System::CalculateCheckSum analogue, src/System.cc)."""
        from hfnet_slam_tpu.slam.atlas import Atlas

        a = Atlas(4, 16, 8, 8, 8)
        a.active.kf_valid[0] = True
        a.active.n_kf = 1
        p = tmp_path / "snap"
        a.save(str(p))
        b = Atlas.load(str(p))
        assert b.active.kf_valid[0]
        # flip a byte -> load must refuse
        f = p / "map_0.npz"
        raw = bytearray(f.read_bytes())
        raw[len(raw) // 2] ^= 0xFF
        f.write_bytes(bytes(raw))
        import pytest as _pytest

        with _pytest.raises(IOError):
            Atlas.load(str(p))

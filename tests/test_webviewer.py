"""Live web viewer (utils/webviewer.py) — the Pangolin GUI analogue
(reference src/Viewer.cc:162-196): page + state endpoint + menu controls
(step-by-step gate, src/Viewer.cc:188-189) over plain HTTP."""
import json
import threading
import time
import urllib.request

import numpy as np


def _mk_store():
    from hfnet_slam_tpu.slam.map import MapStore

    rng = np.random.default_rng(0)
    store = MapStore(k_max=8, m_max=128, n_slots=16, desc_dim=8, gdesc_dim=8)
    store.add_points(rng.uniform(-2, 2, (40, 3)), rng.standard_normal((40, 8)))
    for k in range(3):
        store.kf_valid[k] = True
        store.kf_t[k] = [0.2 * k, 0, 0]
        store.n_kf += 1
    store.kf_parent[1] = 0
    store.kf_parent[2] = 1
    store.loop_edges.append((0, 2))
    return store


def _get(url, timeout=5):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.read()


def _post(url, payload, timeout=5):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read()


class TestWebViewer:
    def test_page_state_and_controls(self):
        from hfnet_slam_tpu.utils.webviewer import WebViewer

        store = _mk_store()
        wv = WebViewer(port=0, every_kf=1, min_period=0.0)
        try:
            # map snapshot published on the frame hook
            wv.on_frame(store, None)
            code, page = _get(wv.url)
            assert code == 200 and b"hfnet-slam-tpu" in page
            code, body = _get(wv.url + "state.json")
            st = json.loads(body)
            assert code == 200
            assert st["n_kf"] == 3 and st["n_mp"] == 40
            assert len(st["kf"]) == 3 and len(st["mp"]) == 40
            assert st["tree"] == [[1, 0], [2, 1]]
            assert st["loops"] == [[0, 2]]
            assert st["frames"] == 1

            # menu controls drive the step gate exactly like LiveViewer
            _post(wv.url + "control", {"cmd": "step_mode", "on": True})
            passed = []

            def run():
                for _ in range(2):
                    wv.on_frame(store, None)
                    passed.append(1)

            th = threading.Thread(target=run, daemon=True)
            th.start()
            time.sleep(0.15)
            assert passed == []  # gated
            _post(wv.url + "control", {"cmd": "step", "n": 1})
            for _ in range(50):
                if len(passed) == 1:
                    break
                time.sleep(0.02)
            assert len(passed) == 1
            _post(wv.url + "control", {"cmd": "release"})
            th.join(timeout=5)
            assert len(passed) == 2

            try:
                _get(wv.url + "nope")
                assert False, "unknown path must 404"
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            wv.close()

    def test_system_hook_and_tracker_fields(self):
        """WebViewer attached through SLAMSystem.start_webviewer publishes
        tracker state + trajectory (FrameDrawer status line role)."""
        from hfnet_slam_tpu.geometry import cameras
        from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
        from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig

        cam = cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
        world = SyntheticWorld.cloud(seed=5, n_landmarks=600, extent=16.0,
                                     center=(0, 0, 10.0), desc_dim=32)
        ext = FakeExtractor(world, cam, pad_to=256, noise_px=0.3,
                            desc_noise=0.03, max_landmarks_per_frame=240,
                            seed=7)
        cfg = SystemConfig(k_max=32, m_max=4096, n_slots=256, desc_dim=32,
                           gdesc_dim=32, async_mapping=False,
                           loop_closing=False)
        sysm = SLAMSystem(cam, ext, cfg)
        wv = sysm.start_webviewer(min_period=0.0)
        try:
            target = np.array([0.0, 0.0, 10.0])
            n_fed = 0
            for i in range(10):
                th = 0.02 * i
                c = np.array([10 * np.sin(th), 0.0, 10 - 10 * np.cos(th)])
                fwd = target - c
                fwd /= np.linalg.norm(fwd)
                right = np.cross([0, 1, 0], fwd)
                right /= np.linalg.norm(right)
                R_wc = np.stack([right, np.cross(fwd, right), fwd], 1)
                R = R_wc.T.astype(np.float32)
                t = (-R @ c).astype(np.float32)
                sysm.track_features(ext(R, t), 0.05 * i)
                n_fed += 1
            code, body = _get(wv.url + "state.json")
            st = json.loads(body)
            assert st["frames"] == n_fed
            assert st["state"] in ("NOT_INITIALIZED", "OK", "LOST",
                                   "RECENTLY_LOST")
            if st["traj"]:
                assert st["cam"] is not None and len(st["cam"]) == 3
        finally:
            sysm.shutdown()  # also closes the viewer
            assert not wv._thread.is_alive()

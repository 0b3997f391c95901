"""Concurrency stress tests for the shared DeviceMap mirror.

Round 4's loop-closure bench crashed with "Array has been deleted":
DeviceMap._scatter_tables donated its input buffers, so a tracker-thread
sync() DELETED the tables a concurrently-running fuse dispatch (loop
correction / merge, slam/loop_closing._fuse_loop_points) had captured off
the lock (VERDICT r4 weak #1). The 189-test suite missed it because no
test hammered sync-vs-fuse interleaving. These do, deliberately, from
multiple threads — they fail on the donating implementation within
milliseconds and must stay green on the functional (non-donated) one.
"""
import threading
import time

import numpy as np
import pytest

from hfnet_slam_tpu.geometry import cameras
from hfnet_slam_tpu.slam import fused
from hfnet_slam_tpu.slam.map import MapStore


def make_store(m=2048, k=8, n=128, d=32):
    rng = np.random.default_rng(0)
    store = MapStore(k_max=k, m_max=m, n_slots=n, desc_dim=d, gdesc_dim=d)
    n_pts = m // 2
    pos = rng.uniform(-5, 5, (n_pts, 3)).astype(np.float32)
    pos[:, 2] += 10.0
    desc = rng.standard_normal((n_pts, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    store.add_points(pos, desc)
    return store


def test_sync_vs_fuse_hammer():
    """Tracker-thread sync() racing a fuse dispatch on captured tables.

    Thread A: marks rows dirty + syncs the shared mirror in a tight loop
    (what the tracker does every frame). Main thread: captures a snapshot
    under the lock, then dispatches fuse_pairs_batch on it OFF the lock
    (what the loop-correction / merge fuse does). With donated scatters
    the dispatch raises RuntimeError("Array has been deleted")."""
    cam = cameras.pinhole(100.0, 100.0, 64.0, 64.0, 128, 128)
    store = make_store()
    lock = threading.RLock()
    dm = fused.get_device_map(store)
    rng = np.random.default_rng(1)

    stop = threading.Event()
    errs = []

    def tracker_loop():
        try:
            while not stop.is_set():
                with lock:
                    ids = rng.integers(0, store.m_max // 2, 64)
                    store.mark_points_dirty(ids)
                    dm.sync()
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    t = threading.Thread(target=tracker_loop, daemon=True)
    t.start()

    P, N, C = 4, store.n_slots, 256
    R_t = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    t_t = np.zeros((P, 3), np.float32)
    xy_t = rng.uniform(0, 128, (P, N, 2)).astype(np.float32)
    desc_t = rng.standard_normal((P, N, store.desc_dim)).astype(np.float32)
    desc_t /= np.linalg.norm(desc_t, axis=2, keepdims=True)
    oct_t = np.zeros((P, N), np.int32)
    msk_t = np.ones((P, N), bool)
    cand = rng.integers(0, store.m_max // 2, (P, C)).astype(np.int32)

    deadline = time.monotonic() + 4.0
    n_runs = 0
    try:
        while time.monotonic() < deadline:
            with lock:
                dm.sync()
                pos_s, desc_s, _, _, _, valid_s = dm.snapshot()
            # dispatch + wait OFF the lock, exactly like _fuse_loop_points
            idx = np.asarray(fused.fuse_pairs_batch(
                cam.kind, cam.params, 128.0, 128.0,
                R_t, t_t, xy_t, desc_t, oct_t, msk_t, cand,
                pos_s, desc_s, valid_s))
            assert idx.shape == (P, N)
            n_runs += 1
    finally:
        stop.set()
        t.join(timeout=10)
    assert not errs, f"tracker thread raised: {errs[0]!r}"
    assert n_runs >= 3  # the fuse path actually exercised, repeatedly


def test_snapshot_survives_concurrent_syncs():
    """A captured snapshot stays readable and internally consistent after
    many subsequent syncs mutated the live mirror."""
    store = make_store()
    dm = fused.get_device_map(store)
    dm.sync()
    pos0, desc0, *_rest, valid0 = dm.snapshot()
    before = np.asarray(pos0).copy()
    for _ in range(8):
        store.mp_pos[: store.m_max // 2] += 0.5
        store.mark_points_dirty(np.arange(store.m_max // 2))
        dm.sync()
    # live mirror moved...
    assert not np.allclose(np.asarray(dm.pos), before)
    # ...but the captured snapshot did not (old buffers alive, not deleted)
    after = np.asarray(pos0)
    np.testing.assert_array_equal(after, before)
    assert np.asarray(valid0).shape == (store.m_max,)


def test_mapping_pause_handshake_no_toctou():
    """request_pause() must never report 'paused' while the worker is about
    to start an item (advisor r4 finding #1: busy set after the pause
    check). Hammer the handshake: a keyframe-less fake system whose
    process hook records whether it ever ran while a pause was granted."""
    from hfnet_slam_tpu.slam.pipeline import MappingWorker

    class FakeMapper:
        abort_ba = False

        def process_keyframe(self, k, do_ba=True):
            time.sleep(0.002)
            overlap[0] |= paused_granted.is_set()

    class FakeStore:
        kf_valid = np.ones(64, bool)

    class FakeSystem:
        pass

    overlap = [False]
    paused_granted = threading.Event()
    sys_ = FakeSystem()
    sys_.mapper = FakeMapper()
    sys_.store = FakeStore()
    sys_.loop_closer = None
    sys_.loop_worker = None
    sys_.vi = None
    w = MappingWorker(sys_)
    try:
        for trial in range(60):
            w.enqueue(sys_.store, trial % 64)
            # race the pause against the worker picking the item up
            w.request_pause(timeout=5.0)
            paused_granted.set()
            time.sleep(0.004)  # worker would start the item NOW if racy
            paused_granted.clear()
            w.resume()
        w.drain()
    finally:
        w.stop()
    assert not overlap[0], \
        "worker processed a keyframe while request_pause had returned"


# ---------------------------------------------------------------------------
# slow tier: whole-stack async stress (VERDICT r4 next #8 — the round-4
# crash class was "green suite, red bench": no test drove tracking +
# mapping + loop closing + merges concurrently for wall-clock minutes)
# ---------------------------------------------------------------------------

def check_store_invariants(store):
    """Structural invariants that the concurrent association paths
    (tracker claims, fuse replacements, culling, merges) must preserve.
    Call under the map lock."""
    obs = store.kf_obs.copy()
    obs[~store.kf_valid] = -1
    counts = np.zeros(store.m_max, np.int32)
    live = obs[obs >= 0]
    np.add.at(counts, live, 1)
    np.testing.assert_array_equal(
        counts, store.mp_obs_count,
        err_msg="mp_obs_count out of sync with kf_obs")
    assert store.mp_valid[live].all(), "observation of a removed point"
    assert np.isfinite(store.kf_R[store.kf_valid]).all()
    assert np.isfinite(store.kf_t[store.kf_valid]).all()
    assert np.isfinite(store.mp_pos[store.mp_valid]).all()


@pytest.mark.slow
def test_async_full_stack_stress():
    """Minutes of flat-out async tracking + mapping + loop corrections +
    a forced map split and merge-back, with structural invariants checked
    under the lock throughout and worker exceptions re-raised at the end."""
    from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
    from hfnet_slam_tpu.slam.local_mapping import MapperConfig
    from hfnet_slam_tpu.slam.loop_closing import LoopCloserConfig
    from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
    from hfnet_slam_tpu.slam.tracking import TrackerConfig

    cam = cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
    rng = np.random.default_rng(11)
    n_lm = 4000
    th = rng.uniform(0, 2 * np.pi, n_lm)
    rr = rng.uniform(12.0, 20.0, n_lm)
    pts = np.stack([rr * np.sin(th), rng.uniform(-4.0, 4.0, n_lm),
                    6.0 - rr * np.cos(th)], 1).astype(np.float32)
    d = rng.standard_normal((n_lm, 64)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    world = SyntheticWorld(pts, d, rng)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.4,
                        desc_noise=0.03, max_landmarks_per_frame=480,
                        seed=7, max_depth=25.0)
    cfg = SystemConfig(
        k_max=256, m_max=16384, n_slots=512, desc_dim=64, gdesc_dim=64,
        async_mapping=True,
        tracker=TrackerConfig(local_mp_cap=2048,
                              min_init_med_parallax_deg=1.0),
        mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                            tri_neighbors=5),
        loop=LoopCloserConfig(
            min_pair_matches=30, min_sim3_inliers=15, min_proj_matches=30,
            consistency_hits=1, n_covis_window=5, window_mp_cap=2048,
            gba_kf_cap=48, gba_mp_cap=4096, gba_edge_cap=16384,
            ransac_hyps=256),
    )
    sys_ = SLAMSystem(cam, ext, cfg)

    def pose(i):
        radius = 6.0
        a = 4.4 * np.pi * (i % 330) / 330.0
        out = np.array([np.sin(a), 0.0, -np.cos(a)])
        c = np.array([0.0, 0.0, radius]) + radius * out \
            + np.array([0.0, 0.15 * np.sin(0.1 * i), 0.0])
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, out)
        right /= np.linalg.norm(right)
        R_wc = np.stack([right, np.cross(out, right), out], 1)
        return R_wc.T.astype(np.float32), (-R_wc.T @ c).astype(np.float32)

    n_frames = 480
    ts_off = 0.0
    tracked = 0
    try:
        for i in range(n_frames):
            if i == 240:
                ts_off = 30.0  # timestamp jump: LOST -> new map -> merge-back
            R, t = pose(i)
            _, Re, te = sys_.track_features(ext(R, t), 0.05 * i + ts_off)
            if Re is not None:
                tracked += 1
                assert np.isfinite(Re).all() and np.isfinite(te).all()
            if i % 40 == 39:
                with sys_.worker.map_lock:
                    check_store_invariants(sys_.store)
        sys_.finish()  # drain: re-raises any worker exception
    finally:
        sys_.shutdown()
    with sys_.worker.map_lock:
        check_store_invariants(sys_.store)
    lc = sys_.loop_closer
    # the concurrent paths must actually have been exercised
    assert lc is not None and lc.stats["checked"] > 0
    assert (lc.stats["corrected"] + lc.stats["merged"]) >= 1, lc.stats
    assert tracked > 0.7 * n_frames

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

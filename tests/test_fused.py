"""Fused tracking fast path (slam/fused.py).

Guards the round-3 performance contract: steady-state tracking runs as ONE
jitted dispatch against the device-resident map mirror with ZERO new XLA
compilations per frame (the round-2 bench showed 206 mid-run recompiles —
each a shape/weak-type leak; this test pins them at zero), and the fused
program is behaviorally equivalent to the staged reference pipeline
(TrackWithMotionModel + TrackLocalMap, /root/reference/src/Tracking.cc:
2165-2388) it replaces.
"""
import numpy as np
import pytest

from jax._src import monitoring

from hfnet_slam_tpu.evaluation import ate
from hfnet_slam_tpu.geometry import cameras
from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
from hfnet_slam_tpu.slam.local_mapping import MapperConfig
from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
from hfnet_slam_tpu.slam.tracking import OK, Tracker, TrackerConfig

COMPILE_EVENT = "/jax/compilation_cache/compile_requests_use_cache"


def make_cam():
    return cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)


def browse_pose(i, radius=10.0, rate=0.010, bob=0.4):
    target = np.array([0.0, 0.0, radius])
    th = rate * i
    c = np.array([radius * np.sin(th), bob * np.sin(0.07 * i),
                  radius - radius * np.cos(th)])
    fwd = target - c
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    R_wc = np.stack([right, np.cross(fwd, right), fwd], 1)
    return R_wc.T.astype(np.float32), (-R_wc.T @ c).astype(np.float32)


def build_system(seed=5):
    cam = make_cam()
    world = SyntheticWorld.cloud(seed=seed, n_landmarks=1200, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=64)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=420, seed=7)
    cfg = SystemConfig(
        k_max=128, m_max=8192, n_slots=512, desc_dim=64, gdesc_dim=64,
        tracker=TrackerConfig(local_mp_cap=1024, min_init_med_parallax_deg=4.0),
        mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                            tri_neighbors=5),
    )
    return SLAMSystem(cam, ext, cfg), ext


def run_frames(sys_, ext, lo, hi):
    est_c, gt_c = [], []
    for i in range(lo, hi):
        R, t = browse_pose(i)
        st, Re, te = sys_.track_features(ext(R, t), 0.05 * i)
        if Re is not None:
            est_c.append(-Re.T @ te)
            gt_c.append(-R.T @ t)
    return np.asarray(est_c), np.asarray(gt_c)


def test_no_steady_state_recompiles():
    """After a warm-up prefix has exercised every code path (init, KF
    creation, triangulation, fuse, local BA, culling, loop checks), further
    frames must trigger ZERO XLA compile requests: all shapes are static
    and -1-padded to fixed capacities."""
    sys_, ext = build_system()
    run_frames(sys_, ext, 0, 45)
    assert sys_.tracker.state == OK

    events = []
    listener = lambda ev, **kw: events.append(ev)
    monitoring.register_event_listener(listener)
    try:
        run_frames(sys_, ext, 45, 80)
    finally:
        monitoring.unregister_event_listener(listener)
    n_compiles = sum(1 for e in events if e == COMPILE_EVENT)
    assert sys_.tracker.state == OK
    assert n_compiles == 0, f"{n_compiles} XLA compiles in steady state"


def test_fused_matches_staged_pipeline():
    """The fused program and the staged fallbacks it replaces must agree:
    same sequence, fused path force-disabled vs enabled, both track to
    small scale-corrected ATE and end with consistent map sizes."""
    results = {}
    for mode in ("fused", "staged"):
        sys_, ext = build_system()
        if mode == "staged":
            sys_.tracker._track_fused = lambda frame: False
        est, gt = run_frames(sys_, ext, 0, 70)
        assert sys_.tracker.state == OK
        rmse = ate.ate_rmse(est, gt, with_scale=True)
        results[mode] = (rmse, int(sys_.store.kf_valid.sum()),
                         int(sys_.store.mp_valid.sum()))
    rmse_f, kf_f, mp_f = results["fused"]
    rmse_s, kf_s, mp_s = results["staged"]
    # ~7 m of path over 70 frames; both pipelines must stay well-tracked
    assert rmse_f < 0.25, f"fused ATE {rmse_f}"
    assert rmse_s < 0.25, f"staged ATE {rmse_s}"
    # same order of map growth (not bitwise equality: the staged path uses
    # its own matcher variants; gates are shared constants)
    assert abs(kf_f - kf_s) <= max(3, 0.4 * max(kf_f, kf_s))
    assert 0.5 < (mp_f + 1) / (mp_s + 1) < 2.0


def test_device_map_incremental_sync():
    """DeviceMap row-level sync matches a full re-upload after scattered
    point updates (the dirty-row path is what keeps per-frame host->device
    traffic at O(kB))."""
    from hfnet_slam_tpu.slam import fused
    from hfnet_slam_tpu.slam.map import MapStore

    store = MapStore(k_max=8, m_max=256, n_slots=64, desc_dim=16, gdesc_dim=16)
    rng = np.random.default_rng(0)
    ids = store.add_points(rng.normal(size=(40, 3)).astype(np.float32),
                           rng.normal(size=(40, 16)).astype(np.float32),
                           first_kf=0)
    dm = fused.get_device_map(store)
    dm.sync()
    np.testing.assert_allclose(np.asarray(dm.pos)[ids], store.mp_pos[ids])

    # scattered update -> row-dirty -> incremental sync
    sel = ids[::3]
    store.mp_pos[sel] += 1.5
    store.mark_points_dirty(sel)
    dm.sync()
    np.testing.assert_allclose(np.asarray(dm.pos)[: store.m_max],
                               store.mp_pos, rtol=1e-6)

    # whole-map move -> all-dirty -> full re-upload
    store.mp_pos[:] *= 0.5
    store.bump_change()
    dm.sync()
    np.testing.assert_allclose(np.asarray(dm.pos)[: store.m_max],
                               store.mp_pos, rtol=1e-6)

"""End-to-end monocular SLAM regression on synthetic worlds.

The hermetic equivalent of the reference's dataset evaluation tier
(SURVEY.md §4): a FakeExtractor observes a fixed landmark field through
ground-truth poses; the SLAM system must initialize, track, triangulate
and keep scale-corrected ATE small. No dataset, no checkpoint.

Scenario notes: monocular SLAM accuracy is governed by parallax geometry.
The primary regression uses a lateral-rich trajectory (well-conditioned,
the regime EuRoC-style datasets mostly live in). A forward-corridor
stress sequence is kept short: sustained low-parallax forward motion
feeds triangulation-depth noise back into tracking, a known hard case
that the round-1 slice (no relocalization / multi-map recovery) does not
fully stabilize over long horizons.
"""
import numpy as np
import pytest

from hfnet_slam_tpu.evaluation import ate
from hfnet_slam_tpu.geometry import cameras
from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
from hfnet_slam_tpu.slam.local_mapping import MapperConfig
from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
from hfnet_slam_tpu.slam.tracking import OK, TrackerConfig


def make_cam():
    return cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)


def corridor_trajectory(n_frames, step=0.09, sway=0.3, yaw_amp=0.04):
    """GT poses (R_cw, t_cw): forward along +z with lateral sway + yaw wobble."""
    poses = []
    for i in range(n_frames):
        z = 1.0 + step * i
        x = sway * np.sin(0.08 * i)
        yaw = yaw_amp * np.sin(0.05 * i)
        c, s = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        center = np.array([x, 0.0, z])
        R_cw = R_wc.T
        poses.append((R_cw.astype(np.float32), (-R_cw @ center).astype(np.float32)))
    return poses


def browse_trajectory(n_frames, radius=10.0, rate=0.010, bob=0.4):
    """Lateral arc at distance `radius` from a landmark cloud centered at
    (0,0,radius), always facing the cloud center: strong parallax, the
    well-conditioned monocular regime."""
    poses = []
    target = np.array([0.0, 0.0, radius])
    for i in range(n_frames):
        th = rate * i
        c = np.array([radius * np.sin(th), bob * np.sin(0.07 * i), radius - radius * np.cos(th)])
        fwd = target - c
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R_wc = np.stack([right, upv, fwd], 1)
        R_cw = R_wc.T
        poses.append((R_cw.astype(np.float32), (-R_cw @ c).astype(np.float32)))
    return poses


def small_system(cam, extractor, **tracker_kw):
    cfg = SystemConfig(
        k_max=128, m_max=8192, n_slots=512, desc_dim=64, gdesc_dim=64,
        tracker=TrackerConfig(local_mp_cap=2048, **tracker_kw),
        mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                            tri_neighbors=5),
    )
    return SLAMSystem(cam, extractor, cfg)


def run_sequence(sys_, ext, gt, dt=0.05):
    """Feed all frames; return matched (est_centers, gt_centers)."""
    est_c, gt_c = [], []
    for i, (R, t) in enumerate(gt):
        feats = ext(R, t)
        st, Re, te = sys_.track_features(feats, dt * i)
        if Re is not None:
            est_c.append(-Re.T @ te)
            gt_c.append(-R.T @ t)
    return np.asarray(est_c), np.asarray(gt_c)


@pytest.fixture(scope="module")
def browse_run():
    cam = make_cam()
    world = SyntheticWorld.cloud(seed=5, n_landmarks=1400, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=64)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=480, seed=7)
    sys_ = small_system(cam, ext, min_init_med_parallax_deg=4.0)
    gt = browse_trajectory(80)
    est, gtc = run_sequence(sys_, ext, gt)
    return sys_, gt, est, gtc


def test_browse_tracks_whole_sequence(browse_run):
    sys_, gt, est, gtc = browse_run
    assert sys_.tracker.state == OK
    assert len(est) >= len(gt) - 20  # init consumes some frames


def test_browse_map_is_populated(browse_run):
    sys_, _, _, _ = browse_run
    store = sys_.store
    assert store.kf_valid.sum() >= 3
    assert store.mp_valid.sum() >= 200
    assert (store.covis == store.covis.T).all()
    kfs = store.valid_kf_ids()
    assert store.covis[np.ix_(kfs, kfs)].max() >= 15


def test_browse_ate_small(browse_run):
    _, _, est, gtc = browse_run
    err = ate.ate_rmse(est, gtc, with_scale=True)
    path = np.linalg.norm(np.diff(gtc, axis=0), axis=1).sum()
    assert err < 0.07 * path, f"ATE {err:.3f} m over {path:.1f} m path"


def test_corridor_short_sequence():
    """Forward corridor (stress case), bounded horizon."""
    cam = make_cam()
    world = SyntheticWorld.corridor(seed=3, n_landmarks=2600, length=25.0,
                                    width=7.0, height=5.0, desc_dim=64)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=480, seed=7)
    sys_ = small_system(cam, ext, min_init_med_parallax_deg=3.0)
    gt = corridor_trajectory(55)
    est, gtc = run_sequence(sys_, ext, gt)
    assert sys_.tracker.state == OK
    assert len(est) >= 10
    err = ate.ate_rmse(est, gtc, with_scale=True)
    assert err < 0.45, f"ATE {err:.3f} m"


def test_trajectory_export_tum(browse_run, tmp_path):
    sys_, _, _, _ = browse_run
    p = tmp_path / "traj.txt"
    sys_.save_trajectory(p)
    rows = np.loadtxt(p)
    assert rows.shape[1] == 8
    q = rows[:, 4:8]
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)


def test_map_save_load_roundtrip(browse_run, tmp_path):
    sys_, _, _, _ = browse_run
    p = tmp_path / "map.npz"
    sys_.save_map(p)
    from hfnet_slam_tpu.slam.map import MapStore

    m2 = MapStore.load(p)
    np.testing.assert_array_equal(m2.kf_valid, sys_.store.kf_valid)
    np.testing.assert_array_equal(m2.kf_obs, sys_.store.kf_obs)
    np.testing.assert_allclose(m2.mp_pos, sys_.store.mp_pos)
    assert m2.n_kf == sys_.store.n_kf


def test_distorted_rig_tracks_accurately():
    """Keypoint undistortion (Frame::UndistortKeyPoints parity): the fake
    sensor emits raw radial-tangentially distorted pixels (EuRoC-grade
    k1=-0.28, /root/reference/Examples/Monocular/EuRoC.yaml:28-31); the
    system must undistort them and track as accurately as the ideal rig."""
    cam = cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480,
                          dist=(-0.2834, 0.0739, 2.0e-4, 1.76e-5))
    world = SyntheticWorld.cloud(seed=5, n_landmarks=1400, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=64)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=480, seed=7)
    sys_ = small_system(cam, ext, min_init_med_parallax_deg=4.0)
    gt = browse_trajectory(60)
    est, gtc = run_sequence(sys_, ext, gt)
    assert sys_.tracker.state == OK
    err = ate.ate_rmse(est, gtc, with_scale=True)
    path = np.linalg.norm(np.diff(gtc, axis=0), axis=1).sum()
    assert err < 0.07 * path, f"ATE {err:.3f} m over {path:.1f} m path"


def test_async_pipeline_matches_sync_quality():
    """Async mapping worker (slam/pipeline.py): same sequence tracked with
    mapping/loop off the tracking thread must stay accurate and leave a
    consistent map after drain()."""
    cam = make_cam()
    world = SyntheticWorld.cloud(seed=5, n_landmarks=1400, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=64)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=480, seed=7)
    cfg = SystemConfig(
        k_max=128, m_max=8192, n_slots=512, desc_dim=64, gdesc_dim=64,
        async_mapping=True,
        tracker=TrackerConfig(local_mp_cap=2048, min_init_med_parallax_deg=4.0),
        mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                            tri_neighbors=5),
    )
    sys_ = SLAMSystem(cam, ext, cfg)
    assert sys_.worker is not None
    gt = browse_trajectory(80)
    est, gtc = run_sequence(sys_, ext, gt)
    sys_.finish()   # drain the mapping queue; re-raises worker exceptions
    assert sys_.tracker.state == OK
    assert len(est) >= len(gt) - 20
    store = sys_.store
    assert store.kf_valid.sum() >= 3
    assert store.mp_valid.sum() >= 200
    err = ate.ate_rmse(est, gtc, with_scale=True)
    path = np.linalg.norm(np.diff(gtc, axis=0), axis=1).sum()
    assert err < 0.08 * path, f"async ATE {err:.3f} m over {path:.1f} m path"
    sys_.shutdown()


def test_localization_only_mode():
    """ActivateLocalizationMode: tracking continues against the frozen map
    (no new keyframes / map points), and deactivation resumes SLAM."""
    cam = make_cam()
    world = SyntheticWorld.cloud(seed=9, n_landmarks=1400, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=64)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=480, seed=3)
    sys_ = small_system(cam, ext, min_init_med_parallax_deg=4.0)
    gt = browse_trajectory(70)
    for i, (R, t) in enumerate(gt[:40]):
        sys_.track_features(ext(R, t), 0.05 * i)
    assert sys_.tracker.state == OK
    sys_.activate_localization_mode()
    n_kf = int(sys_.store.kf_valid.sum())
    n_mp = int(sys_.store.mp_valid.sum())
    tracked = 0
    for i, (R, t) in enumerate(gt[40:]):
        st, Re, te = sys_.track_features(ext(R, t), 0.05 * (40 + i))
        tracked += Re is not None
    assert tracked >= 25                      # still localizing
    assert int(sys_.store.kf_valid.sum()) == n_kf  # map frozen
    assert int(sys_.store.mp_valid.sum()) == n_mp
    sys_.deactivate_localization_mode()
    assert not sys_.tracker.localization_only


def test_timestamp_jump_resets():
    """Tracking.cc:1122-1160: a backward timestamp or a long gap must not
    poison the motion model — the tracker goes LOST and the Atlas layer
    recovers with a fresh map."""
    cam = make_cam()
    world = SyntheticWorld.cloud(seed=4, n_landmarks=1400, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=64)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=480, seed=5)
    sys_ = small_system(cam, ext, min_init_med_parallax_deg=4.0)
    gt = browse_trajectory(60)
    for i, (R, t) in enumerate(gt[:30]):
        sys_.track_features(ext(R, t), 0.05 * i)
    assert sys_.tracker.state == OK
    n_maps_before = sys_.atlas.n_maps()
    # 100 s gap -> guard trips, map recovery kicks in
    st, Re, te = sys_.track_features(ext(*gt[30]), 0.05 * 29 + 100.0)
    assert Re is None
    # subsequent frames initialize a fresh map and track again
    for i, (R, t) in enumerate(gt[30:]):
        sys_.track_features(ext(R, t), 102.0 + 0.05 * i)
    assert sys_.tracker.state == OK


@pytest.mark.slow
def test_no_steady_state_recompiles_stack_wide():
    """VERDICT r3 #2: zero XLA compiles across the WHOLE stack (tracking +
    mapping + maintenance kernels) in the steady-state window — not just
    the fused tracker (test_fused pins that one). Variable pow2 buckets in
    refresh_point_descriptors / DeviceMap.sync were the round-3 leak."""
    from jax._src import monitoring

    cam = make_cam()
    world = SyntheticWorld.cloud(seed=5, n_landmarks=1400, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=64)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=480, seed=7)
    cfg = SystemConfig(
        k_max=128, m_max=8192, n_slots=512, desc_dim=64, gdesc_dim=64,
        loop_closing=False,
        tracker=TrackerConfig(local_mp_cap=1024,
                              min_init_med_parallax_deg=4.0),
        mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                            tri_neighbors=5),
    )
    sys_ = SLAMSystem(cam, ext, cfg)
    gt = browse_trajectory(110)
    for i in range(60):  # warm: compile every kernel incl. KF pipeline
        sys_.track_features(ext(*gt[i]), 0.05 * i)
    events = []
    listener = lambda ev, **kw: events.append(ev)
    monitoring.register_event_listener(listener)
    for i in range(60, 110):
        sys_.track_features(ext(*gt[i]), 0.05 * i)
    monitoring.unregister_event_listener(listener)
    n_kf = int(sys_.store.kf_valid.sum())
    sys_.shutdown()
    n_compiles = sum(
        1 for e in events
        if e == "/jax/compilation_cache/compile_requests_use_cache")
    assert n_kf >= 4  # mapping actually ran in the window
    assert n_compiles == 0, f"{n_compiles} steady-state compiles leaked"

"""MapStore capacity growth (VERDICT r2 weak #5): keyframes and map points
must never be silently dropped at capacity — the store doubles in place
(one XLA recompile per doubling; shape count stays logarithmic)."""
import numpy as np

from hfnet_slam_tpu.geometry import cameras
from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
from hfnet_slam_tpu.slam.local_mapping import MapperConfig
from hfnet_slam_tpu.slam.map import MapStore
from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
from hfnet_slam_tpu.slam.tracking import OK, TrackerConfig


def _feats(rng, n_slots=16, d=8):
    from hfnet_slam_tpu.models.extractor import Features

    g = rng.standard_normal(8).astype(np.float32)
    return Features(
        xy=rng.uniform(0, 100, (n_slots, 2)).astype(np.float32),
        score=np.zeros(n_slots, np.float32),
        octave=np.zeros(n_slots, np.int32),
        desc=rng.standard_normal((n_slots, d)).astype(np.float32),
        mask=np.ones(n_slots, bool),
        global_desc=g / np.linalg.norm(g),
    )


def test_store_grows_preserving_data():
    rng = np.random.default_rng(0)
    store = MapStore(k_max=4, m_max=16, n_slots=16, desc_dim=8, gdesc_dim=8)
    kfs = [store.add_keyframe(np.eye(3), np.zeros(3) + i, _feats(rng), 0.1 * i)
           for i in range(6)]  # crosses k_max=4
    assert store.k_max == 8
    np.testing.assert_allclose(store.kf_t[kfs[2]], np.zeros(3) + 2)
    assert store.covis.shape == (8, 8)
    assert (store.kf_parent[6:] == -1).all()

    ids = store.add_points(rng.normal(size=(40, 3)).astype(np.float32),
                           rng.normal(size=(40, 8)).astype(np.float32),
                           first_kf=kfs[0])  # crosses m_max=16 twice
    assert store.m_max == 64
    assert store.mp_valid[ids].all()
    assert len(store._mp_dirty) == 64


def test_system_survives_keyframe_overflow():
    """End to end: a tiny-capacity system on a long browse must keep
    inserting keyframes (growing) instead of silently skipping them."""
    cam = cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
    world = SyntheticWorld.cloud(seed=5, n_landmarks=1200, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=64)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=420, seed=7)
    cfg = SystemConfig(
        k_max=4, m_max=2048, n_slots=512, desc_dim=64, gdesc_dim=64,
        loop_closing=False,
        tracker=TrackerConfig(local_mp_cap=1024, min_init_med_parallax_deg=4.0,
                              max_frames_between_kf=3),
        mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                            tri_neighbors=5,
                            kf_cull_min_age=10 ** 6),  # culling off: the
        # capacity MUST grow rather than drop coverage
    )
    sys_ = SLAMSystem(cam, ext, cfg)

    def browse(i):
        th = 0.03 * i  # fast sweep: coverage churn forces keyframes
        r = 10.0
        c = np.array([r * np.sin(th), 0.4 * np.sin(0.07 * i), r - r * np.cos(th)])
        fwd = np.array([0.0, 0.0, r]) - c
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        R_wc = np.stack([right, np.cross(fwd, right), fwd], 1)
        return R_wc.T.astype(np.float32), (-R_wc.T @ c).astype(np.float32)

    for i in range(80):
        sys_.track_features(ext(*browse(i)), 0.05 * i)
    assert sys_.tracker.state == OK
    assert sys_.store.k_max > 4, "store never grew"
    assert int(sys_.store.kf_valid.sum()) > 4, "keyframes were dropped"

"""Multi-map merge: losing the map, starting a new one, welding them back.

The signature ORB-SLAM3/HFNet-SLAM recovery (SURVEY.md §5.3, MergeLocal):
after an extended feature blackout the tracker goes LOST, the mature map
is stored, a fresh map starts — and when place recognition later matches
the new map into the stored one, the maps merge into a single consistent
map whose trajectory spans both sessions.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from hfnet_slam_tpu.geometry import cameras
from hfnet_slam_tpu.models.extractor import Features
from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
from hfnet_slam_tpu.slam.local_mapping import MapperConfig
from hfnet_slam_tpu.slam.loop_closing import LoopCloserConfig
from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
from hfnet_slam_tpu.slam.tracking import OK, TrackerConfig
from tests.test_slam import browse_trajectory, make_cam


def empty_feats(n=512, d=64, g=64):
    return Features(
        xy=jnp.zeros((n, 2)), score=jnp.zeros(n),
        octave=jnp.zeros(n, jnp.int32), desc=jnp.zeros((n, d)),
        mask=jnp.zeros(n, bool), global_desc=jnp.zeros(g),
    )


@pytest.fixture(scope="module")
def merge_run():
    cam = make_cam()
    world = SyntheticWorld.cloud(seed=5, n_landmarks=1600, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=64)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=480, seed=7)
    cfg = SystemConfig(
        k_max=192, m_max=16384, n_slots=512, desc_dim=64, gdesc_dim=64,
        tracker=TrackerConfig(
            local_mp_cap=2048, min_init_med_parallax_deg=2.0,
            recently_lost_frames=4,   # short window -> LOST -> new map
            min_reloc_inliers=10**9,  # force relocalization to fail
            mature_map_kfs=3,         # store (not discard) the first map
            # the synthetic world tracks so cleanly that c2 fires late;
            # raise the ratio so keyframes accrue before the blackout
            kf_ref_ratio=0.95,
        ),
        mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                            tri_neighbors=5),
        loop=LoopCloserConfig(
            min_pair_matches=30, min_sim3_inliers=15, min_proj_matches=30,
            consistency_hits=1, n_covis_window=5,
            window_mp_cap=2048, gba_kf_cap=48, gba_mp_cap=4096,
            gba_edge_cap=16384, ransac_hyps=256,
        ),
    )
    sys_ = SLAMSystem(cam, ext, cfg)
    gt = browse_trajectory(160)
    est_c, gt_c, est_i = [], [], []
    events = {"lost_to_new_map": False, "merged_at": -1}
    for i, (R, t) in enumerate(gt):
        if 50 <= i < 58:
            feats = empty_feats()
        else:
            feats = ext(R, t)
        st, Re, te = sys_.track_features(feats, 0.05 * i)
        if sys_.atlas.n_maps() > 1:
            events["lost_to_new_map"] = True
        if events["lost_to_new_map"] and sys_.atlas.n_maps() == 1 and events["merged_at"] < 0:
            events["merged_at"] = i
        if Re is not None:
            est_c.append(-Re.T @ te)
            gt_c.append(-R.T @ t)
            est_i.append(i)
    return sys_, np.asarray(est_c), np.asarray(gt_c), np.asarray(est_i), events


@pytest.mark.slow
def test_map_was_lost_and_merged(merge_run):
    sys_, est, gtc, idx, events = merge_run
    assert events["lost_to_new_map"], "blackout never forced a second map"
    assert events["merged_at"] > 0, "maps never merged"
    assert sys_.atlas.n_maps() == 1
    assert sys_.loop_closer.stats["merged"] >= 1


@pytest.mark.slow
def test_merged_trajectory_consistent(merge_run):
    from hfnet_slam_tpu.evaluation import ate

    sys_, est, gtc, idx, events = merge_run
    m = events["merged_at"]
    sel = idx >= m  # post-merge segment lives in the merged frame
    assert sel.sum() > 40
    # the seam region (tracked on transplanted points) carries the Sim3
    # weld's residual error and settles as BA relaxes it; assert loose
    # there and tight once settled (the reference's merge has the same
    # transient — its welding BA + essential graph smooth it out)
    err_all = ate.ate_rmse(est[sel], gtc[sel], with_scale=True)
    path = np.linalg.norm(np.diff(gtc[sel], axis=0), axis=1).sum()
    assert err_all < 0.15 * path, f"post-merge ATE {err_all:.3f} over {path:.1f} m"
    settled = idx >= m + 30
    assert settled.sum() > 25
    err_settled = ate.ate_rmse(est[settled], gtc[settled], with_scale=True)
    assert err_settled < 0.05, f"settled ATE {err_settled:.3f} m"


@pytest.mark.slow
def test_merged_map_is_single_consistent_store(merge_run):
    sys_, *_ = merge_run
    store = sys_.store
    kfs = store.valid_kf_ids()
    # reference-grade keyframe culling (90% same-or-finer-scale redundancy)
    # now bounds the map — with flat-octave fake features it prunes hard,
    # so the floor is lower than the pre-culling 15
    assert len(kfs) >= 8
    # covisibility crosses the seam: the merged halves must be connected
    assert (store.covis[np.ix_(kfs, kfs)] > 0).any()
    # observation bookkeeping intact
    obs = store.kf_obs[kfs]
    live = obs[obs >= 0]
    assert store.mp_valid[live].all()


def test_merge_grows_target_beyond_capacity():
    """merge_into must GROW the target store when active+target exceed its
    capacity — zero dropped keyframes/points (the reference's MergeLocal
    moves everything, LoopClosing.cc:1355-1922; VERDICT r3 weak #5)."""
    from hfnet_slam_tpu.slam import merging
    from hfnet_slam_tpu.slam.map import MapStore

    rng = np.random.default_rng(0)

    def build(n_kf, n_mp, k_max, m_max):
        st = MapStore(k_max=k_max, m_max=m_max, n_slots=16, desc_dim=8,
                      gdesc_dim=8)
        descs = rng.normal(size=(n_mp, 8)).astype(np.float32)
        descs /= np.linalg.norm(descs, axis=1, keepdims=True)
        ids = st.add_points(rng.normal(size=(n_mp, 3)).astype(np.float32),
                            descs)

        class F:
            xy = rng.uniform(0, 100, (16, 2)).astype(np.float32)
            score = np.ones(16, np.float32)
            octave = np.zeros(16, np.int32)
            desc = np.zeros((16, 8), np.float32)
            mask = np.ones(16, bool)
            global_desc = np.ones(8, np.float32)

        for i in range(n_kf):
            obs = np.full(16, -1, np.int32)
            obs[:4] = ids[(4 * i) % n_mp: (4 * i) % n_mp + 4]
            st.add_keyframe(np.eye(3), np.zeros(3), F(), float(i), obs=obs)
        return st

    active = build(n_kf=12, n_mp=96, k_max=16, m_max=128)
    target = build(n_kf=6, n_mp=48, k_max=8, m_max=64)
    n_kf_a = int(active.kf_valid.sum())
    n_mp_a = int(active.mp_valid.sum())
    n_kf_t = int(target.kf_valid.sum())
    n_mp_t = int(target.mp_valid.sum())
    G = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 1.0)
    kf_remap, mp_remap = merging.merge_into(active, target, G)
    # NOTHING dropped: every active keyframe and landmark transplanted
    assert len(kf_remap) == n_kf_a
    assert len(mp_remap) == n_mp_a
    assert int(target.kf_valid.sum()) == n_kf_a + n_kf_t
    assert int(target.mp_valid.sum()) == n_mp_a + n_mp_t
    # capacities grew
    assert target.k_max > 8 and target.m_max > 64
    # observation bookkeeping intact in the grown store
    kfs = target.valid_kf_ids()
    obs = target.kf_obs[kfs]
    live = obs[obs >= 0]
    assert target.mp_valid[live].all()

"""Loop-closing stack: Sim3 solver, pose graph, retrieval, e2e correction.

Mirrors the reference's loop-closing verification needs (SURVEY.md §2
LoopClosing / Sim3Solver / KeyFrameDatabase rows) hermetically: synthetic
point sets for the solvers, a synthetic circular trajectory with a
revisit for the end-to-end loop correction.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from hfnet_slam_tpu import lie
from hfnet_slam_tpu.geometry import cameras
from hfnet_slam_tpu.optim import pose_graph as pg
from hfnet_slam_tpu.optim import sim3 as s3


def make_cam():
    return cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)


# ---------------------------------------------------------------------------
# Sim3 solver (Sim3Solver.cc analogue)
# ---------------------------------------------------------------------------

class TestSim3:
    def _problem(self, s_gt=1.3, n_out=30, N=128, seed=0):
        rng = np.random.default_rng(seed)
        cam = make_cam()
        R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.1, 0.3])))
        t_gt = np.array([0.5, -0.2, 0.1], np.float32)
        p2 = rng.uniform(-2, 2, (N, 3)).astype(np.float32) + np.array([0, 0, 6], np.float32)
        p1 = s_gt * p2 @ R_gt.T + t_gt
        p1[:n_out] += rng.uniform(1, 3, (n_out, 3))  # gross outliers
        uv1 = np.asarray(cam.project(jnp.asarray(p1)))
        uv2 = np.asarray(cam.project(jnp.asarray(p2)))
        return cam, R_gt, t_gt, s_gt, p1, p2, uv1, uv2, n_out

    def test_horn_closed_form_exact(self):
        cam, R_gt, t_gt, s_gt, p1, p2, uv1, uv2, n_out = self._problem(n_out=0)
        R, t, s = s3.horn_sim3(jnp.asarray(p2), jnp.asarray(p1))
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-5)
        assert abs(float(s) - s_gt) < 1e-5

    def test_ransac_rejects_outliers(self):
        cam, R_gt, t_gt, s_gt, p1, p2, uv1, uv2, n_out = self._problem()
        N = len(p1)
        res = s3.sim3_ransac(
            cam.kind, cam.params,
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(N), jnp.ones(N), jnp.ones(N, bool),
            jnp.asarray([1, 2], jnp.uint32), n_hyps=128,
        )
        assert int(res["n_inliers"]) >= N - n_out - 3
        inl = np.asarray(res["inliers"])
        assert not inl[:n_out].any()
        assert abs(float(res["s12"]) - s_gt) < 0.05

    def test_optimize_sim3_recovers_exact(self):
        cam, R_gt, t_gt, s_gt, p1, p2, uv1, uv2, n_out = self._problem()
        N = len(p1)
        res = s3.sim3_ransac(
            cam.kind, cam.params,
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(N), jnp.ones(N), jnp.ones(N, bool),
            jnp.asarray([1, 2], jnp.uint32), n_hyps=128,
        )
        opt = s3.optimize_sim3(
            cam.kind, cam.params, res["R12"], res["t12"], res["s12"],
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(N), jnp.ones(N), res["inliers"],
        )
        assert np.linalg.norm(np.asarray(opt["R12"]) - R_gt) < 1e-3
        assert np.linalg.norm(np.asarray(opt["t12"]) - t_gt) < 1e-3
        assert abs(float(opt["s12"]) - s_gt) < 1e-3

    def test_fix_scale(self):
        cam, R_gt, t_gt, s_gt, p1, p2, uv1, uv2, n_out = self._problem(s_gt=1.0, n_out=0)
        N = len(p1)
        res = s3.sim3_ransac(
            cam.kind, cam.params,
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(N), jnp.ones(N), jnp.ones(N, bool),
            jnp.asarray([3, 4], jnp.uint32), n_hyps=64, fix_scale=True,
        )
        assert float(res["s12"]) == 1.0
        assert int(res["n_inliers"]) == N


# ---------------------------------------------------------------------------
# essential graph (Optimizer::OptimizeEssentialGraph analogue)
# ---------------------------------------------------------------------------

class TestPoseGraph:
    def _circle(self, K=12, noise=0.05, seed=0):
        rng = np.random.default_rng(seed)
        gt_R, gt_t = [], []
        for k in range(K):
            th = 2 * np.pi * k / K
            gt_R.append(np.asarray(lie.so3_exp(jnp.asarray([0, 0, th], jnp.float32))))
            gt_t.append(np.array([np.cos(th), np.sin(th), 0], np.float32))
        gt_R, gt_t = np.stack(gt_R), np.stack(gt_t)
        est_R = gt_R.copy()
        est_t = gt_t + rng.normal(0, noise, (K, 3)).astype(np.float32)
        est_t[0] = gt_t[0]
        return gt_R, gt_t, est_R, est_t

    def _solve(self, gt_R, gt_t, est_R, est_t, fix_scale=False):
        K = len(gt_R)
        ones = np.ones(K, np.float32)
        pairs = [(k, k + 1) for k in range(K - 1)]
        Rm, tm, sm, w = pg.make_edges_from_poses(est_R, est_t, ones, pairs)
        Rl, tl, sl, wl = pg.make_edges_from_poses(gt_R, gt_t, ones, [(0, K - 1)])
        e_i = np.asarray([p[0] for p in pairs] + [0], np.int32)
        e_j = np.asarray([p[1] for p in pairs] + [K - 1], np.int32)
        prob = pg.PoseGraphProblem(
            R=jnp.asarray(est_R), t=jnp.asarray(est_t), s=jnp.ones(K),
            fixed=jnp.asarray(np.arange(K) == 0),
            e_i=jnp.asarray(e_i), e_j=jnp.asarray(e_j),
            e_R=jnp.asarray(np.concatenate([Rm, Rl])),
            e_t=jnp.asarray(np.concatenate([tm, tl])),
            e_s=jnp.asarray(np.concatenate([sm, sl])),
            e_w=jnp.asarray(np.concatenate([w, wl * 5])),
            e_valid=jnp.ones(len(e_i), bool),
        )
        return pg.optimize_pose_graph(prob, n_iters=15, fix_scale=fix_scale)

    def test_loop_edge_pulls_drift_out(self):
        gt_R, gt_t, est_R, est_t = self._circle()
        out, costs = self._solve(gt_R, gt_t, est_R, est_t)
        assert float(costs[-1]) < float(costs[0]) * 0.1
        t_new = np.asarray(out.t) / np.asarray(out.s)[:, None]
        err_before = np.linalg.norm(est_t[-1] - gt_t[-1])
        err_after = np.linalg.norm(t_new[-1] - gt_t[-1])
        assert err_after < 0.2 * err_before

    def test_fix_scale_keeps_unit_scale(self):
        gt_R, gt_t, est_R, est_t = self._circle()
        out, _ = self._solve(gt_R, gt_t, est_R, est_t, fix_scale=True)
        np.testing.assert_allclose(np.asarray(out.s), 1.0, atol=1e-6)

    def test_fixed_vertex_does_not_move(self):
        gt_R, gt_t, est_R, est_t = self._circle()
        out, _ = self._solve(gt_R, gt_t, est_R, est_t)
        np.testing.assert_allclose(np.asarray(out.R[0]), est_R[0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.t[0]), est_t[0], atol=1e-6)


# ---------------------------------------------------------------------------
# Sim3 window propagation (CorrectLoop's :1185-1251 stage) with scale != 1.
# Guards the composition S_iw = S_ik o S_cw against double-applying the loop
# scale (the exact regime loop closing exists for: monocular scale drift).
# ---------------------------------------------------------------------------

class TestSim3Propagation:
    def _feats(self, n_slots, desc_dim, rng):
        from hfnet_slam_tpu.models.extractor import Features

        d = rng.standard_normal((n_slots, desc_dim)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return Features(
            xy=jnp.zeros((n_slots, 2)), score=jnp.ones(n_slots),
            octave=jnp.zeros(n_slots, jnp.int32), desc=jnp.asarray(d),
            mask=jnp.ones(n_slots, bool), global_desc=jnp.zeros(8),
        )

    def test_window_correction_with_scaled_drift(self):
        from hfnet_slam_tpu.slam.loop_closing import LoopCloser, LoopCloserConfig
        from hfnet_slam_tpu.slam.map import MapStore

        rng = np.random.default_rng(3)
        cam = make_cam()
        store = MapStore(k_max=16, m_max=512, n_slots=64, desc_dim=8, gdesc_dim=8)
        s_g = 1.15
        R_g = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.01, 0.05], jnp.float32)))
        t_g = np.array([0.3, -0.1, 0.2], np.float32)

        # true world points + true camera poses (cand=0 at identity)
        pts = rng.uniform(-2, 2, (60, 3)).astype(np.float32) + [0, 0, 8]
        true_R, true_t = [np.eye(3, dtype=np.float32)], [np.zeros(3, np.float32)]
        for i in range(1, 4):
            true_R.append(np.asarray(lie.so3_exp(jnp.asarray([0, 0.05 * i, 0], jnp.float32))))
            true_t.append(np.array([0.4 * i, 0.0, 0.1 * i], np.float32))

        # drifted map: points p' = s R_g p + t_g; poses T'_i = [R_i R_g^T,
        # s t_i - R_i R_g^T t_g] (projections unchanged; camera depths x s)
        pts_d = s_g * pts @ R_g.T + t_g
        feats0 = self._feats(64, 8, rng)
        store.add_keyframe(true_R[0], true_t[0], feats0, 0.0)  # cand, true frame
        ids = store.add_points(pts_d, np.asarray(feats0.desc)[:60], first_kf=0)
        for i in range(1, 4):
            Rd = true_R[i] @ R_g.T
            td = s_g * true_t[i] - Rd @ t_g
            k = store.add_keyframe(Rd, td, self._feats(64, 8, rng), float(i),
                                   obs=np.concatenate([ids, -np.ones(4, np.int32)]))
            store.update_covisibility(k)

        lc = LoopCloser(cam, store, LoopCloserConfig())
        # measured Sim3 cand-cam -> current-cam: true relative SE3 with the
        # drift scale on translation (3D-3D pairs are drifted-vs-true)
        kcur = 3
        R_cm = true_R[kcur] @ true_R[0].T
        t_cm = s_g * (true_t[kcur] - R_cm @ true_t[0])
        S_cw, window = lc.propagate_window_correction(kcur, 0, R_cm, t_cm, s_g)

        assert set(window) == {1, 2, 3}
        for i in (1, 2, 3):
            np.testing.assert_allclose(store.kf_R[i], true_R[i], atol=1e-5)
            np.testing.assert_allclose(store.kf_t[i], true_t[i], atol=1e-5)
        np.testing.assert_allclose(store.mp_pos[ids], pts, atol=1e-4)


# ---------------------------------------------------------------------------
# retrieval (KeyFrameDatabase analogue)
# ---------------------------------------------------------------------------

class TestRetrieval:
    def _store_with_gdescs(self, K=20, dim=64, seed=0):
        from hfnet_slam_tpu.slam.map import MapStore

        rng = np.random.default_rng(seed)
        store = MapStore(k_max=32, m_max=64, n_slots=8, desc_dim=8, gdesc_dim=dim)
        g = rng.standard_normal((K, dim)).astype(np.float32)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        for k in range(K):
            store.kf_valid[k] = True
            store.kf_gdesc[k] = g[k]
            store.n_kf += 1
        return store, g

    def test_score_all_self_is_one(self):
        from hfnet_slam_tpu.slam import retrieval

        store, g = self._store_with_gdescs()
        sc = retrieval.score_all(store, g[3])
        assert abs(sc[3] - 1.0) < 1e-5
        assert sc.argmax() == 3

    def test_detect_candidates_excludes(self):
        from hfnet_slam_tpu.slam import retrieval

        store, g = self._store_with_gdescs()
        # make kf 7 a near-duplicate of kf 3
        store.kf_gdesc[7] = store.kf_gdesc[3]
        cands = retrieval.detect_n_best_candidates(store, g[3], exclude={3}, n=3)
        assert 7 in cands and 3 not in cands

    def test_reloc_candidates(self):
        from hfnet_slam_tpu.slam import retrieval

        store, g = self._store_with_gdescs()
        q = g[5] + 0.05 * g[6]
        q /= np.linalg.norm(q)
        cands = retrieval.detect_relocalization_candidates(store, q)
        assert len(cands) >= 1
        assert cands[0] == 5


# ---------------------------------------------------------------------------
# end-to-end loop closure on a circular revisit
# ---------------------------------------------------------------------------

def circle_trajectory(n_frames, radius=6.0, total_angle=2.25 * np.pi, bob=0.15):
    """Camera orbits a circle of `radius` about (0,0,radius), facing OUTWARD
    toward a surrounding landmark ring (lateral sweep = strong parallax),
    going past a full revolution so the start region is revisited."""
    poses = []
    center = np.array([0.0, 0.0, radius])
    for i in range(n_frames):
        th = total_angle * i / n_frames
        out = np.array([np.sin(th), 0.0, -np.cos(th)])
        c = center + radius * out + np.array([0.0, bob * np.sin(0.1 * i), 0.0])
        fwd = out  # look outward at the ring
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R_wc = np.stack([right, upv, fwd], 1)
        R_cw = R_wc.T
        poses.append((R_cw.astype(np.float32), (-R_cw @ c).astype(np.float32)))
    return poses


@pytest.fixture(scope="module")
def loop_run():
    from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
    from hfnet_slam_tpu.slam.local_mapping import MapperConfig
    from hfnet_slam_tpu.slam.loop_closing import LoopCloserConfig
    from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
    from hfnet_slam_tpu.slam.tracking import TrackerConfig

    cam = make_cam()
    # landmark ring surrounding the camera circle (radius 6 about (0,0,6))
    rng = np.random.default_rng(11)
    n_lm = 4000
    th = rng.uniform(0, 2 * np.pi, n_lm)
    rr = rng.uniform(12.0, 20.0, n_lm)
    pts = np.stack([
        rr * np.sin(th),
        rng.uniform(-4.0, 4.0, n_lm),
        6.0 - rr * np.cos(th),
    ], 1).astype(np.float32)
    d = rng.standard_normal((n_lm, 64)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    from hfnet_slam_tpu.models.fake import SyntheticWorld as SW

    world = SW(pts, d, rng)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3, desc_noise=0.03,
                        max_landmarks_per_frame=480, seed=7, max_depth=25.0)
    cfg = SystemConfig(
        k_max=256, m_max=16384, n_slots=512, desc_dim=64, gdesc_dim=64,
        tracker=TrackerConfig(local_mp_cap=2048, min_init_med_parallax_deg=1.0),
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
    gt = circle_trajectory(170)
    est_c, gt_c = [], []
    for i, (R, t) in enumerate(gt):
        feats = ext(R, t)
        st, Re, te = sys_.track_features(feats, 0.05 * i)
        if Re is not None:
            est_c.append(-Re.T @ te)
            gt_c.append(-R.T @ t)
    return sys_, np.asarray(est_c), np.asarray(gt_c)


@pytest.mark.slow
def test_loop_detected_and_corrected(loop_run):
    sys_, est, gtc = loop_run
    lc = sys_.loop_closer
    assert lc is not None
    assert lc.stats["checked"] > 0
    assert lc.stats["corrected"] >= 1, f"loop stats: {lc.stats}"
    assert len(sys_.store.loop_edges) >= 1


@pytest.mark.slow
def test_loop_trajectory_consistent(loop_run):
    from hfnet_slam_tpu.evaluation import ate

    sys_, est, gtc = loop_run
    assert len(est) > 100
    err = ate.ate_rmse(est, gtc, with_scale=True)
    path = np.linalg.norm(np.diff(gtc, axis=0), axis=1).sum()
    assert err < 0.05 * path, f"ATE {err:.3f} m over {path:.1f} m"


@pytest.mark.slow
def test_trajectory_recovery_propagates_correction(loop_run):
    """Relative-pose trajectory recovery (Tracking.cc:1604-1624): frames
    tracked BEFORE the loop correction must follow their reference KFs when
    the trajectory is rebuilt at save time."""
    from hfnet_slam_tpu.evaluation import ate
    from hfnet_slam_tpu.utils import trajectory as TJ

    sys_, est, gtc = loop_run
    traj = sys_.tracker.trajectory
    rec = TJ.recovered(traj)
    assert len(rec) == len(traj) == len(est)
    # the loop correction moved reference KFs -> recovered poses must differ
    # from the frozen track-time absolutes for a meaningful share of frames
    moved = sum(
        1 for e, (_, R, t) in zip(traj, rec)
        if np.linalg.norm(np.asarray(e.t) - t) > 1e-6
    )
    assert moved > 10, f"only {moved} frames moved by recovery"
    # ... and the rebuilt trajectory is at least as accurate as the frozen one
    est_rec = np.asarray([-R.T @ t for _, R, t in rec])
    err_live = ate.ate_rmse(est, gtc, with_scale=True)
    err_rec = ate.ate_rmse(est_rec, gtc, with_scale=True)
    assert err_rec <= err_live * 1.05 + 1e-6, (
        f"recovery hurt: {err_rec:.4f} vs live {err_live:.4f}")


class TestGBAPropagation:
    """Capacity-capped global BA must leave NO stale poses: keyframes and
    points outside the solve follow their spanning-tree anchors
    (LoopClosing.cc:2440-2540 propagation; VERDICT r1 weak #3)."""

    def _store(self, K=20, P=100, seed=0):
        from hfnet_slam_tpu.models.extractor import Features
        from hfnet_slam_tpu.slam.map import MapStore

        rng = np.random.default_rng(seed)
        store = MapStore(k_max=32, m_max=512, n_slots=16, desc_dim=8, gdesc_dim=8)
        pts = rng.uniform(-3, 3, (P, 3)).astype(np.float32) + [0, 0, 10]

        def feats():
            d = rng.standard_normal((16, 8)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            return Features(xy=jnp.zeros((16, 2)), score=jnp.ones(16),
                            octave=jnp.zeros(16, jnp.int32), desc=jnp.asarray(d),
                            mask=jnp.ones(16, bool), global_desc=jnp.zeros(8))

        ids = store.add_points(pts, rng.standard_normal((P, 8)).astype(np.float32),
                               first_kf=0)
        for i in range(K):
            R = np.asarray(lie.so3_exp(jnp.asarray([0, 0.03 * i, 0], jnp.float32)))
            t = np.array([0.2 * i, 0, 0.05 * i], np.float32)
            obs = ids[(4 * i) % P: (4 * i) % P + 8][:8]
            obs = np.concatenate([obs, -np.ones(16 - len(obs), np.int32)]).astype(np.int32)
            store.add_keyframe(R, t, feats(), float(i), obs=obs)
            store.update_covisibility(i)
        return store, ids

    def test_uncovered_kfs_and_points_follow_anchors(self):
        from hfnet_slam_tpu.slam.local_mapping import LocalMapper, MapperConfig

        store, ids = self._store()
        cam = make_cam()
        mapper = LocalMapper(cam, store, MapperConfig())
        pre_R = store.kf_R.copy()
        pre_t = store.kf_t.copy()
        # simulate a capped solve that rigidly moved only KFs 0..9 + their pts
        Rg = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.02, 0.1], jnp.float32)))
        tg = np.array([0.5, -0.3, 0.2], np.float32)
        opt_kfs = list(range(10))
        opt_mps = ids[:40]
        for j in opt_kfs:  # world moved by G: T_new = T_old o G^{-1}
            store.kf_R[j] = pre_R[j] @ Rg.T
            store.kf_t[j] = pre_t[j] - (pre_R[j] @ Rg.T) @ tg
        store.mp_pos[opt_mps] = store.mp_pos[opt_mps] @ Rg.T + tg

        mapper.propagate_ba_correction(opt_kfs, opt_mps, pre_R, pre_t)

        # every KF must now carry the same world transform
        for j in range(20):
            np.testing.assert_allclose(store.kf_R[j], pre_R[j] @ Rg.T, atol=1e-5)
            np.testing.assert_allclose(
                store.kf_t[j], pre_t[j] - (pre_R[j] @ Rg.T) @ tg, atol=1e-5)
        # ... and every point (uncovered ones followed their reference KF)
        expect = (np.asarray(store.mp_pos[ids[40:]]) - tg) @ Rg  # undo G
        pre_pts = None  # points 40: were moved by propagation from original
        # original positions: reconstruct from undoing G must match pre state
        # (they started consistent with pre poses)
        store2, ids2 = self._store()
        np.testing.assert_allclose(expect, store2.mp_pos[ids2[40:]], atol=1e-4)


class TestFourDoF:
    """OptimizeEssentialGraph4DoF analogue: the inertial pose graph must
    correct drift with yaw+translation only — roll/pitch (the gravity
    direction) and scale stay pinned (Optimizer.cc:5292)."""

    def test_4dof_preserves_horizon(self):
        from hfnet_slam_tpu.optim import pose_graph as pg

        rng = np.random.default_rng(0)
        K = 10
        # ground truth: yaw-circle of cameras (world z = gravity)
        gt_R, gt_t = [], []
        for i in range(K):
            yaw = 2 * np.pi * i / K
            R = np.asarray(lie.so3_exp(jnp.asarray([0, 0, yaw], jnp.float32)))
            gt_R.append(R)
            gt_t.append(np.asarray([np.cos(yaw), np.sin(yaw), 0.0], np.float32))
        gt_R, gt_t = np.stack(gt_R), np.stack(gt_t)
        # drifted estimate: growing extra yaw + translation noise
        est_R, est_t = gt_R.copy(), gt_t.copy()
        for i in range(K):
            dyaw = 0.05 * i
            Rd = np.asarray(lie.so3_exp(jnp.asarray([0, 0, dyaw], jnp.float32)))
            est_R[i] = est_R[i] @ Rd  # world-side yaw drift
            est_t[i] = est_t[i] + rng.normal(0, 0.02, 3).astype(np.float32)

        pairs = [(i, i + 1) for i in range(K - 1)]
        Rm, tm, sm, w = pg.make_edges_from_poses(
            est_R, est_t, np.ones(K, np.float32), np.asarray(pairs),
        )
        # loop edge 0 -> K-1 with the TRUE relative pose
        Rt, tt, st, _ = pg.make_edges_from_poses(
            gt_R, gt_t, np.ones(K, np.float32), np.asarray([(0, K - 1)]),
        )
        pairs.append((0, K - 1))
        Rm = np.concatenate([Rm, Rt]); tm = np.concatenate([tm, tt])
        sm = np.concatenate([sm, st]); w = np.concatenate([w, [1.0]])
        fixed = np.zeros(K, bool); fixed[0] = True
        prob = pg.PoseGraphProblem(
            R=jnp.asarray(est_R), t=jnp.asarray(est_t),
            s=jnp.ones(K), fixed=jnp.asarray(fixed),
            e_i=jnp.asarray([p[0] for p in pairs], jnp.int32),
            e_j=jnp.asarray([p[1] for p in pairs], jnp.int32),
            e_R=jnp.asarray(Rm), e_t=jnp.asarray(tm), e_s=jnp.asarray(sm),
            e_w=jnp.asarray(w), e_valid=jnp.ones(len(pairs), bool),
        )
        out, _ = pg.optimize_pose_graph(prob, n_iters=20, mode="4dof")
        R_out = np.asarray(out.R)
        # scale untouched
        np.testing.assert_allclose(np.asarray(out.s), 1.0, atol=1e-6)
        # every camera's world-z axis unchanged: rotation applied was
        # yaw-only, so R_out R_est^T must map e_z to e_z
        for i in range(K):
            dR = R_out[i].T @ np.asarray(est_R[i])  # world-side update
            np.testing.assert_allclose(dR @ [0, 0, 1], [0, 0, 1], atol=1e-4)
        # drift reduced: last KF closer to GT than before
        err0 = np.linalg.norm(est_t[-1] - gt_t[-1])
        err1 = np.linalg.norm(np.asarray(out.t[-1]) - gt_t[-1])
        rot0 = np.degrees(np.abs(np.asarray(
            lie.so3_log(jnp.asarray(est_R[-1] @ gt_R[-1].T)))).max())
        rot1 = np.degrees(np.abs(np.asarray(
            lie.so3_log(jnp.asarray(R_out[-1] @ gt_R[-1].T)))).max())
        assert rot1 < rot0 * 0.5, f"yaw drift {rot0:.2f} -> {rot1:.2f} deg"
        assert err1 < err0 * 1.5  # translation not degraded


class TestGravityGate:
    def _closer(self):
        from hfnet_slam_tpu.models.extractor import Features
        from hfnet_slam_tpu.slam.loop_closing import LoopCloser, LoopCloserConfig
        from hfnet_slam_tpu.slam.map import MapStore

        rng = np.random.default_rng(0)
        store = MapStore(k_max=8, m_max=64, n_slots=16, desc_dim=8, gdesc_dim=8)
        d = rng.standard_normal((16, 8)).astype(np.float32)
        feats = Features(xy=jnp.zeros((16, 2)), score=jnp.ones(16),
                         octave=jnp.zeros(16, jnp.int32), desc=jnp.asarray(d),
                         mask=jnp.ones(16, bool), global_desc=jnp.zeros(8))
        store.add_keyframe(np.eye(3), np.zeros(3), feats, 0.0)   # cand
        store.add_keyframe(np.eye(3), np.asarray([1.0, 0, 0]), feats, 1.0)  # k
        store.imu_initialized = True
        store.viba2 = True
        cam = make_cam()
        return LoopCloser(cam, store, LoopCloserConfig()), store

    def test_roll_correction_rejected(self):
        lc, store = self._closer()
        # loop Sim3 whose world correction rolls the horizon by 0.05 rad
        R_bad = np.asarray(lie.so3_exp(jnp.asarray([0.05, 0, 0], jnp.float32)))
        hit = lc._gravity_gate(1, 0, R_bad, np.zeros(3, np.float32), 1.0, None)
        assert hit is None

    def test_yaw_correction_forced_unit_scale(self):
        lc, store = self._closer()
        R_yaw = np.asarray(lie.so3_exp(jnp.asarray([0, 0, 0.2], jnp.float32)))
        t = np.asarray([0.9, 0.1, 0.0], np.float32)
        hit = lc._gravity_gate(1, 0, R_yaw, t, 1.05, None)
        assert hit is not None
        R_cm, t_cm, s_cm, _ = hit
        assert s_cm == 1.0          # VIBA2: scale forced to unit
        phi = np.asarray(lie.so3_log(jnp.asarray(
            store.kf_R[1].T @ (R_cm @ store.kf_R[0]))))
        assert abs(phi[0]) < 1e-6 and abs(phi[1]) < 1e-6  # pure yaw kept


@pytest.mark.slow
def test_temporal_sim3_refinement_confirms_loop():
    """With the reference's 3-consecutive-KF consistency requirement, the
    2nd and 3rd confirmations must come from the temporal Sim3 refinement
    (DetectAndReffineSim3FromLastKF, LoopClosing.cc:378-467,547) — guided
    projection under the propagated Sim3 — NOT from fresh retrieval, and
    the loop must still close."""
    from hfnet_slam_tpu.models.fake import FakeExtractor
    from hfnet_slam_tpu.models.fake import SyntheticWorld as SW
    from hfnet_slam_tpu.slam.local_mapping import MapperConfig
    from hfnet_slam_tpu.slam.loop_closing import LoopCloserConfig
    from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
    from hfnet_slam_tpu.slam.tracking import TrackerConfig

    cam = make_cam()
    rng = np.random.default_rng(11)
    n_lm = 4000
    th = rng.uniform(0, 2 * np.pi, n_lm)
    rr = rng.uniform(12.0, 20.0, n_lm)
    pts = np.stack([rr * np.sin(th), rng.uniform(-4.0, 4.0, n_lm),
                    6.0 - rr * np.cos(th)], 1).astype(np.float32)
    d = rng.standard_normal((n_lm, 64)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    world = SW(pts, d, rng)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3, desc_noise=0.03,
                        max_landmarks_per_frame=480, seed=7, max_depth=25.0)
    cfg = SystemConfig(
        k_max=256, m_max=16384, n_slots=512, desc_dim=64, gdesc_dim=64,
        tracker=TrackerConfig(local_mp_cap=2048, min_init_med_parallax_deg=1.0),
        mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                            tri_neighbors=5),
        loop=LoopCloserConfig(
            min_pair_matches=30, min_sim3_inliers=15, min_proj_matches=30,
            consistency_hits=3,  # the reference's gate — forces the
            n_covis_window=5,    # refinement path for hits 2 and 3
            window_mp_cap=2048, gba_kf_cap=48, gba_mp_cap=4096,
            gba_edge_cap=16384, ransac_hyps=256),
    )
    sys_ = SLAMSystem(cam, ext, cfg)
    gt = circle_trajectory(200)
    est_c, gt_c = [], []
    for i, (R, t) in enumerate(gt):
        st, Re, te = sys_.track_features(ext(R, t), 0.05 * i)
        if Re is not None:
            est_c.append(-Re.T @ te)
            gt_c.append(-R.T @ t)
    lc = sys_.loop_closer
    assert lc.stats["corrected"] >= 1, f"loop stats: {lc.stats}"
    assert lc.stats["refined"] >= 2, (
        f"confirmations 2+3 must come from temporal refinement: {lc.stats}")
    from hfnet_slam_tpu.evaluation import ate

    err = ate.ate_rmse(np.asarray(est_c), np.asarray(gt_c), with_scale=True)
    path = np.linalg.norm(np.diff(np.asarray(gt_c), axis=0), axis=1).sum()
    assert err < 0.05 * path, f"ATE {err:.3f} over {path:.1f} m"


@pytest.mark.slow
def test_tracking_not_blocked_by_correction(monkeypatch):
    """The essential-graph solve runs OFF the map lock: the tracker must
    complete frames while a correction's solve is in flight. Reference
    bar: CorrectLoop pauses only LocalMapping, never Tracking
    (LoopClosing.cc:1115-1133). The pose-graph solve is wrapped with an
    artificial 1 s stall; frames tracked strictly inside the stall window
    prove the lock is not held through it."""
    import time as _time

    from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
    from hfnet_slam_tpu.optim import pose_graph as pg
    from hfnet_slam_tpu.slam.local_mapping import MapperConfig
    from hfnet_slam_tpu.slam.loop_closing import LoopCloserConfig
    from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
    from hfnet_slam_tpu.slam.tracking import TrackerConfig

    solves = []
    real = pg.optimize_pose_graph

    def slow_solve(*a, **kw):
        t0 = _time.perf_counter()
        out = real(*a, **kw)
        import jax as _jax

        _jax.block_until_ready(out[0].R)
        _time.sleep(1.0)  # pretend the solve takes a second
        solves.append((t0, _time.perf_counter()))
        return out

    monkeypatch.setattr(pg, "optimize_pose_graph", slow_solve)

    cam = make_cam()
    rng = np.random.default_rng(11)
    n_lm = 4000
    th = rng.uniform(0, 2 * np.pi, n_lm)
    rr = rng.uniform(12.0, 20.0, n_lm)
    pts = np.stack([rr * np.sin(th), rng.uniform(-4.0, 4.0, n_lm),
                    6.0 - rr * np.cos(th)], 1).astype(np.float32)
    d = rng.standard_normal((n_lm, 64)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    world = SyntheticWorld(pts, d, rng)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3, desc_noise=0.03,
                        max_landmarks_per_frame=480, seed=7, max_depth=25.0)
    cfg = SystemConfig(
        k_max=256, m_max=16384, n_slots=512, desc_dim=64, gdesc_dim=64,
        async_mapping=True,
        tracker=TrackerConfig(local_mp_cap=2048, min_init_med_parallax_deg=1.0),
        mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                            tri_neighbors=5),
        loop=LoopCloserConfig(
            min_pair_matches=30, min_sim3_inliers=15, min_proj_matches=30,
            consistency_hits=1, n_covis_window=5, window_mp_cap=2048,
            gba_kf_cap=48, gba_mp_cap=4096, gba_edge_cap=16384,
            ransac_hyps=256),
    )
    sys_ = SLAMSystem(cam, ext, cfg)
    # a continuous multi-revolution orbit at the same angular rate as the
    # 170-frame/2.25pi circuit: the camera keeps revisiting the start
    n_max = 600
    gt = circle_trajectory(n_max, total_angle=2.25 * np.pi * n_max / 170.0)
    feats_all = [ext(R, t) for R, t in gt]
    frames = []
    # keep the tracker running until a correction's solve has completed —
    # frames fed while the solve is in flight are the overlap evidence.
    # Pace frames at the scenario's native 20 fps like a real camera:
    # feeding flat-out starves the mapping worker (keyframes never accrue,
    # no loop ever detected)
    i = 0
    while i < n_max and not solves:
        f0 = _time.perf_counter()
        sys_.track_features(feats_all[i], 0.05 * i)
        f1 = _time.perf_counter()
        frames.append((f0, f1))
        i += 1
        _time.sleep(max(0.0, 0.05 - (f1 - f0)))
    sys_.finish()
    corrected = sys_.loop_closer.stats["corrected"]
    stats = dict(sys_.loop_closer.stats)
    sys_.shutdown()
    assert solves, f"pose-graph solve never invoked (stats: {stats})"
    assert corrected >= 1, f"no loop correction ran (stats: {stats})"
    inside = sum(1 for s0, s1 in solves
                 for f0, f1 in frames if f0 > s0 and f1 < s1)
    assert inside >= 3, (
        f"tracker stalled through the correction: {inside} frames completed "
        f"inside {len(solves)} solve window(s)")

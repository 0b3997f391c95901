"""Right-camera observations as first-class BA measurements (VERDICT r3
missing #4): the reference keeps fisheye-stereo right-camera keypoints as
observations with "ToBody" edges (src/Matcher.cc:647/787/964/1055,
include/OptimizableTypes.h:110-144). Here they are rig-aware edges in the
one BA engine: cam_sel routes each edge through the left or right camera
(blended extrinsic + intrinsics, optim/factors.reproj_depth_residual_rig).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hfnet_slam_tpu import lie
from hfnet_slam_tpu.geometry import cameras
from hfnet_slam_tpu.optim import ba, factors


CAM_L = cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
CAM_R = cameras.pinhole(455.0, 452.0, 318.0, 242.0, 640, 480)
# right camera 11 cm to the right, slightly toed in (x_r = R_rl x_l + t_rl)
R_RL = np.asarray(lie.so3_exp(jnp.asarray([0.0, -0.03, 0.005])), np.float32)
T_RL = np.array([-0.11, 0.002, 0.001], np.float32)


def _project_right(p_l):
    pc = p_l @ R_RL.T + T_RL
    return np.array(CAM_R.project(jnp.asarray(pc))), pc[:, 2]


class TestRigFactor:
    def test_zero_residual_at_truth(self):
        rng = np.random.default_rng(0)
        p_w = rng.uniform(-2, 2, 3).astype(np.float32) + np.array([0, 0, 6])
        R = np.asarray(lie.so3_exp(jnp.asarray([0.1, -0.05, 0.2])), np.float32)
        t = np.array([0.3, -0.1, 0.2], np.float32)
        pc_l = R @ p_w + t
        uv_r, _ = _project_right(pc_l[None])
        r, Jp, Jx, depth = factors.reproj_depth_residual_rig(
            CAM_L.kind, CAM_L.params, CAM_R.params,
            jnp.asarray(R_RL), jnp.asarray(T_RL), jnp.asarray(1.0),
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(p_w),
            jnp.asarray(uv_r[0]), jnp.asarray(0.0), jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(r)[:2], 0.0, atol=1e-3)
        assert float(depth) > 0
        # sel = 0 must reduce to the plain left residual
        uv_l = np.array(CAM_L.project(jnp.asarray(pc_l)))
        r0, *_ = factors.reproj_depth_residual_rig(
            CAM_L.kind, CAM_L.params, CAM_R.params,
            jnp.asarray(R_RL), jnp.asarray(T_RL), jnp.asarray(0.0),
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(p_w),
            jnp.asarray(uv_l), jnp.asarray(0.0), jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(r0)[:2], 0.0, atol=1e-3)

    def test_jacobian_matches_fd(self):
        """Analytic pose/point Jacobians of the RIGHT edge vs finite
        differences (the ToBody chain rule is where sign errors live)."""
        rng = np.random.default_rng(1)
        p_w = np.array([0.4, -0.3, 5.0], np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray([0.05, 0.1, -0.02])), np.float32)
        t = np.array([0.1, 0.05, -0.1], np.float32)
        uv = np.array([300.0, 200.0], np.float32)

        def res(xi, dp):
            dR, dt = lie.se3_retract(jnp.asarray(R), jnp.asarray(t),
                                     jnp.asarray(xi))
            r, _, _, _ = factors.reproj_depth_residual_rig(
                CAM_L.kind, CAM_L.params, CAM_R.params,
                jnp.asarray(R_RL), jnp.asarray(T_RL), jnp.asarray(1.0),
                dR, dt, jnp.asarray(p_w + dp), jnp.asarray(uv),
                jnp.asarray(0.0), jnp.asarray(0.0))
            return np.asarray(r)

        _, Jp, Jx, _ = factors.reproj_depth_residual_rig(
            CAM_L.kind, CAM_L.params, CAM_R.params,
            jnp.asarray(R_RL), jnp.asarray(T_RL), jnp.asarray(1.0),
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(p_w),
            jnp.asarray(uv), jnp.asarray(0.0), jnp.asarray(0.0))
        eps = 1e-4
        for k in range(6):
            xi = np.zeros(6, np.float32)
            xi[k] = eps
            fd = (res(xi, np.zeros(3)) - res(-xi, np.zeros(3))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(Jp)[:, k], fd,
                                       rtol=2e-2, atol=2e-2)
        for k in range(3):
            dp = np.zeros(3, np.float32)
            dp[k] = eps
            fd = (res(np.zeros(6), dp) - res(np.zeros(6), -dp)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(Jx)[:, k], fd,
                                       rtol=2e-2, atol=2e-2)


class TestRigBA:
    def _problem(self, right_only_frac=0.3, seed=0):
        """Two keyframes observing a cloud; a fraction of points observed
        ONLY by the right cameras — they are constrained solely through
        the ToBody edges."""
        rng = np.random.default_rng(seed)
        M = 120
        pts = rng.uniform(-3, 3, (M, 3)).astype(np.float32) + np.array(
            [0, 0, 8.0], np.float32)
        K = 2
        R_gt = np.stack([
            np.eye(3, dtype=np.float32),
            np.asarray(lie.so3_exp(jnp.asarray([0.02, 0.25, -0.01])),
                       np.float32)])
        t_gt = np.stack([np.zeros(3, np.float32),
                         np.array([-1.2, 0.05, 0.1], np.float32)])
        n_right_only = int(M * right_only_frac)
        is_right_only = np.zeros(M, bool)
        is_right_only[:n_right_only] = True

        kf_idx, pt_idx, uv, sel = [], [], [], []
        for k in range(K):
            pc_l = pts @ R_gt[k].T + t_gt[k]
            uv_l = np.array(CAM_L.project(jnp.asarray(pc_l)))
            uv_r, z_r = _project_right(pc_l)
            for m in range(M):
                if not is_right_only[m]:
                    kf_idx.append(k); pt_idx.append(m)
                    uv.append(uv_l[m]); sel.append(0.0)
                kf_idx.append(k); pt_idx.append(m)
                uv.append(uv_r[m]); sel.append(1.0)
        E = len(kf_idx)
        # perturb
        xi = rng.normal(0, 0.01, (K, 6)).astype(np.float32)
        xi[0] = 0
        R0 = np.stack([np.asarray(
            lie.se3_retract(jnp.asarray(R_gt[k]), jnp.asarray(t_gt[k]),
                            jnp.asarray(xi[k]))[0]) for k in range(K)])
        t0 = np.stack([np.asarray(
            lie.se3_retract(jnp.asarray(R_gt[k]), jnp.asarray(t_gt[k]),
                            jnp.asarray(xi[k]))[1]) for k in range(K)])
        pts0 = pts + rng.normal(0, 0.05, (M, 3)).astype(np.float32)

        prob = ba.BAProblem(
            poses_R=jnp.asarray(R0), poses_t=jnp.asarray(t0),
            fixed=jnp.asarray(np.array([True, False])),
            points=jnp.asarray(pts0),
            kf_idx=jnp.asarray(np.asarray(kf_idx, np.int32)),
            pt_idx=jnp.asarray(np.asarray(pt_idx, np.int32)),
            uv=jnp.asarray(np.asarray(uv, np.float32)),
            inv_sigma2=jnp.ones(E), valid=jnp.ones(E, bool),
            z_meas=jnp.zeros(E), wz=jnp.zeros(E),
            cam_sel=jnp.asarray(np.asarray(sel, np.float32)),
            rig_R=jnp.asarray(R_RL), rig_t=jnp.asarray(T_RL),
            params_r=CAM_R.params,
        )
        return prob, R_gt, t_gt, pts, is_right_only

    def test_right_edges_constrain_ba(self):
        prob, R_gt, t_gt, pts_gt, right_only = self._problem()
        out = ba.bundle_adjust(CAM_L.kind, CAM_L.params, prob,
                               rounds=((5, True), (15, False)))
        dR = np.asarray(out.poses_R[1]) @ R_gt[1].T
        ang = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR))))
        dt = np.linalg.norm(np.asarray(out.poses_t[1]) - t_gt[1])
        assert ang < 2e-3 and dt < 5e-3, (ang, dt)
        # right-ONLY landmarks converge too: they are real measurements,
        # not a depth side-channel
        err = np.linalg.norm(np.asarray(out.points) - pts_gt, axis=1)
        assert err[right_only].max() < 2e-2, err[right_only].max()
        assert bool(np.asarray(out.valid).all())

    def test_without_right_edges_right_only_points_drift(self):
        """Control: invalidating the right edges leaves right-only points
        unconstrained — proving the constraint really flows through the
        ToBody chain."""
        prob, R_gt, t_gt, pts_gt, right_only = self._problem()
        valid = np.asarray(prob.valid).copy()
        valid[np.asarray(prob.cam_sel) > 0.5] = False
        prob = prob._replace(valid=jnp.asarray(valid))
        out = ba.bundle_adjust(CAM_L.kind, CAM_L.params, prob,
                               rounds=((5, True), (15, False)))
        err = np.linalg.norm(np.asarray(out.points) - pts_gt, axis=1)
        # the initial perturbation (sigma 0.05) persists for blind points
        assert err[right_only].max() > 2e-2


class TestRigSystemE2E:
    def test_right_bank_created_and_consumed(self):
        """Fisheye-stereo system path: right-camera matches become stored
        right-bank observations at keyframes and ride local BA as ToBody
        edges (no crash, observations persist through outlier gates,
        tracking stays metric)."""
        from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
        from hfnet_slam_tpu.slam.local_mapping import MapperConfig
        from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
        from hfnet_slam_tpu.slam.tracking import OK, TrackerConfig
        from hfnet_slam_tpu.geometry import cameras as C

        cam_l = C.kb8(190.0, 190.0, 256.0, 256.0,
                      0.0035, 0.0007, -0.0037, 0.0007, 512, 512)
        cam_r = C.kb8(190.5, 190.2, 255.0, 257.0,
                      0.0034, 0.0008, -0.0038, 0.0006, 512, 512)
        R_lr = np.asarray(lie.so3_exp(jnp.asarray([0.01, -0.02, 0.005])),
                          np.float32)
        t_lr = np.array([0.11, 0.002, -0.001], np.float32)
        world = SyntheticWorld.cloud(seed=3, n_landmarks=900, extent=8.0,
                                     center=(0, 0, 4.0), desc_dim=32)
        ext_l = FakeExtractor(world, cam_l, pad_to=256, noise_px=0.2,
                              desc_noise=0.02, max_landmarks_per_frame=220,
                              seed=7, max_depth=5.0)
        ext_r = FakeExtractor(world, cam_r, pad_to=256, noise_px=0.2,
                              desc_noise=0.02, max_landmarks_per_frame=220,
                              seed=8, max_depth=5.0)
        cfg = SystemConfig(
            k_max=32, m_max=4096, n_slots=256, desc_dim=32, gdesc_dim=64,
            loop_closing=False, baseline=float(np.linalg.norm(t_lr)),
            cam_right=cam_r, T_lr=(R_lr, t_lr),
            tracker=TrackerConfig(local_mp_cap=512,
                                  min_stereo_init_points=50, th_depth=6.0),
            mapper=MapperConfig(ba_kf_cap=8, ba_mp_cap=1024,
                                ba_edge_cap=4096, tri_neighbors=3),
        )

        class StereoExt:
            """extractor protocol for track_stereo: __call__(image) where
            'image' is the GT pose pair, alternating left/right calls."""

            def __init__(self):
                self.calls = 0

            def __call__(self, pose):
                self.calls += 1
                return (ext_l if self.calls % 2 == 1 else ext_r)(pose)

        sys_ = SLAMSystem(cam_l, StereoExt(), cfg)
        assert sys_.store.has_right
        assert sys_.cfg.mapper.rig is not None
        R_rl, t_rl = R_lr.T, (-R_lr.T @ t_lr).astype(np.float32)
        est_c, gt_c, states = [], [], []
        for i in range(14):
            c = np.array([0.10 * i, 0.02 * i, 0.0])
            R_cw = np.eye(3, dtype=np.float32)
            t_cw = (-c).astype(np.float32)
            R_r = (R_rl @ R_cw).astype(np.float32)
            t_r = (R_rl @ t_cw + t_rl).astype(np.float32)
            st, Re, te = sys_.track_stereo((R_cw, t_cw), (R_r, t_r), 0.1 * i)
            states.append(st)
            if Re is not None:
                est_c.append(-Re.T @ te)
                gt_c.append(c)
        sys_.finish()
        store = sys_.store
        n_right = int((store.kf_obs_r >= 0).sum()) if store.has_right else 0
        n_kf = int(store.kf_valid.sum())
        sys_.shutdown()
        assert states[-1] == OK
        assert n_kf >= 2
        assert n_right > 50, f"right-bank observations: {n_right}"
        # metric accuracy preserved with ToBody edges in the solves
        err = np.linalg.norm(np.asarray(est_c) - np.asarray(gt_c), axis=1)
        assert err.max() < 0.05, err.max()

"""Stereo matching kernel and depth-seeded (stereo/RGB-D) SLAM frontend.

Covers the reference's stereo data path (Frame::ComputeStereoMatches /
ComputeStereoFromRGBD, Tracking::StereoInitialization, close-point
creation in CreateNewKeyFrame) with synthetic rectified features.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from hfnet_slam_tpu.geometry import cameras
from hfnet_slam_tpu.ops import stereo as S


def make_cam():
    return cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)


class TestMatchStereo:
    def _rig(self, N=128, baseline=0.1, seed=0):
        """Synthetic rectified stereo: right features are left features
        shifted by disparity = fx*b/z."""
        rng = np.random.default_rng(seed)
        cam = make_cam()
        z = rng.uniform(1.0, 20.0, N).astype(np.float32)
        uL = rng.uniform(80, 600, N).astype(np.float32)
        v = rng.uniform(20, 460, N).astype(np.float32)
        disp = cam.fx * baseline / z
        uR = uL - disp
        d = rng.standard_normal((N, 32)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        xyL = np.stack([uL, v], 1)
        xyR = np.stack([uR, v + rng.normal(0, 0.2, N)], 1).astype(np.float32)
        octv = np.zeros(N, np.int32)
        mask = np.ones(N, bool)
        return cam, baseline, xyL, xyR, d, octv, mask, z

    def test_depth_recovered(self):
        cam, b, xyL, xyR, d, octv, mask, z = self._rig()
        depth, uR = S.match_stereo(
            jnp.asarray(xyL), jnp.asarray(d), jnp.asarray(octv), jnp.asarray(mask),
            jnp.asarray(xyR), jnp.asarray(d), jnp.asarray(octv), jnp.asarray(mask),
            fx=float(cam.fx), baseline=b,
        )
        depth = np.asarray(depth)
        matched = depth > 0
        assert matched.mean() > 0.9
        rel = np.abs(depth[matched] - z[matched]) / z[matched]
        assert np.median(rel) < 0.05

    def test_row_gate(self):
        cam, b, xyL, xyR, d, octv, mask, z = self._rig()
        xyR_bad = xyR.copy()
        xyR_bad[:, 1] += 30.0  # break rectification
        depth, _ = S.match_stereo(
            jnp.asarray(xyL), jnp.asarray(d), jnp.asarray(octv), jnp.asarray(mask),
            jnp.asarray(xyR_bad), jnp.asarray(d), jnp.asarray(octv), jnp.asarray(mask),
            fx=float(cam.fx), baseline=b,
        )
        assert (np.asarray(depth) > 0).sum() == 0

    def test_negative_disparity_rejected(self):
        cam, b, xyL, xyR, d, octv, mask, z = self._rig()
        xyR_bad = xyL.copy()
        xyR_bad[:, 0] += 5.0  # right of the left feature: impossible
        depth, _ = S.match_stereo(
            jnp.asarray(xyL), jnp.asarray(d), jnp.asarray(octv), jnp.asarray(mask),
            jnp.asarray(xyR_bad), jnp.asarray(d), jnp.asarray(octv), jnp.asarray(mask),
            fx=float(cam.fx), baseline=b,
        )
        assert (np.asarray(depth) > 0).sum() == 0


class TestDepthAtKeypoints:
    def test_lookup(self):
        depth_im = np.zeros((48, 64), np.float32)
        depth_im[10, 20] = 2.5
        depth_im[30, 40] = 7.0
        xy = jnp.asarray([[20.2, 9.8], [40.0, 30.0], [5.0, 5.0]])
        d = np.asarray(S.depth_at_keypoints(jnp.asarray(depth_im), xy, 1.0))
        np.testing.assert_allclose(d, [2.5, 7.0, 0.0])

    def test_depth_factor(self):
        depth_im = np.full((8, 8), 5000.0, np.float32)
        xy = jnp.asarray([[4.0, 4.0]])
        d = np.asarray(S.depth_at_keypoints(jnp.asarray(depth_im), xy, 1.0 / 5000.0))
        np.testing.assert_allclose(d, [1.0])


class TestDepthFrontendE2E:
    """RGB-D-style tracking: FakeExtractor features + ground-truth depth.
    Depth pins scale, so ATE is checked WITHOUT scale correction — the
    metric the reference's stereo/RGB-D modes are scored on."""

    def test_rgbd_browse_metric_scale(self):
        from hfnet_slam_tpu.evaluation import ate
        from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
        from hfnet_slam_tpu.slam.local_mapping import MapperConfig
        from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
        from hfnet_slam_tpu.slam.tracking import OK, TrackerConfig
        from tests.test_slam import browse_trajectory

        cam = make_cam()
        world = SyntheticWorld.cloud(seed=5, n_landmarks=1400, extent=16.0,
                                     center=(0, 0, 10.0), desc_dim=64)
        ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                            desc_noise=0.03, max_landmarks_per_frame=480, seed=7)
        cfg = SystemConfig(
            k_max=128, m_max=8192, n_slots=512, desc_dim=64, gdesc_dim=64,
            loop_closing=False,
            tracker=TrackerConfig(local_mp_cap=2048, th_depth=25.0,
                                  min_stereo_init_points=50),
            mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                                tri_neighbors=5),
        )
        sys_ = SLAMSystem(cam, ext, cfg)
        gt = browse_trajectory(60)
        est_c, gt_c = [], []
        for i, (R, t) in enumerate(gt):
            feats = ext(R, t)
            # ground-truth depth of the observed landmarks (z in camera)
            ids = ext.last_ids
            pc = world.landmarks[ids] @ R.T + t
            depth = np.zeros(512, np.float32)
            depth[: len(ids)] = pc[:, 2] * (1 + np.random.default_rng(i).normal(0, 0.005, len(ids)))
            st, Re, te = sys_.track_features(feats, 0.05 * i, depth=depth)
            if Re is not None:
                est_c.append(-Re.T @ te)
                gt_c.append(-R.T @ t)
        assert sys_.tracker.state == OK
        assert len(est_c) >= len(gt) - 2  # depth init needs no parallax wait
        est_c, gt_c = np.asarray(est_c), np.asarray(gt_c)
        err = ate.ate_rmse(est_c, gt_c, with_scale=False)  # metric!
        assert err < 0.25, f"metric ATE {err:.3f} m"
        # scale is right: with_scale shouldn't improve much
        err_s = ate.ate_rmse(est_c, gt_c, with_scale=True)
        assert err < err_s * 1.5 + 0.05


class TestFisheyeStereo:
    """Non-overlapping / unrectified stereo (KB8 TriangulateMatches,
    /root/reference/src/CameraModels/KannalaBrandt8.cpp:306-376 +
    Frame::ComputeStereoFishEyeMatches, Frame.cc:1138-1175)."""

    def _kb8_rig(self, N=128, seed=0):
        rng = np.random.default_rng(seed)
        # TUM-VI-like fisheye intrinsics
        cam_l = cameras.kb8(190.0, 190.0, 256.0, 256.0,
                            0.0035, 0.0007, -0.0037, 0.0007, 512, 512)
        cam_r = cameras.kb8(190.5, 190.2, 255.0, 257.0,
                            0.0034, 0.0008, -0.0038, 0.0006, 512, 512)
        # right camera 11 cm to the left cam's +x, slightly rotated
        from hfnet_slam_tpu import lie

        R_lr = np.asarray(lie.so3_exp(jnp.asarray([0.01, -0.02, 0.005])),
                          np.float32)
        t_lr = np.array([0.11, 0.002, -0.001], np.float32)
        # world points in front of the LEFT camera
        # depths inside the parallax-gate range: cos(parallax) < 0.9998
        # caps usable stereo depth at ~5.5 m for an 0.11 m baseline (far
        # points are mono territory, same as the reference's gate)
        pts = np.stack([rng.uniform(-1.8, 1.8, N), rng.uniform(-1.8, 1.8, N),
                        rng.uniform(1.2, 4.5, N)], 1).astype(np.float32)
        uv_l = np.asarray(cameras.project(cam_l.kind, cam_l.params,
                                          jnp.asarray(pts)))
        R_rl, t_rl = R_lr.T, -R_lr.T @ t_lr
        p_r = pts @ R_rl.T + t_rl
        uv_r = np.asarray(cameras.project(cam_r.kind, cam_r.params,
                                          jnp.asarray(p_r)))
        d = rng.standard_normal((N, 32)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        mask = np.ones(N, bool)
        oct_ = np.zeros(N, np.int32)
        return (cam_l, cam_r, R_lr, t_lr, pts,
                uv_l.astype(np.float32), uv_r.astype(np.float32),
                d, mask, oct_)

    def test_depth_recovered_through_fisheye_models(self):
        (cam_l, cam_r, R_lr, t_lr, pts, uv_l, uv_r, d, mask,
         oct_) = self._kb8_rig()
        depth, idx, p3d = S.match_stereo_fisheye(
            cam_l.kind, cam_l.params, cam_r.kind, cam_r.params,
            jnp.asarray(uv_l), jnp.asarray(d), jnp.asarray(oct_),
            jnp.asarray(mask),
            jnp.asarray(uv_r), jnp.asarray(d), jnp.asarray(oct_),
            jnp.asarray(mask),
            jnp.asarray(R_lr), jnp.asarray(t_lr),
        )
        depth = np.asarray(depth)
        ok = depth > 0
        assert ok.sum() > 0.8 * len(pts), f"only {ok.sum()} matched"
        err = np.abs(depth[ok] - pts[ok, 2]) / pts[ok, 2]
        assert np.median(err) < 0.02, f"median depth err {np.median(err):.3f}"
        # triangulated points land on the ground truth
        p_err = np.linalg.norm(np.asarray(p3d)[ok] - pts[ok], axis=1)
        assert np.median(p_err) < 0.1

    def test_wrong_matches_rejected(self):
        (cam_l, cam_r, R_lr, t_lr, pts, uv_l, uv_r, d, mask,
         oct_) = self._kb8_rig()
        # shuffle right descriptors: descriptor matches become geometric
        # nonsense; the triangulation gates must reject them
        perm = np.random.default_rng(1).permutation(len(d))
        depth, idx, _ = S.match_stereo_fisheye(
            cam_l.kind, cam_l.params, cam_r.kind, cam_r.params,
            jnp.asarray(uv_l), jnp.asarray(d), jnp.asarray(oct_),
            jnp.asarray(mask),
            jnp.asarray(uv_r[perm]), jnp.asarray(d), jnp.asarray(oct_),
            jnp.asarray(mask),
            jnp.asarray(R_lr), jnp.asarray(t_lr),
        )
        assert (np.asarray(depth) > 0).sum() < 0.1 * len(pts)

    def test_system_stereo_init_metric(self):
        """End to end: KB8 stereo depth makes the very first frame a
        metric-scale map (StereoInitialization path), fed through
        SLAMSystem.track_features."""
        from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
        from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
        from hfnet_slam_tpu.slam.tracking import OK, TrackerConfig
        from hfnet_slam_tpu.slam.local_mapping import MapperConfig
        from hfnet_slam_tpu import lie

        cam_l = cameras.kb8(190.0, 190.0, 256.0, 256.0,
                            0.0035, 0.0007, -0.0037, 0.0007, 512, 512)
        cam_r = cameras.kb8(190.0, 190.0, 256.0, 256.0,
                            0.0035, 0.0007, -0.0037, 0.0007, 512, 512)
        R_lr = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.0])),
                          np.float32)
        t_lr = np.array([0.11, 0.0, 0.0], np.float32)
        world = SyntheticWorld.cloud(seed=3, n_landmarks=900, extent=8.0,
                                     center=(0, 0, 6.0), desc_dim=32)
        ext_l = FakeExtractor(world, cam_l, pad_to=256, noise_px=0.2,
                              desc_noise=0.02, max_landmarks_per_frame=220,
                              seed=7)
        ext_r = FakeExtractor(world, cam_r, pad_to=256, noise_px=0.2,
                              desc_noise=0.02, max_landmarks_per_frame=220,
                              seed=8)
        cfg = SystemConfig(
            k_max=32, m_max=4096, n_slots=256, desc_dim=32, gdesc_dim=64,
            loop_closing=False, baseline=float(np.linalg.norm(t_lr)),
            cam_right=cam_r, T_lr=(R_lr, t_lr),
            tracker=TrackerConfig(local_mp_cap=512, min_stereo_init_points=50,
                                  th_depth=20.0),
            mapper=MapperConfig(ba_kf_cap=8, ba_mp_cap=1024, ba_edge_cap=4096,
                                tri_neighbors=3),
        )
        sys_ = SLAMSystem(cam_l, ext_l, cfg)
        R_rl, t_rl = R_lr.T, (-R_lr.T @ t_lr).astype(np.float32)
        from hfnet_slam_tpu.ops import stereo as S

        est_c, gt_c = [], []
        for i in range(12):
            c = np.array([0.12 * i, 0.02 * i, 0.0])
            R_cw = np.eye(3, dtype=np.float32)
            t_cw = (-c).astype(np.float32)
            fl = ext_l(R_cw, t_cw)
            # right-camera pose: T_rw = T_rl o T_lw
            R_r = (R_rl @ R_cw).astype(np.float32)
            t_r = (R_rl @ t_cw + t_rl).astype(np.float32)
            fr = ext_r(R_r, t_r)
            depth, _, _ = S.match_stereo_fisheye(
                cam_l.kind, cam_l.params, cam_r.kind, cam_r.params,
                fl.xy, fl.desc, fl.octave, fl.mask,
                fr.xy, fr.desc, fr.octave, fr.mask,
                jnp.asarray(R_lr), jnp.asarray(t_lr))
            st, Re, te = sys_.track_features(fl, 0.1 * i,
                                             depth=np.asarray(depth))
            if Re is not None:
                est_c.append(-Re.T @ te)
                gt_c.append(c)
        assert sys_.tracker.state == OK
        est_c, gt_c = np.asarray(est_c), np.asarray(gt_c)
        # METRIC scale: no scale alignment allowed
        from hfnet_slam_tpu.evaluation import ate

        err = ate.ate_rmse(est_c, gt_c, with_scale=False)
        assert err < 0.08, f"metric stereo ATE {err:.3f}"

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

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfnet_slam_tpu import lie
from hfnet_slam_tpu.geometry import cameras
from hfnet_slam_tpu.optim import pose_opt, ba

CAM = cameras.pinhole(458.0, 457.0, 367.0, 248.0, 752, 480)
FX = 458.0


def make_world(key, m=300):
    return jax.random.uniform(key, (m, 3), minval=-4, maxval=4) + jnp.array([0, 0, 8.0])


class TestPoseOptimize:
    def _setup(self, key, n=300, noise_px=0.5, outlier_frac=0.0):
        k1, k2, k3 = jax.random.split(key, 3)
        pts = make_world(k1, n)
        R_gt = lie.so3_exp(jnp.array([0.04, -0.1, 0.06]))
        t_gt = jnp.array([0.3, -0.2, 0.5])
        uv = CAM.project(pts @ R_gt.T + t_gt)
        uv = uv + jax.random.normal(k2, uv.shape) * noise_px
        n_out = int(n * outlier_frac)
        if n_out:
            uv = uv.at[:n_out].add(
                jax.random.uniform(k3, (n_out, 2), minval=30, maxval=120)
            )
        return pts, uv, R_gt, t_gt, n_out

    def test_converges_from_perturbed_init(self):
        pts, uv, R_gt, t_gt, _ = self._setup(jax.random.PRNGKey(0))
        dR, dt = lie.se3_exp(jnp.array([0.05, -0.05, 0.1, 0.02, 0.03, -0.02]))
        R0, t0 = lie.se3_mul(dR, dt, R_gt, t_gt)
        res = pose_opt.pose_optimize(
            CAM.kind, CAM.params, R0, t0, pts, uv,
            jnp.ones(pts.shape[0]), jnp.ones(pts.shape[0], bool),
        )
        err = jnp.linalg.norm(lie.se3_log(*lie.se3_mul(*lie.se3_inverse(R_gt, t_gt), res["R"], res["t"])))
        assert float(err) < 5e-3, float(err)
        assert int(res["n_inliers"]) > 290

    def test_exact_convergence_noise_free(self):
        pts, uv, R_gt, t_gt, _ = self._setup(jax.random.PRNGKey(7), noise_px=0.0)
        dR, dt = lie.se3_exp(jnp.array([0.1, -0.08, 0.12, 0.03, 0.02, -0.04]))
        R0, t0 = lie.se3_mul(dR, dt, R_gt, t_gt)
        res = pose_opt.pose_optimize(
            CAM.kind, CAM.params, R0, t0, pts, uv,
            jnp.ones(pts.shape[0]), jnp.ones(pts.shape[0], bool),
        )
        err = jnp.linalg.norm(lie.se3_log(*lie.se3_mul(*lie.se3_inverse(R_gt, t_gt), res["R"], res["t"])))
        assert float(err) < 1e-4, float(err)

    def test_rejects_outliers(self):
        pts, uv, R_gt, t_gt, n_out = self._setup(jax.random.PRNGKey(1), outlier_frac=0.25)
        dR, dt = lie.se3_exp(0.05 * jnp.ones(6))
        R0, t0 = lie.se3_mul(dR, dt, R_gt, t_gt)
        res = pose_opt.pose_optimize(
            CAM.kind, CAM.params, R0, t0, pts, uv,
            jnp.ones(pts.shape[0]), jnp.ones(pts.shape[0], bool),
        )
        err = jnp.linalg.norm(lie.se3_log(*lie.se3_mul(*lie.se3_inverse(R_gt, t_gt), res["R"], res["t"])))
        assert float(err) < 5e-3, float(err)
        inl = np.array(res["inlier"])
        assert inl[:n_out].sum() < 0.1 * n_out  # outliers rejected
        assert inl[n_out:].mean() > 0.95

    def test_respects_mask(self):
        pts, uv, R_gt, t_gt, _ = self._setup(jax.random.PRNGKey(2))
        valid = jnp.arange(pts.shape[0]) < 150
        res = pose_opt.pose_optimize(
            CAM.kind, CAM.params, R_gt, t_gt, pts, uv, jnp.ones(pts.shape[0]), valid
        )
        assert not bool(res["inlier"][150:].any())


class TestBundleAdjust:
    def _make_problem(self, key, K=6, M=250, noise_px=0.5, perturb=True):
        kp, kn, kq = jax.random.split(key, 3)
        pts_gt = make_world(kp, M)
        # trajectory: cameras looking at the cloud from a line
        poses_R, poses_t = [], []
        for i in range(K):
            xi = jnp.array([0.4 * i, 0.02 * i, 0.0, 0.0, 0.03 * i, 0.0])
            R, t = lie.se3_exp(xi)
            poses_R.append(R)
            poses_t.append(t)
        poses_R = jnp.stack(poses_R)
        poses_t = jnp.stack(poses_t)

        # every camera observes every point (all visible for this geometry)
        kf_idx = jnp.repeat(jnp.arange(K), M).astype(jnp.int32)
        pt_idx = jnp.tile(jnp.arange(M), K).astype(jnp.int32)
        pc = jnp.einsum("kij,mj->kmi", poses_R, pts_gt) + poses_t[:, None, :]
        uv = CAM.project(pc.reshape(-1, 3))
        uv = uv + jax.random.normal(kn, uv.shape) * noise_px
        valid = jnp.ones(K * M, dtype=bool)

        R0, t0, p0 = poses_R, poses_t, pts_gt
        if perturb:
            xi_noise = jax.random.normal(kq, (K, 6)) * 0.01
            xi_noise = xi_noise.at[:2].set(0.0)  # keep fixed poses exact
            R0, t0 = jax.vmap(lie.se3_retract)(poses_R, poses_t, xi_noise)
            p0 = pts_gt + jax.random.normal(kq, (M, 3)) * 0.05

        prob = ba.BAProblem(
            poses_R=R0,
            poses_t=t0,
            fixed=jnp.arange(K) < 2,  # fix two -> pins gauge incl. scale
            points=p0,
            kf_idx=kf_idx,
            pt_idx=pt_idx,
            uv=uv,
            inv_sigma2=jnp.ones(K * M),
            valid=valid,
        )
        return prob, poses_R, poses_t, pts_gt

    def _pose_err(self, prob, R_gt, t_gt):
        errs = jax.vmap(
            lambda R, t, Rg, tg: jnp.linalg.norm(
                lie.se3_log(*lie.se3_mul(*lie.se3_inverse(Rg, tg), R, t))
            )
        )(prob.poses_R, prob.poses_t, R_gt, t_gt)
        return float(errs.max())

    def test_converges(self):
        prob, R_gt, t_gt, pts_gt = self._make_problem(jax.random.PRNGKey(3))
        err0 = self._pose_err(prob, R_gt, t_gt)
        out = ba.bundle_adjust(CAM.kind, CAM.params, prob)
        err1 = self._pose_err(out, R_gt, t_gt)
        assert err1 < err0 * 0.2, (err0, err1)
        assert err1 < 6e-3  # statistical floor for 0.5 px noise
        # points also recover
        pt_err = float(jnp.median(jnp.linalg.norm(out.points - pts_gt, axis=-1)))
        assert pt_err < 0.03
        # fixed poses untouched
        np.testing.assert_array_equal(out.poses_R[:2], prob.poses_R[:2])

    def test_exact_convergence_noise_free(self):
        prob, R_gt, t_gt, pts_gt = self._make_problem(jax.random.PRNGKey(5), noise_px=0.0)
        out = ba.bundle_adjust(CAM.kind, CAM.params, prob)
        assert self._pose_err(out, R_gt, t_gt) < 1e-5
        assert float(jnp.abs(out.points - pts_gt).max()) < 1e-3

    def test_outlier_edges_removed(self):
        prob, R_gt, t_gt, pts_gt = self._make_problem(jax.random.PRNGKey(4))
        uv_bad = prob.uv.at[:100].add(80.0)
        prob = prob._replace(uv=uv_bad)
        out = ba.bundle_adjust(CAM.kind, CAM.params, prob)
        valid = np.array(out.valid)
        assert valid[:100].sum() < 10
        assert valid[100:].mean() > 0.95
        # this seed's clean-problem ML optimum sits at ~0.015 from GT
        # (verified by optimizing the outlier-free problem from ground truth)
        assert self._pose_err(out, R_gt, t_gt) < 0.02

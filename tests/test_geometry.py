import jax
import jax.numpy as jnp
import numpy as np

from hfnet_slam_tpu import lie
from hfnet_slam_tpu.geometry import cameras, triangulation, twoview


class TestPinhole:
    cam = cameras.pinhole(458.0, 457.0, 367.0, 248.0, 752, 480)

    def test_project_unproject(self):
        uv = jnp.array([[100.0, 200.0], [367.0, 248.0], [700.0, 50.0]])
        xn = self.cam.unproject(uv)
        np.testing.assert_allclose(xn[..., 2], 1.0)
        uv2 = self.cam.project(xn)
        np.testing.assert_allclose(uv, uv2, atol=1e-3)

    def test_jacobian_matches_autodiff(self):
        pc = jnp.array([0.3, -0.2, 2.0])
        J = self.cam.project_jac(pc)
        J_ad = jax.jacobian(lambda p: self.cam.project(p))(pc)
        np.testing.assert_allclose(J, J_ad, atol=1e-4)

    def test_batched(self):
        pts = jax.random.normal(jax.random.PRNGKey(0), (32, 3)) + jnp.array([0, 0, 5.0])
        uv = self.cam.project(pts)
        assert uv.shape == (32, 2)


class TestKB8:
    # TUM-VI-like fisheye
    cam = cameras.kb8(190.98, 190.97, 254.93, 256.90,
                      0.00348, 0.000715, -0.00205, 0.000419, 512, 512)

    def test_project_unproject_roundtrip(self):
        key = jax.random.PRNGKey(1)
        pts = jax.random.normal(key, (64, 3))
        pts = pts.at[:, 2].set(jnp.abs(pts[:, 2]) + 0.5)
        uv = self.cam.project(pts)
        xn = self.cam.unproject(uv)
        # bearing should be parallel to the original point
        p_dir = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        x_dir = xn / jnp.linalg.norm(xn, axis=-1, keepdims=True)
        np.testing.assert_allclose(p_dir, x_dir, atol=1e-3)

    def test_jacobian_matches_autodiff(self):
        pc = jnp.array([0.4, -0.3, 1.5])
        J = self.cam.project_jac(pc)
        J_ad = jax.jacobian(lambda p: self.cam.project(p))(pc)
        np.testing.assert_allclose(J, J_ad, rtol=1e-3, atol=1e-3)


class TestTriangulation:
    def test_exact(self):
        key = jax.random.PRNGKey(2)
        p1 = jax.random.uniform(key, (128, 3), minval=-2, maxval=2) + jnp.array([0, 0, 6.0])
        R21 = lie.so3_exp(jnp.array([0.02, -0.1, 0.03]))
        t21 = jnp.array([0.8, 0.05, 0.02])
        p2 = p1 @ R21.T + t21
        x1 = p1[:, :2] / p1[:, 2:]
        x2 = p2[:, :2] / p2[:, 2:]
        p1_hat = triangulation.triangulate_dlt(x1, x2, R21, t21)
        np.testing.assert_allclose(p1_hat, p1, atol=1e-2)
        good, cosp = triangulation.cheirality_and_error(p1_hat, x1, x2, R21, t21, th2=1e-4)
        assert bool(jnp.all(good))


class TestTwoView:
    def _make_scene(self, key, n=300, planar=False, noise_px=0.5, f=458.0):
        k1, k2, k3 = jax.random.split(key, 3)
        if planar:
            xy = jax.random.uniform(k1, (n, 2), minval=-3, maxval=3)
            p1 = jnp.concatenate([xy, jnp.full((n, 1), 6.0)], axis=1)
        else:
            p1 = jax.random.uniform(k1, (n, 3), minval=-3, maxval=3) + jnp.array([0, 0, 7.0])
        R21 = lie.so3_exp(jnp.array([0.03, -0.15, 0.02]))
        t21 = jnp.array([1.0, 0.1, 0.05])
        p2 = p1 @ R21.T + t21
        x1 = p1[:, :2] / p1[:, 2:]
        x2 = p2[:, :2] / p2[:, 2:]
        noise = noise_px / f
        x1 = x1 + jax.random.normal(k2, x1.shape) * noise
        x2 = x2 + jax.random.normal(k3, x2.shape) * noise
        self._gt_p1 = p1
        return x1, x2, R21, t21

    def _check(self, res, R21, t21):
        assert bool(res["ok"]), f"reconstruction failed: n_good={res['n_good']}"
        R_err = lie.so3_log(res["R21"] @ R21.T)
        assert float(jnp.linalg.norm(R_err)) < 0.02, R_err
        t_dir = res["t21"] / jnp.linalg.norm(res["t21"])
        t_gt = t21 / jnp.linalg.norm(t21)
        assert float(jnp.abs(jnp.dot(t_dir, t_gt))) > 0.999

    def test_general_scene(self):
        x1, x2, R21, t21 = self._make_scene(jax.random.PRNGKey(3))
        mask = jnp.ones(x1.shape[0], dtype=bool)
        res = twoview.reconstruct_two_views(x1, x2, mask, jax.random.PRNGKey(4), 1.0 / 458.0)
        assert not bool(res["used_H"])
        self._check(res, R21, t21)

    def test_planar_scene_uses_H(self):
        x1, x2, R21, t21 = self._make_scene(jax.random.PRNGKey(5), planar=True)
        mask = jnp.ones(x1.shape[0], dtype=bool)
        res = twoview.reconstruct_two_views(x1, x2, mask, jax.random.PRNGKey(6), 1.0 / 458.0)
        assert bool(res["used_H"])
        self._check(res, R21, t21)

    def test_with_outliers_and_padding(self):
        x1, x2, R21, t21 = self._make_scene(jax.random.PRNGKey(7), n=250)
        key = jax.random.PRNGKey(8)
        # corrupt 20% of matches, pad to 512
        n_out = 50
        x2 = x2.at[:n_out].set(jax.random.uniform(key, (n_out, 2), minval=-0.5, maxval=0.5))
        pad = 512 - x1.shape[0]
        x1 = jnp.concatenate([x1, jnp.zeros((pad, 2))])
        x2 = jnp.concatenate([x2, jnp.zeros((pad, 2))])
        mask = jnp.arange(512) < 250
        res = twoview.reconstruct_two_views(x1, x2, mask, jax.random.PRNGKey(9), 1.0 / 458.0)
        self._check(res, R21, t21)
        # padded entries must not be marked good
        assert not bool(jnp.any(res["good"][250:]))

    def test_triangulated_points_scale_consistent(self):
        x1, x2, R21, t21 = self._make_scene(jax.random.PRNGKey(10), noise_px=0.1)
        mask = jnp.ones(x1.shape[0], dtype=bool)
        res = twoview.reconstruct_two_views(x1, x2, mask, jax.random.PRNGKey(11), 1.0 / 458.0)
        self._check(res, R21, t21)
        # t is unit norm -> map is scaled by 1/|t_gt|; compare per point
        scale = 1.0 / float(jnp.linalg.norm(t21))
        good = np.array(res["good"])
        z = np.array(res["points"][:, 2])[good]
        z_gt = np.array(self._gt_p1[:, 2])[good] * scale
        assert np.median(np.abs(z - z_gt) / z_gt) < 0.05


def test_radtan_undistort_roundtrip():
    """Iterative inverse of the radial-tangential model: distort -> undistort
    must round-trip to well under 0.05 px with EuRoC coefficients."""
    import jax.numpy as jnp
    from hfnet_slam_tpu.geometry import cameras as C

    params = jnp.asarray([458.654, 457.296, 367.215, 248.375], jnp.float32)
    dist = C.np_pad_dist((-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05))
    rng = np.random.default_rng(0)
    uv = rng.uniform((40, 40), (710, 440), (500, 2)).astype(np.float32)
    uv_d = C.distort_points(params, dist, jnp.asarray(uv))
    uv_u = C.undistort_points(params, dist, uv_d)
    err = np.abs(np.asarray(uv_u) - uv).max()
    assert err < 0.05, f"max round-trip error {err:.4f} px"


def test_undistort_identity_without_dist():
    from hfnet_slam_tpu.geometry import cameras as C

    cam = C.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
    assert cam.dist is None
    cam0 = C.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480, dist=(0.0, 0.0))
    assert cam0.dist is None  # all-zero coefficients collapse to ideal


def test_triangulate_gn_refinement_low_parallax():
    """Advisor r4 finding #5: the inhomogeneous f32 DLT squares the
    conditioning; at low parallax the raw solve is visibly noisier than
    the geometric optimum. The GN refinement step must cut the 3D error
    versus the raw DLT on a low-parallax ensemble (and never hurt)."""
    import numpy as np
    import jax.numpy as jnp

    from hfnet_slam_tpu.geometry import triangulation as T

    rng = np.random.default_rng(0)
    n = 512
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(18.0, 25.0, n)], 1).astype(np.float32)
    # tiny baseline (0.08 at ~20 m depth: ~0.2 deg parallax)
    R21 = np.eye(3, dtype=np.float32)
    t21 = np.array([-0.08, 0.0, 0.0], np.float32)
    xn1 = pts[:, :2] / pts[:, 2:3]
    p2 = pts @ R21.T + t21
    xn2 = p2[:, :2] / p2[:, 2:3]
    noise = 0.5 / 450.0  # 0.5 px at fx = 450
    xn1n = (xn1 + rng.normal(0, noise, xn1.shape)).astype(np.float32)
    xn2n = (xn2 + rng.normal(0, noise, xn2.shape)).astype(np.float32)

    raw = np.asarray(T.triangulate_dlt(jnp.asarray(xn1n), jnp.asarray(xn2n),
                                       jnp.asarray(R21), jnp.asarray(t21),
                                       refine=0))
    ref = np.asarray(T.triangulate_dlt(jnp.asarray(xn1n), jnp.asarray(xn2n),
                                       jnp.asarray(R21), jnp.asarray(t21),
                                       refine=1))
    ok = np.isfinite(raw).all(1) & np.isfinite(ref).all(1) \
        & (raw[:, 2] > 0) & (ref[:, 2] > 0)
    e_raw = np.linalg.norm(raw[ok] - pts[ok], axis=1)
    e_ref = np.linalg.norm(ref[ok] - pts[ok], axis=1)
    # refined reprojection residual must not exceed the raw one
    def reproj_err(X):
        r1 = X[:, :2] / X[:, 2:3] - xn1n[ok]
        p2_ = X @ R21.T + t21
        r2 = p2_[:, :2] / p2_[:, 2:3] - xn2n[ok]
        return (r1 ** 2).sum() + (r2 ** 2).sum()
    assert reproj_err(ref[ok]) <= reproj_err(raw[ok]) * 1.001
    assert np.median(e_ref) <= np.median(e_raw) * 1.001

    # exact-measurement sanity: both recover the points
    exact = np.asarray(T.triangulate_dlt(jnp.asarray(xn1), jnp.asarray(xn2),
                                         jnp.asarray(R21), jnp.asarray(t21)))
    assert np.median(np.linalg.norm(exact - pts, axis=1)) < 0.05

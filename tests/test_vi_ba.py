"""Joint visual-inertial bundle adjustment (optim/vi_ba.py).

Synthetic-trajectory tests for the FullInertialBA / LocalInertialBA
analogue (reference src/Optimizer.cc:392/:2383): a body flies through a
point cloud with known IMU, the problem is perturbed, and the joint
solve must recover poses, velocities, biases and landmarks.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hfnet_slam_tpu import lie
from hfnet_slam_tpu.geometry import cameras, imu
from hfnet_slam_tpu.optim import vi_ba

CAM = cameras.pinhole(458.0, 457.0, 367.0, 248.0, 752, 480)
TBC_R = np.asarray(lie.so3_exp(jnp.array([0.0, 0.02, -0.01])))
TBC_T = np.array([0.015, -0.04, 0.02], np.float32)
GRAV = np.asarray(imu.GRAVITY_VEC)
DT = 0.005
STEPS_PER_LINK = 60


def simulate_keyframes(n_kf, w_fn, a_fn, bg=np.zeros(3), ba=np.zeros(3)):
    """Integrate body motion; return per-KF states and per-link IMU blocks."""
    R, p, v = np.eye(3), np.zeros(3), np.zeros(3)
    kf_R, kf_p, kf_v = [R.copy()], [p.copy()], [v.copy()]
    links = []
    for l in range(n_kf - 1):
        meas = np.zeros((STEPS_PER_LINK, 7), np.float32)
        for i in range(STEPS_PER_LINK):
            t = (l * STEPS_PER_LINK + i) * DT
            w = w_fn(t)
            a_w = a_fn(t)
            meas[i, :3] = R.T @ (a_w - GRAV) + ba
            meas[i, 3:6] = w + bg
            meas[i, 6] = DT
            p = p + v * DT + 0.5 * a_w * DT * DT
            v = v + a_w * DT
            R = R @ np.asarray(lie.so3_exp(jnp.asarray(w * DT)))
        links.append(meas)
        kf_R.append(R.copy())
        kf_p.append(p.copy())
        kf_v.append(v.copy())
    return np.stack(kf_R), np.stack(kf_p), np.stack(kf_v), links


def body_to_cam(R_wb, p_wb):
    R_cb = TBC_R.T
    R_cw = R_cb @ R_wb.T
    t_cw = -R_cw @ p_wb - R_cb @ TBC_T
    return R_cw, t_cw


def make_problem(key, n_kf=6, m=80, noise_px=0.0, perturb=0.01,
                 bg_true=np.zeros(3), prior_g=0.0, prior_a=0.0):
    kp, kn, kq, kv = jax.random.split(key, 4)
    w_fn = lambda t: np.array([0.05 * np.sin(t), 0.1, 0.08 * np.cos(2 * t)])
    a_fn = lambda t: np.array([0.6 * np.cos(t), 0.5 * np.sin(1.3 * t), 0.3 * np.cos(0.7 * t)])
    kf_R, kf_p, kf_v, links = simulate_keyframes(n_kf, w_fn, a_fn, bg=bg_true)

    # landmarks in front of the whole trajectory (cameras look down +z)
    pts_gt = np.asarray(jax.random.uniform(kp, (m, 3), minval=-4, maxval=4)
                        + jnp.array([0.0, 0.0, 9.0]))

    # visual edges: every KF observes every point
    kf_idx, pt_idx, uvs = [], [], []
    for k in range(n_kf):
        R_cw, t_cw = body_to_cam(kf_R[k], kf_p[k])
        pc = pts_gt @ R_cw.T + t_cw
        uv = np.asarray(CAM.project(jnp.asarray(pc)))
        kf_idx.append(np.full(m, k))
        pt_idx.append(np.arange(m))
        uvs.append(uv)
    kf_idx = np.concatenate(kf_idx).astype(np.int32)
    pt_idx = np.concatenate(pt_idx).astype(np.int32)
    uv = np.concatenate(uvs).astype(np.float32)
    if noise_px:
        uv = uv + np.asarray(jax.random.normal(kn, uv.shape)) * noise_px
    E = len(uv)

    # per-link preintegration at zero linearization bias
    calib = imu.default_calib()
    pres = [imu.integrate(jnp.asarray(mblk), jnp.ones(len(mblk), bool), calib,
                          jnp.zeros(3), jnp.zeros(3)) for mblk in links]
    pre = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)

    # perturb everything but KF 0 (the fixed gauge anchor)
    xi = np.asarray(jax.random.normal(kq, (n_kf, 6))) * perturb
    xi[0] = 0.0
    R0 = np.stack([kf_R[k] @ np.asarray(lie.so3_exp(jnp.asarray(xi[k, :3])))
                   for k in range(n_kf)])
    p0 = kf_p + xi[:, 3:6]
    v0 = kf_v + np.asarray(jax.random.normal(kv, (n_kf, 3))) * perturb
    v0[0] = kf_v[0]
    pts0 = pts_gt + np.asarray(jax.random.normal(kq, (m, 3))) * (perturb * 3)

    prob = vi_ba.VIBAProblem(
        R_wb=jnp.asarray(R0, jnp.float32), p_wb=jnp.asarray(p0, jnp.float32),
        v=jnp.asarray(v0, jnp.float32),
        bg=jnp.zeros((n_kf, 3)), ba=jnp.zeros((n_kf, 3)),
        fixed=jnp.zeros(n_kf, bool),
        fix_pose_only=jnp.arange(n_kf) == 0,
        points=jnp.asarray(pts0, jnp.float32),
        Tbc_R=jnp.asarray(TBC_R, jnp.float32), Tbc_t=jnp.asarray(TBC_T, jnp.float32),
        kf_idx=jnp.asarray(kf_idx), pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv), inv_sigma2=jnp.ones(E),
        valid=jnp.ones(E, bool),
        z_meas=jnp.zeros(E), wz=jnp.zeros(E),
        li=jnp.arange(n_kf - 1, dtype=jnp.int32),
        lj=jnp.arange(1, n_kf, dtype=jnp.int32),
        pre=pre, lvalid=jnp.ones(n_kf - 1, bool),
        prior_g=jnp.asarray(prior_g), prior_a=jnp.asarray(prior_a),
    )
    return prob, kf_R, kf_p, kf_v, pts_gt


def pose_err(prob, R_gt, p_gt):
    dR = np.einsum("kij,kil->kjl", np.asarray(prob.R_wb), R_gt)  # R_est^T R_gt
    ang = np.array([np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(d))))
                    for d in dR])
    dp = np.linalg.norm(np.asarray(prob.p_wb) - p_gt, axis=-1)
    return float(ang.max()), float(dp.max())


class TestVIBundleAdjust:
    def test_converges_noise_free(self):
        prob, R_gt, p_gt, v_gt, pts_gt = make_problem(jax.random.PRNGKey(0))
        a0, d0 = pose_err(prob, R_gt, p_gt)
        out = vi_ba.vi_bundle_adjust(CAM.kind, CAM.params, prob,
                                     rounds=((8, True), (20, False)))
        a1, d1 = pose_err(out, R_gt, p_gt)
        assert a1 < 2e-3 and d1 < 5e-3, (a0, d0, a1, d1)
        v_err = np.abs(np.asarray(out.v) - v_gt).max()
        assert v_err < 2e-2, v_err
        # all visual edges survive classification
        assert bool(np.asarray(out.valid).all())

    def test_improves_under_noise(self):
        prob, R_gt, p_gt, v_gt, pts_gt = make_problem(
            jax.random.PRNGKey(1), noise_px=0.5, perturb=0.02)
        a0, d0 = pose_err(prob, R_gt, p_gt)
        out = vi_ba.vi_bundle_adjust(CAM.kind, CAM.params, prob,
                                     rounds=((8, True), (20, False)))
        a1, d1 = pose_err(out, R_gt, p_gt)
        # rotation is strongly observable (gravity + vision) and must drop
        # hard; absolute position converges to the MAP optimum for this
        # noise draw, which sits near 0.6x the init error
        assert a1 < 0.1 * a0, (a0, a1)
        assert d1 < 0.7 * d0, (d0, d1)

    def test_gyro_bias_recovered(self):
        bg = np.array([0.008, -0.012, 0.01])
        prob, R_gt, p_gt, v_gt, pts_gt = make_problem(
            jax.random.PRNGKey(2), bg_true=bg, perturb=0.005)
        out = vi_ba.vi_bundle_adjust(CAM.kind, CAM.params, prob,
                                     rounds=((8, True), (20, False)))
        bg_est = np.asarray(out.bg).mean(axis=0)
        np.testing.assert_allclose(bg_est, bg, atol=2e-3)

    def test_outlier_edges_classified(self):
        prob, R_gt, p_gt, v_gt, pts_gt = make_problem(
            jax.random.PRNGKey(3), noise_px=0.3, perturb=0.01)
        uv = np.array(prob.uv)
        uv[:20] += 60.0  # corrupt 20 observations
        prob = prob._replace(uv=jnp.asarray(uv))
        out = vi_ba.vi_bundle_adjust(CAM.kind, CAM.params, prob,
                                     rounds=((8, True), (20, False)))
        valid = np.asarray(out.valid)
        assert valid[:20].sum() <= 2, valid[:20].sum()
        assert valid[20:].mean() > 0.95

    def test_fixed_state_untouched(self):
        prob, *_ = make_problem(jax.random.PRNGKey(4))
        # KF0: pose-only fixed -> pose frozen; KF1: fully fixed
        prob = prob._replace(fixed=jnp.arange(prob.fixed.shape[0]) == 1)
        out, _ = vi_ba.vi_ba_iterate(CAM.kind, CAM.params, prob, 3, True,
                                     5.991)
        np.testing.assert_allclose(np.asarray(out.R_wb[0]),
                                   np.asarray(prob.R_wb[0]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(out.p_wb[0]),
                                   np.asarray(prob.p_wb[0]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(out.v[1]),
                                   np.asarray(prob.v[1]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(out.bg[1]),
                                   np.asarray(prob.bg[1]), atol=1e-7)


@pytest.mark.slow
class TestChunkedFullInertialBA:
    """Uncapped FullInertialBA (reference Optimizer.cc:392-813 optimizes
    EVERY keyframe): a map with 80+ chain keyframes — far beyond the old
    48-KF truncation window — solves JOINTLY with capacities sized to the
    map, and every keyframe (including the oldest 30) must converge."""

    def test_80_kf_chain_all_optimized(self):
        from hfnet_slam_tpu.geometry import imu as IMU
        from hfnet_slam_tpu.slam.local_mapping import LocalMapper, MapperConfig
        from hfnet_slam_tpu.slam.map import MapStore
        from hfnet_slam_tpu.slam.vi import VIManager

        n_kf, m = 80, 240
        n_see = 64  # landmarks per keyframe (local covisibility)
        # mild yaw so the camera keeps scene overlap along the whole chain
        w_fn = lambda t: np.array([0.02 * np.sin(t), 0.03, 0.02 * np.cos(2 * t)])
        a_fn = lambda t: np.array([0.6 * np.cos(t), 0.5 * np.sin(1.3 * t),
                                   0.3 * np.cos(0.7 * t)])
        kf_R, kf_p, kf_v, links = simulate_keyframes(n_kf, w_fn, a_fn)
        rng = np.random.default_rng(0)
        # landmarks distributed ALONG the trajectory, in front of the
        # cameras that pass them — realistic local covisibility, unlike a
        # single start-clustered cloud the tail cameras can't see
        anchor = kf_p[np.linspace(0, n_kf - 1, m).astype(int)]
        pts_gt = (anchor + rng.uniform(-3, 3, (m, 3))
                  + np.array([0, 0, 8.0])).astype(np.float32)

        store = MapStore(k_max=128, m_max=512, n_slots=n_see, desc_dim=8,
                         gdesc_dim=8)
        ids = store.add_points(pts_gt, np.ones((m, 8), np.float32))
        calib = imu.default_calib()
        calib = calib._replace(Tbc_R=jnp.asarray(TBC_R, jnp.float32),
                               Tbc_t=jnp.asarray(TBC_T, jnp.float32)) \
            if hasattr(calib, "_replace") else calib

        class F:
            score = np.ones(n_see, np.float32)
            octave = np.zeros(n_see, np.int32)
            desc = np.zeros((n_see, 8), np.float32)
            mask = np.ones(n_see, bool)
            global_desc = np.ones(8, np.float32)

        # perturb every pose/velocity except KF0 (the gauge)
        xi = rng.normal(size=(n_kf, 6)) * 0.01
        xi[0] = 0.0
        dv = rng.normal(size=(n_kf, 3)) * 0.01
        dv[0] = 0.0
        for k in range(n_kf):
            R_wb = kf_R[k] @ np.asarray(lie.so3_exp(jnp.asarray(xi[k, :3])))
            p_wb = kf_p[k] + xi[k, 3:6]
            R_cb = TBC_R.T
            R_cw = R_cb @ R_wb.T
            t_cw = -R_cw @ p_wb - R_cb @ TBC_T
            # observations from the TRUE pose (noise-free pixels) of the
            # n_see nearest landmarks that sit in front of the camera
            R_cw_gt, t_cw_gt = body_to_cam(kf_R[k], kf_p[k])
            pc = pts_gt @ R_cw_gt.T + t_cw_gt
            uv_all = np.asarray(CAM.project(jnp.asarray(pc)))
            in_view = (pc[:, 2] > 1.0) & (uv_all[:, 0] >= 0) \
                & (uv_all[:, 0] < CAM.width) & (uv_all[:, 1] >= 0) \
                & (uv_all[:, 1] < CAM.height)
            near = np.argsort(np.where(in_view, pc[:, 2], 1e9))[:n_see]
            near = near[in_view[near]]
            feats = F()
            feats.xy = np.zeros((n_see, 2), np.float32)
            feats.xy[: len(near)] = uv_all[near]
            obs = np.full(n_see, -1, np.int32)
            obs[: len(near)] = ids[near]
            kk = store.add_keyframe(R_cw, t_cw, feats, float(k) * 0.3, obs=obs)
            store.kf_vel[kk] = kf_v[k] + dv[k]
            store.kf_prev[kk] = kk - 1 if k > 0 else -1
        # perturb the landmarks too
        store.mp_pos[ids] += rng.normal(size=(m, 3)).astype(np.float32) * 0.03
        store.imu_initialized = True

        vim = VIManager(calib, store)
        c = imu.default_calib()
        for k in range(1, n_kf):
            vim.kf_pre[k] = imu.integrate(
                jnp.asarray(links[k - 1]), jnp.ones(len(links[k - 1]), bool),
                vim.calib, jnp.zeros(3), jnp.zeros(3))

        cfg = MapperConfig(fiba_kf_cap=24, iba_mp_cap=512, iba_edge_cap=8192,
                           fiba_rounds=((6, True), (14, False)))
        mapper = LocalMapper(CAM, store, cfg)
        mapper.vim = vim
        mapper.full_inertial_ba(vim)
        # 80 KFs <= fiba_max_joint -> ONE joint problem, no chunk sweep
        assert mapper.stats.get("fiba_chunks", 0) == 0

        # EVERY keyframe converged — including the oldest 30, which the old
        # 48-KF truncation would have left on rigid propagation
        for k in range(n_kf):
            R_wb_est, p_wb_est = vim.cam_to_body(store.kf_R[k], store.kf_t[k])
            dR = R_wb_est.T @ kf_R[k]
            ang = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR))))
            dp = np.linalg.norm(p_wb_est - kf_p[k])
            assert ang < 5e-3 and dp < 2e-2, (k, ang, dp)
        # velocities too (the 15-d state optimized, not just the pose)
        v_err = np.linalg.norm(store.kf_vel[:n_kf] - kf_v, axis=1)
        assert v_err.max() < 5e-2, v_err.max()

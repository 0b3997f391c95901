"""IMU preintegration and visual-inertial optimizers.

Hermetic synthetic-trajectory tests mirroring the reference's inertial
math (src/ImuTypes.cc, src/Optimizer.cc inertial entry points): closed-form
checks for preintegration, bias-Jacobian correction, state prediction, and
the gravity/scale/bias initialization + VI pose tracking solvers.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hfnet_slam_tpu import lie
from hfnet_slam_tpu.geometry import cameras, imu
from hfnet_slam_tpu.optim import inertial

GRAV = np.asarray(imu.GRAVITY_VEC)


def simulate(n_steps, dt, w_fn, a_fn, g=GRAV, bg=np.zeros(3), ba=np.zeros(3),
             R0=np.eye(3), p0=np.zeros(3), v0=np.zeros(3)):
    """Simulate body motion; return (meas (N,7), R, p, v final)."""
    R, p, v = R0.copy(), p0.copy(), v0.copy()
    meas = np.zeros((n_steps, 7), np.float32)
    for i in range(n_steps):
        t = i * dt
        w = w_fn(t)
        a_w = a_fn(t)
        meas[i, :3] = R.T @ (a_w - g) + ba
        meas[i, 3:6] = w + bg
        meas[i, 6] = dt
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(w * dt)))
    return meas, R, p, v


class TestPreintegration:
    def setup_method(self):
        self.calib = imu.default_calib()

    def test_constant_acceleration(self):
        a_w = np.array([0.3, -0.2, 0.1])
        meas, R, p, v = simulate(200, 0.005, lambda t: np.zeros(3), lambda t: a_w)
        pre = imu.integrate(jnp.asarray(meas), jnp.ones(200, bool), self.calib,
                            jnp.zeros(3), jnp.zeros(3))
        R2, p2, v2 = imu.predict_state(jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
                                       jnp.zeros(3), jnp.zeros(3), pre)
        np.testing.assert_allclose(np.asarray(v2), a_w, atol=1e-3)
        np.testing.assert_allclose(np.asarray(p2), 0.5 * a_w, atol=1e-3)

    def test_pure_rotation(self):
        w = np.array([0, 0, 0.5])
        meas, R, p, v = simulate(200, 0.005, lambda t: w, lambda t: np.zeros(3))
        pre = imu.integrate(jnp.asarray(meas), jnp.ones(200, bool), self.calib,
                            jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(
            np.asarray(pre.dR), np.asarray(lie.so3_exp(jnp.asarray(w))), atol=1e-4
        )

    def test_padding_rows_are_skipped(self):
        a_w = np.array([1.0, 0.0, 0.0])
        meas, *_ = simulate(100, 0.005, lambda t: np.zeros(3), lambda t: a_w)
        padded = np.concatenate([meas, 99 * np.ones((50, 7), np.float32)])
        mask = np.concatenate([np.ones(100, bool), np.zeros(50, bool)])
        pre_a = imu.integrate(jnp.asarray(meas), jnp.ones(100, bool), self.calib,
                              jnp.zeros(3), jnp.zeros(3))
        pre_b = imu.integrate(jnp.asarray(padded), jnp.asarray(mask), self.calib,
                              jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(pre_a.dP), np.asarray(pre_b.dP), atol=1e-6)
        assert abs(float(pre_a.dT) - float(pre_b.dT)) < 1e-6

    def test_bias_jacobian_correction(self):
        w = np.array([0, 0, 0.5])
        bg = np.array([0.01, -0.02, 0.03], np.float32)
        meas, *_ = simulate(200, 0.005, lambda t: w, lambda t: np.zeros(3), bg=bg)
        pre = imu.integrate(jnp.asarray(meas), jnp.ones(200, bool), self.calib,
                            jnp.zeros(3), jnp.zeros(3))
        dR = imu.delta_rotation(pre, jnp.asarray(bg))
        R_true = np.asarray(lie.so3_exp(jnp.asarray(w)))
        assert np.linalg.norm(np.asarray(dR) - R_true) < 1e-3

    def test_residual_zero_for_consistent_states(self):
        meas, R2, p2, v2 = simulate(
            100, 0.005,
            lambda t: np.array([0.3, -0.2, 0.5]),
            lambda t: np.array([1.0, 0.5, -0.3]),
        )
        pre = imu.integrate(jnp.asarray(meas), jnp.ones(100, bool), self.calib,
                            jnp.zeros(3), jnp.zeros(3))
        r = imu.inertial_residual(
            jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(R2), jnp.asarray(p2), jnp.asarray(v2), pre,
        )
        assert np.abs(np.asarray(r)).max() < 1e-3

    def test_covariance_grows(self):
        meas, *_ = simulate(100, 0.005, lambda t: np.zeros(3), lambda t: np.zeros(3))
        pre50 = imu.integrate(jnp.asarray(meas[:50]), jnp.ones(50, bool),
                              self.calib, jnp.zeros(3), jnp.zeros(3))
        pre100 = imu.integrate(jnp.asarray(meas), jnp.ones(100, bool),
                               self.calib, jnp.zeros(3), jnp.zeros(3))
        tr50 = float(jnp.trace(pre50.C[:9, :9]))
        tr100 = float(jnp.trace(pre100.C[:9, :9]))
        assert tr100 > tr50 > 0


class TestInertialInit:
    def test_recovers_scale_gravity_bias(self):
        calib = imu.default_calib()
        theta_g = np.array([0.08, -0.05, 0.0], np.float32)
        Rwg_true = np.asarray(lie.so3_exp(jnp.asarray(theta_g)))
        g_true = Rwg_true @ GRAV
        bg_true = np.array([0.004, -0.003, 0.002], np.float32)
        scale_true = 2.0

        dt, K, spk = 0.005, 12, 60
        R, p, v = np.eye(3), np.zeros(3), np.zeros(3)
        Rs, ps, vs, pres = [R.copy()], [p.copy()], [v.copy()], []
        for k in range(K - 1):
            meas = np.zeros((spk, 7), np.float32)
            for i in range(spk):
                t = (k * spk + i) * dt
                w = np.array([0.8 * np.sin(2 * t), 0.5, -0.6 * np.cos(1.5 * t)])
                a_w = np.array([2.0 * np.cos(3 * t), 1.5 * np.sin(4 * t), 0.8 * np.sin(2 * t)])
                meas[i, :3] = R.T @ (a_w - g_true)
                meas[i, 3:6] = w + bg_true
                meas[i, 6] = dt
                p = p + v * dt + 0.5 * a_w * dt * dt
                v = v + a_w * dt
                R = R @ np.asarray(lie.so3_exp(jnp.asarray(w * dt)))
            Rs.append(R.copy()); ps.append(p.copy()); vs.append(v.copy())
            pres.append(imu.integrate(jnp.asarray(meas), jnp.ones(spk, bool),
                                      calib, jnp.zeros(3), jnp.zeros(3)))
        pres_b = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
        res = inertial.inertial_init(
            jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ps) / scale_true),
            pres_b, prior_g=1e2, prior_a=1e10, n_iters=60,
        )
        assert abs(float(res["scale"]) - scale_true) < 0.02
        assert np.abs(np.asarray(res["bg"]) - bg_true).max() < 1e-3
        g_est = np.asarray(res["Rwg"]) @ GRAV
        cos = np.clip(g_est @ g_true / imu.GRAVITY**2, -1, 1)
        assert np.degrees(np.arccos(cos)) < 0.5
        assert np.abs(np.asarray(res["v"]) - np.stack(vs)).max() < 0.01


class TestPoseInertial:
    def test_tracks_through_interval(self):
        rng = np.random.default_rng(1)
        calib = imu.default_calib()
        cam = cameras.pinhole(450., 450., 320., 240., 640, 480)
        R1 = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.2])))
        p1 = np.array([0.3, -0.1, 0.0], np.float32)
        v1 = np.array([0.4, 0.1, -0.2], np.float32)
        meas, R2t, p2t, v2t = simulate(
            10, 0.005,
            lambda t: np.array([0.3, -0.2, 0.5]),
            lambda t: np.array([1.0, 0.5, -0.3]),
            R0=R1, p0=p1, v0=v1,
        )
        pre = imu.integrate(jnp.asarray(meas), jnp.ones(10, bool), calib,
                            jnp.zeros(3), jnp.zeros(3))
        M = 256
        pts = rng.uniform(-4, 4, (M, 3)).astype(np.float32) + np.array([0, 0, 8], np.float32)
        R_cw, t_cw = inertial.body_to_cam(jnp.asarray(R2t), jnp.asarray(p2t),
                                          jnp.eye(3), jnp.zeros(3))
        uv = np.array(cam.project(jnp.asarray(pts) @ np.asarray(R_cw).T + np.asarray(t_cw)))
        uv = (uv + rng.normal(0, 0.3, uv.shape)).astype(np.float32)
        res = inertial.pose_inertial_optimize(
            cam.kind, cam.params, jnp.eye(3), jnp.zeros(3),
            jnp.asarray(R1), jnp.asarray(p1), jnp.asarray(v1),
            jnp.zeros(3), jnp.zeros(3), pre,
            jnp.asarray(R2t @ np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.01, 0.03])))),
            jnp.asarray(p2t + np.array([0.05, -0.03, 0.02])),
            jnp.asarray(v2t + 0.1),
            jnp.asarray(pts), jnp.asarray(uv), jnp.ones(M), jnp.ones(M, bool),
        )
        assert int(res["n_inliers"]) > 240
        assert np.linalg.norm(np.asarray(res["p"]) - p2t) < 5e-3
        assert np.linalg.norm(np.asarray(res["v"]) - v2t) < 5e-2


class TestReintegration:
    def test_chain_reintegrate_on_large_bias(self):
        """VIManager.reintegrate_chain relinearizes at the new bias exactly
        (Preintegrated::Reintegrate, reference src/ImuTypes.cc:168, fired
        after InertialOptimization at src/Optimizer.cc:3217)."""
        from hfnet_slam_tpu.slam.map import MapStore
        from hfnet_slam_tpu.slam.vi import VIManager, VIConfig

        store = MapStore(k_max=4, m_max=16, n_slots=8, desc_dim=8, gdesc_dim=8)
        store.kf_valid[:2] = True
        store.kf_timestamp[:2] = [0.0, 0.5]
        calib = imu.default_calib()
        vim = VIManager(calib, store, VIConfig(meas_cap=64))

        bg_true = np.array([0.02, -0.015, 0.01], np.float32)
        meas, _, _, _ = simulate(
            40, 0.0125,
            lambda t: np.array([0.3, -0.2, 0.5]),
            lambda t: np.array([1.0, 0.5, -0.3]),
            bg=bg_true,
        )
        pre0 = vim.integrate(meas)  # linearized at bias 0
        vim.on_keyframe(1, 0, pre0, meas=meas)

        # within tolerance: no-op
        assert vim.reintegrate_chain() == 0

        # optimizer lands on the true gyro bias -> exceeds reint_bg_tol
        store.kf_bg[0] = bg_true
        assert vim.reintegrate_chain() == 1
        pre1 = vim.kf_pre[1]
        assert np.allclose(np.asarray(pre1.bg0), bg_true, atol=1e-6)
        # exact reintegration matches a direct integrate at the new bias
        direct = vim.integrate(meas, bg=bg_true)
        np.testing.assert_allclose(np.asarray(pre1.dR), np.asarray(direct.dR),
                                   atol=1e-6)
        # and agrees with the first-order Jacobian correction to 1st order
        corr = imu.delta_rotation(pre0, jnp.asarray(bg_true))
        assert np.linalg.norm(np.asarray(pre1.dR) - np.asarray(corr)) < 5e-3

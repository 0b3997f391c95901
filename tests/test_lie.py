import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfnet_slam_tpu import lie


def rand_rot(key, n=()):
    phi = jax.random.normal(key, n + (3,))
    return lie.so3_exp(phi)


class TestSO3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(0)
        phi = jax.random.normal(key, (64, 3)) * 0.8
        # keep |phi| < pi so log returns the same representative
        phi = phi / jnp.maximum(1.0, jnp.linalg.norm(phi, axis=-1, keepdims=True) / 3.0)
        R = lie.so3_exp(phi)
        phi2 = lie.so3_log(R)
        np.testing.assert_allclose(phi, phi2, atol=2e-5)

    def test_small_angle(self):
        phi = jnp.array([[1e-10, 0, 0], [0.0, 0.0, 0.0], [1e-6, -1e-7, 2e-6]])
        R = lie.so3_exp(phi)
        assert not jnp.any(jnp.isnan(R))
        np.testing.assert_allclose(lie.so3_log(R), phi, atol=1e-7)

    def test_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        for theta in [np.pi - 1e-4, np.pi - 1e-2, 3.0]:
            phi = jnp.asarray(theta * axis, dtype=jnp.float32)
            R = lie.so3_exp(phi)
            phi2 = lie.so3_log(R)
            R2 = lie.so3_exp(phi2)
            np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_rotation_properties(self):
        R = rand_rot(jax.random.PRNGKey(1), (16,))
        I = jnp.eye(3)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), jnp.broadcast_to(I, R.shape), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(16), atol=1e-5)

    def test_left_jacobian_fd(self):
        # J_l: Exp(phi + dphi) ~ Exp(J_l dphi) Exp(phi)
        phi = jnp.array([0.3, -0.2, 0.5])
        J = lie.so3_left_jacobian(phi)
        eps = 1e-4
        for i in range(3):
            d = jnp.zeros(3).at[i].set(eps)
            lhs = lie.so3_exp(phi + d) @ lie.so3_exp(phi).T
            num = lie.so3_log(lhs) / eps
            np.testing.assert_allclose(num, J[:, i], atol=1e-2)

    def test_jacobian_inverse(self):
        phi = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
        J = lie.so3_left_jacobian(phi)
        Jinv = lie.so3_left_jacobian_inv(phi)
        np.testing.assert_allclose(J @ Jinv, jnp.broadcast_to(jnp.eye(3), J.shape), atol=1e-4)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(3), (32, 6)) * 0.5
        R, t = lie.se3_exp(xi)
        xi2 = lie.se3_log(R, t)
        np.testing.assert_allclose(xi, xi2, atol=2e-5)

    def test_inverse_mul(self):
        xi = jax.random.normal(jax.random.PRNGKey(4), (8, 6))
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inverse(R, t)
        Rp, tp = lie.se3_mul(R, t, Ri, ti)
        np.testing.assert_allclose(Rp, jnp.broadcast_to(jnp.eye(3), Rp.shape), atol=1e-5)
        np.testing.assert_allclose(tp, jnp.zeros_like(tp), atol=1e-5)

    def test_apply(self):
        xi = jnp.array([1.0, 2.0, 3.0, 0.1, 0.2, 0.3])
        R, t = lie.se3_exp(xi)
        p = jnp.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(lie.se3_apply(R, t, p), R @ p + t, atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(5), (32, 7)) * 0.5
        R, t, s = lie.sim3_exp(xi)
        xi2 = lie.sim3_log(R, t, s)
        np.testing.assert_allclose(xi, xi2, atol=5e-5)

    def test_identity(self):
        R, t, s = lie.sim3_exp(jnp.zeros(7))
        np.testing.assert_allclose(R, jnp.eye(3), atol=1e-7)
        np.testing.assert_allclose(t, jnp.zeros(3), atol=1e-7)
        np.testing.assert_allclose(s, 1.0, atol=1e-7)

    def test_reduces_to_se3(self):
        xi6 = jax.random.normal(jax.random.PRNGKey(6), (8, 6))
        xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1))], axis=-1)
        R7, t7, s7 = lie.sim3_exp(xi7)
        R6, t6 = lie.se3_exp(xi6)
        np.testing.assert_allclose(R7, R6, atol=1e-5)
        np.testing.assert_allclose(t7, t6, atol=1e-4)
        np.testing.assert_allclose(s7, jnp.ones(8), atol=1e-6)

    def test_mul_inverse(self):
        xi = jax.random.normal(jax.random.PRNGKey(7), (4, 7)) * 0.5
        R, t, s = lie.sim3_exp(xi)
        Ri, ti, si = lie.sim3_inverse(R, t, s)
        Rp, tp, sp = lie.sim3_mul(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(Rp, jnp.broadcast_to(jnp.eye(3), Rp.shape), atol=1e-5)
        np.testing.assert_allclose(tp, jnp.zeros_like(tp), atol=1e-4)
        np.testing.assert_allclose(sp, jnp.ones(4), atol=1e-5)

    def test_apply_scale(self):
        R, t, s = lie.sim3_exp(jnp.array([0.0] * 6 + [jnp.log(2.0)]))
        p = jnp.array([1.0, 1.0, 1.0])
        np.testing.assert_allclose(lie.sim3_apply(R, t, s, p), 2.0 * p, atol=1e-5)


class TestQuat:
    def test_roundtrip(self):
        R = rand_rot(jax.random.PRNGKey(8), (64,))
        q = lie.rot_to_quat(R)
        R2 = lie.quat_to_rot(q)
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_identity(self):
        q = lie.rot_to_quat(jnp.eye(3))
        np.testing.assert_allclose(jnp.abs(q), jnp.array([1.0, 0, 0, 0]), atol=1e-6)

    def test_normalize_rotation(self):
        R = rand_rot(jax.random.PRNGKey(9)) + 0.01 * jax.random.normal(jax.random.PRNGKey(10), (3, 3))
        Rn = lie.normalize_rotation(R)
        np.testing.assert_allclose(Rn @ Rn.T, jnp.eye(3), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(Rn), 1.0, atol=1e-5)


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(lambda xi: lie.se3_log(*lie.se3_exp(xi))))
    xi = jax.random.normal(jax.random.PRNGKey(11), (16, 6))
    np.testing.assert_allclose(f(xi), xi, atol=2e-5)


class TestOrthonormalize:
    def test_projects_back_to_so3(self):
        R = rand_rot(jax.random.PRNGKey(12))
        # per-step defects in the tracking loop are ~1e-5 before the fix
        # re-projects them (the quat roundtrip is accurate to ~defect/2)
        R_bad = R * 1.0001
        Rn = lie.orthonormalize(R_bad)
        np.testing.assert_allclose(Rn @ Rn.T, jnp.eye(3), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(Rn), 1.0, atol=1e-5)
        np.testing.assert_allclose(Rn, R, atol=1e-4)

    def test_velocity_model_defect_does_not_compound(self):
        """Regression: R_v = R_cur R_last^T velocity composition must not
        amplify non-orthonormality (pre-fix it grew det x2.4 PER FRAME
        until metric tracking collapsed)."""
        key = jax.random.PRNGKey(13)
        R_last = rand_rot(key)
        R_cur = np.asarray(rand_rot(jax.random.PRNGKey(14)), np.float32)
        R_cur = R_cur * (1 + 1e-4)  # seed a small defect
        for _ in range(30):
            R_v = lie.orthonormalize(jnp.asarray(R_cur) @ R_last.T)
            R_pred = np.asarray(R_v @ R_last, np.float32)
            R_last = jnp.asarray(R_cur)
            R_cur = R_pred
        # pre-fix: det grows x2.4 per step -> ~1e10 after 30. Post-fix the
        # seeded defect merely persists bounded (the pipeline additionally
        # renormalizes the frame pose itself after optimization).
        assert abs(float(np.linalg.det(R_cur)) - 1.0) < 1e-3

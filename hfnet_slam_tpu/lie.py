"""Lie groups SO(3) / SE(3) / Sim(3) in pure JAX.

Replaces the reference's header-only Sophus dependency
(/root/reference/Thirdparty/Sophus, used throughout e.g.
include/KeyFrame.h, src/ImuTypes.cc) with a small functional module.

Conventions:
  * Rotations are 3x3 matrices (f32 by default); batching via leading axes
    (every function is vmap-compatible and already broadcasts over leading
    dims where noted).
  * SE3 is represented as a pair (R, t); Sim3 as (R, t, s).
  * Tangent ordering: se3 = [rho(3), phi(3)] (translation first, like Sophus),
    sim3 = [rho(3), phi(3), sigma(1)].
  * All small-angle branches are implemented with `jnp.where` over Taylor
    expansions so the functions are jit/grad-safe (no NaN from 0/0 in
    either branch of the where).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(v):
    """so3 hat: (...,3) -> (...,3,3) skew-symmetric."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


def vee(M):
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3).

    theta2 is theta^2; uses Taylor series below sqrt(eps) thresholds.
    """
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2)
    return A, B, C


def so3_exp(phi):
    """Rodrigues: (...,3) -> (...,3,3)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + A[..., None, None] * K + B[..., None, None] * (K @ K)


def so3_log(R):
    """(...,3,3) -> (...,3), |phi| <= pi. Stable everywhere (incl. near pi).

    Goes through the branch-safe quaternion extraction (largest Shepperd
    pivot), then axis-angle: phi = 2 atan2(|v|, w) v / |v|.
    """
    q = rot_to_quat(R)
    # canonical sign: w >= 0 so the angle is in [0, pi]
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    w, v = q[..., 0], q[..., 1:]
    # differentiation safety: norm(v) has a NaN tangent at v=0, and that NaN
    # leaks through BOTH branches of a jnp.where under jvp/jacfwd (the pose
    # graph optimizer differentiates log at near-identity residuals). Guard
    # the sqrt input itself and keep the small branch norm-free (nv2 only).
    nv2 = jnp.sum(v * v, axis=-1)
    small = nv2 < 1e-12
    nv_safe = jnp.sqrt(jnp.where(small, 1.0, nv2))
    w_safe = jnp.maximum(w, _EPS)
    # generic: 2*atan2(nv, w)/nv ; small angle: 2/w * (1 - nv^2/(3 w^2))
    scale = jnp.where(
        small,
        2.0 / w_safe * (1.0 - nv2 / (3.0 * w_safe * w_safe)),
        2.0 * jnp.arctan2(nv_safe, w) / nv_safe,
    )
    return scale[..., None] * v


def so3_left_jacobian(phi):
    """Left Jacobian J_l of SO(3): (...,3) -> (...,3,3)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    _, B, C = _sinc_coeffs(theta2)
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + B[..., None, None] * K + C[..., None, None] * (K @ K)


def so3_right_jacobian(phi):
    """Right Jacobian J_r(phi) = J_l(-phi). Mirrors IMU::RightJacobianSO3
    (reference include/ImuTypes.h:254-260)."""
    return so3_left_jacobian(-phi)


def so3_left_jacobian_inv(phi):
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    half = 0.5 * theta
    small = theta2 < 1e-8
    # cot term: 1/t^2 - cos(t/2)/(2 t sin(t/2))
    cot_coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / theta2 - jnp.cos(half) / (2.0 * theta * jnp.where(jnp.abs(jnp.sin(half)) < _EPS, 1.0, jnp.sin(half))),
    )
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I - 0.5 * K + cot_coef[..., None, None] * (K @ K)


def so3_right_jacobian_inv(phi):
    return so3_left_jacobian_inv(-phi)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_exp(xi):
    """xi = [rho, phi] (...,6) -> (R (...,3,3), t (...,3))."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    R = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_log(R, t):
    phi = so3_log(R)
    Vinv = so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_mul(R1, t1, R2, t2):
    return R1 @ R2, jnp.einsum("...ij,...j->...i", R1, t2) + t1


def se3_apply(R, t, p):
    """Apply transform to points p (...,3) (broadcasting over leading dims)."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def se3_retract(R, t, xi):
    """Left-multiplicative retraction: T' = Exp(xi) * T  (g2o/ORB-SLAM style:
    vertices update by left multiplication, cf. VertexPose::oplusImpl)."""
    dR, dt = se3_exp(xi)
    return se3_mul(dR, dt, R, t)


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------

def _sim3_W(phi, sigma):
    """W matrix of Sim(3) exp: t = W @ rho.  W = C*I + A*hat(phi) + B*hat(phi)^2
    with Taylor branches for small theta and/or sigma (Sophus sim3 calcW)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    s = jnp.exp(sigma)
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta2 < 1e-8
    sig_safe = jnp.where(small_sig, 1.0, sigma)
    th_safe = jnp.where(small_th, 1.0, theta)
    th2_safe = jnp.where(small_th, 1.0, theta2)

    C = jnp.where(small_sig, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (s - 1.0) / sig_safe)

    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c = theta2 + sigma * sigma
    c_safe = jnp.where(small_th & small_sig, 1.0, c)

    A_small_th = jnp.where(
        small_sig, 0.5 + sigma / 3.0, ((sigma - 1.0) * s + 1.0) / (sig_safe * sig_safe)
    )
    A_generic = (a * sigma + (1.0 - b) * theta) / (th_safe * c_safe)
    A = jnp.where(small_th, A_small_th, A_generic)

    B_small_th = jnp.where(
        small_sig,
        1.0 / 6.0 + sigma / 8.0,
        (s * (sigma * sigma / 2.0 - sigma + 1.0) - 1.0) / (sig_safe ** 3),
    )
    B_generic = (C - ((b - 1.0) * sigma + a * theta) / c_safe) / th2_safe
    B = jnp.where(small_th, B_small_th, B_generic)

    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return C[..., None, None] * I + A[..., None, None] * K + B[..., None, None] * (K @ K)


def sim3_exp(xi):
    """xi = [rho, phi, sigma] (...,7) -> (R, t, s) with s = exp(sigma)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    W = _sim3_W(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return R, t, jnp.exp(sigma)


def sim3_log(R, t, s):
    phi = so3_log(R)
    sigma = jnp.log(s)
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def sim3_inverse(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t), s_inv


def sim3_mul(R1, t1, s1, R2, t2, s2):
    return (
        R1 @ R2,
        s1[..., None] * jnp.einsum("...ij,...j->...i", R1, t2) + t1,
        s1 * s2,
    )


def sim3_apply(R, t, s, p):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t


# ---------------------------------------------------------------------------
# Quaternion helpers (wxyz) for compact storage / trajectory export
# ---------------------------------------------------------------------------

def rot_to_quat(R):
    """(...,3,3) -> (...,4) wxyz, using Shepperd's method (branch-safe)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4.0 * jnp.maximum(qw0, _EPS)),
                    (m02 - m20) / (4.0 * jnp.maximum(qw0, _EPS)),
                    (m10 - m01) / (4.0 * jnp.maximum(qw0, _EPS))], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4.0 * jnp.maximum(qx1, _EPS)), qx1,
                    (m01 + m10) / (4.0 * jnp.maximum(qx1, _EPS)),
                    (m02 + m20) / (4.0 * jnp.maximum(qx1, _EPS))], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4.0 * jnp.maximum(qy2, _EPS)),
                    (m01 + m10) / (4.0 * jnp.maximum(qy2, _EPS)), qy2,
                    (m12 + m21) / (4.0 * jnp.maximum(qy2, _EPS))], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4.0 * jnp.maximum(qz3, _EPS)),
                    (m02 + m20) / (4.0 * jnp.maximum(qz3, _EPS)),
                    (m12 + m21) / (4.0 * jnp.maximum(qz3, _EPS)), qz3], axis=-1)

    # choose branch by largest pivot
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    k = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (...,4,4)
    q = jnp.take_along_axis(qs, k[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rot(q):
    """(...,4) wxyz -> (...,3,3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def normalize_rotation(R):
    """Project a near-rotation matrix back onto SO(3) via SVD
    (mirrors IMU::NormalizeRotation, reference src/ImuTypes.cc)."""
    U, _, Vt = jnp.linalg.svd(R)
    Rn = U @ Vt
    # fix improper rotation (det = -1)
    det = jnp.linalg.det(Rn)
    U = U.at[..., :, -1].multiply(jnp.sign(det)[..., None])
    return U @ Vt


def orthonormalize(R):
    """Cheap SO(3) re-projection via quaternion roundtrip (no SVD).

    LOAD-BEARING for f32 matrix-form poses: rotation products leak
    non-orthonormality (det != 1) at ~1e-7 per compose, and the tracking
    loop's velocity model R_v = R_cur R_last^T re-INJECTS each frame's
    defect multiplicatively — measured det growth x2.4 per frame until
    the scene visibly inflates and tracking collapses. Tangent-space
    retractions (exp(xi) R) cannot remove the defect (exp(xi) is
    orthonormal), so every retraction/composition site must renormalize.
    g2o/Sophus avoid this by storing quaternions; we store matrices for
    the MXU and pay one quat roundtrip instead."""
    return quat_to_rot(rot_to_quat(R))

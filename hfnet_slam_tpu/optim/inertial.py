"""Visual-inertial optimizers: IMU initialization and VI pose tracking.

Replaces the reference's inertial g2o problems (/root/reference/src/
Optimizer.cc): `InertialOptimization` x3 (:3042/:3227/:3389 — poses fixed,
optimize velocities + biases + gravity direction VertexGDir + scale
VertexScale, 200 its) and the pose-only VI trackers
`PoseInertialOptimizationLastKeyFrame` (:4491) / `...LastFrame` (:4875 —
visual reprojection + EdgeInertial + bias random walk + marginalized
prior ConstraintPoseImu).

TPU design: each problem is one jitted Gauss-Newton loop whose residual
stack is built by autodiff (jax.jacfwd) instead of G2oTypes' hand-written
Jacobians; parameter counts are tiny (9 + 3K for init, 15 for tracking) so
the dense normal equations solve in registers-scale time and the cost is
dominated by the vmapped residual evaluation, which is MXU/VPU friendly.

State convention: body pose (R_wb, p_wb), world velocity v_w, biases
(bg, ba). Camera pose derives via the body->camera extrinsic T_bc
(camera-in-body), matching the reference's ImuCamPose (G2oTypes.h:74).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import lie
from ..geometry import cameras, imu


def body_to_cam(R_wb, p_wb, Tbc_R, Tbc_t):
    """World->camera (R_cw, t_cw) from a body state and T_bc
    (camera-in-body): x_c = R_bc^T (R_wb^T (x_w - p_wb) - t_bc)."""
    R_cb = Tbc_R.T
    R_cw = R_cb @ R_wb.T
    t_cw = -R_cw @ p_wb - R_cb @ Tbc_t
    return R_cw, t_cw


# ---------------------------------------------------------------------------
# IMU initialization (InertialOptimization analogue)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def inertial_init(
    R_wb,       # (K,3,3) body rotations from visual SLAM (fixed)
    p_wb,       # (K,3) body positions (up-to-scale for monocular)
    pre: imu.Preintegrated,  # batched (K-1,...) per consecutive pair
    prior_g: float = 1e2,
    prior_a: float = 1e10,
    n_iters: int = 40,
    fix_scale: bool = False,
):
    """Solve gravity direction, scale, shared biases and per-KF velocities
    with poses fixed (LocalMapping::InitializeIMU -> InertialOptimization,
    Optimizer.cc:3042; priors (1e2,1e10) per LocalMapping.cc:200-275).

    Parameter vector x = [theta_g(2), log_s(1), bg(3), ba(3), v(3K)].
    Returns dict(Rwg, scale, bg, ba, v, cost).
    """
    K = R_wb.shape[0]
    nP = 9 + 3 * K
    info9 = jax.vmap(imu.information_9)(pre)  # (K-1,9,9)

    def unpack(x):
        theta = jnp.concatenate([x[:2], jnp.zeros(1)])  # gravity dir: 2 dof
        Rwg = lie.so3_exp(theta)
        s = jnp.where(fix_scale, 1.0, jnp.exp(x[2]))
        bg = x[3:6]
        ba = x[6:9]
        v = x[9:].reshape(K, 3)
        return Rwg, s, bg, ba, v

    def residuals(x):
        Rwg, s, bg, ba, v = unpack(x)
        g = Rwg @ imu.GRAVITY_VEC

        def pair(i):
            pr = jax.tree.map(lambda a: a[i], pre)
            t = pr.dT
            R1, R2 = R_wb[i], R_wb[i + 1]
            p1, p2 = s * p_wb[i], s * p_wb[i + 1]
            v1, v2 = v[i], v[i + 1]
            dR = imu.delta_rotation(pr, bg)
            dV = imu.delta_velocity(pr, bg, ba)
            dP = imu.delta_position(pr, bg, ba)
            eR = lie.so3_log(dR.T @ R1.T @ R2)
            eV = R1.T @ (v2 - v1 - g * t) - dV
            eP = R1.T @ (p2 - p1 - v1 * t - 0.5 * g * t * t) - dP
            r = jnp.concatenate([eR, eV, eP])
            # whiten with the preintegration information
            L = jnp.linalg.cholesky(info9[i] + 1e-9 * jnp.eye(9))
            return L.T @ r

        r_in = jax.vmap(pair)(jnp.arange(K - 1)).reshape(-1)
        r_pri = jnp.concatenate([
            jnp.sqrt(prior_g) * (x[3:6]),
            jnp.sqrt(prior_a) * (x[6:9]),
        ])
        return jnp.concatenate([r_in, r_pri])

    def gn_step(carry, _):
        x, lam = carry
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        H = J.T @ J
        b = J.T @ r
        H = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(nP)
        dx = -jnp.linalg.solve(H, b)
        x_new = x + dx
        ok = (jnp.sum(residuals(x_new) ** 2) < jnp.sum(r**2)) & jnp.all(jnp.isfinite(dx))
        x = jnp.where(ok, x_new, x)
        lam = jnp.where(ok, lam * 0.5, lam * 4.0)
        return (x, lam), jnp.sum(r**2)

    # ---- closed-form linear alignment seed --------------------------------
    # The GN from a cold start (s=1) diverges when the true visual->metric
    # scale is large (log_s overshoots into a dead basin). eV and eP are
    # LINEAR in (s, g, v) at zero bias — the classic monocular VI alignment
    # (Martinelli / VINS-Mono initialization) — so solve that least-squares
    # problem first and start the GN from its solution.
    #   eV_i: R1^T v2 - R1^T v1 - t R1^T g            = dV_i
    #   eP_i: s R1^T (p2-p1) - t R1^T v1 - t^2/2 R1^T g = dP_i
    # unknowns u = [s, g(3), v(3K)].
    def lin_rows(i):
        pr = jax.tree.map(lambda a: a[i], pre)
        t = pr.dT
        R1t = R_wb[i].T
        dV = imu.delta_velocity(pr, jnp.zeros(3), jnp.zeros(3))
        dP = imu.delta_position(pr, jnp.zeros(3), jnp.zeros(3))
        A = jnp.zeros((6, 4 + 3 * K))
        # eV row block
        A = A.at[:3, 1:4].set(-t * R1t)
        A = jax.lax.dynamic_update_slice(A, -R1t, (0, 4 + 3 * i))
        A = jax.lax.dynamic_update_slice(A, R1t, (0, 7 + 3 * i))
        # eP row block
        A = A.at[3:, 0].set(R1t @ (p_wb[i + 1] - p_wb[i]))
        A = A.at[3:, 1:4].set(-0.5 * t * t * R1t)
        A = jax.lax.dynamic_update_slice(A, -t * R1t, (3, 4 + 3 * i))
        b = jnp.concatenate([dV, dP])
        return A, b

    A_all, b_all = jax.vmap(lin_rows)(jnp.arange(K - 1))
    A_all = A_all.reshape(-1, 4 + 3 * K)
    b_all = b_all.reshape(-1)
    if fix_scale:  # static: s pinned at 1, move its column to the rhs
        u, _, _, _ = jnp.linalg.lstsq(A_all[:, 1:], b_all - A_all[:, 0])
        s_lin = jnp.asarray(1.0)
        g_lin = u[0:3]
        v_lin = u[3:].reshape(K, 3)
    else:
        u, _, _, _ = jnp.linalg.lstsq(A_all, b_all)
        s_lin = jnp.clip(jnp.abs(u[0]), 1e-3, 1e4)
        g_lin = u[1:4]
        v_lin = u[4:].reshape(K, 3)
    # gravity direction -> minimal 2-dof rotation from GRAVITY_VEC
    g_hat = g_lin / jnp.maximum(jnp.linalg.norm(g_lin), 1e-9)
    e_z = imu.GRAVITY_VEC / imu.GRAVITY
    axis = jnp.cross(e_z, g_hat)
    sin_a = jnp.linalg.norm(axis)
    cos_a = jnp.dot(e_z, g_hat)
    theta = axis / jnp.maximum(sin_a, 1e-9) * jnp.arctan2(sin_a, cos_a)

    x0 = jnp.zeros(nP)
    x0 = x0.at[:2].set(theta[:2])
    x0 = x0.at[2].set(jnp.where(fix_scale, 0.0, jnp.log(s_lin)))
    x0 = x0.at[9:].set(v_lin.reshape(-1))
    (x, _), costs = jax.lax.scan(gn_step, (x0, jnp.asarray(1e-2)), None, length=n_iters)
    Rwg, s, bg, ba, v = unpack(x)
    return {"Rwg": Rwg, "scale": s, "bg": bg, "ba": ba, "v": v, "cost": costs}


# ---------------------------------------------------------------------------
# VI pose tracking (PoseInertialOptimizationLast{Frame,KeyFrame} analogue)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cam_kind", "n_rounds", "n_iters"))
def pose_inertial_optimize(
    cam_kind, cam_params,
    Tbc_R, Tbc_t,
    # previous (anchor) state — fixed, like the reference's last KF / the
    # marginalized last frame
    R1, p1, v1, bg1, ba1,
    pre: imu.Preintegrated,
    # current-state initial guess
    R2, p2, v2,
    # visual observations of the current frame (fixed landmarks)
    points_w, uv, inv_sigma2, valid,
    chi2_mono: float = 5.991,
    # prior from previous marginalization (ConstraintPoseImu), 15x15 info
    # over [dphi dp dv dbg dba] or None
    prior_info=None,
    prior_state=None,  # (R, p, v, bg, ba) tuple the prior anchors to
    n_rounds: int = 4,
    n_iters: int = 10,
):
    """Optimize the current frame's 15-d state [R_wb p_wb v bg ba] with
    monocular reprojection + one inertial edge + bias random walk
    (Optimizer.cc:4491/:4875; 4 rounds of chi2 re-classification like
    PoseOptimization). Returns dict(R, p, v, bg, ba, inlier, n_inliers)."""
    info9 = imu.information_9(pre)
    L9 = jnp.linalg.cholesky(info9 + 1e-9 * jnp.eye(9)).T
    # bias random walk information from the walk covariance accumulated
    # over the interval (EdgeGyroRW/EdgeAccRW use C[9:12]/C[12:15])
    Cg = pre.C[9:12, 9:12] + 1e-12 * jnp.eye(3)
    Ca = pre.C[12:15, 12:15] + 1e-12 * jnp.eye(3)
    Lg = jnp.linalg.cholesky(jnp.linalg.inv(Cg)).T
    La = jnp.linalg.cholesky(jnp.linalg.inv(Ca)).T

    def state_of(x, R0, p0, v0, bg0, ba0):
        R = R0 @ lie.so3_exp(x[:3])
        p = p0 + x[3:6]
        v = v0 + x[6:9]
        bg = bg0 + x[9:12]
        ba = ba0 + x[12:15]
        return R, p, v, bg, ba

    def visual_residuals(R, p):
        R_cw, t_cw = body_to_cam(R, p, Tbc_R, Tbc_t)
        pc = points_w @ R_cw.T + t_cw
        uvp = cameras.project(cam_kind, cam_params, pc)
        return uvp - uv, pc[:, 2]

    def gn_round(carry, robust):
        R0, p0, v0, bg0, ba0, inlier = carry

        def full_residual(x):
            R, p, v, bg, ba = state_of(x, R0, p0, v0, bg0, ba0)
            r_i = L9 @ imu.inertial_residual(R1, p1, v1, bg, ba, R, p, v, pre)
            r_bg = Lg @ (bg - bg1)
            r_ba = La @ (ba - ba1)
            parts = [r_i, r_bg, r_ba]
            if prior_info is not None:
                Rp, pp, vp, bgp, bap = prior_state
                dx = jnp.concatenate([
                    lie.so3_log(Rp.T @ R), p - pp, v - vp, bg - bgp, ba - bap
                ])
                Lp = jnp.linalg.cholesky(prior_info + 1e-9 * jnp.eye(15)).T
                parts.append(Lp @ dx)
            return jnp.concatenate(parts)

        def gn_step(st, _):
            x, lam = st
            R, p, v, bg, ba = state_of(x, R0, p0, v0, bg0, ba0)
            e, depth = visual_residuals(R, p)
            chi2 = jnp.sum(e * e, -1) * inv_sigma2
            w_h = jnp.where(robust, jnp.where(
                chi2 <= chi2_mono, 1.0,
                jnp.sqrt(chi2_mono / jnp.maximum(chi2, 1e-12))), 1.0)
            w = w_h * inv_sigma2 * inlier * (depth > 0)

            def vis_flat(x_):
                R_, p_, _, _, _ = state_of(x_, R0, p0, v0, bg0, ba0)
                e_, _ = visual_residuals(R_, p_)
                return e_.reshape(-1)

            Jv = jax.jacfwd(vis_flat)(x)           # (2N,15)
            rv = e.reshape(-1)
            wv = jnp.repeat(w, 2)
            Jo = jax.jacfwd(full_residual)(x)       # (M,15)
            ro = full_residual(x)
            H = Jv.T @ (Jv * wv[:, None]) + Jo.T @ Jo
            b = Jv.T @ (rv * wv) + Jo.T @ ro
            H = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(15)
            dx = -jnp.linalg.solve(H, b)
            x_new = x + dx

            # acceptance on total robust cost
            def cost(x_):
                R_, p_, _, _, _ = state_of(x_, R0, p0, v0, bg0, ba0)
                e_, d_ = visual_residuals(R_, p_)
                c = jnp.sum(e_ * e_, -1) * inv_sigma2
                rob = jnp.minimum(c, chi2_mono + jnp.sqrt(
                    chi2_mono * jnp.maximum(c - chi2_mono, 0.0)))
                return jnp.sum(rob * inlier * (d_ > 0)) + jnp.sum(full_residual(x_) ** 2)

            ok = (cost(x_new) < cost(x)) & jnp.all(jnp.isfinite(dx))
            x = jnp.where(ok, x_new, x)
            lam = jnp.where(ok, lam * 0.5, lam * 4.0)
            return (x, lam), None

        (x, _), _ = jax.lax.scan(
            gn_step, (jnp.zeros(15), jnp.asarray(1e-4)), None, length=n_iters
        )
        R, p, v, bg, ba = state_of(x, R0, p0, v0, bg0, ba0)
        e, depth = visual_residuals(R, p)
        chi2 = jnp.sum(e * e, -1) * inv_sigma2
        inlier = (valid & (chi2 <= chi2_mono) & (depth > 0)).astype(jnp.float32)
        return (R, p, v, bg, ba, inlier), None

    carry = (R2, p2, v2, bg1, ba1, valid.astype(jnp.float32))
    for rnd in range(n_rounds):
        carry, _ = gn_round(carry, jnp.asarray(rnd < 2))
    R, p, v, bg, ba, inl = carry
    R = lie.orthonormalize(R)  # keep frame-to-frame composition on SO(3)
    inlier = inl > 0

    # posterior 15x15 information of the optimized state (visual +
    # inertial + bias-RW, evaluated at the optimum): seeds the LastFrame
    # marginal-prior chain (ConstraintPoseImu, Optimizer.cc:2960)
    def vis_x(x_):
        R_, p_, _, _, _ = state_of(x_, R, p, v, bg, ba)
        e_, _ = visual_residuals(R_, p_)
        return e_.reshape(-1)

    def oth_x(x_):
        R_, p_, v_, bg_, ba_ = state_of(x_, R, p, v, bg, ba)
        r_i = L9 @ imu.inertial_residual(R1, p1, v1, bg_, ba_, R_, p_, v_, pre)
        return jnp.concatenate([r_i, Lg @ (bg_ - bg1), La @ (ba_ - ba1)])

    z15 = jnp.zeros(15)
    _, depth = visual_residuals(R, p)
    w_post = inv_sigma2 * inl * (depth > 0)
    Jv = jax.jacfwd(vis_x)(z15)
    Jo = jax.jacfwd(oth_x)(z15)
    H = Jv.T @ (Jv * jnp.repeat(w_post, 2)[:, None]) + Jo.T @ Jo
    H = 0.5 * (H + H.T)
    return {"R": R, "p": p, "v": v, "bg": bg, "ba": ba,
            "inlier": inlier, "n_inliers": jnp.sum(inlier), "H": H}


@partial(jax.jit, static_argnames=("cam_kind", "n_rounds", "n_iters"))
def pose_inertial_optimize_marg(
    cam_kind, cam_params,
    Tbc_R, Tbc_t,
    # previous frame state — SOFT-anchored by its 15x15 marginal prior
    R1, p1, v1, bg1, ba1,
    prior_info,
    pre: imu.Preintegrated,
    # current-state initial guess
    R2, p2, v2,
    points_w, uv, inv_sigma2, valid,
    chi2_mono: float = 5.991,
    n_rounds: int = 4,
    n_iters: int = 8,
):
    """PoseInertialOptimizationLastFrame WITH the marginalized prior
    (Optimizer.cc:4875 + Marginalize :2960): the previous and current
    frame states optimize JOINTLY (30 dof) — the previous one held by the
    15x15 information carried from its own solve instead of being frozen —
    and the previous state is then marginalized out of the joint Hessian,
    producing the next frame's prior. This is how inter-keyframe visual-
    inertial information chains across frames in the reference.

    Returns dict(R, p, v, bg, ba, inlier, n_inliers, prior_info_out)."""
    info9 = imu.information_9(pre)
    L9 = jnp.linalg.cholesky(info9 + 1e-9 * jnp.eye(9)).T
    Cg = pre.C[9:12, 9:12] + 1e-12 * jnp.eye(3)
    Ca = pre.C[12:15, 12:15] + 1e-12 * jnp.eye(3)
    Lg = jnp.linalg.cholesky(jnp.linalg.inv(Cg)).T
    La = jnp.linalg.cholesky(jnp.linalg.inv(Ca)).T
    Lp = jnp.linalg.cholesky(prior_info + 1e-6 * jnp.eye(15)).T

    def state_of(dx, R0, p0, v0, bg0, ba0):
        R = R0 @ lie.so3_exp(dx[:3])
        return (R, p0 + dx[3:6], v0 + dx[6:9], bg0 + dx[9:12],
                ba0 + dx[12:15])

    def both(x):
        s1 = state_of(x[:15], R1, p1, v1, bg1, ba1)
        s2 = state_of(x[15:], R2, p2, v2, bg1, ba1)
        return s1, s2

    def visual_residuals(R, p):
        R_cw, t_cw = body_to_cam(R, p, Tbc_R, Tbc_t)
        pc = points_w @ R_cw.T + t_cw
        uvp = cameras.project(cam_kind, cam_params, pc)
        return uvp - uv, pc[:, 2]

    def oth_x(x):
        (Ra, pa, va, bga, baa), (Rb, pb, vb, bgb, bab) = both(x)
        r_i = L9 @ imu.inertial_residual(Ra, pa, va, bgb, bab,
                                         Rb, pb, vb, pre)
        r_bg = Lg @ (bgb - bga)
        r_ba = La @ (bab - baa)
        r_pri = Lp @ x[:15]  # the prior anchors AT the passed-in state
        return jnp.concatenate([r_i, r_bg, r_ba, r_pri])

    def vis_x(x):
        _, (Rb, pb, _, _, _) = both(x)
        e, _ = visual_residuals(Rb, pb)
        return e.reshape(-1)

    def gn_round(carry, robust):
        x0, inlier = carry

        def gn_step(st, _):
            x, lam = st
            _, (Rb, pb, _, _, _) = both(x)
            e, depth = visual_residuals(Rb, pb)
            chi2 = jnp.sum(e * e, -1) * inv_sigma2
            w_h = jnp.where(robust, jnp.where(
                chi2 <= chi2_mono, 1.0,
                jnp.sqrt(chi2_mono / jnp.maximum(chi2, 1e-12))), 1.0)
            w = w_h * inv_sigma2 * inlier * (depth > 0)
            Jv = jax.jacfwd(vis_x)(x)
            rv = vis_x(x)
            wv = jnp.repeat(w, 2)
            Jo = jax.jacfwd(oth_x)(x)
            ro = oth_x(x)
            H = Jv.T @ (Jv * wv[:, None]) + Jo.T @ Jo
            b = Jv.T @ (rv * wv) + Jo.T @ ro
            H = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(30)
            dx = -jnp.linalg.solve(H, b)
            x_new = x + dx

            def cost(x_):
                _, (R_, p_, _, _, _) = both(x_)
                e_, d_ = visual_residuals(R_, p_)
                c = jnp.sum(e_ * e_, -1) * inv_sigma2
                rob = jnp.minimum(c, chi2_mono + jnp.sqrt(
                    chi2_mono * jnp.maximum(c - chi2_mono, 0.0)))
                return (jnp.sum(rob * inlier * (d_ > 0))
                        + jnp.sum(oth_x(x_) ** 2))

            ok = (cost(x_new) < cost(x)) & jnp.all(jnp.isfinite(dx))
            x = jnp.where(ok, x_new, x)
            lam = jnp.where(ok, lam * 0.5, lam * 4.0)
            return (x, lam), None

        (x, _), _ = jax.lax.scan(
            gn_step, (x0, jnp.asarray(1e-4)), None, length=n_iters)
        _, (Rb, pb, _, _, _) = both(x)
        e, depth = visual_residuals(Rb, pb)
        chi2 = jnp.sum(e * e, -1) * inv_sigma2
        inlier = (valid & (chi2 <= chi2_mono) & (depth > 0)).astype(jnp.float32)
        return (x, inlier), None

    carry = (jnp.zeros(30), valid.astype(jnp.float32))
    for rnd in range(n_rounds):
        carry, _ = gn_round(carry, jnp.asarray(rnd < 2))
    x, inl = carry
    _, (R, p, v, bg, ba) = both(x)
    R = lie.orthonormalize(R)

    # joint Hessian at the optimum -> marginalize the previous state:
    # prior_out = H22 - H21 H11^{-1} H12 (Optimizer.cc:2960 Marginalize)
    _, depth = visual_residuals(R, p)
    w_post = inv_sigma2 * inl * (depth > 0)
    Jv = jax.jacfwd(vis_x)(x)
    Jo = jax.jacfwd(oth_x)(x)
    H = Jv.T @ (Jv * jnp.repeat(w_post, 2)[:, None]) + Jo.T @ Jo
    H = 0.5 * (H + H.T)
    H11 = H[:15, :15] + 1e-6 * jnp.eye(15)
    H12 = H[:15, 15:]
    H22 = H[15:, 15:]
    prior_out = H22 - H12.T @ jnp.linalg.solve(H11, H12)
    prior_out = 0.5 * (prior_out + prior_out.T)

    inlier = inl > 0
    return {"R": R, "p": p, "v": v, "bg": bg, "ba": ba,
            "inlier": inlier, "n_inliers": jnp.sum(inlier),
            "prior_info_out": prior_out}

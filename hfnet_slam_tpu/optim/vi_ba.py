"""Joint visual-inertial bundle adjustment (15-d states + landmarks).

Replaces the reference's two big inertial g2o problems
(/root/reference/src/Optimizer.cc): `FullInertialBA` (:392 — BlockSolverX,
LM, every KF carries VertexPose + VertexVelocity + per-KF bias vertices,
EdgeInertial between consecutive chain KFs, EdgeGyroRW/EdgeAccRW chaining
the biases, optional EdgePriorGyro/EdgePriorAcc on the first KF, monocular
and stereo reprojection edges with Huber) and `LocalInertialBA` (:2383 —
the same factors over a temporal window of Nd=10 (25 "bLarge") opt KFs
with up to 200 fixed anchors).

TPU design (mirrors optim/ba.py and shares its conventions):
  * One fixed-shape problem: K keyframes x 15-d tangent [phi dp dv dbg dba]
    (body pose retraction R' = R Exp(phi), p' = p + dp), M landmarks x 3,
    E visual edges, L inertial links — all padded with validity masks.
  * Landmarks are Schur-eliminated exactly as in optim/ba.py; the visual
    coupling only touches the 6 pose rows of each 15-d block, so the
    reduced camera system S is a dense (K,15,K,15) tensor whose pose-pose
    corner takes the Schur correction and whose (i,j) off-diagonal blocks
    take the inertial edge Hessians — the role g2o's sparse block solver
    plays, but as two batched matmuls + scatter-adds on the MXU.
  * Per-edge Jacobians come from forward-mode autodiff of the residuals
    (9 inputs for a visual edge, 30 for an inertial link) instead of
    G2oTypes' hand-written Jacobians; at these widths jacfwd is a handful
    of fused primal evaluations and XLA keeps it on-chip.

State convention matches optim/inertial.py: body pose (R_wb, p_wb), world
velocity v, biases (bg, ba); camera pose derives via the body->camera
extrinsic T_bc (ImuCamPose, reference include/G2oTypes.h:74). The inertial
residual is whitened per-link with the preintegration information
(EdgeInertial's SetInformation), bias random walks with the walk covariance
accumulated over the link (EdgeGyroRW/EdgeAccRW use C[9:12]/C[12:15]).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from ..geometry import cameras, imu
from . import factors


class VIBAProblem(NamedTuple):
    """Fixed-shape VI-BA problem. K keyframes, M points, E visual edges,
    L inertial links (padded)."""

    # keyframe body states
    R_wb: jnp.ndarray     # (K,3,3)
    p_wb: jnp.ndarray     # (K,3)
    v: jnp.ndarray        # (K,3)
    bg: jnp.ndarray       # (K,3)
    ba: jnp.ndarray       # (K,3)
    fixed: jnp.ndarray    # (K,) bool — full 15-d state frozen
    # (K,) bool — only the 6-d pose is frozen, velocity/biases stay free
    # (the gauge anchor of FullInertialBA: the map origin KF keeps its pose
    # but still participates in the bias chain)
    fix_pose_only: jnp.ndarray
    # landmarks
    points: jnp.ndarray   # (M,3)
    # body->camera extrinsic
    Tbc_R: jnp.ndarray    # (3,3)
    Tbc_t: jnp.ndarray    # (3,)
    # visual edges
    kf_idx: jnp.ndarray   # (E,) int32
    pt_idx: jnp.ndarray   # (E,) int32
    uv: jnp.ndarray       # (E,2)
    inv_sigma2: jnp.ndarray  # (E,)
    valid: jnp.ndarray    # (E,) bool
    z_meas: jnp.ndarray   # (E,) measured depth (0 = mono edge)
    wz: jnp.ndarray       # (E,) depth-row weight bf/z^2 (0 = mono)
    # inertial links between chain keyframes
    li: jnp.ndarray       # (L,) int32 — earlier KF
    lj: jnp.ndarray       # (L,) int32 — later KF
    pre: imu.Preintegrated  # batched (L,...)
    lvalid: jnp.ndarray   # (L,) bool
    # prior pulling KF 0's biases toward their current estimate
    # (EdgePriorGyro/EdgePriorAcc on the first KF, Optimizer.cc:471-489)
    prior_g: jnp.ndarray  # scalar weight
    prior_a: jnp.ndarray  # scalar weight


def _body_to_cam(R_wb, p_wb, Tbc_R, Tbc_t):
    R_cb = Tbc_R.T
    R_cw = R_cb @ R_wb.T
    t_cw = -R_cw @ p_wb - R_cb @ Tbc_t
    return R_cw, t_cw


def _link_whiteners(prob: VIBAProblem):
    """Per-link 9-d inertial whitener and 3-d bias-RW whiteners, zeroed
    for invalid (padding) links so they contribute nothing."""

    def one(pre_C, lv):
        C9 = 0.5 * (pre_C[:9, :9] + pre_C[:9, :9].T) + 1e-9 * jnp.eye(9)
        L9 = jnp.linalg.cholesky(jnp.linalg.inv(C9)).T
        Cg = pre_C[9:12, 9:12] + 1e-10 * jnp.eye(3)
        Ca = pre_C[12:15, 12:15] + 1e-10 * jnp.eye(3)
        Lg = jnp.linalg.cholesky(jnp.linalg.inv(Cg)).T
        La = jnp.linalg.cholesky(jnp.linalg.inv(Ca)).T
        z = jnp.where(lv, 1.0, 0.0)
        return L9 * z, Lg * z, La * z

    return jax.vmap(one)(prob.pre.C, prob.lvalid)


def _link_residual(prob: VIBAProblem, L9, Lg, La, l, x30):
    """15-d whitened residual of link l as a function of the 30-d tangent
    [xi_i(15), xi_j(15)] around the current states."""
    i, j = prob.li[l], prob.lj[l]
    xi, xj = x30[:15], x30[15:]
    Ri = prob.R_wb[i] @ lie.so3_exp(xi[:3])
    pi = prob.p_wb[i] + xi[3:6]
    vi = prob.v[i] + xi[6:9]
    bgi = prob.bg[i] + xi[9:12]
    bai = prob.ba[i] + xi[12:15]
    Rj = prob.R_wb[j] @ lie.so3_exp(xj[:3])
    pj = prob.p_wb[j] + xj[3:6]
    vj = prob.v[j] + xj[6:9]
    bgj = prob.bg[j] + xj[9:12]
    baj = prob.ba[j] + xj[12:15]
    pre_l = jax.tree.map(lambda a: a[l], prob.pre)
    r9 = L9[l] @ imu.inertial_residual(Ri, pi, vi, bgi, bai, Rj, pj, vj, pre_l)
    rbg = Lg[l] @ (bgj - bgi)
    rba = La[l] @ (baj - bai)
    return jnp.concatenate([r9, rbg, rba])


def _vis_residual(cam_kind, cam_params, prob: VIBAProblem, e, x9):
    """3-row visual residual of edge e as a function of the 9-d tangent
    [phi(3) dp(3) dpt(3)]. Returns (r, depth)."""
    k, m = prob.kf_idx[e], prob.pt_idx[e]
    R = prob.R_wb[k] @ lie.so3_exp(x9[:3])
    p = prob.p_wb[k] + x9[3:6]
    R_cw, t_cw = _body_to_cam(R, p, prob.Tbc_R, prob.Tbc_t)
    r, _, _, depth = factors.reproj_depth_residual(
        cam_kind, cam_params, R_cw, t_cw, prob.points[m] + x9[6:9],
        prob.uv[e], prob.z_meas[e], prob.wz[e],
    )
    return r, depth


def _states_replace(prob, R, p, v, bg, ba, pts):
    return prob._replace(R_wb=R, p_wb=p, v=v, bg=bg, ba=ba, points=pts)


@partial(jax.jit, static_argnames=("cam_kind", "n_iters", "robust"))
def vi_ba_iterate(cam_kind, cam_params, prob: VIBAProblem,
                  n_iters: int, robust: bool, chi2_mono: float):
    """Run n_iters of LM on the joint VI problem. Returns (prob', costs)."""
    K = prob.R_wb.shape[0]
    M = prob.points.shape[0]
    E = prob.uv.shape[0]
    L = prob.li.shape[0]
    D = 15
    L9, Lg, La = _link_whiteners(prob)
    delta2 = jnp.where(prob.wz > 0, factors.CHI2_STEREO, chi2_mono)
    z9 = jnp.zeros(9)
    z30 = jnp.zeros(30)
    max_step = jnp.asarray(0.5, prob.p_wb.dtype)

    def _vis_costs(p2: VIBAProblem):
        r, depth = jax.vmap(lambda e: _vis_residual(cam_kind, cam_params, p2, e, z9))(
            jnp.arange(E))
        chi2 = jnp.sum(r * r, -1) * p2.inv_sigma2
        m = p2.valid * (depth > 0)
        huber = jnp.where(chi2 <= delta2, chi2,
                          2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2)
        return (huber if robust else chi2) * m

    def _link_res(p2: VIBAProblem):
        return jax.vmap(lambda l: _link_residual(p2, L9, Lg, La, l, z30))(
            jnp.arange(L))

    def edge_costs(p2: VIBAProblem):
        """Per-term robust costs (visual per-edge + inertial per-link) —
        for MONITORING totals only (accept/reject uses cost_diff)."""
        rl = _link_res(p2)
        cl = jnp.sum(rl * rl, -1) * p2.lvalid
        return jnp.concatenate([_vis_costs(p2), cl])

    def cost_diff(p_new: VIBAProblem, p_old: VIBAProblem):
        """Sum of per-term cost differences, f32-safe. Visual chi2 are
        O(1)-O(1e2): plain differences resolve. Whitened inertial chi2 are
        O(1e8) (the preintegration information over a 0.3 s link is huge),
        so chi2_new - chi2_old in f32 has O(10) noise PER LINK — enough to
        accept random-walk steps near convergence and drift a long chain
        by decimeters. (r_new-r_old)*(r_new+r_old) is algebraically the
        same difference but keeps the precision of r itself."""
        dv = jnp.sum(_vis_costs(p_new) - _vis_costs(p_old))
        rn = _link_res(p_new)
        ro = _link_res(p_old)
        dl = jnp.sum(jnp.sum((rn - ro) * (rn + ro), -1) * p_old.lvalid)
        return dv + dl

    def lm_step(carry, _):
        R, p, v, bg, ba, pts, lam = carry
        cur = _states_replace(prob, R, p, v, bg, ba, pts)

        # ---- visual part: residuals + autodiff Jacobians ----------------
        def vis_edge(e):
            f = lambda x: _vis_residual(cam_kind, cam_params, cur, e, x)[0]
            r, depth = _vis_residual(cam_kind, cam_params, cur, e, z9)
            J = jax.jacfwd(f)(z9)  # (3,9)
            return r, J[:, :6], J[:, 6:9], depth

        r, Jb, Jp, depth = jax.vmap(vis_edge)(jnp.arange(E))
        chi2 = jnp.sum(r * r, -1) * cur.inv_sigma2
        w = cur.inv_sigma2 * cur.valid * (depth > 0)
        if robust:
            w = w * factors.huber_weight(chi2, delta2)

        JbW = Jb * w[:, None, None]
        Hbb = jax.ops.segment_sum(jnp.einsum("eri,erj->eij", JbW, Jb),
                                  cur.kf_idx, K)  # (K,6,6)
        bb = jax.ops.segment_sum(jnp.einsum("eri,er->ei", JbW, r), cur.kf_idx, K)
        JpW = Jp * w[:, None, None]
        Hpp = jax.ops.segment_sum(jnp.einsum("eri,erj->eij", JpW, Jp),
                                  cur.pt_idx, M)  # (M,3,3)
        bp = jax.ops.segment_sum(jnp.einsum("eri,er->ei", JpW, r), cur.pt_idx, M)
        Wcp = jax.ops.segment_sum(
            jnp.einsum("eri,erj->eij", JbW, Jp),
            cur.pt_idx * K + cur.kf_idx, M * K,
        ).reshape(M, K, 6, 3)

        # ---- inertial part ----------------------------------------------
        def in_link(l):
            f = lambda x: _link_residual(cur, L9, Lg, La, l, x)
            rl = f(z30)
            J = jax.jacfwd(f)(z30)  # (15,30)
            return rl, J

        rl, Jl = jax.vmap(in_link)(jnp.arange(L))
        Hl = jnp.einsum("lri,lrj->lij", Jl, Jl)   # (L,30,30)
        bl = jnp.einsum("lri,lr->li", Jl, rl)     # (L,30)

        # ---- assemble the reduced camera system S (K,15,K,15) -----------
        lam_eps = 1e-8
        Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + lam_eps)[..., None] * jnp.eye(3)
        Hpp_inv = jnp.linalg.inv(Hpp_d)
        WHinv = jnp.einsum("mkac,mcd->mkad", Wcp, Hpp_inv)       # (M,K,6,3)
        S_vis = -jnp.einsum("mkad,mled->kale", WHinv, Wcp)       # (K,6,K,6)

        S = jnp.zeros((K, D, K, D), cur.p_wb.dtype)
        S = S.at[:, :6, :, :6].add(S_vis)
        S = S.at[jnp.arange(K), :6, jnp.arange(K), :6].add(Hbb)
        # scatter inertial 30x30 blocks — group the two KF axes first:
        # (K,D,K,D) reshaped directly would interleave tangent and KF dims
        Sf = S.transpose(0, 2, 1, 3).reshape(K * K, D, D)
        ij = lambda a, b: a * K + b
        Sf = Sf.at[ij(prob.li, prob.li)].add(Hl[:, :15, :15])
        Sf = Sf.at[ij(prob.li, prob.lj)].add(Hl[:, :15, 15:])
        Sf = Sf.at[ij(prob.lj, prob.li)].add(Hl[:, 15:, :15])
        Sf = Sf.at[ij(prob.lj, prob.lj)].add(Hl[:, 15:, 15:])
        S = Sf.reshape(K, K, D, D).transpose(0, 2, 1, 3)
        # bias priors on KF 0 (centered at the current estimate, so they
        # only stiffen the system — matching a prior anchored at the
        # InertialOptimization output the reference passes in)
        S = S.at[0, 9:12, 0, 9:12].add(prob.prior_g * jnp.eye(3))
        S = S.at[0, 12:15, 0, 12:15].add(prob.prior_a * jnp.eye(3))

        rhs = jnp.zeros((K, D), cur.p_wb.dtype)
        rhs = rhs.at[:, :6].add(-bb + jnp.einsum("mkad,md->ka", WHinv, bp))
        rhs = rhs.at[prob.li].add(-bl[:, :15])
        rhs = rhs.at[prob.lj].add(-bl[:, 15:])

        # ---- damping, gauge, solve ---------------------------------------
        diag = jnp.einsum("kaka->ka", S)
        S = S + (lam * diag + lam_eps)[:, :, None, None] * \
            jnp.eye(D)[None, :, None, :] * jnp.eye(K)[:, None, :, None]
        # per-(KF, tangent-row) free mask: full freeze or pose-only freeze
        pose_rows = (jnp.arange(D) < 6)[None, :]
        free = ((~cur.fixed)[:, None] &
                ~(cur.fix_pose_only[:, None] & pose_rows)).astype(S.dtype)
        S = S * free[:, :, None, None] * free[None, None, :, :]
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
            jnp.eye(D)[None] * (1.0 - free)[:, :, None])
        rhs = rhs * free

        # Jacobi preconditioning: the inertial information (~1e9) and the
        # visual information (~1) give S a raw condition number beyond f32;
        # scaling rows/cols by d^-1/2 brings the solve back into range
        Sm = S.reshape(K * D, K * D)
        d = jnp.sqrt(jnp.maximum(jnp.diagonal(Sm), 1e-12))
        Sm = Sm / d[:, None] / d[None, :]
        b = rhs.reshape(K * D) / d
        y = jnp.linalg.solve(Sm, b)
        # one iterative-refinement step: at K ~ 100+ the scaled system's
        # f32 solve still loses ~3 digits; refining against the residual
        # recovers them for the price of a second solve
        y = y + jnp.linalg.solve(Sm, b - Sm @ y)
        dx = (y / d).reshape(K, D)
        dx = dx * free
        step = jnp.sqrt(jnp.sum(dx * dx, -1))
        dx = dx * jnp.minimum(1.0, max_step / jnp.maximum(jnp.max(step), 1e-12))

        # ---- back-substitute landmarks -----------------------------------
        Hpc_dc = jnp.einsum("mkac,ka->mc", Wcp, dx[:, :6])
        dp_pts = jnp.einsum("mcd,md->mc", Hpp_inv, -bp - Hpc_dc)
        pstep = jnp.sqrt(jnp.sum(dp_pts * dp_pts, -1))
        dp_pts = dp_pts * jnp.minimum(1.0, max_step / jnp.maximum(pstep, 1e-12))[:, None]

        R_new = jax.vmap(lambda Rk, d: Rk @ lie.so3_exp(d))(R, dx[:, :3])
        R_new = lie.orthonormalize(R_new).astype(R.dtype)
        p_new = p + dx[:, 3:6]
        v_new = v + dx[:, 6:9]
        bg_new = bg + dx[:, 9:12]
        ba_new = ba + dx[:, 12:15]
        pts_new = pts + dp_pts

        new = _states_replace(prob, R_new, p_new, v_new, bg_new, ba_new, pts_new)
        dcost = cost_diff(new, cur)
        c_new = jnp.sum(edge_costs(new))
        ok = (dcost < 0) & jnp.all(jnp.isfinite(dx)) & jnp.all(jnp.isfinite(dp_pts))
        pick = lambda a, b: jnp.where(ok, a, b)
        carry = (pick(R_new, R), pick(p_new, p), pick(v_new, v),
                 pick(bg_new, bg), pick(ba_new, ba), pick(pts_new, pts),
                 jnp.where(ok, jnp.maximum(lam * 0.33, 1e-5), jnp.minimum(lam * 4.0, 1e4)))
        return carry, c_new

    carry0 = (prob.R_wb, prob.p_wb, prob.v, prob.bg, prob.ba, prob.points,
              jnp.asarray(1e-3, prob.p_wb.dtype))
    (R, p, v, bg, ba, pts, _), costs = jax.lax.scan(lm_step, carry0, None,
                                                    length=n_iters)
    return _states_replace(prob, R, p, v, bg, ba, pts), costs


@partial(jax.jit, static_argnames=("cam_kind",))
def classify_visual_edges(cam_kind, cam_params, prob: VIBAProblem,
                          chi2_mono: float, base_valid):
    """Chi-square re-classification of visual edges (the erase loops at the
    end of Local/FullInertialBA, Optimizer.cc:700-780/:2840-2900)."""
    E = prob.uv.shape[0]
    z9 = jnp.zeros(9)
    r, depth = jax.vmap(lambda e: _vis_residual(cam_kind, cam_params, prob, e, z9))(
        jnp.arange(E))
    chi2 = jnp.sum(r * r, -1) * prob.inv_sigma2
    th = jnp.where(prob.wz > 0, factors.CHI2_STEREO, chi2_mono)
    return base_valid & (chi2 <= th) & (depth > 0)


def vi_bundle_adjust(cam_kind, cam_params, prob: VIBAProblem,
                     rounds=((5, True), (10, True)),
                     chi2_mono: float = factors.CHI2_MONO,
                     should_abort=None,
                     ):
    """LM rounds with visual-outlier re-classification between them — the
    VI counterpart of optim/ba.bundle_adjust.

    should_abort: polled between rounds (the detached inertial GBA's stop
    flag — mbStopGBA semantics, reference LoopClosing.cc:1123); on True
    the remaining rounds are skipped and the caller discards the result."""
    base_valid = prob.valid
    for n_iters, robust in rounds:
        if should_abort is not None and should_abort():
            break
        prob, _ = vi_ba_iterate(cam_kind, cam_params, prob, n_iters, robust,
                                chi2_mono)
        new_valid = classify_visual_edges(cam_kind, cam_params, prob,
                                          chi2_mono, base_valid)
        prob = prob._replace(valid=new_valid)
    return prob

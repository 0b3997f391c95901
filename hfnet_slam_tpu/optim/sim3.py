"""Sim(3) estimation: closed-form Horn alignment, vectorized RANSAC, and
bidirectional-reprojection Sim3 refinement.

Replaces the reference's Sim3Solver (/root/reference/src/Sim3Solver.cc,
include/Sim3Solver.h:37-61: Horn closed-form from 3 point pairs inside a
sequential RANSAC loop) and Optimizer::OptimizeSim3
(/root/reference/src/Optimizer.cc:2115: g2o VertexSim3Expmap with
bidirectional EdgeSim3ProjectXYZ / EdgeInverseSim3ProjectXYZ, chi2=10).

TPU design: instead of iterating hypotheses sequentially with an early
exit, ALL RANSAC hypotheses are evaluated in one batched computation —
3-point Horn solves are a vmapped closed form and inlier counting is a
batched matmul-free projection, so the full 750-hypothesis budget
(LoopClosing.cc:753-765 uses RANSAC(0.99, 40, 750)) costs one kernel
launch. The refinement is Gauss-Newton on the 7-d tangent with autodiff
Jacobians (JAX replaces g2o's hand-written Jacobians).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import lie
from ..geometry import cameras


# ---------------------------------------------------------------------------
# closed-form Horn alignment (Sim3Solver::ComputeSim3 analogue)
# ---------------------------------------------------------------------------

def horn_sim3(p1, p2, w=None, fix_scale: bool = False):
    """Closed-form Sim3 (R21, t21, s21) minimizing |p2 - s R p1 - t|^2.

    p1, p2: (N,3) corresponding points; w: optional (N,) weights.
    Returns (R, t, s) mapping frame-1 points into frame 2.
    """
    if w is None:
        w = jnp.ones(p1.shape[0], p1.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c1 = jnp.sum(p1 * w[:, None], axis=0) / wsum
    c2 = jnp.sum(p2 * w[:, None], axis=0) / wsum
    q1 = p1 - c1
    q2 = p2 - c2
    # cross-covariance; rotation via SVD (equivalent to Horn's quaternion
    # method used by Sim3Solver.cc, but batched-friendly)
    M = jnp.einsum("n,ni,nj->ij", w, q2, q1)
    U, _, Vt = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
    D = D.at[2, 2].set(d)
    R = U @ D @ Vt
    # scale: s = <q2, R q1> / |q1|^2 (asymmetric form, as in Sim3Solver)
    Rq1 = q1 @ R.T
    num = jnp.sum(w[:, None] * q2 * Rq1)
    den = jnp.maximum(jnp.sum(w[:, None] * q1 * q1), 1e-12)
    s = jnp.where(fix_scale, 1.0, num / den)
    t = c2 - s * (R @ c1)
    return R, t, s


# ---------------------------------------------------------------------------
# vectorized RANSAC (Sim3Solver::iterate analogue)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cam_kind", "n_hyps", "fix_scale"))
def sim3_ransac(
    cam_kind,
    cam_params,
    p1_c,          # (N,3) matched map points in camera-1 frame
    p2_c,          # (N,3) matched map points in camera-2 frame
    uv1,           # (N,2) pixel observation of pair i in image 1
    uv2,           # (N,2) pixel observation of pair i in image 2
    inv_sigma2_1,  # (N,)
    inv_sigma2_2,  # (N,)
    valid,         # (N,) bool
    key,
    n_hyps: int = 256,
    chi2_th: float = 9.21,
    fix_scale: bool = False,
):
    """Estimate S12 = (R12, t12, s12) from matched points with all RANSAC
    hypotheses batched. Inlier test = bidirectional reprojection chi2
    (Sim3Solver::CheckInliers): p2 mapped into camera 1 by S12 must
    reproject near uv1, and p1 mapped by S21 near uv2.

    Returns dict(R12, t12, s12, inliers (N,), n_inliers, ok).
    """
    N = p1_c.shape[0]
    nv = jnp.sum(valid)

    # sample 3 distinct valid indices per hypothesis: draw from the valid
    # set via gumbel-top-3 over masked uniform scores (fixed shapes)
    g = jax.random.gumbel(key, (n_hyps, N))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, picks = jax.lax.top_k(g, 3)  # (H,3)

    def one_hypothesis(idx):
        # horn_sim3(a, b) maps a->b; we want S12: frame-2 coords -> frame 1
        a1 = p1_c[idx]
        a2 = p2_c[idx]
        return horn_sim3(a2, a1, fix_scale=fix_scale)

    R_h, t_h, s_h = jax.vmap(one_hypothesis)(picks)  # (H,3,3),(H,3),(H,)

    def count_inliers(R12, t12, s12):
        # map p2 into camera 1: x1 = s12 R12 x2 + t12 (Sim3Solver convention:
        # S12 transforms coordinates of frame 2 into frame 1)
        p2_in1 = s12 * (p2_c @ R12.T) + t12
        p1_in2 = (p1_c - t12) @ R12 / jnp.maximum(s12, 1e-9)
        e1 = cameras.project(cam_kind, cam_params, p2_in1) - uv1
        e2 = cameras.project(cam_kind, cam_params, p1_in2) - uv2
        chi1 = jnp.sum(e1 * e1, axis=-1) * inv_sigma2_1
        chi2 = jnp.sum(e2 * e2, axis=-1) * inv_sigma2_2
        inl = valid & (chi1 < chi2_th) & (chi2 < chi2_th) \
            & (p2_in1[:, 2] > 0) & (p1_in2[:, 2] > 0)
        return inl

    inl_h = jax.vmap(count_inliers)(R_h, t_h, s_h)  # (H,N)
    counts = jnp.sum(inl_h, axis=1)
    # reject degenerate scales
    s_ok = (s_h > 0.1) & (s_h < 10.0)
    counts = jnp.where(s_ok, counts, -1)
    best = jnp.argmax(counts)

    inliers = inl_h[best]
    # refit on all inliers of the best hypothesis (cheap polish)
    R12, t12, s12 = horn_sim3(
        p2_c, p1_c, w=inliers.astype(p1_c.dtype), fix_scale=fix_scale
    )
    inliers2 = count_inliers(R12, t12, s12)
    use_refit = (
        (jnp.sum(inliers2) >= jnp.sum(inliers))
        & jnp.all(jnp.isfinite(t12)) & jnp.isfinite(s12)
        & (s12 > 0.1) & (s12 < 10.0)
    )
    R12 = jnp.where(use_refit, R12, R_h[best])
    t12 = jnp.where(use_refit, t12, t_h[best])
    s12 = jnp.where(use_refit, s12, s_h[best])
    inliers = jnp.where(use_refit, inliers2, inliers)

    return {
        "R12": R12,
        "t12": t12,
        "s12": s12,
        "inliers": inliers,
        "n_inliers": jnp.sum(inliers),
        "n_valid": nv,
    }


# ---------------------------------------------------------------------------
# Sim3 refinement (Optimizer::OptimizeSim3 analogue)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cam_kind", "n_iters", "fix_scale"))
def optimize_sim3(
    cam_kind,
    cam_params,
    R12, t12, s12,
    p1_c, p2_c, uv1, uv2,
    inv_sigma2_1, inv_sigma2_2, valid,
    chi2_th: float = 10.0,
    n_iters: int = 20,
    fix_scale: bool = False,
):
    """Gauss-Newton refinement of S12 over bidirectional reprojection
    residuals with Huber weights and a final chi2 inlier sweep
    (Optimizer.cc:2115-2380; th2=10 per LoopClosing.cc:864).

    Tangent ordering [rho, phi, sigma]; right-multiplicative retraction.
    Returns dict(R12, t12, s12, inliers, n_inliers).
    """

    def residuals(xi, R0, t0, s0):
        dR, dt, ds = lie.sim3_exp(xi)
        R, t, s = lie.sim3_mul(R0, t0, s0, dR, dt, ds)
        p2_in1 = s * (p2_c @ R.T) + t
        Ri, ti, si = lie.sim3_inverse(R, t, s)
        p1_in2 = si * (p1_c @ Ri.T) + ti
        e1 = cameras.project(cam_kind, cam_params, p2_in1) - uv1
        e2 = cameras.project(cam_kind, cam_params, p1_in2) - uv2
        return e1, e2, p2_in1[:, 2], p1_in2[:, 2]

    def chi2_of(e1, e2):
        return (jnp.sum(e1 * e1, -1) * inv_sigma2_1,
                jnp.sum(e2 * e2, -1) * inv_sigma2_2)

    def huber_w(chi2):
        return jnp.where(chi2 <= chi2_th, 1.0, jnp.sqrt(chi2_th / jnp.maximum(chi2, 1e-12)))

    def step(carry, _):
        R, t, s, inlier = carry
        zero = jnp.zeros(7, R.dtype)

        def res_flat(xi):
            e1, e2, _, _ = residuals(xi, R, t, s)
            return jnp.concatenate([e1.reshape(-1), e2.reshape(-1)])

        J = jax.jacfwd(res_flat)(zero)  # (4N, 7)
        e1, e2, z1, z2 = residuals(zero, R, t, s)
        c1, c2 = chi2_of(e1, e2)
        w1 = inlier * inv_sigma2_1 * huber_w(c1) * (z1 > 0)
        w2 = inlier * inv_sigma2_2 * huber_w(c2) * (z2 > 0)
        w = jnp.concatenate([jnp.repeat(w1, 2), jnp.repeat(w2, 2)])
        r = jnp.concatenate([e1.reshape(-1), e2.reshape(-1)])
        H = jnp.einsum("ni,n,nj->ij", J, w, J)
        b = jnp.einsum("ni,n->i", J, w * r)
        if fix_scale:
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            b = b.at[6].set(0.0)
        dx = -jnp.linalg.solve(H + 1e-6 * jnp.eye(7), b)
        dR, dt, ds = lie.sim3_exp(dx)
        R_n, t_n, s_n = lie.sim3_mul(R, t, s, dR, dt, ds)
        # accept on robust-cost decrease
        e1n, e2n, _, _ = residuals(jnp.zeros(7), R_n, t_n, s_n)
        c1n, c2n = chi2_of(e1n, e2n)
        rob = lambda c: jnp.minimum(c, chi2_th + jnp.sqrt(chi2_th * jnp.maximum(c - chi2_th, 0.0)))
        dcost = jnp.sum((rob(c1n) - rob(c1)) * inlier) + jnp.sum((rob(c2n) - rob(c2)) * inlier)
        ok = (dcost < 0) & jnp.all(jnp.isfinite(dx))
        R = jnp.where(ok, lie.orthonormalize(R_n), R)
        t = jnp.where(ok, t_n, t)
        s = jnp.where(ok, s_n, s)
        return (R, t, s, inlier), None

    inlier0 = valid.astype(R12.dtype)
    (R, t, s, _), _ = jax.lax.scan(
        step, (R12, t12, jnp.asarray(s12), inlier0), None, length=n_iters
    )
    e1, e2, z1, z2 = residuals(jnp.zeros(7), R, t, s)
    c1, c2 = chi2_of(e1, e2)
    inliers = valid & (c1 <= chi2_th) & (c2 <= chi2_th) & (z1 > 0) & (z2 > 0)
    return {"R12": R, "t12": t, "s12": s, "inliers": inliers,
            "n_inliers": jnp.sum(inliers)}

"""Bundle adjustment with Schur-complement landmark elimination, pure JAX.

One engine replaces the reference's g2o-based BundleAdjustment /
LocalBundleAdjustment / GlobalBundleAdjustemnt family
(/root/reference/src/Optimizer.cc:52-390, :1116-1498): Levenberg-Marquardt
over keyframe SE3 poses + landmark positions with monocular reprojection
factors, landmarks marginalized per-point (the role g2o's
`setMarginalized(true)` plays at Optimizer.cc:1289), and chi-square
outlier re-classification between rounds.

TPU design:
  * Edges are fixed-capacity arrays (kf_idx, pt_idx, uv, inv_sigma2, valid);
    residuals/Jacobians are vmapped, normal-equation blocks accumulated with
    segment-sums.
  * The camera-point coupling is materialized as a dense (M, K, 6, 3) block
    tensor W — for SLAM-scale local BA (K <= 64 keyframes, M <= 16k points)
    this fits comfortably in HBM and turns the Schur reduction
    S = Hcc - W^T Hpp^-1 W into two large batched matmuls on the MXU,
    instead of g2o's sparse pointer-chasing.
  * The reduced (6K, 6K) camera system is solved densely.

The same edge layout is what the distributed variant shards over a device
mesh (parallel/dist_ba.py): landmark blocks are embarrassingly parallel and
the reduced system is formed with a psum.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from ..geometry import cameras
from . import factors


class BAProblem(NamedTuple):
    """Fixed-shape BA problem. K keyframes, M points, E edges (padded).

    Edges with wz > 0 are stereo/RGB-D observations: the residual gains a
    pixel-equivalent depth row (factors.reproj_depth_residual), replacing
    the reference's (u, v, uR) stereo edges."""

    poses_R: jnp.ndarray     # (K,3,3) world->cam
    poses_t: jnp.ndarray     # (K,3)
    fixed: jnp.ndarray       # (K,) bool — poses held constant
    points: jnp.ndarray      # (M,3)
    kf_idx: jnp.ndarray      # (E,) int32
    pt_idx: jnp.ndarray      # (E,) int32
    uv: jnp.ndarray          # (E,2)
    inv_sigma2: jnp.ndarray  # (E,)
    valid: jnp.ndarray       # (E,) bool
    z_meas: jnp.ndarray = None   # (E,) measured depth (0 = mono edge)
    wz: jnp.ndarray = None       # (E,) depth-row weight bf/z^2 (0 = mono)
    # stereo-rig right-camera observations (the reference's ToBody edges,
    # OptimizableTypes.h:110-144): cam_sel = 1 observes through the RIGHT
    # camera at (rig_R, rig_t) (x_r = rig_R x_l + rig_t) with params_r
    # intrinsics; both cameras must share cam_kind
    cam_sel: jnp.ndarray = None  # (E,) 0 = left, 1 = right
    rig_R: jnp.ndarray = None    # (3,3)
    rig_t: jnp.ndarray = None    # (3,)
    params_r: jnp.ndarray = None  # right-camera intrinsics


def with_depth_defaults(prob: BAProblem, cam_params=None) -> BAProblem:
    """Fill absent stereo/rig fields with mono/left-edge defaults."""
    E = prob.uv.shape[0]
    z = prob.z_meas if prob.z_meas is not None else jnp.zeros(E)
    w = prob.wz if prob.wz is not None else jnp.zeros(E)
    sel = prob.cam_sel if prob.cam_sel is not None else jnp.zeros(E)
    rR = prob.rig_R if prob.rig_R is not None else jnp.eye(3)
    rt = prob.rig_t if prob.rig_t is not None else jnp.zeros(3)
    pr = prob.params_r
    if pr is None:
        pr = cam_params if cam_params is not None else jnp.zeros(4)
    return prob._replace(z_meas=z, wz=w, cam_sel=sel, rig_R=rR, rig_t=rt,
                         params_r=jnp.asarray(pr))


def _edge_terms(cam_kind, cam_params, prob: BAProblem, w_extra):
    """Per-edge residuals (3-row: reprojection + optional depth),
    Jacobians and weights. Rig-aware: cam_sel routes each edge through
    the left or the right camera of a stereo rig."""
    R = prob.poses_R[prob.kf_idx]
    t = prob.poses_t[prob.kf_idx]
    p = prob.points[prob.pt_idx]

    def one(R, t, p, uv, z, wz, sel):
        return factors.reproj_depth_residual_rig(
            cam_kind, jnp.asarray(cam_params), prob.params_r,
            prob.rig_R, prob.rig_t, sel, R, t, p, uv, z, wz
        )

    r, Jc, Jp, depth = jax.vmap(one)(R, t, p, prob.uv, prob.z_meas, prob.wz,
                                     prob.cam_sel)
    w = w_extra * prob.inv_sigma2 * prob.valid * (depth > 0)
    return r, Jc, Jp, w, depth


def _robust_cost(chi2, delta2, robust):
    huber = jnp.where(
        chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2
    )
    return jnp.where(robust, huber, chi2)


def inv3_sym(A):
    """Closed-form inverse of batched SYMMETRIC 3x3 matrices (adjugate /
    determinant) — elementwise ops only. Batched jnp.linalg.inv lowers to
    generic LU kernels that dominate the LM step for the (M,3,3) landmark
    blocks; the damped Hpp is PD so the determinant is safely positive."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e = A[..., 1, 1], A[..., 1, 2]
    f = A[..., 2, 2]
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    inv_det = 1.0 / det
    row0 = jnp.stack([co00, co01, co02], -1)
    row1 = jnp.stack([co01, co11, co12], -1)
    row2 = jnp.stack([co02, co12, co22], -1)
    return jnp.stack([row0, row1, row2], -2) * inv_det[..., None, None]


@partial(jax.jit, static_argnames=("cam_kind", "n_iters", "robust"))
def ba_iterate(cam_kind, cam_params, prob: BAProblem, n_iters: int, robust: bool, chi2_th: float):
    """Run n_iters of LM with landmark marginalization. Returns updated prob.

    Numerics: computation runs in the dtype of the problem arrays (f32 on
    TPU). The f64-free stability measures — lambda floor and step trust
    region — are load-bearing: without them the near-gauge directions of
    monocular BA random-walk under f32 round-off and the map warps.
    """
    prob = with_depth_defaults(prob, cam_params)
    K = prob.poses_R.shape[0]
    M = prob.points.shape[0]
    # per-edge gate: stereo/depth edges are 3-dof (CHI2_STEREO = 7.815)
    delta2 = jnp.where(prob.wz > 0, factors.CHI2_STEREO, chi2_th)
    f64 = prob.poses_R.dtype == jnp.float64
    lam_min = 1e-7 if f64 else 1e-4
    # step cap in scene units; map scale is median-depth-normalized to ~1
    max_step = jnp.asarray(1e3 if f64 else 0.25, prob.poses_R.dtype)

    def edge_costs(poses_R, poses_t, points):
        """Per-edge robust costs. Accept/reject must compare the SUM OF
        PER-EDGE DIFFERENCES, not the difference of two large sums: with
        thousands of edges the total is ~1e4 while a converged LM step
        changes it by ~1e-2 — below f32 resolution, so a naive comparison
        accepts noise and the solution random-walks."""
        p2 = prob._replace(poses_R=poses_R, poses_t=poses_t, points=points)
        r, _, _, w0, depth = _edge_terms(cam_kind, cam_params, p2, 1.0)
        chi2 = jnp.sum(r * r, axis=-1) * prob.inv_sigma2
        m = prob.valid * (depth > 0)
        return _robust_cost(chi2, delta2, robust) * m

    def lm_step(carry, _):
        poses_R, poses_t, points, lam = carry
        p2 = prob._replace(poses_R=poses_R, poses_t=poses_t, points=points)
        r, Jc, Jp, w, depth = _edge_terms(cam_kind, cam_params, p2, 1.0)
        chi2 = jnp.sum(r * r, axis=-1) * prob.inv_sigma2
        if robust:
            w = w * factors.huber_weight(chi2, delta2)

        # --- normal equation blocks (segment sums over edges) -----------
        JcW = Jc * w[:, None, None]
        Hcc = jax.ops.segment_sum(
            jnp.einsum("eri,erj->eij", JcW, Jc), prob.kf_idx, K
        )  # (K,6,6)
        bc = jax.ops.segment_sum(jnp.einsum("eri,er->ei", JcW, r), prob.kf_idx, K)
        JpW = Jp * w[:, None, None]
        Hpp = jax.ops.segment_sum(
            jnp.einsum("eri,erj->eij", JpW, Jp), prob.pt_idx, M
        )  # (M,3,3)
        bp = jax.ops.segment_sum(jnp.einsum("eri,er->ei", JpW, r), prob.pt_idx, M)
        Wcp = jax.ops.segment_sum(
            jnp.einsum("eri,erj->eij", JcW, Jp),
            prob.pt_idx * K + prob.kf_idx,
            M * K,
        ).reshape(M, K, 6, 3)

        # --- damping ----------------------------------------------------
        eyeK6 = jnp.eye(6, dtype=poses_R.dtype)
        eye3 = jnp.eye(3, dtype=poses_R.dtype)
        Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., None] * eye3
        Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., None] * eyeK6

        Hpp_inv = inv3_sym(Hpp_d)

        # --- Schur complement: S = Hcc - W Hpp^-1 W^T -------------------
        WHinv = jnp.einsum("mkac,mcd->mkad", Wcp, Hpp_inv)  # (M,K,6,3)
        S_off = -jnp.einsum("mkad,mled->kale", WHinv, Wcp)  # (K,6,K,6)
        S = S_off.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc_d)
        rhs = -bc + jnp.einsum("mkad,md->ka", WHinv, bp)  # (K,6)

        # --- freeze fixed cameras --------------------------------------
        free = (~prob.fixed).astype(S.dtype)
        S = S * free[:, None, None, None] * free[None, None, :, None]
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
            eyeK6 * prob.fixed[:, None, None]
        )
        rhs = rhs * free[:, None]

        dc = jnp.linalg.solve(S.reshape(K * 6, K * 6), rhs.reshape(K * 6)).reshape(K, 6)
        dc = dc * free[:, None]

        # trust region: monocular BA has near-gauge (scale/warp) directions
        # whose tiny eigenvalues make f32 solves wander; cap the camera step
        # norm so quasi-nullspace excursions can't be accepted on cost noise
        step = jnp.sqrt(jnp.sum(dc * dc, axis=-1))
        shrink = jnp.minimum(1.0, max_step / jnp.maximum(jnp.max(step), 1e-12))
        dc = dc * shrink

        # --- back-substitute landmarks ---------------------------------
        Hpc_dc = jnp.einsum("mkac,ka->mc", Wcp, dc)  # (M,3)
        dp = jnp.einsum("mcd,md->mc", Hpp_inv, -bp - Hpc_dc)
        pstep = jnp.sqrt(jnp.sum(dp * dp, axis=-1))
        dp = dp * jnp.minimum(1.0, max_step / jnp.maximum(pstep, 1e-12))[:, None]

        R_new, t_new = jax.vmap(lie.se3_retract)(poses_R, poses_t, dc)
        R_new = lie.orthonormalize(R_new).astype(poses_R.dtype)
        t_new = t_new.astype(poses_t.dtype)
        pts_new = points + dp

        # current-state costs come free from the residuals already
        # evaluated above (edge_costs would re-run the whole vmap)
        costs_old = _robust_cost(chi2, delta2, robust) \
            * (prob.valid * (depth > 0))
        costs_new = edge_costs(R_new, t_new, pts_new)
        dcost = jnp.sum(costs_new - costs_old)
        c_new = jnp.sum(costs_new)
        ok = (dcost < 0) & jnp.all(jnp.isfinite(dc)) & jnp.all(jnp.isfinite(dp))
        poses_R = jnp.where(ok, R_new, poses_R)
        poses_t = jnp.where(ok, t_new, poses_t)
        points = jnp.where(ok, pts_new, points)
        # lambda floor 1e-4: below this the damped system's small (near-gauge)
        # eigenvalues sink under f32 solve noise (g2o runs in f64 and can
        # afford 1e-7; we cannot on TPU)
        lam = jnp.where(ok, jnp.maximum(lam * 0.33, lam_min), jnp.minimum(lam * 4.0, 1e4))
        return (poses_R, poses_t, points, lam), c_new

    (R, t, pts, _), costs = jax.lax.scan(
        lm_step,
        (prob.poses_R, prob.poses_t, prob.points, jnp.asarray(1e-4, prob.poses_R.dtype)),
        None,
        length=n_iters,
    )
    return prob._replace(poses_R=R, poses_t=t, points=pts), costs


@partial(jax.jit, static_argnames=("cam_kind",))
def classify_edges(cam_kind, cam_params, prob: BAProblem, chi2_th: float, base_valid):
    """Re-classify edges against the base validity set (outlier recycling)."""
    prob = with_depth_defaults(prob, cam_params)
    r, _, _, _, depth = _edge_terms(cam_kind, cam_params, prob, 1.0)
    chi2 = jnp.sum(r * r, axis=-1) * prob.inv_sigma2
    th = jnp.where(prob.wz > 0, factors.CHI2_STEREO, chi2_th)
    return base_valid & (chi2 <= th) & (depth > 0)


def bundle_adjust(
    cam_kind,
    cam_params,
    prob: BAProblem,
    rounds=((5, True), (10, True), (8, False)),
    chi2_th: float = factors.CHI2_MONO,
    final_classify: bool = True,
    should_abort=None,
):
    """Full BA schedule: LM rounds with outlier re-classification between
    them (mirrors LocalBundleAdjustment's 5-iteration probe + 10-iteration
    main solve, Optimizer.cc:1350-1365, and its final outlier sweep).

    should_abort: optional zero-arg callable polled between rounds — the
    detached global-BA thread's stop flag (the reference's mbStopGBA,
    LoopClosing.cc:1123-1133); on True the remaining rounds are skipped
    (the caller discards the result)."""
    prob = with_depth_defaults(prob, cam_params)
    base_valid = prob.valid
    for n_iters, robust in rounds:
        if should_abort is not None and should_abort():
            break
        prob, _ = ba_iterate(cam_kind, cam_params, prob, n_iters, robust, chi2_th)
        new_valid = classify_edges(cam_kind, cam_params, prob, chi2_th, base_valid)
        prob = prob._replace(valid=new_valid)
    return prob

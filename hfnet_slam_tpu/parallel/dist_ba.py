"""Distributed bundle adjustment over a JAX device mesh.

The reference has no distributed backend at all (SURVEY.md §2.4): its
parallelism is three POSIX threads and per-object mutexes. This module is
the TPU-native scale-out path: Schur-complement BA where the LANDMARK
blocks — embarrassingly parallel after marginalization — are sharded
across devices, and the reduced camera system (small, dense) is formed
with a `psum` over the mesh and solved replicated.

Partitioning contract: each device owns a contiguous slab of M/n_dev
landmarks AND every (padded) edge that observes them. The host packs
edges into per-device buckets (`partition_edges`); inside `shard_map`
each device computes

    Hpp (local), bp (local), Wcp (local M-slab x all K cameras),
    partial Hcc / bc  (its edges only)

then `psum` produces the full (K,6,6)+(K,6) camera system and the full
Schur complement S = Hcc - W Hpp^-1 W^T on every device; the (6K x 6K)
solve is replicated (tiny), and each device back-substitutes only its own
landmark slab. Communication per iteration = one psum of O(K^2 * 36)
floats over ICI — independent of the landmark count.

Design: jax-ml.github.io/scaling-book recipe — pick a mesh, annotate
shardings, let collectives ride ICI; no NCCL/MPI analogue needed.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import lie
from ..optim import factors


class ShardedBA(NamedTuple):
    """Edge/landmark arrays pre-bucketed per device.

    D = n_devices, Ml = landmarks per device, El = edges per device.
    Landmark ids inside each shard are LOCAL (0..Ml); camera ids global.
    """

    poses_R: jnp.ndarray      # (K,3,3) replicated
    poses_t: jnp.ndarray      # (K,3)
    fixed: jnp.ndarray        # (K,)
    points: jnp.ndarray       # (D,Ml,3) sharded along D
    kf_idx: jnp.ndarray       # (D,El)
    pt_idx: jnp.ndarray       # (D,El) local landmark index
    uv: jnp.ndarray           # (D,El,2)
    inv_sigma2: jnp.ndarray   # (D,El)
    valid: jnp.ndarray        # (D,El)
    # stereo/RGB-D depth rows (reference stereo edges Optimizer.cc:
    # 1116-1498): measured depth + pixel-equivalent weight bf/z^2; wz = 0
    # turns the row off (mono edge) — same contract as optim/ba.BAProblem
    z_meas: jnp.ndarray = None   # (D,El)
    wz: jnp.ndarray = None       # (D,El)


def partition_edges(n_dev, K, M_per_dev, E_per_dev, poses_R, poses_t, fixed,
                    points, kf_idx, pt_idx, uv, inv_sigma2, valid,
                    z_meas=None, wz=None):
    """Host-side packing: landmarks round-robin into n_dev slabs, each edge
    into its landmark's slab. Caps must be sized to the problem (the
    mapper computes them exactly, local_mapping._run_dist_gba); any
    overflow is LOGGED loudly — a dropped edge silently weakens the solve.
    """
    D, Ml, El = n_dev, M_per_dev, E_per_dev
    n_dropped = 0
    pts = np.zeros((D, Ml, 3), np.float32)
    kfe = np.zeros((D, El), np.int32)
    pte = np.zeros((D, El), np.int32)
    uve = np.zeros((D, El, 2), np.float32)
    ise = np.ones((D, El), np.float32)
    vae = np.zeros((D, El), bool)
    zme = np.zeros((D, El), np.float32)
    wze = np.zeros((D, El), np.float32)
    if z_meas is None:
        z_meas = np.zeros(len(kf_idx), np.float32)
    if wz is None:
        wz = np.zeros(len(kf_idx), np.float32)

    M = len(points)
    owner = np.arange(M) % D
    local = np.arange(M) // D
    ok = local < Ml
    for d in range(D):
        sel = ok & (owner == d)
        pts[d, local[sel]] = points[sel]
    # vectorized edge packing (the per-edge Python loop ran under the map
    # lock and stalled the tracker ~1 s on big global solves): stable-sort
    # edges by owning device, then positions within each device bucket
    valid = np.asarray(valid, bool)
    pt_idx = np.asarray(pt_idx)
    e_sel = np.nonzero(valid & ok[pt_idx])[0]
    n_dropped += int(valid.sum() - len(e_sel))
    if len(e_sel):
        d_e = owner[pt_idx[e_sel]]
        order = np.argsort(d_e, kind="stable")
        e_sel, d_e = e_sel[order], d_e[order]
        starts = np.searchsorted(d_e, np.arange(D))
        pos = np.arange(len(e_sel)) - starts[d_e]
        keep = pos < El
        n_dropped += int((~keep).sum())
        e_k, d_k, p_k = e_sel[keep], d_e[keep], pos[keep]
        kfe[d_k, p_k] = np.asarray(kf_idx)[e_k]
        pte[d_k, p_k] = local[pt_idx[e_k]]
        uve[d_k, p_k] = np.asarray(uv)[e_k]
        ise[d_k, p_k] = np.asarray(inv_sigma2)[e_k]
        zme[d_k, p_k] = np.asarray(z_meas)[e_k]
        wze[d_k, p_k] = np.asarray(wz)[e_k]
        vae[d_k, p_k] = True
    if n_dropped:
        from ..utils.log import warn

        warn(f"dist_ba.partition_edges: {n_dropped} edges overflowed the "
             f"per-device caps (Ml={Ml}, El={El}) and were DROPPED — "
             "size the caps to the problem")
    return ShardedBA(
        poses_R=jnp.asarray(poses_R), poses_t=jnp.asarray(poses_t),
        fixed=jnp.asarray(fixed), points=jnp.asarray(pts),
        kf_idx=jnp.asarray(kfe), pt_idx=jnp.asarray(pte),
        uv=jnp.asarray(uve), inv_sigma2=jnp.asarray(ise), valid=jnp.asarray(vae),
        z_meas=jnp.asarray(zme), wz=jnp.asarray(wze),
    ), (owner, local, ok)


def _with_depth_defaults(z_meas, wz, like):
    """Fill absent depth fields with mono-edge zeros (old callers)."""
    z = z_meas if z_meas is not None else jnp.zeros_like(like)
    w = wz if wz is not None else jnp.zeros_like(like)
    return z, w


def _shard_terms(cam_kind, cam_params, poses_R, poses_t, points,
                 kf_idx, pt_idx, uv, inv_sigma2, valid, robust, delta2,
                 z_meas=None, wz=None):
    """Per-edge residual/Jacobian terms for one device's edge bucket.
    3-row residuals: reprojection + optional depth row (wz > 0)."""
    R = poses_R[kf_idx]
    t = poses_t[kf_idx]
    p = points[pt_idx]
    z_meas, wz = _with_depth_defaults(z_meas, wz, inv_sigma2)
    r, Jc, Jp, depth = jax.vmap(
        lambda R, t, p, u, z, w: factors.reproj_depth_residual(
            cam_kind, cam_params, R, t, p, u, z, w)
    )(R, t, p, uv, z_meas, wz)
    chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
    w = inv_sigma2 * valid * (depth > 0)
    if robust:
        w = w * factors.huber_weight(chi2, delta2)
    return r, Jc, Jp, w


@functools.partial(jax.jit, static_argnames=("cam_kind", "mesh", "robust"))
def dist_lm_step(cam_kind, cam_params, prob: ShardedBA, mesh: Mesh,
                 lam=1e-4, robust: bool = True,
                 chi2_th: float = factors.CHI2_MONO,
                 max_step: float = 0.25):
    """One distributed Levenberg-Marquardt iteration with IN-GRAPH
    accept/reject. Returns (poses_R, poses_t, points, lam_new, cost,
    accepted). Jitted with the mesh static: one compile per problem shape.

    f32 numerics mirror the single-device engine (optim/ba.ba_iterate):
      * accept on the psum of PER-EDGE cost differences — comparing two
        large cost totals under-resolves a converged step in f32;
      * Jacobi-scaled reduced-system solve (conditioning grows with K);
      * per-camera/per-point step caps against quasi-nullspace excursions;
      * lambda floor 1e-4."""
    K = prob.poses_R.shape[0]
    axis = "ba"
    dt = prob.points.dtype
    lam = jnp.asarray(lam, dt)
    chi2_th = jnp.asarray(chi2_th, dt)
    max_step = jnp.asarray(max_step, dt)

    def robust_cost(chi2, delta2):
        if not robust:
            return chi2
        return jnp.where(chi2 <= delta2, chi2,
                         2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0))
                         - delta2)

    def local_cost(poses_R, poses_t, points, kf_idx, pt_idx, uv, inv_s2,
                   valid, z_meas, wz):
        delta2 = jnp.where(wz > 0, factors.CHI2_STEREO, chi2_th)
        r, _, _, w0 = _shard_terms(
            cam_kind, cam_params, poses_R, poses_t, points,
            kf_idx, pt_idx, uv, inv_s2, valid, False, delta2,
            z_meas=z_meas, wz=wz)
        chi2 = jnp.sum(r * r, axis=-1) * inv_s2
        m = (w0 > 0).astype(dt)
        return robust_cost(chi2, delta2) * m  # per-edge

    def step(poses_R, poses_t, fixed, points, kf_idx, pt_idx, uv, inv_s2,
             valid, z_meas, wz):
        # leading device axis is mapped away by shard_map
        points, kf_idx, pt_idx, uv, inv_s2, valid, z_meas, wz = (
            points[0], kf_idx[0], pt_idx[0], uv[0], inv_s2[0], valid[0],
            z_meas[0], wz[0]
        )
        Ml = points.shape[0]
        delta2 = jnp.where(wz > 0, factors.CHI2_STEREO, chi2_th)
        r, Jc, Jp, w = _shard_terms(
            cam_kind, cam_params, poses_R, poses_t, points,
            kf_idx, pt_idx, uv, inv_s2, valid, robust, delta2,
            z_meas=z_meas, wz=wz)

        JcW = Jc * w[:, None, None]
        Hcc_part = jax.ops.segment_sum(jnp.einsum("eri,erj->eij", JcW, Jc), kf_idx, K)
        bc_part = jax.ops.segment_sum(jnp.einsum("eri,er->ei", JcW, r), kf_idx, K)
        JpW = Jp * w[:, None, None]
        Hpp = jax.ops.segment_sum(jnp.einsum("eri,erj->eij", JpW, Jp), pt_idx, Ml)
        bp = jax.ops.segment_sum(jnp.einsum("eri,er->ei", JpW, r), pt_idx, Ml)
        Wcp = jax.ops.segment_sum(
            jnp.einsum("eri,erj->eij", JcW, Jp), pt_idx * K + kf_idx, Ml * K
        ).reshape(Ml, K, 6, 3)

        eye3 = jnp.eye(3, dtype=dt)
        Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., None] * eye3
        Hpp_inv = jnp.linalg.inv(Hpp_d)
        WHinv = jnp.einsum("mkac,mcd->mkad", Wcp, Hpp_inv)
        S_part = -jnp.einsum("mkad,mled->kale", WHinv, Wcp)
        rhs_part = -bc_part + jnp.einsum("mkad,md->ka", WHinv, bp)

        # ---- the one collective: reduce the camera system over the mesh ----
        Hcc = jax.lax.psum(Hcc_part, axis)
        S_off = jax.lax.psum(S_part, axis)
        rhs = jax.lax.psum(rhs_part, axis)

        eyeK6 = jnp.eye(6, dtype=dt)
        Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., None] * eyeK6
        S = S_off.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc_d)
        free = (~fixed).astype(S.dtype)
        S = S * free[:, None, None, None] * free[None, None, :, None]
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(eyeK6 * fixed[:, None, None])
        rhs = rhs * free[:, None]

        # Jacobi-scaled solve: the reduced camera system's conditioning
        # grows with K and kills a raw float32 solve near convergence;
        # symmetric diagonal scaling keeps the f32 solve usable at K=256+
        S2 = S.reshape(K * 6, K * 6)
        r2 = rhs.reshape(K * 6)
        d = jnp.sqrt(jnp.clip(jnp.abs(jnp.diagonal(S2)), 1e-12))
        y = jnp.linalg.solve(S2 / d[:, None] / d[None, :], r2 / d)
        dc = (y / d).reshape(K, 6)
        dc = dc * free[:, None]
        # camera step trust region (quasi-nullspace guard)
        cstep = jnp.sqrt(jnp.sum(dc * dc, axis=-1))
        dc = dc * jnp.minimum(1.0, max_step / jnp.maximum(jnp.max(cstep), 1e-12))

        # local landmark back-substitution (+ per-point step cap)
        Hpc_dc = jnp.einsum("mkac,ka->mc", Wcp, dc)
        dp = jnp.einsum("mcd,md->mc", Hpp_inv, -bp - Hpc_dc)
        pstep = jnp.sqrt(jnp.sum(dp * dp, axis=-1))
        dp = dp * jnp.minimum(1.0, max_step / jnp.maximum(pstep, 1e-12))[:, None]

        R_new, t_new = jax.vmap(lie.se3_retract)(poses_R, poses_t, dc)
        R_new = lie.orthonormalize(R_new).astype(dt)
        t_new = t_new.astype(dt)
        pts_new = points + dp

        # ---- in-graph accept/reject on the psum of per-edge differences ----
        c_old_e = local_cost(poses_R, poses_t, points,
                             kf_idx, pt_idx, uv, inv_s2, valid, z_meas, wz)
        c_new_e = local_cost(R_new, t_new, pts_new,
                             kf_idx, pt_idx, uv, inv_s2, valid, z_meas, wz)
        dcost = jax.lax.psum(jnp.sum(c_new_e - c_old_e), axis)
        # ok must be IDENTICAL on every device: dc/dcost are replicated,
        # and the per-shard landmark finiteness is psum-combined
        bad_local = (~(jnp.all(jnp.isfinite(dp))
                       & jnp.all(jnp.isfinite(pts_new)))).astype(jnp.int32)
        ok = (dcost < 0) & jnp.all(jnp.isfinite(dc)) \
            & (jax.lax.psum(bad_local, axis) == 0)
        poses_R_o = jnp.where(ok, R_new, poses_R)
        poses_t_o = jnp.where(ok, t_new, poses_t)
        pts_o = jnp.where(ok, pts_new, points)
        lam_new = jnp.where(ok, jnp.maximum(lam * 0.33, 1e-4),
                            jnp.minimum(lam * 4.0, 1e4))
        cost = jax.lax.psum(jnp.sum(jnp.where(ok, c_new_e, c_old_e)), axis)
        return (poses_R_o, poses_t_o, pts_o[None], lam_new[None],
                cost[None], ok[None])

    f = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
    )
    z, w = _with_depth_defaults(prob.z_meas, prob.wz, prob.inv_sigma2)
    R, t, pts, lam_new, cost, ok = f(
        prob.poses_R, prob.poses_t, prob.fixed, prob.points,
        prob.kf_idx, prob.pt_idx, prob.uv, prob.inv_sigma2, prob.valid, z, w)
    return R, t, pts, lam_new[0], cost[0], ok[0]


@functools.partial(jax.jit, static_argnames=("cam_kind", "mesh", "robust"))
def _dist_cost_jit(cam_kind, cam_params, prob: ShardedBA, mesh: Mesh,
                   robust: bool = True):
    axis = "ba"

    def f(poses_R, poses_t, points, kf_idx, pt_idx, uv, inv_s2, valid,
          z_meas, wz):
        points, kf_idx, pt_idx, uv, inv_s2, valid, z_meas, wz = (
            points[0], kf_idx[0], pt_idx[0], uv[0], inv_s2[0], valid[0],
            z_meas[0], wz[0]
        )
        delta2 = jnp.where(wz > 0, factors.CHI2_STEREO, factors.CHI2_MONO)
        r, _, _, w = _shard_terms(
            cam_kind, cam_params, poses_R, poses_t, points,
            kf_idx, pt_idx, uv, inv_s2, valid, robust, delta2,
            z_meas=z_meas, wz=wz)
        return jax.lax.psum(jnp.sum(r * r * w[:, None]), axis)[None]

    g = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    z, w = _with_depth_defaults(prob.z_meas, prob.wz, prob.inv_sigma2)
    return g(prob.poses_R, prob.poses_t, prob.points,
             prob.kf_idx, prob.pt_idx, prob.uv,
             prob.inv_sigma2, prob.valid, z, w)


def dist_cost(cam_kind, cam_params, prob: ShardedBA, mesh: Mesh,
              robust: bool = True):
    """Total (Huber-robustified) chi2 over the mesh (one psum). Robust by
    default so gross outliers — which BA cannot remove, only down-weight —
    don't mask the inlier convergence signal."""
    return float(np.asarray(
        _dist_cost_jit(cam_kind, cam_params, prob, mesh, robust))[0])


def dist_bundle_adjust(cam_kind, cam_params, prob: ShardedBA, mesh: Mesh,
                       rounds=((5, True), (10, True)), lam: float = 1e-4,
                       chi2_th: float = factors.CHI2_MONO,
                       should_abort=None):
    """Full distributed BA: the single-device bundle_adjust's iteration
    schedule (robust stages, then a cleanup stage) around dist_lm_step,
    plus a final per-edge outlier classification. This is what the mapper
    routes big global solves through (LocalMapper.run_global_ba).

    should_abort: optional zero-arg callable polled between LM iterations
    (the detached GBA thread's stop flag, mbStopGBA semantics).

    Returns (prob_out, edge_valid (D,El) bool, costs list)."""
    base_valid = prob.valid
    costs = [dist_cost(cam_kind, cam_params, prob, mesh)]
    for iters, robust in rounds:
        for _ in range(iters):
            if should_abort is not None and should_abort():
                break
            # accept/reject + damping adaptation run IN-GRAPH on the psum
            # of per-edge cost differences (dist_lm_step docstring); the
            # host loop only carries lam and the monitoring cost
            R, t, pts, lam, c, _ok = dist_lm_step(
                cam_kind, cam_params, prob, mesh, lam=lam, robust=robust,
                chi2_th=chi2_th)
            prob = prob._replace(poses_R=R, poses_t=t, points=pts)
            costs.append(float(np.asarray(c)))
        # between stages: re-classify edges against the BASE validity set
        # (outlier recycling, like the single-device engine) — drops that
        # prove premature as the solve converges are reinstated
        prob = prob._replace(
            valid=base_valid & jnp.asarray(
                _dist_classify(cam_kind, cam_params,
                               prob._replace(valid=base_valid), mesh,
                               chi2_th)))
    edge_valid = _dist_classify(cam_kind, cam_params, prob, mesh, chi2_th)
    edge_valid = edge_valid & np.asarray(prob.valid)
    return prob, edge_valid, costs


@functools.partial(jax.jit, static_argnames=("cam_kind", "mesh"))
def _dist_classify_jit(cam_kind, cam_params, prob: ShardedBA, mesh: Mesh,
                       chi2_th: float = factors.CHI2_MONO):
    axis = "ba"

    def cls(poses_R, poses_t, points, kf_idx, pt_idx, uv, inv_s2, valid,
            z_meas, wz):
        points, kf_idx, pt_idx, uv, inv_s2, valid, z_meas, wz = (
            points[0], kf_idx[0], pt_idx[0], uv[0], inv_s2[0], valid[0],
            z_meas[0], wz[0]
        )
        delta2 = jnp.where(wz > 0, factors.CHI2_STEREO, chi2_th)
        r, _, _, _ = _shard_terms(
            cam_kind, cam_params, poses_R, poses_t, points,
            kf_idx, pt_idx, uv, inv_s2, valid, False, delta2,
            z_meas=z_meas, wz=wz)
        chi2 = jnp.sum(r * r, axis=-1) * inv_s2
        return (valid & (chi2 < delta2))[None]

    g = jax.shard_map(
        cls, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    z, w = _with_depth_defaults(prob.z_meas, prob.wz, prob.inv_sigma2)
    return g(prob.poses_R, prob.poses_t, prob.points,
             prob.kf_idx, prob.pt_idx, prob.uv,
             prob.inv_sigma2, prob.valid, z, w)


def _dist_classify(cam_kind, cam_params, prob: ShardedBA, mesh: Mesh,
                   chi2_th: float):
    """Per-edge chi2 gate (D, El) over the mesh."""
    return np.asarray(
        _dist_classify_jit(cam_kind, cam_params, prob, mesh, chi2_th))

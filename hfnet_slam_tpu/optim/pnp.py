"""PnP RANSAC: camera pose from 3D-2D correspondences, all hypotheses batched.

Replaces the reference's MLPnPsolver (/root/reference/src/MLPnPsolver.cpp,
a maximum-likelihood PnP in a sequential RANSAC wrapper used only by
Tracking::Relocalization, Tracking.cc:3071-3098, with
SetRansacParameters(0.99, 10, 300, 6, 0.5, 5.991)).

TPU design: instead of MLPnP's nullspace formulation iterated hypothesis-
by-hypothesis, every RANSAC hypothesis is a 6-point DLT solved by a
vmapped 12x12 SVD, evaluated against all correspondences in one batched
projection — one kernel launch for the whole 300-hypothesis budget. The
winning pose is then polished by the standard pose optimizer
(optim/pose_opt.py), mirroring the reference's PoseOptimization handoff.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import cameras


def _dlt_pose(X, xn):
    """6+ point DLT for P=[R|t] from world points X (N,3) and normalized
    image points xn (N,2). Returns (R, t, ok)."""
    N = X.shape[0]
    Xh = jnp.concatenate([X, jnp.ones((N, 1), X.dtype)], axis=1)  # (N,4)
    z = jnp.zeros((N, 4), X.dtype)
    u = xn[:, 0:1]
    v = xn[:, 1:2]
    rows_u = jnp.concatenate([Xh, z, -u * Xh], axis=1)  # (N,12)
    rows_v = jnp.concatenate([z, Xh, -v * Xh], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2N,12)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    p = Vt[-1]
    P = p.reshape(3, 4)
    M = P[:, :3]
    # sign: majority of the sample must have positive depth
    depths = Xh @ P[2]
    P = P * jnp.where(jnp.sum(depths > 0) >= jnp.sum(depths < 0), 1.0, -1.0)
    M = P[:, :3]
    U, S, Vt2 = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(U @ Vt2))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], X.dtype)).at[2, 2].set(d)
    R = U @ D @ Vt2
    scale = jnp.mean(S) * d
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    ok = jnp.isfinite(scale) & (jnp.abs(scale) > 1e-9)
    return R, t, ok


@partial(jax.jit, static_argnames=("cam_kind", "n_hyps", "sample_size"))
def pnp_ransac(
    cam_kind,
    cam_params,
    points_w,     # (N,3)
    uv,           # (N,2) pixels
    inv_sigma2,   # (N,)
    valid,        # (N,) bool
    key,
    n_hyps: int = 256,
    sample_size: int = 6,
    chi2_th: float = 5.991,
):
    """Batched-RANSAC PnP. Returns dict(R, t, inliers, n_inliers)."""
    N = points_w.shape[0]
    xn = cameras.unproject(cam_kind, cam_params, uv)[:, :2]

    g = jax.random.gumbel(key, (n_hyps, N))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, picks = jax.lax.top_k(g, sample_size)  # (H,S)

    def one(idx):
        return _dlt_pose(points_w[idx], xn[idx])

    R_h, t_h, ok_h = jax.vmap(one)(picks)

    def count(R, t):
        pc = points_w @ R.T + t
        uvp = cameras.project(cam_kind, cam_params, pc)
        e = uvp - uv
        chi2 = jnp.sum(e * e, axis=-1) * inv_sigma2
        return valid & (chi2 < chi2_th) & (pc[:, 2] > 0)

    inl_h = jax.vmap(count)(R_h, t_h)
    counts = jnp.where(ok_h, jnp.sum(inl_h, axis=1), -1)
    best = jnp.argmax(counts)
    return {
        "R": R_h[best],
        "t": t_h[best],
        "inliers": inl_h[best],
        "n_inliers": jnp.maximum(counts[best], 0),
    }

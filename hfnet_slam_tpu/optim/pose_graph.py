"""Pose-graph optimization over Sim(3) — the essential graph.

Replaces the reference's Optimizer::OptimizeEssentialGraph
(/root/reference/src/Optimizer.cc:1501: g2o BlockSolver_7_3 LM over
VertexSim3Expmap with EdgeSim3 relative constraints from loop edges,
spanning-tree edges and strong-covisibility edges w>=100) and the
inertial 4-DoF variant OptimizeEssentialGraph4DoF (Optimizer.cc:5292:
yaw+translation only, roll/pitch pinned by gravity).

TPU design: fixed-capacity edge arrays; per-edge 7-d residuals
r = log_sim3(S_meas  S_i  S_j^{-1}) with autodiff Jacobians w.r.t.
left-multiplicative tangent perturbations of both endpoints; the normal
equations are accumulated with segment-sums into a dense (7K, 7K) system
solved on the MXU (a pose graph of hundreds of keyframes is small by TPU
standards — dense beats sparse pointer-chasing here).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie


class PoseGraphProblem(NamedTuple):
    """K Sim3 vertices (world->cam), E relative edges (padded)."""

    R: jnp.ndarray        # (K,3,3)
    t: jnp.ndarray        # (K,3)
    s: jnp.ndarray        # (K,)
    fixed: jnp.ndarray    # (K,) bool
    e_i: jnp.ndarray      # (E,) int32 vertex i
    e_j: jnp.ndarray      # (E,) int32 vertex j
    e_R: jnp.ndarray      # (E,3,3) measured S_ji = S_j S_i^-1
    e_t: jnp.ndarray      # (E,3)
    e_s: jnp.ndarray      # (E,)
    e_w: jnp.ndarray      # (E,) information weight
    e_valid: jnp.ndarray  # (E,) bool


def _edge_residual(Ri, ti, si, Rj, tj, sj, Rm, tm, sm, xi_i, xi_j,
                   right=False):
    """r = log_sim3(S_m * (S_i+xi_i) * (S_j+xi_j)^-1), 7-d.

    right=False: left-multiplicative perturbation exp(xi) S (camera-frame
    tangent, the plain Sim3 graph). right=True: S exp(xi) — the tangent
    acts on WORLD coordinates, so masking phi_x/phi_y/sigma yields the
    reference's gravity-preserving 4-DoF graph (yaw + translation;
    Optimizer::OptimizeEssentialGraph4DoF, Optimizer.cc:5292)."""
    dRi, dti, dsi = lie.sim3_exp(xi_i)
    dRj, dtj, dsj = lie.sim3_exp(xi_j)
    if right:
        R1, t1, s1 = lie.sim3_mul(Ri, ti, si, dRi, dti, dsi)
        R2, t2, s2 = lie.sim3_mul(Rj, tj, sj, dRj, dtj, dsj)
    else:
        R1, t1, s1 = lie.sim3_mul(dRi, dti, dsi, Ri, ti, si)
        R2, t2, s2 = lie.sim3_mul(dRj, dtj, dsj, Rj, tj, sj)
    R2i, t2i, s2i = lie.sim3_inverse(R2, t2, s2)
    Ra, ta, sa = lie.sim3_mul(Rm, tm, sm, R1, t1, s1)
    Rr, tr, sr = lie.sim3_mul(Ra, ta, sa, R2i, t2i, s2i)
    return lie.sim3_log(Rr, tr, sr)


@partial(jax.jit, static_argnames=("n_iters", "fix_scale", "mode"))
def optimize_pose_graph(
    prob: PoseGraphProblem, n_iters: int = 20, fix_scale: bool = False,
    mode: str = "sim3",
):
    """Gauss-Newton on the Sim3 pose graph. Identity information matrices,
    like the reference (matLambda = I, Optimizer.cc:1552).

    fix_scale=True pins every vertex's scale DOF (scale observable but
    orientation free — the stereo/RGB-D case).
    mode="4dof" additionally pins roll/pitch in the WORLD frame
    (right-multiplicative tangents): the inertial case where gravity fixes
    the horizon (OptimizeEssentialGraph4DoF, Optimizer.cc:5292).
    Returns the problem with updated (R, t, s).
    """
    K = prob.R.shape[0]
    right = mode == "4dof"
    pin_dofs = (3, 4, 6) if right else ((6,) if fix_scale else ())

    def gn_step(carry, _):
        R, t, s = carry

        def per_edge(i, j, Rm, tm, sm, w, v):
            def f(xi2):
                return _edge_residual(
                    R[i], t[i], s[i], R[j], t[j], s[j], Rm, tm, sm,
                    xi2[:7], xi2[7:], right=right,
                )
            r = f(jnp.zeros(14, R.dtype))
            J = jax.jacfwd(f)(jnp.zeros(14, R.dtype))  # (7,14)
            wv = w * v
            return r, J[:, :7], J[:, 7:], wv

        r, Ji, Jj, w = jax.vmap(per_edge)(
            prob.e_i, prob.e_j, prob.e_R, prob.e_t, prob.e_s,
            prob.e_w, prob.e_valid.astype(prob.R.dtype),
        )

        # accumulate dense normal equations
        JiW = Ji * w[:, None, None]
        JjW = Jj * w[:, None, None]
        Hii = jax.ops.segment_sum(jnp.einsum("eri,erj->eij", JiW, Ji), prob.e_i, K)
        Hjj = jax.ops.segment_sum(jnp.einsum("eri,erj->eij", JjW, Jj), prob.e_j, K)
        bi = jax.ops.segment_sum(jnp.einsum("eri,er->ei", JiW, r), prob.e_i, K)
        bj = jax.ops.segment_sum(jnp.einsum("eri,er->ei", JjW, r), prob.e_j, K)
        Hij = jax.ops.segment_sum(
            jnp.einsum("eri,erj->eij", JiW, Jj), prob.e_i * K + prob.e_j, K * K
        ).reshape(K, K, 7, 7)

        H = jnp.zeros((K, 7, K, 7), prob.R.dtype)
        H = H.at[jnp.arange(K), :, jnp.arange(K), :].add(Hii + Hjj)
        H = H + jnp.transpose(Hij, (0, 2, 1, 3))
        H = H + jnp.transpose(Hij, (1, 3, 0, 2))
        b = bi + bj

        # gauge + DOF masking
        free = (~prob.fixed).astype(prob.R.dtype)
        H = H * free[:, None, None, None] * free[None, None, :, None]
        b = b * free[:, None]
        for d in pin_dofs:
            H = H.at[:, d, :, :].set(0.0).at[:, :, :, d].set(0.0)
            b = b.at[:, d].set(0.0)
        # unit diagonal on pinned DOFs keeps the system nonsingular
        diag = jnp.einsum("kaka->ka", H)
        pin = (diag <= 1e-12).astype(prob.R.dtype)
        H = H.at[jnp.arange(K)[:, None], jnp.arange(7)[None, :],
                 jnp.arange(K)[:, None], jnp.arange(7)[None, :]].add(pin)
        H = H.at[jnp.arange(K)[:, None], jnp.arange(7)[None, :],
                 jnp.arange(K)[:, None], jnp.arange(7)[None, :]].add(1e-6)

        dx = -jnp.linalg.solve(H.reshape(K * 7, K * 7), b.reshape(K * 7))
        dx = dx.reshape(K, 7) * free[:, None]
        for d in pin_dofs:
            dx = dx.at[:, d].set(0.0)

        dR, dt, ds = lie.sim3_exp(dx)
        if right:
            R_n, t_n, s_n = jax.vmap(lie.sim3_mul)(R, t, s, dR, dt, ds)
        else:
            R_n, t_n, s_n = jax.vmap(lie.sim3_mul)(dR, dt, ds, R, t, s)
        R_n = lie.orthonormalize(R_n)
        ok = jnp.all(jnp.isfinite(dx))
        R = jnp.where(ok, R_n, R)
        t = jnp.where(ok, t_n, t)
        s = jnp.where(ok, s_n, s)
        return (R, t, s), jnp.sum(r * r * w[:, None])

    (R, t, s), costs = jax.lax.scan(
        gn_step, (prob.R, prob.t, prob.s), None, length=n_iters
    )
    return prob._replace(R=R, t=t, s=s), costs


def make_edges_from_poses(R, t, s, pairs, weights=None):
    """Build measured relative Sim3 edges S_ji = S_j S_i^{-1} from current
    vertex poses for the given (i, j) index pairs. Host-side helper used by
    loop closing to freeze spanning-tree / covisibility constraints before
    the corrected poses are injected."""
    import numpy as np

    pairs = np.asarray(pairs, np.int32)
    if weights is None:
        weights = np.ones(len(pairs), np.float32)
    i, j = pairs[:, 0], pairs[:, 1]
    Ri, ti, si = jnp.asarray(R[i]), jnp.asarray(t[i]), jnp.asarray(s[i])
    Rj, tj, sj = jnp.asarray(R[j]), jnp.asarray(t[j]), jnp.asarray(s[j])
    Rii, tii, sii = jax.vmap(lie.sim3_inverse)(Ri, ti, si)
    Rm, tm, sm = jax.vmap(lie.sim3_mul)(Rj, tj, sj, Rii, tii, sii)
    return (
        np.asarray(Rm), np.asarray(tm), np.asarray(sm),
        np.asarray(weights, np.float32),
    )

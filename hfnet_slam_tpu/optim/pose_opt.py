"""Motion-only pose optimization (the per-frame tracking optimizer).

Replaces Optimizer::PoseOptimization (/root/reference/src/Optimizer.cc:
814-1114): g2o Levenberg-Marquardt over a single SE3 vertex with monocular
reprojection edges, run as 4 rounds x 10 iterations with chi-square
inlier/outlier re-classification between rounds (outliers are *recycled*:
an edge marked outlier can return if its error drops below the gate), and
the Huber kernel dropped from round 3 on (Optimizer.cc:1040).

Here the whole schedule is one jitted fixed-shape computation: residuals
and 6x6 normal equations are batched over the (padded) observation set.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import lie
from . import factors

N_ROUNDS = 4
# LM iterations per round. The reference runs 4x10 (Optimizer.cc:1009);
# with the accept-test LM here each round converges in <5 steps from the
# motion-model / previous-stage init, and the per-round chi2
# re-classification (the part that matters for robustness) is unchanged.
N_ITERS = 5


@partial(jax.jit, static_argnames=("cam_kind",))
def pose_optimize(
    cam_kind,
    cam_params,
    R0,
    t0,
    points_w,
    uv,
    inv_sigma2,
    valid,
    chi2_th: float = factors.CHI2_MONO,
    z_meas=None,
    wz=None,
):
    """Optimize Tcw given fixed 3-D points and their observations.

    Args:
      R0, t0: initial world->camera pose.
      points_w: (N,3) world points.
      uv: (N,2) observed pixels.
      inv_sigma2: (N,) information scale (1/1.2^(2*octave) per the
        reference's per-level sigma).
      valid: (N,) bool.
      z_meas/wz: optional per-observation depth + pixel-equivalent weight
        (stereo/RGB-D points get the 3-dof edge, chi2 7.815 like the
        reference's deltaStereo branch, Optimizer.cc:871-872).
    Returns dict(R, t, inlier (N,), n_inliers).
    """
    return pose_optimize_core(cam_kind, cam_params, R0, t0, points_w, uv,
                              inv_sigma2, valid, chi2_th, z_meas, wz)


def pose_optimize_core(
    cam_kind,
    cam_params,
    R0,
    t0,
    points_w,
    uv,
    inv_sigma2,
    valid,
    chi2_th=factors.CHI2_MONO,
    z_meas=None,
    wz=None,
):
    """Traceable body of pose_optimize: called directly by the fused
    per-frame tracking program (slam/fused.py) so the whole front-end stays
    one XLA computation."""
    if z_meas is None:
        z_meas = jnp.zeros(points_w.shape[0])
    if wz is None:
        wz = jnp.zeros(points_w.shape[0])
    # per-edge Huber delta^2 = chi2 threshold (deltaMono/deltaStereo)
    delta2 = jnp.where(wz > 0, factors.CHI2_STEREO, chi2_th)

    def residuals(R, t):
        r, Jp, _, depth = jax.vmap(
            lambda p, u, z, w: factors.reproj_depth_residual(
                cam_kind, cam_params, R, t, p, u, z, w)
        )(points_w, uv, z_meas, wz)
        return r, Jp, depth

    def chi2_of(r):
        return jnp.sum(r * r, axis=-1) * inv_sigma2

    def gn_round(carry, robust):
        R, t, inlier = carry

        def gn_step(st, _):
            R, t, lam = st
            r, J, depth = residuals(R, t)
            chi2 = chi2_of(r)
            w = jnp.where(robust, factors.huber_weight(chi2, delta2), 1.0)
            w = w * inv_sigma2 * inlier * (depth > 0)
            H = jnp.einsum("nri,n,nrj->ij", J, w, J)
            b = jnp.einsum("nri,n,nr->i", J, w, r)
            H = H + lam * jnp.diag(jnp.diag(H))
            dx = -jnp.linalg.solve(H + 1e-9 * jnp.eye(6), b)
            R_new, t_new = lie.se3_retract(R, t, dx)
            # accept if total robust cost decreases; compare via the sum of
            # per-edge differences — differencing two large f32 sums loses
            # the signal once the step reduction is ~1e-4 of the total
            r2, _, d2 = residuals(R_new, t_new)
            co = jnp.minimum(chi2, delta2 + jnp.sqrt(delta2 * jnp.maximum(chi2 - delta2, 0.0))) * inlier
            chi2_new = chi2_of(r2)
            cn = jnp.minimum(chi2_new, delta2 + jnp.sqrt(delta2 * jnp.maximum(chi2_new - delta2, 0.0))) * inlier
            accept = jnp.sum(cn - co) < 0
            R = jnp.where(accept, R_new, R)
            t = jnp.where(accept, t_new, t)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            return (R.astype(st[0].dtype), t.astype(st[1].dtype), lam), None

        (R, t, _), _ = jax.lax.scan(
            gn_step, (R, t, jnp.asarray(1e-4, R.dtype)), None, length=N_ITERS
        )
        R = lie.orthonormalize(R).astype(R.dtype)  # see lie.orthonormalize
        # re-classify: outlier recycling — recompute from the base valid set
        r, _, depth = residuals(R, t)
        chi2 = chi2_of(r)
        inlier = valid & (chi2 <= delta2) & (depth > 0)
        return (R, t, inlier.astype(jnp.float32)), None

    inlier0 = valid.astype(jnp.float32)
    carry = (R0, t0, inlier0)
    # rounds 1-2 with Huber, rounds 3-4 plain least squares (Optimizer.cc:1040)
    for rnd in range(N_ROUNDS):
        carry, _ = gn_round(carry, robust=jnp.asarray(rnd < 2))
    R, t, inlier_f = carry
    inlier = inlier_f > 0
    return {"R": R, "t": t, "inlier": inlier, "n_inliers": jnp.sum(inlier)}

"""Shared factor (residual/Jacobian) builders for the Gauss-Newton engine.

One functional factor library replaces the reference's g2o vertex/edge zoo
(src/G2oTypes.cc, src/OptimizableTypes.cpp): every factor returns
(residual, Jacobians, weight) for fixed-shape batched edges under vmap.

Conventions:
  * Poses are world->camera (Tcw = (R, t)), like the reference.
  * Tangent updates are LEFT-multiplicative on Tcw: T' = Exp(xi) T,
    xi = [rho, phi] — matching lie.se3_retract.
  * chi2 thresholds: 5.991 (mono, 2 dof) / 7.815 (stereo, 3 dof)
    (src/Optimizer.cc:871-872).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import lie
from ..geometry import cameras

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


def huber_weight(chi2, delta2):
    """Huber IRLS weight on the squared, information-weighted residual."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


def reproj_residual(cam_kind, cam_params, R, t, p_w, uv):
    """Monocular reprojection residual + Jacobians.

    Returns r (2,), J_pose (2,6) wrt left-tangent of Tcw, J_point (2,3) wrt
    world point, depth (scalar, for cheirality gating)."""
    pc = R @ p_w + t
    r = cameras.project(cam_kind, cam_params, pc) - uv
    Jproj = cameras.project_jac(cam_kind, cam_params, pc)  # (2,3)
    # d pc / d xi for T' = Exp(xi) Tcw: dpc = drho + dphi x pc
    J_pose = jnp.concatenate([Jproj, -Jproj @ lie.hat(pc)], axis=1)  # (2,6)
    J_point = Jproj @ R
    return r, J_pose, J_point, pc[2]


def reproj_depth_residual_rig(cam_kind, cam_params_l, cam_params_r,
                              R_rl, t_rl, sel, R, t, p_w, uv, z_meas, w_z):
    """Rig-aware reprojection(+depth) residual: sel = 0 observes through
    the LEFT (body) camera, sel = 1 through the RIGHT camera at extrinsic
    (R_rl, t_rl) (x_r = R_rl x_l + t_rl) with its own intrinsics.

    The TPU-native replacement for the reference's "ToBody" edges
    (EdgeSE3ProjectXYZToBody, include/OptimizableTypes.h:110-144): right-
    camera keypoints are first-class measurements of the LEFT pose. Both
    cameras must share cam_kind (true for real rigs: KB8+KB8 pinhole+
    pinhole); per-edge camera selection is an arithmetic blend of the
    extrinsic and the intrinsic vectors, so one vmapped factor serves
    mixed edge sets without branching.

    Returns r (3,), J_pose (3,6) wrt the LEFT pose tangent, J_point (3,3),
    depth (in the OBSERVING camera)."""
    s = sel.astype(R.dtype) if hasattr(sel, "astype") else jnp.asarray(
        sel, R.dtype)
    eye = jnp.eye(3, dtype=R.dtype)
    R_x = s * R_rl + (1.0 - s) * eye
    t_x = s * t_rl
    params = s * cam_params_r + (1.0 - s) * cam_params_l

    pc_l = R @ p_w + t
    pc = R_x @ pc_l + t_x
    r2 = cameras.project(cam_kind, params, pc) - uv
    rz = w_z * (pc[2] - z_meas)
    r = jnp.concatenate([r2, rz[None]])
    Jproj = cameras.project_jac(cam_kind, params, pc)      # (2,3)
    Jz = w_z * jnp.array([0.0, 0.0, 1.0])
    Jpc = jnp.concatenate([Jproj, Jz[None]], axis=0)       # (3,3) d r/d pc
    Jpc_l = Jpc @ R_x                                       # d r / d pc_l
    J_pose = jnp.concatenate([Jpc_l, -Jpc_l @ lie.hat(pc_l)], axis=1)
    J_point = Jpc_l @ R
    return r, J_pose, J_point, pc[2]


def reproj_depth_residual(cam_kind, cam_params, R, t, p_w, uv, z_meas, w_z):
    """Reprojection + depth residual: r = [du, dv, w_z (z - z_meas)].

    The TPU-native replacement for the reference's 3-d stereo edge
    EdgeStereoSE3ProjectXYZ with error (u, v, uR) (include/OptimizableTypes.h,
    src/Optimizer.cc stereo branches): a right-image column uR = u - bf/z
    carries exactly one extra datum — the depth — so the residual here uses
    z directly with the pixel-equivalent weight w_z = bf / z_meas^2
    (d uR = bf/z^2 dz), keeping chi2 thresholds in pixel units
    (CHI2_STEREO = 7.815 for 3 dof). w_z = 0 turns the row off (mono edge).

    Returns r (3,), J_pose (3,6), J_point (3,3), depth.
    """
    pc = R @ p_w + t
    r2 = cameras.project(cam_kind, cam_params, pc) - uv
    rz = w_z * (pc[2] - z_meas)
    r = jnp.concatenate([r2, rz[None]])
    Jproj = cameras.project_jac(cam_kind, cam_params, pc)  # (2,3)
    Jz = w_z * jnp.array([0.0, 0.0, 1.0])                  # d rz / d pc
    Jpc = jnp.concatenate([Jproj, Jz[None]], axis=0)       # (3,3)
    J_pose = jnp.concatenate([Jpc, -Jpc @ lie.hat(pc)], axis=1)  # (3,6)
    J_point = Jpc @ R
    return r, J_pose, J_point, pc[2]

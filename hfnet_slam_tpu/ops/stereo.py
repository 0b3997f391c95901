"""Stereo depth association kernels.

Replaces the reference's Frame::ComputeStereoMatches
(/root/reference/src/Frame.cc:824-: per-row candidate tables, descriptor
distance with gate (TH_HIGH+TH_LOW)/2, SAD sub-pixel refinement) and
Frame::ComputeStereoFromRGBD.

TPU design: rectified-stereo matching is one masked similarity matmul —
the row table becomes a |vL - vR| <= tol band mask and the disparity range
a [minD, maxD] mask; sub-pixel refinement is unnecessary at 256-d float
descriptor accuracy (the reference's SAD step compensates for ORB's
coarse binary descriptors).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import matching as M


@partial(jax.jit, static_argnames=("max_dist",))
def match_stereo(
    xyL, descL, octL, maskL,
    xyR, descR, octR, maskR,
    fx: float, baseline: float,
    min_z: float = 0.1,
    row_tol: float = 2.0,
    max_dist: float = (M.TH_HIGH + M.TH_LOW) / 2,
):
    """Associate rectified left/right features and return per-left-slot
    depth.

    Gates (mirroring Frame::ComputeStereoMatches):
      * same row: |vL - vR| <= row_tol * 1.2^octave(L)
      * disparity in (minD, maxD): uR in [uL - maxD, uL - minD]
      * octave agreement within 1 level
      * mutual best descriptor match under max_dist

    Returns:
      depth: (NL,) f32, 0 where unmatched.
      u_right: (NL,) matched right x-coordinate (or -1).
    """
    bf = fx * baseline
    max_d = bf / min_z          # max disparity (close points)
    min_d = 0.0

    row_w = row_tol * 1.2 ** octL.astype(jnp.float32)
    row_ok = jnp.abs(xyL[:, 1:2] - xyR[None, :, 1]) <= row_w[:, None]
    disp = xyL[:, 0:1] - xyR[None, :, 0]
    disp_ok = (disp > min_d) & (disp < max_d)
    oct_ok = jnp.abs(octL[:, None] - octR[None, :]) <= 1
    allowed = row_ok & disp_ok & oct_ok

    idx, dist = M.match_descriptors(
        descL, maskL, descR, maskR,
        max_dist=max_dist, mutual=True, allowed=allowed,
    )
    uR = jnp.where(idx >= 0, xyR[jnp.clip(idx, 0, xyR.shape[0] - 1), 0], -1.0)
    d = xyL[:, 0] - uR
    depth = jnp.where((idx >= 0) & (d > 1e-3), bf / jnp.maximum(d, 1e-3), 0.0)
    return depth, uR


@partial(jax.jit, static_argnames=("kind_l", "kind_r", "max_dist", "ratio"))
def match_stereo_fisheye(
    kind_l, params_l, kind_r, params_r,
    xyL, descL, octL, maskL,
    xyR, descR, octR, maskR,
    R_lr, t_lr,
    max_dist: float = 0.8,
    ratio: float = 0.7,
    min_parallax_cos: float = 0.9998,
    chi2: float = 5.991,
):
    """Non-overlapping / unrectified (fisheye) stereo association — the
    reference's Frame::ComputeStereoFishEyeMatches + KB8::TriangulateMatches
    (/root/reference/src/Frame.cc:1138-1175,
    src/CameraModels/KannalaBrandt8.cpp:306-376) as ONE program:

      1. brute-force descriptor matching with Lowe's 0.7 ratio (one MXU
         matmul instead of the BFMatcher knn loop);
      2. unproject both keypoints to z=1 bearings (KB8 Newton inversion);
      3. parallax gate cosParallaxRays < 0.9998;
      4. batched DLT triangulation in the LEFT camera frame;
      5. cheirality both views + reprojection chi2 <= 5.991 * sigma^2
         through each camera's own (fisheye) projection.

    Args:
      R_lr, t_lr: pose of the RIGHT camera in the LEFT frame
        (x_l = R_lr @ x_r + t_lr — the reference's mRlr/mtlr).

    Returns:
      depth: (NL,) z in the left camera, 0 where unmatched/rejected.
      idx:   (NL,) matched right slot or -1.
      p3d:   (NL,3) triangulated points in the left camera frame.
    """
    from ..geometry import cameras, triangulation

    idx, _ = M.match_descriptors(
        descL, maskL, descR, maskR,
        max_dist=max_dist, ratio=ratio, mutual=True,
    )
    NR = xyR.shape[0]
    safe = jnp.clip(idx, 0, NR - 1)

    r1 = cameras.unproject(kind_l, params_l, xyL)      # (NL,3), z = 1
    r2 = cameras.unproject(kind_r, params_r, xyR)[safe]

    # parallax between the rays, right rotated into the left camera
    r21 = r2 @ R_lr.T
    cosp = jnp.sum(r1 * r21, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r21, axis=-1), 1e-12)

    # triangulate in the left frame: cam2-from-cam1 is (R_rl, t_rl)
    R_rl = R_lr.T
    t_rl = -R_lr.T @ t_lr
    p1 = triangulation.triangulate_dlt(r1[:, :2], r2[:, :2], R_rl, t_rl)
    z1 = p1[..., 2]
    p2 = p1 @ R_rl.T + t_rl
    z2 = p2[..., 2]

    uv1 = cameras.project(kind_l, params_l, p1)
    uv2 = cameras.project(kind_r, params_r, p2)
    s2_1 = 1.2 ** (2.0 * octL.astype(jnp.float32))
    s2_2 = 1.2 ** (2.0 * octR.astype(jnp.float32))[safe]
    e1 = jnp.sum((uv1 - xyL) ** 2, -1)
    e2 = jnp.sum((uv2 - xyR[safe]) ** 2, -1)

    ok = ((idx >= 0) & (cosp < min_parallax_cos)
          & (z1 > 0) & (z2 > 0)
          & (e1 <= chi2 * s2_1) & (e2 <= chi2 * s2_2)
          & jnp.all(jnp.isfinite(p1), axis=-1))
    depth = jnp.where(ok, z1, 0.0)
    return depth, jnp.where(ok, idx, -1).astype(jnp.int32), p1


@jax.jit
def depth_at_keypoints(depth_image, xy, depth_factor: float = 1.0):
    """RGB-D: sample the registered depth map at keypoint locations
    (Frame::ComputeStereoFromRGBD — nearest-neighbor like the reference's
    depth.at<float>(v,u) lookup)."""
    H, W = depth_image.shape
    u = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, W - 1)
    v = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, H - 1)
    d = depth_image[v, u] * depth_factor
    return jnp.where(jnp.isfinite(d) & (d > 0), d, 0.0)

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

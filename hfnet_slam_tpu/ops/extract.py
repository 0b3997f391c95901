"""Keypoint extraction post-processing, in-graph and batched.

Replaces the reference's CPU post-processing loop
(HFNetRTModel::GetLocalFeaturesFromTensor, src/Extractors/HFNetRTModel.cc:
139-196: threshold scan -> nth_element top-K -> bilinear Resampler ->
row L2 normalize) and the in-graph simple_nms
(hfnet/models/utils/layers.py:10-32) with fully vectorized JAX ops:
top_k + gather run on-device, so keypoints/descriptors never bounce
through the host between inference and matching.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def simple_nms(scores, radius: int = 4, iterations: int = 2):
    """Max-pool NMS on the dense score map, (B,H,W) -> (B,H,W).

    Mirrors hfnet/models/utils/layers.py:10-32 (iterations reduced 3->2 for
    export per hfnet/README.md:48)."""
    size = 2 * radius + 1

    def max_pool(x):
        # max is separable: two 1-D windows do the work of one 2-D window
        # (size^2 -> 2*size comparisons per pixel on the VPU)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, size, 1), window_strides=(1, 1, 1),
            padding="SAME",
        )
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 1, size), window_strides=(1, 1, 1),
            padding="SAME",
        )

    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool(scores)
    for _ in range(iterations - 1):
        supp_mask = max_pool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask, scores, zeros)


def select_keypoints(scores, valid_mask, threshold: float, k: int):
    """Top-K keypoints above threshold from a (H,W) score map.

    Returns (xy (k,2) float32 [x,y], score (k,), mask (k,)). Invalid slots
    have score 0 and mask False. valid_mask may be None (whole map valid).
    Mirrors the threshold scan + nth_element of HFNetRTModel.cc:155-179
    (ties broken by flat index instead of scan order)."""
    H, W = scores.shape
    s = scores if valid_mask is None else jnp.where(valid_mask, scores, 0.0)
    s = s.reshape(-1)
    vals, idx = jax.lax.top_k(s, k)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    mask = vals >= threshold
    return jnp.stack([xs, ys], axis=-1), jnp.where(mask, vals, 0.0), mask


def refine_subpixel(scores, xy):
    """3-tap quadratic subpixel refinement of integer keypoint peaks.

    Fits a parabola per axis through the RAW (pre-NMS) score samples at
    {-1, 0, +1} around each peak; the vertex offset
    0.5*(s_minus - s_plus) / (s_minus - 2 s_0 + s_plus) is clamped to
    +-0.5 px. The reference keeps integer keypoints
    (HFNetRTModel.cc:155-179); at fx ~ 450 a half-pixel of localization
    noise is ~1 mrad of bearing error on every factor, so this is a
    strict accuracy win at negligible cost (one 5-point gather).
    """
    H, W = scores.shape
    xi = xy[:, 0].astype(jnp.int32)
    yi = xy[:, 1].astype(jnp.int32)

    def at(yy, xx):
        return scores[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]

    s0 = at(yi, xi)
    sxm, sxp = at(yi, xi - 1), at(yi, xi + 1)
    sym, syp = at(yi - 1, xi), at(yi + 1, xi)
    denx = sxm - 2.0 * s0 + sxp
    deny = sym - 2.0 * s0 + syp
    dx = jnp.where(jnp.abs(denx) > 1e-9, 0.5 * (sxm - sxp) / denx, 0.0)
    dy = jnp.where(jnp.abs(deny) > 1e-9, 0.5 * (sym - syp) / deny, 0.0)
    dx = jnp.clip(dx, -0.5, 0.5)
    dy = jnp.clip(dy, -0.5, 0.5)
    edge = (xi <= 0) | (xi >= W - 1) | (yi <= 0) | (yi >= H - 1)
    off = jnp.where(edge[:, None], 0.0, jnp.stack([dx, dy], -1))
    return xy + off


def sample_descriptors(desc_map, xy, img_hw):
    """Bilinear-resample L2-normalized descriptors at keypoint locations.

    Args:
      desc_map: (h, w, C) coarse descriptor map (stride-8 of the image).
      xy: (k, 2) keypoint pixel coords [x, y] in the *image* resolution.
      img_hw: (H, W) static image size the keypoints live in.
    Returns (k, C) row-L2-normalized descriptors.

    Coordinate convention mirrors HFNetRTModel.cc:147-149 + the
    tf.contrib.resampler port in BaseModel.cc:490-562:
      x_map = (w-1)/(W-1) * x,  y_map = (h-1)/(H-1) * y   (align corners),
    bilinear with zero padding outside the map.
    """
    h, w, C = desc_map.shape
    H, W = img_hw
    sx = (w - 1.0) / (W - 1.0)
    sy = (h - 1.0) / (H - 1.0)
    x = xy[:, 0] * sx
    y = xy[:, 1] * sy

    fx = jnp.floor(x)
    fy = jnp.floor(y)
    cx = fx + 1
    cy = fy + 1
    dx = cx - x  # weight of floor x
    dy = cy - y

    def gather(ix, iy):
        inb = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        vals = desc_map[iyc, ixc]  # (k, C)
        return vals * inb[:, None]

    out = (
        (dx * dy)[:, None] * gather(fx, fy)
        + ((1 - dx) * (1 - dy))[:, None] * gather(cx, cy)
        + (dx * (1 - dy))[:, None] * gather(fx, cy)
        + ((1 - dx) * dy)[:, None] * gather(cx, fy)
    )
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


def level_budgets(n_features: int, scale_factor: float, n_levels: int):
    """Geometric per-level keypoint budget split (HFextractor.cc:108-119)."""
    inv = 1.0 / scale_factor
    n_desired = n_features * (1 - inv) / (1 - inv ** n_levels)
    budgets = []
    acc = 0
    for i in range(n_levels - 1):
        b = int(round(n_desired))
        budgets.append(b)
        acc += b
        n_desired *= inv
    budgets.append(max(n_features - acc, 0))
    return budgets

"""SLAM-level data-association searches.

Thin, jit-compiled wrappers that combine geometric gating (projection
windows, epipolar constraint) with the MXU descriptor matcher —
the TPU equivalents of the reference Matcher's variants
(src/Matcher.cc): SearchByProjection, SearchByBoW (mutual brute force),
SearchForInitialization, SearchForTriangulation.

All functions take fixed-capacity padded arrays + masks.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import cameras
from ..ops import matching as M


@partial(jax.jit, static_argnames=("cam_kind", "max_dist", "ratio"))
def search_by_projection(
    cam_kind,
    cam_params,
    img_wh,
    R,
    t,
    mp_pos,
    mp_desc,
    mp_valid,
    feat_xy,
    feat_desc,
    feat_octave,
    feat_mask,
    radius: float,
    max_dist: float = M.TH_HIGH,
    ratio: float = 1.0,
    mp_normal=None,
    mp_dmin=None,
    mp_dmax=None,
):
    """Match frame features against projected map points
    (Matcher::SearchByProjection, src/Matcher.cc:40-210).

    The per-keypoint search window scales with the keypoint's pyramid level
    (radius * 1.2^octave), mirroring the reference's th*scaleFactor window.

    When per-point viewing stats are given, the reference's frustum gates
    apply (Frame::isInFrustum + Matcher.cc:212-218): distance inside
    [0.8 dmin, 1.2 dmax], viewing cos(normal, ray) > 0.5, and a tighter
    window (x 2.5/4.0) for head-on views. Points with dmax == 0 have no
    stats yet and pass ungated.

    Returns:
      idx: (N_feat,) int32 index into the mp arrays or -1.
      proj_uv: (N_mp,2) projected pixels (for diagnostics).
    """
    pc = mp_pos @ R.T + t
    depth_ok = pc[:, 2] > 0.1
    uv = cameras.project(cam_kind, cam_params, pc)
    W, H = img_wh
    in_img = (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
    mp_ok = mp_valid & depth_ok & in_img

    radii = radius * (1.2 ** feat_octave.astype(jnp.float32))
    if mp_normal is not None:
        # viewing ray from the camera center, in world coords
        center = -R.T @ t
        ray = mp_pos - center[None, :]
        dist = jnp.maximum(jnp.linalg.norm(ray, axis=1), 1e-9)
        view_cos = jnp.sum(ray / dist[:, None] * mp_normal, axis=1)
        has_stats = mp_dmax > 0
        dist_ok = (dist >= 0.8 * mp_dmin) & (dist <= 1.2 * mp_dmax)
        cos_ok = view_cos > 0.5
        mp_ok = mp_ok & (~has_stats | (dist_ok & cos_ok))
        # head-on views get the tight window (2.5 vs 4.0, Matcher.cc:212)
        tight = has_stats & (view_cos > 0.998)
        radii_mp = jnp.where(tight, 2.5 / 4.0, 1.0)
        d2 = jnp.sum((feat_xy[:, None, :] - uv[None, :, :]) ** 2, axis=-1)
        allowed = d2 <= (radii[:, None] * radii_mp[None, :]) ** 2
    else:
        allowed = M.radius_allowed(feat_xy, uv, radii)
    idx, dist = M.match_descriptors(
        feat_desc, feat_mask, mp_desc, mp_ok,
        max_dist=max_dist, ratio=ratio, mutual=True, allowed=allowed,
    )
    return idx, uv, mp_ok


def _dispatch_platform(*arrs) -> str:
    """Platform this dispatch will actually LOWER for. jax.default_backend()
    alone is wrong in split deployments: a TPU-backend process with
    jax_default_device pinned to CPU (the bench's CNN section, any
    host-pinned stack next to an accelerator extractor) lowers
    numpy-input calls for CPU — routing those to a Pallas TPU kernel
    raises 'Only interpret mode is supported on CPU backend'."""
    for a in arrs:
        if isinstance(a, jax.Array):
            try:
                return next(iter(a.devices())).platform
            except Exception:  # pragma: no cover - exotic array types
                pass
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def search_brute_force(descA, maskA, descB, maskB, max_dist: float = M.TH_LOW, ratio: float = 1.0):
    """Mutual brute-force matching (the reference's SearchByBoW —
    cv::BFMatcher(NORM_L2, crossCheck), src/Matcher.cc:220-263).

    On TPU with MXU-aligned shapes this routes to the fused Pallas kernel
    (ops/pallas_match.py: matmul + top-2 reduction without materializing
    the similarity matrix in HBM, ~1.8x the XLA path); elsewhere it falls
    back to the XLA matcher."""
    if (
        _dispatch_platform(descA, descB) == "tpu"
        and descA.shape[0] % 128 == 0
        and descA.shape[1] % 128 == 0
        and descB.shape[0] % 128 == 0
    ):
        from ..ops import pallas_match as PM

        return PM.match_descriptors_fused(
            descA, maskA, descB, maskB, max_dist=max_dist, ratio=ratio
        )
    return _search_brute_force_xla(descA, maskA, descB, maskB,
                                   max_dist=max_dist, ratio=ratio)


@partial(jax.jit, static_argnames=("max_dist", "ratio"))
def _search_brute_force_xla(descA, maskA, descB, maskB, max_dist, ratio):
    return M.match_descriptors(descA, maskA, descB, maskB, max_dist=max_dist, ratio=ratio, mutual=True)


@partial(jax.jit, static_argnames=("max_dist", "ratio"))
def search_for_initialization(
    xyA, descA, maskA, xyB, descB, maskB,
    window: float = 100.0, max_dist: float = M.TH_LOW, ratio: float = 0.9,
):
    """Windowed search between the two init frames
    (Matcher::SearchForInitialization, src/Matcher.cc:486)."""
    allowed = M.window_allowed(xyA, xyB, window)
    return M.match_descriptors(
        descA, maskA, descB, maskB, max_dist=max_dist, ratio=ratio, mutual=True, allowed=allowed
    )


@partial(jax.jit, static_argnames=("max_dist",))
def search_for_triangulation(
    xn1, desc1, sigma2_1, mask1,
    xn2, desc2, sigma2_2, mask2,
    R21, t21,
    f_px: float,
    max_dist: float = M.TH_LOW,
    chi2_epi: float = 3.84,
):
    """Epipolar-gated mutual matching between two keyframes for new-point
    triangulation (Matcher::SearchForTriangulation, src/Matcher.cc:763-936:
    GEMM similarity + cross-check + epipole-distance and epipolar gates).

    Inputs are *normalized* coordinates (unprojected bearings, z=1) so the
    gate is camera-model agnostic; f_px converts the pixel sigma to
    normalized units.

    R21/t21: relative pose cam1 -> cam2 (x2 = R21 x1 + t21).
    """
    # essential matrix for (xn2^T E xn1 = 0)
    tx = jnp.array(
        [
            [0.0, -t21[2], t21[1]],
            [t21[2], 0.0, -t21[0]],
            [-t21[1], t21[0], 0.0],
        ]
    )
    E = tx @ R21

    h1 = jnp.concatenate([xn1, jnp.ones_like(xn1[:, :1])], axis=1)  # (N1,3)
    h2 = jnp.concatenate([xn2, jnp.ones_like(xn2[:, :1])], axis=1)
    l2 = h1 @ E.T  # epiline of each x1 in image 2: (N1,3)
    # squared point-line distance of each x2 to each l2: (N1,N2)
    num = (l2 @ h2.T) ** 2
    den = jnp.maximum(l2[:, 0:1] ** 2 + l2[:, 1:2] ** 2, 1e-12)
    d2 = num / den  # normalized units^2
    sigma_n2 = sigma2_2[None, :] / (f_px * f_px)
    epi_ok = d2 < chi2_epi * sigma_n2

    # epipole-distance gate: x2 not too close to the epipole (Matcher.cc:894).
    # Epipole in image-2 normalized coords = projection of camera-1's center,
    # which in cam-2 coordinates is t21 (x2 = R21 x1 + t21 with x1 = 0).
    epi = t21[:2] / jnp.where(jnp.abs(t21[2]) < 1e-9, 1e-9, t21[2])
    d_ep2 = jnp.sum((xn2 - epi[None, :]) ** 2, axis=1) * (f_px * f_px)
    far_from_epipole = d_ep2 > 100.0 * sigma2_2  # (10 px)^2 scaled by level

    allowed = epi_ok & far_from_epipole[None, :]
    idx, dist = M.match_descriptors(
        desc1, mask1, desc2, mask2, max_dist=max_dist, mutual=True, allowed=allowed
    )
    return idx, dist

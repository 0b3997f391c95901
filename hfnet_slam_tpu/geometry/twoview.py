"""Two-view reconstruction (monocular map initialization), pure JAX.

TPU-native replacement for /root/reference/src/TwoViewReconstruction.cc
(parallel H & F RANSAC -> model selection -> motion recovery + triangulation,
called from Pinhole::ReconstructWithTwoViews).

Differences from the reference, by design:
  * Works in *normalized* image coordinates (bearings), so it is camera-model
    agnostic (the KB8 path undistorts first, exactly like the reference's
    KannalaBrandt8::ReconstructWithTwoViews does before calling the
    reconstructor). Pixel thresholds are scaled by the focal length.
  * All 200 RANSAC hypotheses for both models are evaluated in parallel with
    vmap (hypothesis x match score matrix on the MXU) instead of a serial loop.
  * Fixed-capacity padded match arrays + masks; fully jit-compatible.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .triangulation import triangulate_dlt, cheirality_and_error

# chi-square thresholds at sigma=1 pixel (TwoViewReconstruction.cc uses
# 3.841 for F inlier test, 5.991 for H and for both models' score)
TH_F = 3.841
TH_H = 5.991
TH_SCORE = 5.991


def _normalize_pts(x, mask):
    """Hartley normalization over valid points: zero mean, unit mean abs dev."""
    m = mask[..., None].astype(x.dtype)
    n = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    mean = jnp.sum(x * m, axis=-2, keepdims=True) / n[..., None, :]
    d = jnp.abs(x - mean) * m
    mean_dev = jnp.sum(d, axis=-2) / n
    s = 1.0 / jnp.maximum(mean_dev, 1e-8)
    xn = (x - mean) * s[..., None, :]
    # T maps x -> xn:  xn = diag(s) (x - mean)
    return xn, mean[..., 0, :], s


def _eight_point_F(p1, p2, mask=None):
    """Normalized 8-point algorithm. p1, p2: (N, 2), optional mask (N,).
    Returns F (3,3) with rank-2 constraint enforced."""
    if mask is None:
        mask = jnp.ones(p1.shape[0], dtype=bool)
    p1n, c1, s1 = _normalize_pts(p1, mask)
    p2n, c2, s2 = _normalize_pts(p2, mask)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, jnp.ones_like(x1)],
        axis=-1,
    ) * mask[:, None]  # (N,9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(F)
    F = (U * jnp.array([S[0], S[1], 0.0])[None, :]) @ Vt2
    # denormalize: F = T2^T Fn T1
    T1 = jnp.array(
        [[s1[0], 0, -s1[0] * c1[0]], [0, s1[1], -s1[1] * c1[1]], [0, 0, 1.0]], p1.dtype
    )
    T2 = jnp.array(
        [[s2[0], 0, -s2[0] * c2[0]], [0, s2[1], -s2[1] * c2[1]], [0, 0, 1.0]], p1.dtype
    )
    return T2.T @ F @ T1


def _dlt_H(p1, p2, mask=None):
    """DLT homography from N>=4 correspondences, optional mask."""
    if mask is None:
        mask = jnp.ones(p1.shape[0], dtype=bool)
    p1n, c1, s1 = _normalize_pts(p1, mask)
    p2n, c2, s2 = _normalize_pts(p2, mask)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0) * jnp.concatenate([mask, mask])[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    Hn = Vt[-1].reshape(3, 3)
    T1 = jnp.array(
        [[s1[0], 0, -s1[0] * c1[0]], [0, s1[1], -s1[1] * c1[1]], [0, 0, 1.0]], p1.dtype
    )
    T2 = jnp.array(
        [[s2[0], 0, -s2[0] * c2[0]], [0, s2[1], -s2[1] * c2[1]], [0, 0, 1.0]], p1.dtype
    )
    T2inv = jnp.linalg.inv(T2)
    return T2inv @ Hn @ T1


def _score_F(F, x1, x2, mask, sigma2):
    """Symmetric epipolar distance score (CheckFundamental)."""
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    l2 = p1 @ F.T  # epiline in image 2
    l1 = p2 @ F  # epiline in image 1
    d2 = jnp.sum(p2 * l2, axis=-1) ** 2 / jnp.maximum(l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12)
    d1 = jnp.sum(p1 * l1, axis=-1) ** 2 / jnp.maximum(l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12)
    c1 = d1 / sigma2
    c2 = d2 / sigma2
    in1 = c1 < TH_F
    in2 = c2 < TH_F
    score = jnp.where(in1, TH_SCORE - c1, 0.0) + jnp.where(in2, TH_SCORE - c2, 0.0)
    inlier = in1 & in2 & mask
    return jnp.sum(score * mask), inlier


def _score_H(H, x1, x2, mask, sigma2):
    Hinv = jnp.linalg.inv(H)
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    q2 = p1 @ H.T
    q2 = q2[..., :2] / jnp.where(jnp.abs(q2[..., 2:]) < 1e-12, 1e-12, q2[..., 2:])
    q1 = p2 @ Hinv.T
    q1 = q1[..., :2] / jnp.where(jnp.abs(q1[..., 2:]) < 1e-12, 1e-12, q1[..., 2:])
    d2 = jnp.sum((q2 - x2) ** 2, axis=-1) / sigma2
    d1 = jnp.sum((q1 - x1) ** 2, axis=-1) / sigma2
    in1 = d1 < TH_H
    in2 = d2 < TH_H
    score = jnp.where(in1, TH_SCORE - d1, 0.0) + jnp.where(in2, TH_SCORE - d2, 0.0)
    inlier = in1 & in2 & mask
    return jnp.sum(score * mask), inlier


def _decompose_E(E):
    """E -> 4 motion hypotheses (R (4,3,3), t (4,3) unit norm)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _decompose_H(H):
    """Faugeras SVD-based homography decomposition -> 8 motion hypotheses.

    Mirrors TwoViewReconstruction::ReconstructH's solution enumeration
    (d' > 0 cases with both signs of x1/x3 and the d'' < 0 cases).
    Returns (R (8,3,3), t (8,3)).
    """
    U, S, Vt = jnp.linalg.svd(H)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = S[0], S[1], S[2]
    V = Vt.T

    eps = 1e-8
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' > 0
    aux_st = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, eps)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    st_s = jnp.array([aux_st, -aux_st, -aux_st, aux_st])

    def make_Rt_pos(i):
        ctheta = ct
        stheta = st_s[i]
        Rp = jnp.array(
            [[ctheta, 0.0, -stheta], [0.0, 1.0, 0.0], [stheta, 0.0, ctheta]], H.dtype
        )
        tp = (d1 - d3) * jnp.array([x1s[i], 0.0, -x3s[i]], H.dtype)
        R = s * U @ Rp @ Vt
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    # case d' < 0
    aux_sp = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, eps)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)
    sp_s = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])

    def make_Rt_neg(i):
        cphi = cp
        sphi = sp_s[i]
        Rp = jnp.array(
            [[cphi, 0.0, sphi], [0.0, -1.0, 0.0], [sphi, 0.0, -cphi]], H.dtype
        )
        tp = (d1 + d3) * jnp.array([x1s[i], 0.0, x3s[i]], H.dtype)
        R = s * U @ Rp @ Vt
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    Rs, ts = [], []
    for i in range(4):
        R, t = make_Rt_pos(i)
        Rs.append(R)
        ts.append(t)
    for i in range(4):
        R, t = make_Rt_neg(i)
        Rs.append(R)
        ts.append(t)
    return jnp.stack(Rs), jnp.stack(ts)


def _check_motion(R21, t21, x1, x2, mask, th2):
    """Triangulate all matches under (R21, t21) and count good points.

    Returns (n_good, parallax_deg, p3d (N,3), good mask)."""
    p1 = triangulate_dlt(x1, x2, R21, t21)
    good, cosp = cheirality_and_error(p1, x1, x2, R21, t21, th2)
    good = good & mask
    n_good = jnp.sum(good)
    # parallax: 50th-largest-parallax trick -> reference takes the 50th
    # smallest cos (min(nGood, 50)); we take a masked quantile instead.
    cosp_masked = jnp.where(good, cosp, 1.0)
    # 50th smallest cos among good (or the largest cos if fewer)
    k = jnp.minimum(n_good, 50)
    sorted_cos = jnp.sort(cosp_masked)
    idx = jnp.clip(k - 1, 0, cosp_masked.shape[0] - 1)
    parallax_cos = sorted_cos[idx]
    parallax_deg = jnp.degrees(jnp.arccos(jnp.clip(parallax_cos, -1.0, 1.0)))
    # median parallax over good points (bad -> cos 1.0, sorts last): the
    # top-50 metric passes even when the BULK of the map has near-zero
    # parallax (tiny baseline vs scene depth), which yields a garbage map
    med_idx = jnp.clip(n_good // 2, 0, cosp_masked.shape[0] - 1)
    med_deg = jnp.degrees(jnp.arccos(jnp.clip(sorted_cos[med_idx], -1.0, 1.0)))
    return n_good, parallax_deg, p1, good, med_deg


@partial(jax.jit, static_argnames=("n_hyp",))
def reconstruct_two_views(x1, x2, mask, key, sigma_n, n_hyp=200, min_parallax_deg=1.0):
    """Full two-view reconstruction from matched normalized coords.

    Args:
      x1, x2: (N,2) normalized coords of matches in views 1 and 2.
      mask:   (N,) bool valid-match mask.
      key:    PRNG key for hypothesis sampling.
      sigma_n: 1-pixel noise in normalized units (≈ 1/fx).
      n_hyp: RANSAC iterations (reference: 200).
    Returns dict with:
      ok (bool), R21 (3,3), t21 (3,), points (N,3) in cam-1 frame,
      good (N,) triangulated-inlier mask, used_H (bool), parallax_deg.
    """
    N = x1.shape[0]
    sigma2 = sigma_n * sigma_n

    logits = jnp.where(mask, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits[None, :], shape=(n_hyp, 8))
    s1 = x1[idx]  # (n_hyp, 8, 2)
    s2 = x2[idx]

    Fs = jax.vmap(_eight_point_F)(s1, s2)
    Hs = jax.vmap(_dlt_H)(s1, s2)

    scores_F, inliers_F = jax.vmap(lambda F: _score_F(F, x1, x2, mask, sigma2))(Fs)
    scores_H, inliers_H = jax.vmap(lambda H: _score_H(H, x1, x2, mask, sigma2))(Hs)

    bF = jnp.argmax(scores_F)
    bH = jnp.argmax(scores_H)
    SF, SH = scores_F[bF], scores_H[bH]
    F_best, H_best = Fs[bF], Hs[bH]
    inl_F, inl_H = inliers_F[bF], inliers_H[bH]

    use_H = SH / jnp.maximum(SH + SF, 1e-12) > 0.5

    # --- refit on the consensus set (gold-standard step) ------------------
    F_best = _eight_point_F(x1, x2, inl_F)
    H_best = _dlt_H(x1, x2, inl_H)
    _, inl_F = _score_F(F_best, x1, x2, mask, sigma2)
    _, inl_H = _score_H(H_best, x1, x2, mask, sigma2)

    # --- motion hypotheses from both models, evaluated uniformly ---------
    # In normalized coords F *is* E; enforce the essential constraint.
    U, S, Vt = jnp.linalg.svd(F_best)
    E = (U * jnp.array([1.0, 1.0, 0.0])[None, :]) @ Vt
    R_E, t_E = _decompose_E(E)  # (4,...)
    R_H, t_H = _decompose_H(H_best)  # (8,...)

    th2 = 4.0 * sigma2  # squared reproj threshold (CheckRT uses 4 sigma^2)

    def eval_family(Rs, ts, inl):
        n_goods, parallaxes, p3ds, goods, med_degs = jax.vmap(
            lambda R, t: _check_motion(R, t, x1, x2, inl, th2)
        )(Rs, ts)
        best = jnp.argmax(n_goods)
        n_best = n_goods[best]
        n_second = jnp.max(
            jnp.where(jnp.arange(Rs.shape[0]) == best, -1, n_goods)
        )
        n_inl = jnp.sum(inl)
        # acceptance gates mirroring ReconstructF/ReconstructH:
        # enough points, clear winner among the family's motions, parallax
        n_min = jnp.maximum(0.5 * n_inl, 50.0)
        ok = (
            (n_best > n_min)
            & (n_second < 0.75 * n_best)
            & (parallaxes[best] > min_parallax_deg)
        )
        return ok, Rs[best], ts[best], p3ds[best], goods[best], n_best, parallaxes[best], med_degs[best]

    res_E = eval_family(R_E, t_E, inl_F)
    res_H = eval_family(R_H, t_H, inl_H)

    # prefer the RH-selected model; fall back to the other if only it passes
    # (more robust than the reference, which simply fails init and retries)
    prefer_H = use_H
    ok_E, ok_H = res_E[0], res_H[0]
    pick_H = jnp.where(prefer_H, ok_H | ~ok_E, ok_H & ~ok_E)

    def pick(i):
        return jnp.where(pick_H, res_H[i], res_E[i])

    ok = jnp.where(pick_H, ok_H, ok_E)
    return {
        "ok": ok,
        "R21": pick(1),
        "t21": pick(2),
        "points": pick(3),
        "good": pick(4) & (ok | jnp.zeros((), bool)),
        "n_good": pick(5),
        "used_H": pick_H,
        "parallax_deg": pick(6),
        "med_parallax_deg": pick(7),
        "score_F": SF,
        "score_H": SH,
    }

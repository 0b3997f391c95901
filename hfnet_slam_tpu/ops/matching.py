"""Descriptor matching & retrieval as MXU matmul kernels.

The reference proves every matching primitive reduces to a similarity
matmul + argmax + cross-check + gating on unit-norm 256-d descriptors
(src/Matcher.cc:848-851 uses an Eigen GEMM des1*des2^T; SearchByBoW is a
brute-force cv::BFMatcher(NORM_L2, crossCheck) at :220-263; the global
KeyFrameDatabase query is a dense 4096-d distance scan,
src/KeyFrameDatabase.cc:85-96). Here those all become one batched,
fixed-shape kernel family that runs entirely on the MXU.

Distance convention: descriptors are L2-normalized, so
  d^2 = 2 - 2 * <a, b>   and thresholds TH_HIGH=0.75 / TH_LOW=0.6
(src/Matcher.cc:33-34) become similarity gates  s > 1 - th^2/2.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

TH_HIGH = 0.75
TH_LOW = 0.6

_NEG = -1e9


def similarity(dA, dB):
    """(NA,D) x (NB,D) -> (NA,NB) cosine similarity on the MXU."""
    return jnp.dot(dA, dB.T, preferred_element_type=jnp.float32)


def dist2_from_sim(s):
    return jnp.maximum(2.0 - 2.0 * s, 0.0)


def sim_from_dist(th):
    return 1.0 - th * th / 2.0


def _top2(S):
    """Row-wise best and second-best. Returns (best_idx, best, second)."""
    best_idx = jnp.argmax(S, axis=1)
    best = jnp.max(S, axis=1)
    S2 = S.at[jnp.arange(S.shape[0]), best_idx].set(_NEG)
    second = jnp.max(S2, axis=1)
    return best_idx, best, second


@partial(jax.jit, static_argnames=("mutual", "ratio", "max_dist"))
def match_descriptors(
    dA,
    maskA,
    dB,
    maskB,
    max_dist: float = TH_LOW,
    ratio: float = 1.0,
    mutual: bool = True,
    allowed=None,
):
    """Generic descriptor matcher.

    Args:
      dA: (NA,D), dB: (NB,D) L2-normalized descriptors.
      maskA/maskB: validity masks.
      max_dist: L2 distance gate (reference TH_LOW/TH_HIGH).
      ratio: nearest/second-nearest distance ratio gate (1.0 = off;
        reference SearchForInitialization uses 0.9).
      mutual: require cross-check (BFMatcher crossCheck=true semantics).
      allowed: optional (NA,NB) bool of admissible pairs (projection
        window, epipolar gate, grid cell, ...).
    Returns:
      idx: (NA,) int32 index into B or -1.
      dist: (NA,) matched L2 distance (0 where unmatched).
    """
    S = similarity(dA, dB)
    gate = maskA[:, None] & maskB[None, :]
    if allowed is not None:
        gate = gate & allowed
    S = jnp.where(gate, S, _NEG)

    idxB, bestA, secondA = _top2(S)
    ok = bestA > _NEG / 2

    # distance & ratio gates (on distances, like the float-L2 reference)
    d = jnp.sqrt(dist2_from_sim(jnp.clip(bestA, -1.0, 1.0)))
    d2nd = jnp.sqrt(dist2_from_sim(jnp.clip(secondA, -1.0, 1.0)))
    ok &= d < max_dist
    if ratio < 1.0:
        ok &= d < ratio * d2nd

    if mutual:
        idxA_of_B = jnp.argmax(S, axis=0)  # (NB,)
        ok &= idxA_of_B[idxB] == jnp.arange(dA.shape[0])

    idx = jnp.where(ok & maskA, idxB, -1)
    return idx.astype(jnp.int32), jnp.where(idx >= 0, d, 0.0)


def window_allowed(xyA, xyB, radius):
    """(NA,2),(NB,2) -> (NA,NB) bool: |xyA_i - xyB_j|_inf < radius.

    The reference's grid-cell candidate gathering (GetFeaturesInArea)
    becomes a dense spatial mask; the matmul is cheap enough on the MXU
    that sparse gathering would only add overhead."""
    d = jnp.abs(xyA[:, None, :] - xyB[None, :, :])
    return jnp.all(d < radius, axis=-1)


def radius_allowed(xyA, xyB, radii_A):
    """Per-A-row circular windows: |xyA_i - xyB_j|_2 < radii_A[i]."""
    d2 = jnp.sum((xyA[:, None, :] - xyB[None, :, :]) ** 2, axis=-1)
    return d2 < (radii_A[:, None] ** 2)


def octave_allowed(octA, octB, tol: int = 1):
    """Scale-consistency gate: |octave difference| <= tol."""
    return jnp.abs(octA[:, None] - octB[None, :]) <= tol


# ---------------------------------------------------------------------------
# Global-descriptor retrieval (replaces KeyFrameDatabase's brute-force scan)
# ---------------------------------------------------------------------------

def global_scores(query, db, db_mask):
    """Place-recognition scores of `query` (4096,) against a DB (K,4096).

    score = max(0, 1 - ||g_q - g_i||_2)  (src/KeyFrameDatabase.cc:85-96).
    Returns (K,) with invalid rows at 0."""
    d2 = jnp.maximum(2.0 - 2.0 * jnp.dot(db, query, preferred_element_type=jnp.float32), 0.0)
    sc = jnp.maximum(0.0, 1.0 - jnp.sqrt(d2))
    return jnp.where(db_mask, sc, 0.0)


def global_scores_batch(queries, db, db_mask):
    """(Q,4096) x (K,4096) -> (Q,K) retrieval scores."""
    s = jnp.dot(queries, db.T, preferred_element_type=jnp.float32)
    d = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s, 0.0))
    return jnp.where(db_mask[None, :], jnp.maximum(0.0, 1.0 - d), 0.0)


@jax.jit
def distinctive_descriptors(descs, mask):
    """Best representative descriptor per point: the observation whose
    median squared distance to all other observations is smallest
    (MapPoint::ComputeDistinctiveDescriptors, reference src/MapPoint.cc,
    with float L2 distances). Batched over points on the MXU.

    descs: (P, O, D) unit descriptors of up to O observations per point.
    mask:  (P, O) validity.
    Returns (P, D) best descriptors ((P,) zeros where no valid obs).
    """
    sim = jnp.einsum("pod,pnd->pon", descs, descs)
    d2 = jnp.maximum(2.0 - 2.0 * sim, 0.0)
    BIG = 8.0
    pair_ok = mask[:, :, None] & mask[:, None, :]
    d2 = jnp.where(pair_ok, d2, BIG)
    d2s = jnp.sort(d2, axis=2)  # invalid entries sort to the end
    n_valid = mask.sum(axis=1)
    med_idx = jnp.clip(n_valid // 2, 0, d2.shape[2] - 1)
    med = jnp.take_along_axis(
        d2s, jnp.broadcast_to(med_idx[:, None, None], d2s.shape[:2] + (1,)),
        axis=2,
    )[..., 0]
    med = jnp.where(mask, med, jnp.inf)
    best = jnp.argmin(med, axis=1)
    out = jnp.take_along_axis(descs, best[:, None, None], axis=1)[:, 0]
    return jnp.where(mask.any(axis=1)[:, None], out, 0.0)

"""Place recognition over NetVLAD global descriptors.

Replaces the reference's KeyFrameDatabase
(/root/reference/src/KeyFrameDatabase.cc): score = max(0, 1 - ||g_q-g_i||)
against EVERY keyframe (:85-96), candidates kept above 0.8x the best
(:190-191), each candidate's score accumulated over its 10 best covisible
keyframes with the best-of-group retained (:107-137), and the top-N groups
returned (DetectNBestCandidates, :75-167) or the >0.75x-best-accumulated
set for relocalization (DetectRelocalizationCandidates, :177-253).

TPU design: the O(N_KF x 4096) scan — the reference's scaling hot spot as
the map grows (SURVEY.md §5.7) — is one MXU matmul over the MapStore's
dense kf_gdesc table (ops/matching.global_scores); only the tiny
candidate-group bookkeeping runs on host. parallel/retrieval.py shards the
same matmul over a device mesh for multi-chip maps.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..ops import matching as M
from .map import MapStore


@dataclasses.dataclass
class RetrievalConfig:
    n_covisibles: int = 10      # group accumulation window (:107)
    min_score_ratio: float = 0.8   # keep > 0.8 * best (:190)
    reloc_floor: float = 0.5       # absolute floor for reloc (:191)
    reloc_acc_ratio: float = 0.75  # > 0.75 * best accumulated (:235-253)


def score_all(store: MapStore, gdesc) -> np.ndarray:
    """(K,) retrieval scores of a query global descriptor against every
    valid keyframe. One MXU matmul over the whole database; when a device
    mesh is installed on the store (SLAMSystem.install_mesh) and the
    keyframe table is large enough, the matmul runs sharded over the
    keyframe axis (parallel/retrieval.py) with the device-side table
    cached against a map version counter."""
    mesh = getattr(store, "retrieval_mesh", None)
    if mesh is not None and store.k_max >= getattr(store, "retrieval_min_kfs", 64):
        from ..parallel import retrieval as pret

        version = (store.n_kf, len(store._free_kf))
        cache = getattr(store, "_retrieval_cache", None)
        if cache is None or cache[0] != version:
            db, vm = pret.make_sharded_db(mesh, store.kf_gdesc, store.kf_valid)
            store._retrieval_cache = (version, db, vm)
        _, db, vm = store._retrieval_cache
        sc = pret.sharded_scores(mesh, np.asarray(gdesc, np.float32)[None],
                                 db, vm)
        return np.array(sc[0])
    sc = M.global_scores(
        jnp.asarray(gdesc, jnp.float32),
        jnp.asarray(store.kf_gdesc),
        jnp.asarray(store.kf_valid),
    )
    return np.array(sc)  # writable copy (np.asarray of a jax array is RO)


def _group_accumulate(store: MapStore, scores, cand_ids, n_covisibles,
                      score_floor=0.0):
    """For each candidate, sum scores over its covisibility group and keep
    the best-scoring member (KeyFrameDatabase.cc:107-137). The reference
    accumulates EVERY covisible whose own score clears the gate — not only
    covisibles that are themselves candidates — so a borderline candidate
    whose neighbors scored just below 0.8x best still gets its group.
    Returns (group_best_kf, group_acc_score) arrays aligned with cand_ids."""
    best_kf = np.empty(len(cand_ids), np.int64)
    acc = np.empty(len(cand_ids), np.float32)
    for n, c in enumerate(cand_ids):
        group = [int(c)] + [int(j) for j in store.covisible_kfs(int(c), n=n_covisibles, min_weight=1)]
        g_scores = [(scores[j], j) for j in group
                    if scores[j] > score_floor or j == int(c)]
        acc[n] = sum(s for s, _ in g_scores)
        best_kf[n] = max(g_scores)[1]
    return best_kf, acc


def detect_n_best_candidates(
    store: MapStore, gdesc, exclude, n: int = 3, cfg: RetrievalConfig = None
):
    """Loop/merge candidate keyframes for a query descriptor
    (DetectNBestCandidates). `exclude` = the query KF's covisible set + self
    (connected KFs must not vote, KeyFrameDatabase.cc:90).

    Returns up to n keyframe ids, best first.
    """
    cfg = cfg or RetrievalConfig()
    scores = score_all(store, gdesc)
    scores[list(exclude)] = 0.0
    best = float(scores.max())
    if best <= 0.0:
        return []
    cand = np.nonzero(scores > cfg.min_score_ratio * best)[0]
    if len(cand) == 0:
        return []
    best_kf, acc = _group_accumulate(store, scores, cand, cfg.n_covisibles,
                                     score_floor=cfg.min_score_ratio * best)
    order = np.argsort(-acc)
    out, seen = [], set()
    for i in order:
        k = int(best_kf[i])
        if k not in seen:
            out.append(k)
            seen.add(k)
        if len(out) >= n:
            break
    return out


def detect_relocalization_candidates(
    store: MapStore, gdesc, cfg: RetrievalConfig = None
):
    """Relocalization candidates (DetectRelocalizationCandidates,
    KeyFrameDatabase.cc:177-253): absolute floor 0.5 on the raw score,
    then groups above 0.75x the best accumulated score."""
    cfg = cfg or RetrievalConfig()
    scores = score_all(store, gdesc)
    best = float(scores.max())
    if best <= 0.0:
        return []
    floor = max(cfg.reloc_floor, cfg.min_score_ratio * best)
    cand = np.nonzero(scores > floor)[0]
    if len(cand) == 0:
        # fall back to the relative gate only (synthetic global descriptors
        # may score below the absolute floor everywhere)
        cand = np.nonzero(scores > cfg.min_score_ratio * best)[0]
    if len(cand) == 0:
        return []
    best_kf, acc = _group_accumulate(store, scores, cand, cfg.n_covisibles,
                                     score_floor=cfg.min_score_ratio * best)
    keep = acc > cfg.reloc_acc_ratio * float(acc.max())
    order = np.argsort(-acc)
    out, seen = [], set()
    for i in order:
        if not keep[i]:
            continue
        k = int(best_kf[i])
        if k not in seen:
            out.append(k)
            seen.add(k)
    return out

"""Fused per-frame tracking: the whole visual front-end as ONE XLA program.

The reference tracks a frame through many separate stages — projection
search, pose optimization, local-map search, second pose optimization
(Tracking::TrackWithMotionModel + TrackLocalMap,
/root/reference/src/Tracking.cc:2165-2388) — each a C++ loop over heap
objects. Round 2 of this rebuild ran those as 6-10 separate jitted kernels
with numpy re-padding of map tables between them; the host round-trips
dominated the frame time (~180 ms/frame of dispatch + transfers).

This module is the TPU-native fix:

  * `DeviceMap` keeps the matching-relevant map-point tables
    (position / descriptor / viewing stats / validity) RESIDENT on device,
    updated incrementally from the MapStore's dirty-row marks
    (map.MapStore.consume_dirty_points) — no per-frame re-upload.
  * `track_step` compiles predict -> motion-model projection search
    (with the x2-window retry as a lax.cond) -> pose optimization ->
    local-map projection search (view-cos / scale-band gates) -> second
    pose optimization into ONE fixed-shape jitted program. The host passes
    two small int32 index vectors (the motion / local candidate sets) and
    receives the pose, the per-slot observation vector, and a 3-scalar
    stats vector — a single dispatch and O(kB) of transfers per frame.

All shapes are static: candidate sets are -1-padded to fixed capacities,
so steady-state tracking never recompiles (asserted by
tests/test_fused.py::test_no_steady_state_recompiles).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import cameras
from ..optim import factors
from ..optim.pose_opt import pose_optimize_core

_NEG = -1e9


class FusedConfig(NamedTuple):
    """Static (hashable) knobs of the fused tracker — one compile per value
    set. Mirrors tracking.TrackerConfig's matching fields."""

    motion_window: float = 15.0
    motion_window_retry: float = 30.0
    local_window: float = 4.0
    th_high: float = 0.75
    min_motion_matches: int = 20


# ---------------------------------------------------------------------------
# device-resident map mirror
# ---------------------------------------------------------------------------

class DeviceMap:
    """Device mirror of the MapStore's matching-relevant point tables.

    sync() applies the store's dirty-row marks: row-level `.at[ids].set`
    scatters for incremental changes (point insertion, descriptor refresh,
    local-BA write-back), a full re-upload for whole-map moves (loop
    correction, gravity alignment, GBA propagation). Scatter index vectors
    are padded to power-of-two lengths so the compile count stays bounded.
    """

    def __init__(self, store, device=None):
        self.store = store
        # optional explicit placement: hybrid deployments pin the mirror
        # to the ACCELERATOR while the process default stays on the CPU
        # backend — every kernel the tables feed then runs there
        self.device = device
        self._upload_all()

    def _put(self, x):
        # explicit copies: on CPU backends jnp.asarray may ZERO-COPY alias
        # the store's numpy buffers, and the host mutates those in place
        # (mp_pos writes in BA write-back / loop propagation) — an aliased
        # mirror tears mid-read and breaks snapshot() semantics. The
        # np.array temp below is never mutated, so aliasing IT is safe.
        if self.device is not None:
            return jax.device_put(np.array(x, copy=True), self.device)
        return jnp.array(x, copy=True)

    def _upload_all(self):
        s = self.store
        self.pos = self._put(s.mp_pos)
        self.desc = self._put(s.mp_desc)
        self.normal = self._put(s.mp_normal)
        self.dmin = self._put(s.mp_dmin)
        self.dmax = self._put(s.mp_dmax)
        self.valid = self._put(s.mp_valid)

    # fixed scatter chunk: ONE compiled shape for every incremental sync
    # (variable pow2 buckets were a steady-state compile leak)
    CHUNK = 1024

    def sync(self):
        """Bring the mirror up to date. Call under the map lock."""
        d = self.store.consume_dirty_points()
        if d is None:
            return
        if isinstance(d, str):  # 'all'
            self._upload_all()
            return
        s = self.store
        M = s.m_max
        P = self.CHUNK
        for start in range(0, len(d), P):
            dc = d[start:start + P]
            n = len(dc)
            ids = np.full(P, M, np.int32)  # pad rows scatter out of bounds
            ids[:n] = dc

            def pad_rows(np_arr):
                shape = (P,) + np_arr.shape[1:]
                out = np.zeros(shape, np_arr.dtype)
                out[:n] = np_arr[dc]
                return out

            # ONE jitted dispatch updates all six tables (six eager
            # .at[].set calls cost six dispatches + op-by-op compiles)
            (self.pos, self.desc, self.normal, self.dmin, self.dmax,
             self.valid) = _scatter_tables(
                self.pos, self.desc, self.normal, self.dmin, self.dmax,
                self.valid, jnp.asarray(ids),
                pad_rows(s.mp_pos), pad_rows(s.mp_desc),
                pad_rows(s.mp_normal), pad_rows(s.mp_dmin),
                pad_rows(s.mp_dmax), pad_rows(s.mp_valid))

    def snapshot(self):
        """Consistent (pos, desc, normal, dmin, dmax, valid) handle tuple.

        Call UNDER the map lock (normally right after sync()). The returned
        handles stay valid off the lock: _scatter_tables is functional (no
        donation), so a concurrent sync() by another thread builds NEW
        arrays and re-points the attributes — the captured tuple keeps the
        old, internally-consistent tables alive. Reading the attributes one
        by one off the lock instead can tear across a mid-sync swap."""
        return (self.pos, self.desc, self.normal, self.dmin, self.dmax,
                self.valid)


@jax.jit
def _scatter_tables(pos, desc, normal, dmin, dmax, valid, idx,
                    r_pos, r_desc, r_normal, r_dmin, r_dmax, r_valid):
    """Row-scatter all DeviceMap tables in one program.

    Deliberately NOT donated: the mirror is shared across threads (tracker,
    mapping worker, loop/merge path) and readers dispatch on table handles
    captured under the map lock, then run OFF the lock. Donation deletes
    the old buffers at the donating dispatch, so any still-captured handle
    raises "Array has been deleted" on its next use — the exact crash that
    killed round 4's loop bench (BENCH_r04 loop_error). The functional
    update keeps old buffers alive for exactly as long as a reader holds
    them; the extra copy is one ~16 MB alloc per sync, invisible next to
    the matching matmuls it feeds."""
    return (pos.at[idx].set(r_pos, mode="drop"),
            desc.at[idx].set(r_desc, mode="drop"),
            normal.at[idx].set(r_normal, mode="drop"),
            dmin.at[idx].set(r_dmin, mode="drop"),
            dmax.at[idx].set(r_dmax, mode="drop"),
            valid.at[idx].set(r_valid, mode="drop"))


def get_device_map(store, device=None) -> DeviceMap:
    """Cached DeviceMap attached to a MapStore (shared by the tracker and
    the mapping worker; both sync under the map lock). `device` pins the
    mirror on first creation (hybrid deployments; ignored afterwards)."""
    dm = getattr(store, "_device_map", None)
    if dm is None:
        dm = DeviceMap(store, device=device)
        store._device_map = dm
    return dm


# ---------------------------------------------------------------------------
# traced building blocks
# ---------------------------------------------------------------------------

def _gather_candidates(ids, m_valid):
    """-1-padded id vector -> (safe row indices, validity)."""
    safe = jnp.clip(ids, 0, m_valid.shape[0] - 1)
    ok = (ids >= 0) & m_valid[safe]
    return safe, ok


def _match_projected(cam_kind, cam_params, W, H, R, t, pos, dsc, ok,
                     xy, desc, radii, feat_mask, th_max,
                     normal=None, dmin=None, dmax=None):
    """Guided projection matching (Matcher::SearchByProjection semantics,
    /root/reference/src/Matcher.cc:40-218), traced inline: project the
    candidate points with (R, t), gate by frustum (+ optional viewing-stat
    gates), window by per-keypoint radius, and mutual-argmax match on the
    similarity matmul. Returns (idx into candidates or -1, candidate
    frustum mask)."""
    pc = pos @ R.T + t
    depth_ok = pc[:, 2] > 0.1
    uv = cameras.project(cam_kind, cam_params, pc)
    in_img = (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
    mp_ok = ok & depth_ok & in_img

    # squared pixel distances via the matmul identity |a-b|^2 =
    # |a|^2+|b|^2-2ab^T: one (N,C) rank-2 product instead of an (N,C,2)
    # broadcast grid (the grid form dominates the fused step on CPU hosts)
    d2 = (jnp.sum(xy * xy, -1)[:, None] + jnp.sum(uv * uv, -1)[None, :]
          - 2.0 * (xy @ uv.T))
    if normal is not None:
        center = -R.T @ t
        ray = pos - center[None, :]
        dist = jnp.maximum(jnp.linalg.norm(ray, axis=1), 1e-9)
        view_cos = jnp.sum(ray / dist[:, None] * normal, axis=1)
        has_stats = dmax > 0
        dist_ok = (dist >= 0.8 * dmin) & (dist <= 1.2 * dmax)
        cos_ok = view_cos > 0.5
        mp_ok = mp_ok & (~has_stats | (dist_ok & cos_ok))
        tight = has_stats & (view_cos > 0.998)
        radii_mp = jnp.where(tight, 2.5 / 4.0, 1.0)
        allowed = d2 <= (radii[:, None] * radii_mp[None, :]) ** 2
    else:
        allowed = d2 < radii[:, None] ** 2

    S = jnp.dot(desc, dsc.T, preferred_element_type=jnp.float32)
    gate = feat_mask[:, None] & mp_ok[None, :] & allowed
    S = jnp.where(gate, S, _NEG)
    idxB = jnp.argmax(S, axis=1)
    best = jnp.max(S, axis=1)
    # distance gate: d < th  <=>  sim > 1 - th^2/2 (unit descriptors)
    sim_gate = 1.0 - th_max * th_max / 2.0
    hit = (best > sim_gate) & (best > _NEG / 2)
    # mutual cross-check (BFMatcher crossCheck semantics)
    idxA_of_B = jnp.argmax(S, axis=0)
    hit &= idxA_of_B[idxB] == jnp.arange(desc.shape[0])
    idx = jnp.where(hit & feat_mask, idxB, -1)
    return idx.astype(jnp.int32), mp_ok


@partial(jax.jit, static_argnames=("cam_kind", "cfg"))
def track_step(cam_kind, cam_params, W, H, R0, t0,
               m_pos, m_desc, m_normal, m_dmin, m_dmax, m_valid,
               motion_ids, local_ids,
               xy, desc, octave, mask, z_meas, wz,
               cfg: FusedConfig):
    """One tracked frame, end to end, on device.

    Stages (Tracking.cc:2165-2388):
      1. motion-model projection search vs the points seen in the previous
         frame (window th=15, retried at 2x via lax.cond — :2231).
      2. pose-only optimization over the matches (Optimizer.cc:814).
      3. local-map projection search vs the covisibility-expanded candidate
         set with viewing-cos / scale-band gates (:2673-2758).
      4. final pose optimization over the merged observation set.

    Returns dict with the final pose, the per-slot map-point observation
    vector (int32, -1 = none), the stage-1 observation vector (for
    visibility statistics), a candidate-visibility mask, and
    stats = [n_motion_matches, n_inliers_stage2, n_inliers_final].
    """
    octave_f = octave.astype(jnp.float32)
    radii_base = 1.2 ** octave_f
    inv_sigma2 = 1.0 / (1.2 ** (2.0 * octave_f))

    ms, mok = _gather_candidates(motion_ids, m_valid)
    pos_m = m_pos[ms]
    desc_m = m_desc[ms]

    def run_motion(radius):
        idx, _ = _match_projected(
            cam_kind, cam_params, W, H, R0, t0, pos_m, desc_m, mok,
            xy, desc, radius * radii_base, mask, cfg.th_high)
        return idx

    idx1 = run_motion(cfg.motion_window)
    n1 = jnp.sum(idx1 >= 0)
    idx1 = jax.lax.cond(
        n1 < cfg.min_motion_matches,
        lambda: run_motion(cfg.motion_window_retry),
        lambda: idx1,
    )
    n1 = jnp.sum(idx1 >= 0)

    obs1 = jnp.where(idx1 >= 0, motion_ids[jnp.clip(idx1, 0, motion_ids.shape[0] - 1)], -1)

    # ---- stage 2: pose optimization over motion matches -----------------
    pts1 = m_pos[jnp.clip(obs1, 0, m_pos.shape[0] - 1)]
    valid1 = obs1 >= 0
    res1 = pose_optimize_core(cam_kind, cam_params, R0, t0, pts1, xy,
                              inv_sigma2, valid1, z_meas=z_meas, wz=wz)
    R1, t1 = res1["R"], res1["t"]
    obs1f = jnp.where(res1["inlier"], obs1, -1).astype(jnp.int32)

    # ---- stage 3: local-map search with the refined pose -----------------
    ls, lok = _gather_candidates(local_ids, m_valid)
    # exclude points already matched this frame (the host-side isin of the
    # unfused path) via a scatter membership table
    Mcap = m_pos.shape[0]
    tbl = jnp.zeros(Mcap + 1, bool).at[
        jnp.where(obs1f >= 0, obs1f, Mcap)].set(True)
    lok = lok & ~tbl[ls]
    idx2, l_vis = _match_projected(
        cam_kind, cam_params, W, H, R1, t1,
        m_pos[ls], m_desc[ls], lok,
        xy, desc, cfg.local_window * radii_base, mask, cfg.th_high,
        normal=m_normal[ls], dmin=m_dmin[ls], dmax=m_dmax[ls])
    new = (idx2 >= 0) & (obs1f < 0)
    obs2 = jnp.where(new, local_ids[jnp.clip(idx2, 0, local_ids.shape[0] - 1)],
                     obs1f)

    # ---- stage 4: final pose optimization --------------------------------
    pts2 = m_pos[jnp.clip(obs2, 0, Mcap - 1)]
    valid2 = obs2 >= 0
    res2 = pose_optimize_core(cam_kind, cam_params, R1, t1, pts2, xy,
                              inv_sigma2, valid2, z_meas=z_meas, wz=wz)
    obs_final = jnp.where(res2["inlier"], obs2, -1).astype(jnp.int32)

    stats = jnp.stack([n1, res1["n_inliers"], res2["n_inliers"]]).astype(jnp.int32)
    return {
        "R": res2["R"], "t": res2["t"],
        "obs": obs_final, "obs1": obs1f,
        "vis_local": l_vis,
        "stats": stats,
    }


# ---------------------------------------------------------------------------
# batched mapping kernels (LocalMapping's per-keyframe hot blocks)
# ---------------------------------------------------------------------------

def _epipolar_match(xn1, desc1, sig2_1, mask1, xn2, desc2, sig2_2, mask2,
                    R21, t21, f_px, max_dist, chi2_epi):
    """Epipolar-gated mutual matching between two keyframes
    (Matcher::SearchForTriangulation, src/Matcher.cc:763-936), traced
    inline so it vmaps over neighbor keyframes."""
    tx = jnp.array([
        [0.0, -t21[2], t21[1]],
        [t21[2], 0.0, -t21[0]],
        [-t21[1], t21[0], 0.0],
    ])
    E = tx @ R21
    h1 = jnp.concatenate([xn1, jnp.ones_like(xn1[:, :1])], axis=1)
    h2 = jnp.concatenate([xn2, jnp.ones_like(xn2[:, :1])], axis=1)
    l2 = h1 @ E.T
    num = (l2 @ h2.T) ** 2
    den = jnp.maximum(l2[:, 0:1] ** 2 + l2[:, 1:2] ** 2, 1e-12)
    d2 = num / den
    sigma_n2 = sig2_2[None, :] / (f_px * f_px)
    epi_ok = d2 < chi2_epi * sigma_n2
    epi = t21[:2] / jnp.where(jnp.abs(t21[2]) < 1e-9, 1e-9, t21[2])
    d_ep2 = jnp.sum((xn2 - epi[None, :]) ** 2, axis=1) * (f_px * f_px)
    far = d_ep2 > 100.0 * sig2_2
    allowed = epi_ok & far[None, :]

    S = jnp.dot(desc1, desc2.T, preferred_element_type=jnp.float32)
    gate = mask1[:, None] & mask2[None, :] & allowed
    S = jnp.where(gate, S, _NEG)
    idxB = jnp.argmax(S, axis=1)
    best = jnp.max(S, axis=1)
    hit = best > 1.0 - max_dist * max_dist / 2.0
    idxA_of_B = jnp.argmax(S, axis=0)
    hit &= idxA_of_B[idxB] == jnp.arange(desc1.shape[0])
    return jnp.where(hit & mask1, idxB, -1).astype(jnp.int32)


def _triangulate_one(xn1, xn2, R21, t21):
    """Batched DLT in cam-1 frame — delegates to the closed-form
    inhomogeneous solve (geometry/triangulation.triangulate_dlt); the
    eigh-based homogeneous route had no native TPU lowering and dominated
    the per-keyframe mapping kernel."""
    from ..geometry import triangulation

    return triangulation.triangulate_dlt(xn1, xn2, R21, t21)


@partial(jax.jit, static_argnames=("min_parallax_cos", "chi2_epi", "max_dist"))
def triangulate_pairs_batch(xn_k, desc_k, sig2_k, free_k,
                            xn_j, desc_j, sig2_j, free_j,
                            R21, t21, f_px,
                            max_dist: float = 0.6,
                            chi2_epi: float = 16.0,
                            min_parallax_cos: float = 0.9998):
    """CreateNewMapPoints' per-neighbor loop (LocalMapping.cc:513-894) as
    ONE fixed-shape program over a padded neighbor batch: epipolar-gated
    matching, DLT triangulation, and cheirality/reprojection/parallax
    gating, vmapped over the neighbor axis.

    Args:
      xn_k/desc_k/sig2_k/free_k: anchor keyframe (N,2)/(N,D)/(N,)/(N,).
      xn_j/...: (B,N,...) neighbor batch (padding rows: free_j all False).
      R21/t21: (B,3,3)/(B,3) cam-k -> cam-j relative poses.
    Returns:
      idx: (B,N) match into the neighbor slots or -1.
      good: (B,N) triangulation-quality mask.
      p1: (B,N,3) triangulated points in the ANCHOR camera frame.
    """
    return _triangulate_core(xn_k, desc_k, sig2_k, free_k,
                             xn_j, desc_j, sig2_j, free_j, R21, t21, f_px,
                             max_dist, chi2_epi, min_parallax_cos)


def _triangulate_core(xn_k, desc_k, sig2_k, free_k,
                      xn_j, desc_j, sig2_j, free_j, R21, t21, f_px,
                      max_dist, chi2_epi, min_parallax_cos):
    def per_pair(xn2, d2_, s2, m2, R, t):
        idx = _epipolar_match(xn_k, desc_k, sig2_k, free_k,
                              xn2, d2_, s2, m2, R, t, f_px,
                              max_dist, chi2_epi)
        safe = jnp.clip(idx, 0, xn2.shape[0] - 1)
        xn2_m = xn2[safe]
        p1 = _triangulate_one(xn_k, xn2_m, R, t)
        th2 = factors.CHI2_MONO * jnp.maximum(sig2_k, s2[safe]) / (f_px * f_px)
        p2 = p1 @ R.T + t
        finite = jnp.all(jnp.isfinite(p1), axis=-1)
        z_ok = (p1[:, 2] > 0) & (p2[:, 2] > 0)
        O2 = -R.T @ t
        ray1 = p1
        ray2 = p1 - O2[None, :]
        cosp = jnp.sum(ray1 * ray2, axis=-1) / jnp.maximum(
            jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1),
            1e-12)
        e1 = p1[:, :2] / jnp.maximum(p1[:, 2:3], 1e-12) - xn_k
        e2 = p2[:, :2] / jnp.maximum(p2[:, 2:3], 1e-12) - xn2_m
        r_ok = (jnp.sum(e1 * e1, -1) < th2) & (jnp.sum(e2 * e2, -1) < th2)
        good = (idx >= 0) & finite & z_ok & r_ok & (cosp < min_parallax_cos)
        return idx, good, p1

    return jax.vmap(per_pair)(xn_j, desc_j, sig2_j, free_j, R21, t21)


@partial(jax.jit, static_argnames=("cam_kind", "radius", "max_dist"))
def fuse_pairs_batch(cam_kind, cam_params, W, H,
                     R_t, t_t, xy_t, desc_t, oct_t, free_t,
                     cand_ids, m_pos, m_desc, m_valid,
                     radius: float = 3.0, max_dist: float = 0.6):
    """SearchInNeighbors' two-way Fuse loop (LocalMapping.cc:895-1011,
    Matcher::Fuse) as ONE program: for each (target KF, source point set)
    pair, project the source points into the target and match them against
    the target's unclaimed keypoint slots. Candidate points are gathered
    from the device-resident map by id.

    Args:
      R_t/t_t: (P,3,3)/(P,3) target KF poses.
      xy_t/desc_t/oct_t/free_t: (P,N,...) target keypoints (free = slot has
        no map point yet).
      cand_ids: (P,C) map-point ids of the source set (-1 padded).
    Returns idx (P,N): match into cand slots or -1.
    """
    return _fuse_core(cam_kind, cam_params, W, H, R_t, t_t, xy_t, desc_t,
                      oct_t, free_t, cand_ids, m_pos, m_desc, m_valid,
                      radius, max_dist)


def _fuse_core(cam_kind, cam_params, W, H, R_t, t_t, xy_t, desc_t, oct_t,
               free_t, cand_ids, m_pos, m_desc, m_valid, radius, max_dist):
    def per_pair(R, t, xy, dsc, oct_, free, ids):
        safe, ok = _gather_candidates(ids, m_valid)
        radii = radius * (1.2 ** oct_.astype(jnp.float32))
        idx, _ = _match_projected(
            cam_kind, cam_params, W, H, R, t,
            m_pos[safe], m_desc[safe], ok, xy, dsc, radii, free, max_dist)
        return idx

    return jax.vmap(per_pair)(R_t, t_t, xy_t, desc_t, oct_t, free_t, cand_ids)


# ---------------------------------------------------------------------------
# device-resident keyframe bank (VERDICT r4 weak #2 / next #2)
# ---------------------------------------------------------------------------

class DeviceKFBank:
    """Device mirror of the keyframe feature + observation tables.

    Round 4's per-keyframe mapping cost 1.39 s of device time at production
    shapes because triangulate/fuse re-packed and re-uploaded the full
    neighbor keypoint banks from host numpy on EVERY keyframe (~35-70 MB;
    the reference's matcher instead reads descriptors from RAM adjacent to
    compute, /root/reference/src/Matcher.cc:763-936). Here the (K,N,*)
    tables are RESIDENT on device, scattered once at keyframe creation;
    the banked triangulate/fuse kernels take neighbor-ID vectors and
    gather in-graph — per-call traffic drops from tens of MB to O(kB).

    Two dirty granularities (MapStore.consume_dirty_kfs):
      * feature rows (xy/desc/octave/mask + the unprojected xn, computed
        in-graph at scatter time): immutable per slot -> dirty only on
        keyframe add / slot reuse;
      * obs rows: change with every association pass -> cheap (N,)-int32
        scatters.

    Same threading contract as DeviceMap: sync() under the map lock,
    snapshot() for handles consumed off the lock (scatters are functional,
    never donated — see _scatter_tables).
    """

    CHUNK_FEAT = 4
    CHUNK_OBS = 16

    def __init__(self, store, cam_kind, cam_params, device=None):
        self.store = store
        self.cam_kind = cam_kind
        self.device = device  # see DeviceMap.device
        if device is not None:
            self.cam_params = jax.device_put(np.asarray(cam_params), device)
        else:
            self.cam_params = jnp.asarray(cam_params)
        self._upload_all()

    def _put(self, x):
        # explicit copies: CPU backends may zero-copy alias numpy buffers
        # the host mutates in place (see DeviceMap._put)
        if self.device is not None:
            return jax.device_put(np.array(x, copy=True), self.device)
        return jnp.array(x, copy=True)

    def _upload_all(self):
        s = self.store
        self.xy = self._put(s.kf_xy)
        self.desc = self._put(s.kf_desc)
        self.octave = self._put(s.kf_octave)
        self.mask = self._put(s.kf_mask)
        self.obs = self._put(s.kf_obs)
        self.xn = _unproject_rows(self.cam_kind, self.cam_params, self.xy)
        self._warm_scatters()

    def _warm_scatters(self):
        """Pre-compile the fixed-shape scatter programs with no-op calls
        (padding ids drop out of bounds): the FIRST keyframe inserted
        after a full upload otherwise pays its scatter compile inside the
        steady-state tracking loop (steady_state_compiles > 0)."""
        s = self.store
        K, N, D = s.k_max, s.n_slots, s.desc_dim
        ids_f = jnp.full(self.CHUNK_FEAT, K, jnp.int32)
        (self.xy, self.desc, self.octave, self.mask,
         self.xn) = _scatter_kf_feat(
            self.cam_kind, self.cam_params,
            self.xy, self.desc, self.octave, self.mask, self.xn, ids_f,
            np.zeros((self.CHUNK_FEAT, N, 2), np.float32),
            np.zeros((self.CHUNK_FEAT, N, D), np.float32),
            np.zeros((self.CHUNK_FEAT, N), np.int32),
            np.zeros((self.CHUNK_FEAT, N), bool))
        self.obs = _scatter_kf_obs(
            self.obs, jnp.full(self.CHUNK_OBS, K, jnp.int32),
            np.full((self.CHUNK_OBS, N), -1, np.int32))

    def sync(self):
        """Bring the bank up to date. Call under the map lock."""
        s = self.store
        feat, obs = s.consume_dirty_kfs()
        if isinstance(feat, str):  # 'all'
            self._upload_all()
            return
        K = s.k_max
        if feat is not None:
            P = self.CHUNK_FEAT
            for start in range(0, len(feat), P):
                dc = feat[start:start + P]
                n = len(dc)
                ids = np.full(P, K, np.int32)
                ids[:n] = dc

                def pad_rows(arr):
                    out = np.zeros((P,) + arr.shape[1:], arr.dtype)
                    out[:n] = arr[dc]
                    return out

                (self.xy, self.desc, self.octave, self.mask,
                 self.xn) = _scatter_kf_feat(
                    self.cam_kind, self.cam_params,
                    self.xy, self.desc, self.octave, self.mask, self.xn,
                    jnp.asarray(ids), pad_rows(s.kf_xy), pad_rows(s.kf_desc),
                    pad_rows(s.kf_octave), pad_rows(s.kf_mask))
        if obs is not None:
            P = self.CHUNK_OBS
            for start in range(0, len(obs), P):
                dc = obs[start:start + P]
                n = len(dc)
                ids = np.full(P, K, np.int32)
                ids[:n] = dc
                rows = np.full((P, s.n_slots), -1, np.int32)
                rows[:n] = s.kf_obs[dc]
                self.obs = _scatter_kf_obs(self.obs, jnp.asarray(ids),
                                           jnp.asarray(rows))

    def snapshot(self):
        """(xy, desc, octave, mask, xn, obs) handle tuple — capture UNDER
        the map lock, consume off it (see DeviceMap.snapshot)."""
        return (self.xy, self.desc, self.octave, self.mask, self.xn,
                self.obs)


@partial(jax.jit, static_argnames=("cam_kind",))
def _unproject_rows(cam_kind, cam_params, xy):
    return cameras.unproject(cam_kind, cam_params, xy)[..., :2]


@partial(jax.jit, static_argnames=("cam_kind",))
def _scatter_kf_feat(cam_kind, cam_params, xy, desc, octv, mask, xn, idx,
                     r_xy, r_desc, r_oct, r_mask):
    """Feature-row scatter; the normalized (unprojected) keypoint
    coordinates are computed in-graph from the incoming pixel rows.
    Functional (not donated) — see _scatter_tables."""
    r_xn = cameras.unproject(cam_kind, cam_params, r_xy)[..., :2]
    return (xy.at[idx].set(r_xy, mode="drop"),
            desc.at[idx].set(r_desc, mode="drop"),
            octv.at[idx].set(r_oct, mode="drop"),
            mask.at[idx].set(r_mask, mode="drop"),
            xn.at[idx].set(r_xn, mode="drop"))


@jax.jit
def _scatter_kf_obs(obs, idx, rows):
    return obs.at[idx].set(rows, mode="drop")


def get_kf_bank(store, cam, device=None) -> DeviceKFBank:
    """Cached DeviceKFBank attached to a MapStore (shared by the mapping
    worker and the loop closer; both sync under the map lock). `device`
    pins the bank on first creation (hybrid deployments)."""
    bank = getattr(store, "_kf_bank", None)
    if bank is None:
        bank = DeviceKFBank(store, cam.kind, cam.params, device=device)
        store._kf_bank = bank
    return bank


@partial(jax.jit, static_argnames=("min_parallax_cos", "chi2_epi",
                                   "max_dist"))
def triangulate_banked(anchor, nbr_ids,
                       R21, t21,
                       b_desc, b_oct, b_mask, b_xn, b_obs,
                       f_px,
                       max_dist: float = 0.6,
                       chi2_epi: float = 16.0,
                       min_parallax_cos: float = 0.9998):
    """triangulate_pairs_batch against the device-resident keyframe bank:
    the anchor row and the (B,)-vector of neighbor rows are gathered
    IN-GRAPH (HBM-local) instead of host-packed and re-uploaded. Relative
    poses R21/t21 (B,3,3)/(B,3) stay host-computed under the map lock —
    they are O(B) scalars and must reflect the locked pose state."""
    K = b_desc.shape[0]
    oct_f = b_oct[anchor].astype(jnp.float32)
    xn_k = b_xn[anchor]
    desc_k = b_desc[anchor]
    sig2_k = 1.2 ** (2.0 * oct_f)
    free_k = b_mask[anchor] & (b_obs[anchor] < 0)
    safe = jnp.clip(nbr_ids, 0, K - 1)
    ok = nbr_ids >= 0
    xn_j = b_xn[safe]
    desc_j = b_desc[safe]
    sig2_j = 1.2 ** (2.0 * b_oct[safe].astype(jnp.float32))
    free_j = b_mask[safe] & (b_obs[safe] < 0) & ok[:, None]
    return _triangulate_core(xn_k, desc_k, sig2_k, free_k,
                             xn_j, desc_j, sig2_j, free_j, R21, t21, f_px,
                             max_dist, chi2_epi, min_parallax_cos)


@partial(jax.jit, static_argnames=("cam_kind", "radius", "max_dist"))
def fuse_neighbors_banked(cam_kind, cam_params, W, H,
                          tgt_ids, src_ids, R_t, t_t,
                          b_xy, b_desc, b_oct, b_mask, b_obs,
                          m_pos, m_desc, m_valid,
                          radius: float = 3.0, max_dist: float = 0.6):
    """fuse_pairs_batch where BOTH sides come from the device keyframe
    bank: target keypoint rows (xy/desc/oct + free slots) and the source
    point sets (cand = obs[src]) are gathered in-graph. tgt_ids/src_ids:
    (P,) keyframe ids, -1 padded. Returns idx (P,N) into the source slot
    axis (decode with a host kf_obs snapshot taken under the same lock)."""
    K = b_desc.shape[0]
    ts = jnp.clip(tgt_ids, 0, K - 1)
    tok = tgt_ids >= 0
    ss = jnp.clip(src_ids, 0, K - 1)
    sok = src_ids >= 0
    free_t = b_mask[ts] & (b_obs[ts] < 0) & tok[:, None]
    cand = jnp.where(sok[:, None], b_obs[ss], -1)
    return _fuse_core(cam_kind, cam_params, W, H, R_t, t_t,
                      b_xy[ts], b_desc[ts], b_oct[ts], free_t, cand,
                      m_pos, m_desc, m_valid, radius, max_dist)


@partial(jax.jit, static_argnames=("cam_kind", "radius", "max_dist"))
def fuse_targets_banked(cam_kind, cam_params, W, H,
                        tgt_ids, cand_ids, R_t, t_t,
                        b_xy, b_desc, b_oct, b_mask,
                        m_pos, m_desc, m_valid,
                        radius: float = 3.0, max_dist: float = 0.75):
    """Loop-correction fuse (SearchAndFuse): target keypoint rows gathered
    from the bank; the candidate point set (the loop landmarks) passed
    explicitly as (P,C) ids. ALL masked slots are fusable — conflicting
    observations are REPLACED by the loop point (LoopClosing.cc:1260-1273),
    so the free mask is the full keypoint mask."""
    K = b_desc.shape[0]
    ts = jnp.clip(tgt_ids, 0, K - 1)
    tok = tgt_ids >= 0
    free_t = b_mask[ts] & tok[:, None]
    return _fuse_core(cam_kind, cam_params, W, H, R_t, t_t,
                      b_xy[ts], b_desc[ts], b_oct[ts], free_t, cand_ids,
                      m_pos, m_desc, m_valid, radius, max_dist)

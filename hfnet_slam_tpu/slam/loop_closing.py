"""Loop closing: place recognition, Sim3 estimation, loop correction.

TPU-native re-design of the reference LoopClosing thread
(/root/reference/src/LoopClosing.cc). Pipeline parity:

  detect (NewDetectCommonRegions, :328-545):
    skip small maps (<12 KFs, :360); retrieval candidates
    (DetectNBestCandidates(…,3), :494); per candidate
    (DetectCommonRegionsFromBoW, :590-1036): match the current KF's
    descriptors against the candidate window's map points, Sim3 RANSAC
    (Sim3Solver RANSAC(0.99,40,750) -> here one batched hypothesis sweep,
    optim/sim3.py), OptimizeSim3 (:864), guided projection gate (:843),
    temporal consistency counter (loop confirmed at >=N consecutive hits,
    :399).

  correct (CorrectLoop, :1109-1353):
    propagate the corrected Sim3 to the current KF's covisible window and
    its map points (:1185-1251), fuse duplicated landmarks (SearchAndFuse,
    :2255), optimize the Sim3 essential graph over spanning-tree + strong
    covisibility + loop edges (Optimizer::OptimizeEssentialGraph,
    Optimizer.cc:1501 -> optim/pose_graph.py), then global BA
    (RunGlobalBundleAdjustment, :2408).

Round-1 scope: runs synchronously on keyframe insertion (the reference's
thread handoff and GBA thread become async dispatch in a later stage).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from .. import lie
from ..optim import sim3 as sim3_mod
from . import retrieval, search
from .map import MapStore


@dataclasses.dataclass
class LoopCloserConfig:
    # detection gates: the REFERENCE defaults (LoopClosing.cc:593-597,
    # tuned to ~1000 keypoints/frame): nBoWMatches=150, nSim3Inliers=35,
    # nProjMatches=50, 3 consecutive-KF consistency (:399). Synthetic test
    # configs scale these down for their sparser fake features.
    min_kfs_in_map: int = 12       # :360
    n_candidates: int = 3          # :494
    n_covis_window: int = 10       # candidate + 10 covisibles (:655)
    min_pair_matches: int = 150    # nBoWMatches
    min_sim3_inliers: int = 35     # nSim3Inliers
    min_proj_matches: int = 50     # nProjMatches
    consistency_hits: int = 3      # 3 consecutive KFs (:399)
    ransac_hyps: int = 512
    ransac_chi2: float = 9.21
    proj_radius: float = 8.0
    fix_scale: bool = False        # True for stereo / post-IMU-init maps
    # correction
    covis_edge_min_weight: int = 100  # essential-graph covis edges
    pg_iters: int = 15
    run_gba: bool = True
    # robust solve + non-robust polish on the chi2-classified inliers
    # (the engine's LBA pattern, optim/ba.bundle_adjust). A robust-only
    # schedule leaves the post-loop map measurably under-converged: on the
    # tests' circular-revisit sequence the keyframe-map ATE stays ~25%
    # above what the recovered trajectory needs to beat the live one.
    gba_rounds: tuple = ((10, True), (8, False))
    gba_kf_cap: int = 64
    gba_mp_cap: int = 8192
    gba_edge_cap: int = 32768
    # fixed-shape capacities
    pair_cap: int = 512        # 3D-3D pairs for the Sim3 stage
    window_mp_cap: int = 4096  # candidate-window map points


class LoopCloser:
    def __init__(self, cam, store: MapStore, cfg: LoopCloserConfig = None,
                 mapper=None, rng_seed: int = 7):
        self.cam = cam
        self.store = store
        self.cfg = cfg or LoopCloserConfig()
        self.mapper = mapper
        self.system = None  # set by SLAMSystem; enables cross-map merges
        self._np_rng = np.random.default_rng(rng_seed)
        from .pipeline import NULL_LOCK
        self.lock = NULL_LOCK  # map lock (shared RLock in async mode)
        # detached GBA thread (pipeline.GBAWorker) in async mode; None ->
        # global BA runs inline (synchronous pipeline / tests)
        self.gba_worker = None
        # MappingWorker to pause during corrections (the reference's
        # RequestStop, LoopClosing.cc:1115-1133) — set by SLAMSystem
        self.mapping_worker = None
        self.consistent_hits = 0
        self.last_candidate = -1
        # temporal Sim3 state (DetectAndReffineSim3FromLastKF,
        # LoopClosing.cc:378-467,547): after a first candidate hit, the
        # NEXT keyframes re-verify by propagating the previous Sim3 through
        # the relative pose and guided projection — no fresh retrieval
        self._pending = None  # dict(cand, S_cw, last_kf, loop_mps, miss)
        self.stats = {"detected": 0, "corrected": 0, "checked": 0,
                      "merged": 0, "refined": 0}
        self.last_loop = None  # (kf, cand) of the last corrected loop
        # refractory window after a correction (the reference skips
        # detection until 10 KFs past the last loop, mLastLoopKFid + 10):
        # the freshly welded region would otherwise re-detect immediately
        self._kf_seq = 0
        self._last_loop_seq = -10**9
        self.loop_refractory_kfs = 10

    # ------------------------------------------------------------------
    def process_keyframe(self, k: int) -> bool:
        """Detect + (if confirmed) correct a loop ending at keyframe k, or
        merge the active map into a matched stored map
        (NewDetectCommonRegions returns loop OR merge candidates).
        Returns True when a correction/merge ran.

        Locking discipline (the reference NEVER pauses Tracking for a
        correction — CorrectLoop stops only LocalMapping,
        LoopClosing.cc:1115-1133): DETECTION runs entirely OFF the map
        lock — it only reads, its kernels (retrieval matmul, brute-force
        match, Sim3 RANSAC) are seconds-scale on a cold host, and a read
        racing a concurrent row write can at worst mis-gate one candidate
        (every decision is re-validated under the lock before any
        mutation). The correction takes the lock for the ms-scale window
        propagation + batched fuse; the essential-graph SOLVE runs off the
        lock on a problem snapshot with a big_change_idx staleness
        discard."""
        act = self._process_keyframe(k)
        if isinstance(act, tuple):
            self._correct_loop(k, *act)
            return True
        return bool(act)

    def _process_keyframe(self, k: int) -> bool:
        store = self.store
        cfg = self.cfg
        self._kf_seq += 1
        if self._kf_seq - self._last_loop_seq < self.loop_refractory_kfs:
            return False  # refractory: just corrected this region
        if store.kf_valid.sum() < cfg.min_kfs_in_map:
            # small maps can't loop on themselves, but CAN merge into a
            # stored map (the recovery path after relocalization fails)
            return self._try_merge(k)

        # temporal refinement of the previous candidate: re-verify by
        # guided projection under the relative-pose-propagated Sim3 BEFORE
        # paying for fresh retrieval (DetectAndReffineSim3FromLastKF,
        # LoopClosing.cc:378-467). Two consecutive misses reset the state.
        if self._pending is not None and self.consistent_hits > 0:
            hit = self._refine_from_last_kf(k)
            if hit is not None:
                self.stats["refined"] += 1
                self.consistent_hits += 1
                cand = self._pending["cand"]
                if self.consistent_hits >= self.cfg.consistency_hits:
                    return self._confirm_and_correct(k, cand, hit)
                return False
            self._pending["miss"] += 1
            if self._pending["miss"] >= 2:
                self._reset_pending()
            # fall through to fresh retrieval (the reference queries the
            # database again when the refine path found nothing)

        exclude = set(int(j) for j in store.covisible_kfs(k, n=64, min_weight=1))
        exclude.add(int(k))
        cands = retrieval.detect_n_best_candidates(
            store, store.kf_gdesc[k], exclude, n=cfg.n_candidates
        )
        self.stats["checked"] += 1
        for cand in cands:
            hit = self._match_candidate(k, cand)
            if hit is None:
                continue
            # temporal consistency (reference: 3 consecutive KFs, :399)
            if cand == self.last_candidate or self._near(cand, self.last_candidate):
                self.consistent_hits += 1
            else:
                self.consistent_hits = 1
            self.last_candidate = cand
            self._remember_pending(k, cand, *hit)
            if self.consistent_hits >= self.cfg.consistency_hits:
                return self._confirm_and_correct(k, cand, hit)
            return False
        return self._try_merge(k)

    def _confirm_and_correct(self, k, cand, hit):
        """Gravity-gate a confirmed hit (under the map lock) and hand the
        correction parameters back to process_keyframe, which runs
        _correct_loop with its own locking. Returns the tuple
        (cand, R_cm, t_cm, s_cm, loop_mps) or False."""
        store = self.store
        if store.imu_initialized:
            hit = self._gravity_gate(k, cand, *hit)
            if hit is None:  # BAD LOOP (LoopClosing.cc:262)
                self._reset_pending()
                return False
        self.stats["detected"] += 1
        self._reset_pending()
        return (cand,) + tuple(hit)

    def _reset_pending(self):
        self.consistent_hits = 0
        self.last_candidate = -1
        self._pending = None

    def _remember_pending(self, k, cand, R_cm, t_cm, s_cm, loop_mps):
        """Store the candidate's world Sim3 S_cw = S_cm o T_mw for the
        temporal refinement of the NEXT keyframe."""
        store = self.store
        Rc, tc = store.kf_R[cand], store.kf_t[cand]
        self._pending = {
            "cand": int(cand),
            "R_cw": R_cm @ Rc,
            "t_cw": s_cm * (R_cm @ tc) + t_cm,
            "s_cw": float(s_cm),
            "last_kf": int(k),
            "loop_mps": np.asarray(loop_mps),
            "miss": 0,
            # slot ids are REUSED after keyframe culling: confirmation may
            # run several keyframes after detection, and a recycled slot
            # would silently point the pending loop at a DIFFERENT (even
            # the current) keyframe — observed as a self-loop correction
            # warping the map by its Sim3 scale. uids pin the identity.
            "cand_uid": int(store.kf_uid[cand]),
            "last_uid": int(store.kf_uid[k]),
        }

    def _refine_from_last_kf(self, k: int):
        """Propagate the pending Sim3 to keyframe k via the relative pose
        T_kl (scale 1), re-verify by guided projection, refine with
        OptimizeSim3 on the co-observed pairs, and re-verify again
        (DetectAndReffineSim3FromLastKF, LoopClosing.cc:547-590; gates
        nProjMatches=30 / nProjOptMatches=50 / nProjMatchesRep=100, scaled
        here from cfg.min_proj_matches like the detection gates).
        Returns (R_cm, t_cm, s_cm, loop_mps) or None."""
        store = self.store
        cfg = self.cfg
        pend = self._pending
        last, cand = pend["last_kf"], pend["cand"]
        if not (store.kf_valid[last] and store.kf_valid[cand]
                and store.kf_valid[k]):
            return None
        # slot-reuse guard (see _remember_pending): the pending endpoints
        # must still be the keyframes they were at detection time
        if (int(store.kf_uid[cand]) != pend.get("cand_uid", -2)
                or int(store.kf_uid[last]) != pend.get("last_uid", -2)):
            return None
        # S_cw = T_kl o S_lw (T_kl from CURRENT poses, scale 1)
        Rl, tl = store.kf_R[last], store.kf_t[last]
        R_kl = store.kf_R[k] @ Rl.T
        t_kl = store.kf_t[k] - R_kl @ tl
        R_cw = R_kl @ pend["R_cw"]
        t_cw = R_kl @ pend["t_cw"] + t_kl
        s_cw = pend["s_cw"]

        loop_mps = pend["loop_mps"]
        loop_mps = loop_mps[store.mp_valid[loop_mps]]
        n_gate = max(int(0.6 * cfg.min_proj_matches), 5)
        if len(loop_mps) < n_gate:
            return None
        wcap = cfg.window_mp_cap
        loop_mps = loop_mps[:wcap]
        pos = np.zeros((wcap, 3), np.float32)
        desc = np.zeros((wcap, store.desc_dim), np.float32)
        mvalid = np.zeros(wcap, bool)
        pos[: len(loop_mps)] = store.mp_pos[loop_mps]
        desc[: len(loop_mps)] = store.mp_desc[loop_mps]
        mvalid[: len(loop_mps)] = True

        def project_count(Rp, tp, sp):
            idx, _, _ = search.search_by_projection(
                self.cam.kind, self.cam.params,
                (self.cam.width, self.cam.height),
                jnp.asarray(Rp * sp), jnp.asarray(tp),
                jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(mvalid),
                jnp.asarray(store.kf_xy[k]), jnp.asarray(store.kf_desc[k]),
                jnp.asarray(store.kf_octave[k]), jnp.asarray(store.kf_mask[k]),
                radius=cfg.proj_radius, max_dist=0.75,
            )
            return np.asarray(idx)

        idx = project_count(R_cw, t_cw, s_cw)
        slots = np.nonzero(idx >= 0)[0]
        if len(slots) < n_gate:
            return None

        # refine S via the slots that carry their own map point (3D-3D
        # pairs, like the detection stage) — OptimizeSim3 analogue
        own = store.kf_obs[k][slots]
        sel = own >= 0
        sel &= store.mp_valid[np.clip(own, 0, store.m_max - 1)]
        s_ref, mp_a = slots[sel], own[sel]
        mp_b = loop_mps[idx[s_ref]]
        # convert to candidate-relative S_cm = S_cw o T_mw^{-1}
        Rc, tc = store.kf_R[cand], store.kf_t[cand]
        R_cm = R_cw @ Rc.T
        t_cm = t_cw - s_cw * (R_cm @ tc)
        s_cm = s_cw
        if len(s_ref) >= max(cfg.min_sim3_inliers // 2, 5):
            Rk, tk = store.kf_R[k], store.kf_t[k]
            p1 = store.mp_pos[mp_a] @ Rk.T + tk
            p2 = store.mp_pos[mp_b] @ Rc.T + tc
            uv1 = store.kf_xy[k][s_ref]
            uv2 = np.asarray(self.cam.project(jnp.asarray(p2)))
            s2_1 = (1.2 ** (2.0 * store.kf_octave[k][s_ref])).astype(np.float32)
            cap = cfg.pair_cap
            n = min(len(s_ref), cap)
            P1 = np.zeros((cap, 3), np.float32); P1[:n] = p1[:n]
            P2 = np.zeros((cap, 3), np.float32); P2[:n] = p2[:n]
            U1 = np.zeros((cap, 2), np.float32); U1[:n] = uv1[:n]
            U2 = np.zeros((cap, 2), np.float32); U2[:n] = uv2[:n]
            IS1 = np.ones(cap, np.float32); IS1[:n] = 1.0 / s2_1[:n]
            val = np.zeros(cap, bool); val[:n] = True
            opt = sim3_mod.optimize_sim3(
                self.cam.kind, self.cam.params,
                jnp.asarray(R_cm), jnp.asarray(t_cm), jnp.asarray(s_cm),
                jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(U1),
                jnp.asarray(U2), jnp.asarray(IS1), jnp.asarray(IS1),
                jnp.asarray(val), fix_scale=cfg.fix_scale,
            )
            if int(opt["n_inliers"]) >= max(cfg.min_sim3_inliers // 2, 5):
                R_cm = np.asarray(opt["R12"])
                t_cm = np.asarray(opt["t12"])
                s_cm = float(opt["s12"])
                R_cw = R_cm @ Rc
                t_cw = s_cm * (R_cm @ tc) + t_cm
                s_cw = s_cm

        # final re-verification at the refined Sim3 (nProjMatchesRep)
        idx2 = project_count(R_cw, t_cw, s_cw)
        n2 = int((idx2 >= 0).sum())
        if n2 < cfg.min_proj_matches:
            return None
        # roll the pending state forward
        pend.update(R_cw=R_cw, t_cw=t_cw, s_cw=float(s_cw),
                    last_kf=int(k), miss=0)
        return R_cm, t_cm, s_cm, pend["loop_mps"]

    def _gravity_gate(self, k, cand, R_cm, t_cm, s_cm, loop_mps):
        """Inertial loops must not bend the horizon: the world-frame
        correction S_ww = T_wk o S_cw must be near-pure-yaw
        (|roll|,|pitch| < 0.016 rad, |roll|+|pitch| < 0.024, |yaw| < 0.349;
        LoopClosing.cc:242-264). After VIBA2 the residual roll/pitch is
        zeroed and scale forced to 1 before correcting."""
        store = self.store
        Rk, tk = store.kf_R[k], store.kf_t[k]
        Rc, tc = store.kf_R[cand], store.kf_t[cand]
        R_cw = R_cm @ Rc
        t_cw = s_cm * (R_cm @ tc) + t_cm
        # S_ww = T_kw^{-1} o S_cw (scale s_cm)
        R_ww = Rk.T @ R_cw
        t_ww = Rk.T @ (t_cw - tk)
        phi = np.asarray(lie.so3_log(jnp.asarray(R_ww)))
        if not (abs(phi[0]) < 0.016 and abs(phi[1]) < 0.016
                and abs(phi[0]) + abs(phi[1]) < 0.024 and abs(phi[2]) < 0.349):
            return None
        if store.viba2:
            phi = np.array([0.0, 0.0, phi[2]], np.float32)
            R_ww = np.asarray(lie.so3_exp(jnp.asarray(phi)))
            # S_cw' = T_kw o S_ww' (yaw-only, unit scale)
            R_cw = Rk @ R_ww
            t_cw = Rk @ t_ww + tk
            # back to the candidate-relative form S_cm' = S_cw' o T_mw^{-1}
            R_cm = R_cw @ Rc.T
            t_cm = t_cw - R_cm @ tc
            s_cm = 1.0
        return R_cm, t_cm, s_cm, loop_mps

    # ------------------------------------------------------------------
    # cross-map merge detection (the merge half of NewDetectCommonRegions)
    # ------------------------------------------------------------------
    def _try_merge(self, k: int) -> bool:
        sys_ = self.system
        if sys_ is None or sys_.atlas.n_maps() < 2:
            return False
        store = self.store
        if int((store.kf_obs[k] >= 0).sum()) < self.cfg.min_pair_matches:
            return False
        for idx, m in enumerate(sys_.atlas.maps):
            if m is store or m.kf_valid.sum() < 3:
                continue
            cands = retrieval.detect_n_best_candidates(
                m, store.kf_gdesc[k], exclude=set(), n=self.cfg.n_candidates
            )
            for cand in cands:
                hit = self._match_candidate(k, cand, store_b=m)
                if hit is None:
                    continue
                # the weld mutates both maps + the tracker: map lock held
                # (detection above ran lock-free; execute_merge re-checks).
                # Mapping is paused like the reference's MergeLocal
                # RequestStop (LoopClosing.cc:1355-) — a keyframe culled
                # mid-weld would otherwise race the fuse apply (advisor r4
                # finding #2; the apply also re-checks kf/mp validity).
                mw = self.mapping_worker
                if mw is not None:
                    mw.request_pause()
                try:
                    with self.lock:
                        k_new = sys_.execute_merge(idx, k, cand, *hit)
                    if k_new is not False:
                        # welding passes OFF the surgery lock (tracking
                        # overlaps; mapping stays paused until resume)
                        sys_.weld_after_merge(int(k_new), hit[-1])
                finally:
                    if mw is not None:
                        mw.resume()
                if k_new is not False:
                    self.stats["merged"] += 1
                    return True
        return False

    def _near(self, a, b):
        if a < 0 or b < 0:
            return False
        return self.store.covis[a, b] > 0

    # ------------------------------------------------------------------
    # detection
    # ------------------------------------------------------------------
    def _match_candidate(self, k: int, cand: int, store_b: MapStore = None):
        """3D-3D association + Sim3 between KF k (active map) and the
        candidate window (in store_b — another map for merges, the active
        map for loops). Returns (R_cm, t_cm, s_cm, loop_mp_ids) or None.
        S_cm maps candidate-camera coords into current-camera coords (the
        reference's gScm)."""
        store = self.store
        cfg = self.cfg
        store_b = store_b if store_b is not None else store

        window = [cand] + [int(j) for j in store_b.covisible_kfs(cand, n=cfg.n_covis_window, min_weight=1)]
        win_mps = store_b.points_seen_by(window)
        if len(win_mps) == 0:
            return None

        # current KF slots that carry a map point
        slots = np.nonzero((store.kf_obs[k] >= 0) & store.kf_mask[k])[0]
        if len(slots) < cfg.min_pair_matches:
            return None

        # descriptor matching: k's keypoints vs window map points (the
        # BoW-free SearchByBoW analogue, one MXU matmul)
        cap = max(cfg.pair_cap, 1)
        wcap = cfg.window_mp_cap
        win_mps = win_mps[:wcap]
        mp_desc = np.zeros((wcap, store.desc_dim), np.float32)
        mp_desc[: len(win_mps)] = store_b.mp_desc[win_mps]
        mp_valid = np.zeros(wcap, bool)
        mp_valid[: len(win_mps)] = True
        kf_sel = np.zeros(store.n_slots, bool)
        kf_sel[slots] = True
        idx, _ = search.search_brute_force(
            jnp.asarray(store.kf_desc[k]), jnp.asarray(kf_sel),
            jnp.asarray(mp_desc), jnp.asarray(mp_valid),
            max_dist=0.75, ratio=1.0,
        )
        idx = np.asarray(idx)
        mslots = np.nonzero(idx >= 0)[0]
        if len(mslots) < cfg.min_pair_matches:
            return None

        # 3D-3D pairs: current KF's own map point <-> window map point
        mp_a = store.kf_obs[k][mslots]              # current-map points
        mp_b = win_mps[idx[mslots]]                 # candidate-window points
        Rk, tk = store.kf_R[k], store.kf_t[k]
        Rc, tc = store_b.kf_R[cand], store_b.kf_t[cand]
        p1 = store.mp_pos[mp_a] @ Rk.T + tk         # in current camera
        p2 = store_b.mp_pos[mp_b] @ Rc.T + tc       # in candidate camera
        uv1 = store.kf_xy[k][mslots]
        uv2 = np.asarray(self.cam.project(jnp.asarray(p2)))
        s2_1 = (1.2 ** (2.0 * store.kf_octave[k][mslots])).astype(np.float32)

        n = min(len(mslots), cap)
        P1 = np.zeros((cap, 3), np.float32); P1[:n] = p1[:n]
        P2 = np.zeros((cap, 3), np.float32); P2[:n] = p2[:n]
        U1 = np.zeros((cap, 2), np.float32); U1[:n] = uv1[:n]
        U2 = np.zeros((cap, 2), np.float32); U2[:n] = uv2[:n]
        IS1 = np.ones(cap, np.float32); IS1[:n] = 1.0 / s2_1[:n]
        valid = np.zeros(cap, bool); valid[:n] = True

        key = jnp.asarray(self._np_rng.integers(0, 2**31, 2), jnp.uint32)
        res = sim3_mod.sim3_ransac(
            self.cam.kind, self.cam.params,
            jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(U1), jnp.asarray(U2),
            jnp.asarray(IS1), jnp.asarray(IS1), jnp.asarray(valid),
            key,
            n_hyps=cfg.ransac_hyps, chi2_th=cfg.ransac_chi2,
            fix_scale=cfg.fix_scale,
        )
        if int(res["n_inliers"]) < cfg.min_sim3_inliers:
            return None

        # refine (OptimizeSim3 analogue). res maps 2->1 = candidate->current.
        opt = sim3_mod.optimize_sim3(
            self.cam.kind, self.cam.params,
            res["R12"], res["t12"], res["s12"],
            jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(U1), jnp.asarray(U2),
            jnp.asarray(IS1), jnp.asarray(IS1), res["inliers"],
            fix_scale=cfg.fix_scale,
        )
        if int(opt["n_inliers"]) < cfg.min_sim3_inliers:
            return None
        R_cm = np.asarray(opt["R12"]); t_cm = np.asarray(opt["t12"])
        s_cm = float(opt["s12"])

        # guided-projection verification (SearchByProjection with the
        # corrected pose, :843): project window points into KF k under
        # S_cw = S_cm o T_mw and count descriptor-consistent matches
        R_cw = R_cm @ Rc
        t_cw = s_cm * (R_cm @ tc) + t_cm
        pos = np.zeros((wcap, 3), np.float32)
        pos[: len(win_mps)] = store_b.mp_pos[win_mps]
        idx2, _, _ = search.search_by_projection(
            self.cam.kind, self.cam.params, (self.cam.width, self.cam.height),
            jnp.asarray(R_cw * s_cm), jnp.asarray(t_cw),
            jnp.asarray(pos), jnp.asarray(mp_desc), jnp.asarray(mp_valid),
            jnp.asarray(store.kf_xy[k]), jnp.asarray(store.kf_desc[k]),
            jnp.asarray(store.kf_octave[k]), jnp.asarray(store.kf_mask[k]),
            radius=cfg.proj_radius, max_dist=0.75,
        )
        n_proj = int((np.asarray(idx2) >= 0).sum())
        if n_proj < cfg.min_proj_matches:
            return None
        return R_cm, t_cm, s_cm, win_mps

    # ------------------------------------------------------------------
    # correction
    # ------------------------------------------------------------------
    def _correct_loop(self, k: int, cand: int, R_cm, t_cm, s_cm, loop_mps):
        """CorrectLoop (:1109): Sim3-propagate the current window, fuse
        duplicates, essential-graph optimize, global BA.

        Only the window propagation + batched fuse (ms-scale) hold the map
        lock; the pose-graph solve runs detached on a snapshot and its
        write-back is discarded when the map moved underneath — the
        reference's tracking thread is never paused by CorrectLoop."""
        from ..optim import pose_graph as pg

        store = self.store
        cfg = self.cfg

        # pause MAPPING (never tracking) for the correction — the
        # reference's RequestStop handshake (LoopClosing.cc:1115-1133):
        # no BA write-back or triangulation may interleave the detached
        # pose-graph solve (their row-level changes don't bump
        # big_change_idx, so the staleness guard alone cannot see them)
        mw = self.mapping_worker
        if mw is not None:
            mw.request_pause()
        try:
            with self.lock:
                # detection ran on the loop thread while mapping worked
                # concurrently: either endpoint may have been CULLED since
                if not (store.kf_valid[k] and store.kf_valid[cand]):
                    return
                # degenerate loop guard: a self- or covisible-"loop" is a
                # slot-reuse artifact (uid guards upstream) or a detection
                # slip — correcting along it warps the map by the Sim3
                # scale with no drift to absorb (the reference never
                # considers connected keyframes as loop candidates)
                if int(cand) == int(k) or store.covis[k, cand] > 0:
                    return
                kf_ids = store.valid_kf_ids()
                pre_R = store.kf_R.copy()
                pre_t = store.kf_t.copy()

                S_cw, window = self.propagate_window_correction(
                    k, cand, R_cm, t_cm, s_cm)
                # the window move IS a whole-map-relevant change: concurrent
                # solves built on pre-correction geometry must discard, the
                # device map mirror must re-upload (the propagation wrote
                # mp_pos directly), and the tracker resets its motion model
                store.loop_edges.append((int(cand), int(k)))
                store.bump_change()

                # fuse loop landmarks into the corrected window
                # (SearchAndFuse :2255) — ONE batched device program
                self._fuse_loop_points(window, loop_mps)

                big0 = store.big_change_idx

                built = self._build_essential_graph(
                    kf_ids, pre_R, pre_t, k, cand, (R_cm, t_cm, s_cm))

            if built is not None:
                prob, meta = built
                # ---- the solve runs OFF the map lock (tracking overlaps;
                # mapping is paused so only born keyframes can appear) ----
                mode = "4dof" if store.imu_initialized else "sim3"
                out, _ = pg.optimize_pose_graph(prob, n_iters=cfg.pg_iters,
                                                fix_scale=cfg.fix_scale,
                                                mode=mode)
                out = (np.asarray(out.R), np.asarray(out.t),
                       np.asarray(out.s))
                with self.lock:
                    if store.big_change_idx == big0:
                        self._apply_pose_graph(meta, out)
                        store.bump_change()
                    else:
                        from ..utils.log import warn

                        warn("loop: essential-graph solve discarded "
                             "(map moved during the detached solve)")
        finally:
            if mw is not None:
                mw.resume()

        # ---- global BA (:2408; FullInertialBA(7) for inertial maps) -----
        # In async mode the solve runs DETACHED on the GBAWorker (the
        # reference's transient GBA thread, LoopClosing.cc:1123-1374): the
        # tracker is only blocked for the Sim3 correction above, never for
        # the global solve; a newer loop aborts an in-flight solve.
        if cfg.run_gba and self.mapper is not None:
            if store.imu_initialized and self.mapper.vim is not None:
                if self.gba_worker is not None:
                    self.gba_worker.request(
                        "inertial", rounds=((3, True), (4, False)))
                else:
                    self.mapper.full_inertial_ba(
                        self.mapper.vim, rounds=((3, True), (4, False)))
            else:
                kwargs = dict(
                    fixed_ids=[int(cand)], rounds=cfg.gba_rounds,
                    kf_cap=cfg.gba_kf_cap, mp_cap=cfg.gba_mp_cap,
                    edge_cap=cfg.gba_edge_cap,
                )
                if self.gba_worker is not None:
                    self.gba_worker.request("visual", **kwargs)
                else:
                    self.mapper.run_global_ba(**kwargs)
        self.stats["corrected"] += 1
        self.last_loop = (int(k), int(cand))
        self._last_loop_seq = self._kf_seq

    def propagate_window_correction(self, k, cand, R_cm, t_cm, s_cm):
        """Sim3-propagate the loop correction through the current KF's
        covisible window and its map points (CorrectLoop's propagation
        stage, LoopClosing.cc:1185-1251). Returns (S_cw, window)."""
        store = self.store
        pre_R = store.kf_R.copy()
        pre_t = store.kf_t.copy()

        # corrected Sim3 of the current KF: S_cw = S_cm o T_mw
        Rc, tc = store.kf_R[cand], store.kf_t[cand]
        S_cw = (R_cm @ Rc, s_cm * (R_cm @ tc) + t_cm, s_cm)

        # current window = k + covisibles (:1173). 31 so the fuse batch is
        # always the SAME padded shape (32): one compile for the lifetime
        window = [int(k)] + [int(j) for j in store.covisible_kfs(k, n=31, min_weight=1)]
        window = [w for w in window if store.kf_valid[w]]

        corr_R = {}; corr_t = {}; corr_s = {}
        Rk, tk = store.kf_R[k], store.kf_t[k]
        for i in window:
            if i == k:
                corr_R[i], corr_t[i], corr_s[i] = S_cw
                continue
            # S_ik = T_iw o T_kw^{-1} (pre-correction, scale 1)
            Ri, ti = store.kf_R[i], store.kf_t[i]
            R_ik = Ri @ Rk.T
            t_ik = ti - R_ik @ tk
            # S_iw_corr = S_ik o S_cw. S_ik has scale 1, so by the sim3_mul
            # convention (lie.py: t = s1 * R1 @ t2 + t1) the translation is
            # R_ik @ t_cw + t_ik — the loop scale s_cw must NOT be applied
            # again here (it is already inside S_cw[1]). Compare the
            # reference's g2oSic * mg2oLoopScw (LoopClosing.cc:1185-1251).
            Rn = R_ik @ S_cw[0]
            tn = R_ik @ S_cw[1] + t_ik
            corr_R[i], corr_t[i], corr_s[i] = Rn, tn, S_cw[2]

        # move window map points: p' = S_corr^{-1}(T_old(p)) (:1185-1251),
        # vectorized over all points (the per-window-KF isin loop was part
        # of the correction's lock-held tail)
        win_mps = store.points_seen_by(window)
        if len(win_mps):
            # reference keyframe per point = first window KF observing it
            # (window-list priority order)
            prio = np.full(store.k_max, len(window), np.int64)
            for n, i in enumerate(window):
                prio[i] = min(prio[i], n)
            kf_e, _, mp_e = store.observing_slots(win_mps)
            in_win = prio[kf_e] < len(window)
            kf_e, mp_e = kf_e[in_win], mp_e[in_win]
            loc = np.zeros(store.m_max, np.int64)
            loc[win_mps] = np.arange(len(win_mps))
            best = np.full(len(win_mps), len(window), np.int64)
            np.minimum.at(best, loc[mp_e], prio[kf_e])
            ok = best < len(window)
            ids = win_mps[ok]
            w_arr = np.asarray(window)
            gi = w_arr[best[ok]]
            Rn = np.stack([corr_R[i] for i in window])[best[ok]]
            tn = np.stack([corr_t[i] for i in window])[best[ok]]
            sn = np.asarray([corr_s[i] for i in window])[best[ok]]
            p_cam = np.einsum("mij,mj->mi", pre_R[gi], store.mp_pos[ids]) \
                + pre_t[gi]
            # inverse sim3: p_w = R^T (p_cam - t) / s
            store.mp_pos[ids] = np.einsum("mi,mij->mj", p_cam - tn, Rn) \
                / sn[:, None]

        # write corrected window poses as SE3 (fold scale into translation:
        # [R, t/s], :1239)
        for i in window:
            store.kf_R[i] = corr_R[i]
            store.kf_t[i] = corr_t[i] / corr_s[i]
        return S_cw, window

    def _fuse_loop_points(self, window, loop_mps):
        """Project loop map points into each corrected window KF and merge
        duplicates: the window KF's conflicting observation is replaced by
        the (older) loop landmark (:1260-1273).

        All window keyframes run as ONE batched device program
        (fused.fuse_targets_banked over a padded KF axis) instead of a
        per-KF search_by_projection loop — the loop dominated the
        correction's lock-held time (VERDICT r3 weak #1). The kernel runs
        with the lock RELEASED (mapping is paused by the correction;
        only the tracker can claim new slots, and the apply re-checks)."""
        from . import fused

        store = self.store
        cfg = self.cfg
        loop_mps = loop_mps[store.mp_valid[loop_mps]]
        if len(loop_mps) == 0:
            return
        cap = cfg.window_mp_cap
        loop_mps = loop_mps[:cap]
        window = [int(i) for i in window if store.kf_valid[i]]
        if not window:
            return
        # FIXED batch shape (the correction window is capped at 32 KFs):
        # one fuse compile for the process lifetime, never under-lock.
        # Target keypoint banks are device-resident (fused.DeviceKFBank)
        # and gathered in-graph — only poses + the loop-point id matrix
        # cross the host boundary per correction.
        P = 32
        R_t = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
        t_t = np.zeros((P, 3), np.float32)
        tgt_ids = np.full(P, -1, np.int32)
        cand = np.full((P, cap), -1, np.int32)
        for pi, i in enumerate(window):
            tgt_ids[pi] = i
            R_t[pi], t_t[pi] = store.kf_R[i], store.kf_t[i]
            cand[pi, : len(loop_mps)] = loop_mps

        dm = fused.get_device_map(store)
        dm.sync()
        # capture table handles UNDER the lock: snapshot() keeps the
        # (non-donated) buffers alive and internally consistent even if the
        # tracker syncs the mirror while the kernel waits below
        pos_s, desc_s, _, _, _, valid_s = dm.snapshot()
        bank = fused.get_kf_bank(store, self.cam)
        bank.sync()
        b_xy, b_desc, b_oct, b_mask, _, _ = bank.snapshot()
        self.lock.release()  # the kernel reads only the snapshots above
        try:
            idx = np.asarray(fused.fuse_targets_banked(
                self.cam.kind, self.cam.params,
                float(self.cam.width), float(self.cam.height),
                tgt_ids, cand, R_t, t_t,
                b_xy, b_desc, b_oct, b_mask,
                pos_s, desc_s, valid_s,
                radius=float(cfg.proj_radius), max_dist=0.75))
        finally:
            self.lock.acquire()

        for pi, i in enumerate(window):
            # the merge path (SLAMSystem.execute_merge) calls this without
            # pausing the mapping worker: a window KF may have been CULLED
            # while the kernel ran — assigning observations to a dead slot
            # corrupts mp_obs_count (advisor r4 finding #2)
            if not store.kf_valid[i]:
                continue
            slots = np.nonzero(idx[pi] >= 0)[0]
            if len(slots) == 0:
                continue
            new_ids = loop_mps[idx[pi][slots]]
            old_ids = store.kf_obs[i][slots]
            # replace: duplicates (old != -1, old != new) die in favor of
            # the loop point; empty slots gain an observation. Vectorized:
            # drop same-point matches, loop points removed mid-kernel, and
            # duplicate claims of one loop point within this KF.
            keep = (old_ids != new_ids) & store.mp_valid[new_ids]
            _, first = np.unique(new_ids, return_index=True)
            uniq = np.zeros(len(new_ids), bool)
            uniq[first] = True
            keep &= uniq
            if not keep.any():
                continue
            s_k, old_k, new_k = slots[keep], old_ids[keep], new_ids[keep]
            store.assign_observations(i, s_k, new_k)
            dead = old_k[(old_k >= 0) & (store.mp_obs_count[np.clip(old_k, 0, store.m_max - 1)] == 0)]
            if len(dead):
                store.remove_points(np.unique(dead))
            store.update_covisibility(int(i))

    def _build_essential_graph(self, kf_ids, pre_R, pre_t, k, cand, S_cm):
        """Build the (padded) Sim3 pose-graph problem from the store.
        Called UNDER the map lock; the returned problem is a self-contained
        snapshot the solve consumes off the lock. K and E are padded to
        powers of two so corrections don't recompile as the map grows
        (padding vertices are fixed identities, padding edges invalid).
        Returns (prob, meta) or None."""
        from ..optim import pose_graph as pg

        store = self.store
        cfg = self.cfg
        kf_ids = np.asarray(kf_ids, int)
        K = len(kf_ids)
        loc = {int(g): n for n, g in enumerate(kf_ids)}

        # ---- edges from PRE-correction poses ----------------------------
        pairs, weights = [], []
        seen = set()

        def add_edge(a, b, w):
            a, b = int(a), int(b)
            if a == b or (a, b) in seen or (b, a) in seen:
                return
            if a not in loc or b not in loc:
                return
            seen.add((a, b))
            pairs.append((loc[a], loc[b]))
            weights.append(w)

        for g in kf_ids:
            p = int(store.kf_parent[g])
            if p >= 0 and store.kf_valid[p]:
                add_edge(p, g, 1.0)   # spanning tree
        for a, b in store.loop_edges:
            if store.kf_valid[a] and store.kf_valid[b]:
                add_edge(a, b, 1.0)   # previous loop edges
        # strong covisibility, scanned on the VALID submatrix only (the
        # full (k_max, k_max) argwhere grows quadratically with capacity)
        sub = store.covis[np.ix_(kf_ids, kf_ids)]
        for a_l, b_l in np.argwhere(sub >= cfg.covis_edge_min_weight):
            if a_l < b_l:
                add_edge(kf_ids[a_l], kf_ids[b_l], 1.0)

        if not pairs:
            return None

        # ---- pad K/E to powers of two BEFORE any device work: exact
        # shapes here meant a fresh XLA compile per correction, UNDER the
        # map lock (the round-3 p99 spike) ---------------------------------
        pairs.append((loc[int(cand)], loc[int(k)]))  # loop edge, slot E-1
        weights.append(1.0)
        E = len(pairs)
        Kp = 1 << max(3, int(K - 1).bit_length())
        Ep = 1 << max(4, int(E - 1).bit_length())
        e_i = np.zeros(Ep, np.int32)
        e_j = np.zeros(Ep, np.int32)
        e_i[:E] = [p[0] for p in pairs]
        e_j[:E] = [p[1] for p in pairs]
        e_w = np.zeros(Ep, np.float32)
        e_w[:E] = weights
        e_valid = np.zeros(Ep, bool)
        e_valid[:E] = True

        # measurements from pre-correction SE3 poses (scale 1), computed at
        # the PADDED edge count (padding pairs alias vertex 0 -> identity)
        s_one = np.ones(len(pre_R), np.float32)
        e_R, e_t, e_s, _ = pg.make_edges_from_poses(
            pre_R[kf_ids], pre_t[kf_ids], s_one[kf_ids],
            np.stack([e_i, e_j], 1), e_w,
        )
        # the loop edge carries the measured Sim3: edge (i=cand, j=k),
        # measurement S_km = S_cm (maps cand-cam coords into k-cam coords)
        e_R = np.array(e_R)  # writable copies (np.asarray of jax is RO)
        e_t = np.array(e_t)
        e_s = np.array(e_s)
        e_R[E - 1] = np.asarray(S_cm[0])
        e_t[E - 1] = np.asarray(S_cm[1])
        e_s[E - 1] = float(S_cm[2])

        # ---- vertices: corrected sim3 for window, pre poses elsewhere ----
        V_R = np.tile(np.eye(3, dtype=np.float32), (Kp, 1, 1))
        V_t = np.zeros((Kp, 3), np.float32)
        V_R[:K] = store.kf_R[kf_ids]
        V_t[:K] = store.kf_t[kf_ids]
        # window poses already carry the correction with scale folded in
        # ([R, t/s]); starting every vertex at s=1 lets the graph
        # re-distribute the remaining drift
        V_s = np.ones(Kp, np.float32)
        fixed = np.ones(Kp, bool)
        fixed[:K] = False
        fixed[loc[int(cand)]] = True

        prob = pg.PoseGraphProblem(
            R=jnp.asarray(V_R), t=jnp.asarray(V_t), s=jnp.asarray(V_s),
            fixed=jnp.asarray(fixed),
            e_i=jnp.asarray(e_i), e_j=jnp.asarray(e_j),
            e_R=jnp.asarray(e_R), e_t=jnp.asarray(e_t), e_s=jnp.asarray(e_s),
            e_w=jnp.asarray(e_w), e_valid=jnp.asarray(e_valid),
        )
        meta = {"kf_ids": kf_ids, "V_R": V_R[:K].copy(),
                "V_t": V_t[:K].copy()}
        return prob, meta

    def _apply_pose_graph(self, meta, out):
        """Write back the pose-graph solution (called under the map lock,
        after the staleness check): correct all map points through their
        reference KF, update keyframe poses [R, t/s], and anchor keyframes
        BORN during the detached solve to their spanning-tree parents (the
        same propagation run_global_ba uses for born KFs)."""
        store = self.store
        kf_ids = meta["kf_ids"]
        K = len(kf_ids)
        V_R, V_t = meta["V_R"], meta["V_t"]
        R_new = out[0][:K]
        t_new = out[1][:K]
        s_new = out[2][:K]

        # poses of EVERY keyframe before this write-back (for born-KF
        # anchoring below; the store may have grown during the solve)
        pre_all_R = store.kf_R.copy()
        pre_all_t = store.kf_t.copy()

        # ---- correct map points via their reference KF (vectorized) -----
        # p' = S_new^{-1}( S_old(p) ), S_old = pose at build time
        mp_ids = np.nonzero(store.mp_valid)[0]
        if len(mp_ids):
            ref = store.mp_first_kf[mp_ids].copy()
            bad = (ref < 0) | (~store.kf_valid[np.clip(ref, 0, store.k_max - 1)])
            if bad.any():
                # fall back to any current observer
                kf_e, _, mp_e = store.observing_slots(mp_ids[bad])
                first = {}
                for kf_, mp_ in zip(kf_e, mp_e):
                    first.setdefault(int(mp_), int(kf_))
                ref[bad] = [first.get(int(m), -1) for m in mp_ids[bad]]
            loc = np.full(store.k_max, -1, np.int64)
            loc[kf_ids] = np.arange(K)
            gi = loc[np.clip(ref, 0, store.k_max - 1)]
            gi[ref < 0] = -1
            ok = gi >= 0
            ids = mp_ids[ok]
            g = gi[ok]
            p_cam = np.einsum("mij,mj->mi", V_R[g], store.mp_pos[ids]) \
                + V_t[g]
            store.mp_pos[ids] = np.einsum(
                "mi,mij->mj", p_cam - t_new[g], R_new[g]) / s_new[g, None]

        # ---- write back poses: T = [R, t/s] ------------------------------
        alive = store.kf_valid[kf_ids]
        store.kf_R[kf_ids[alive]] = R_new[alive]
        store.kf_t[kf_ids[alive]] = (t_new / s_new[:, None])[alive]

        # ---- keyframes born during the detached solve follow anchors ----
        if self.mapper is not None:
            born = np.nonzero(store.kf_valid)[0]
            born = born[~np.isin(born, kf_ids)]
            if len(born):
                self.mapper.propagate_ba_correction(
                    kf_ids[alive], mp_ids, pre_all_R, pre_all_t,
                    scope=born)

"""Map storage: fixed-capacity arrays for keyframes, map points, observations.

TPU-native re-design of the reference's pointer-graph map data model
(src/{Map,KeyFrame,MapPoint,Atlas}.cc): instead of heap objects with
per-object mutexes, the map is a struct-of-arrays with validity masks.
Hot kernels (matching, retrieval, BA) consume contiguous slices directly;
irregular bookkeeping (covisibility, culling decisions) runs on host numpy.

The observation structure is a single (K, N_slots) table `kf_obs` mapping
each keyframe's keypoint slot to a map-point id (-1 = none) — the inverse
of the reference's MapPoint::mObservations map, and the natural layout for
building BA edge lists by masking.

Checkpoint/resume (the reference's SaveAtlas/LoadAtlas boost archives,
src/System.cc) becomes a trivial .npz snapshot: see save()/load().
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class MapStore:
    k_max: int
    m_max: int
    n_slots: int
    desc_dim: int
    gdesc_dim: int

    def __post_init__(self):
        K, M, N, D = self.k_max, self.m_max, self.n_slots, self.desc_dim
        self.kf_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        self.kf_t = np.zeros((K, 3), np.float32)
        self.kf_valid = np.zeros(K, bool)
        self.kf_timestamp = np.zeros(K, np.float64)
        self.kf_xy = np.zeros((K, N, 2), np.float32)
        self.kf_desc = np.zeros((K, N, D), np.float32)
        self.kf_score = np.zeros((K, N), np.float32)
        self.kf_octave = np.zeros((K, N), np.int32)
        self.kf_mask = np.zeros((K, N), bool)
        self.kf_gdesc = np.zeros((K, self.gdesc_dim), np.float32)
        self.kf_obs = np.full((K, N), -1, np.int32)
        # spanning tree (KeyFrame::mpParent analogue): parent = best covisible
        # KF at insertion time; -1 for roots. Loop edges live beside it.
        self.kf_parent = np.full(K, -1, np.int32)
        self.loop_edges: list[tuple[int, int]] = []
        # stereo/RGB-D per-keypoint depth (mvDepth analogue; 0 = none)
        self.kf_depth = np.zeros((K, N), np.float32)
        # visual-inertial per-KF state (KeyFrame mVw/mImuBias analogue)
        self.kf_vel = np.zeros((K, 3), np.float32)
        self.kf_bg = np.zeros((K, 3), np.float32)
        self.kf_ba = np.zeros((K, 3), np.float32)
        self.kf_prev = np.full(K, -1, np.int32)  # IMU chain (mPrevKF)
        # map-level inertial flags (Map::isImuInitialized / VIBA1 / VIBA2)
        self.imu_initialized = False
        self.viba1 = False
        self.viba2 = False

        self.mp_pos = np.zeros((M, 3), np.float32)
        self.mp_desc = np.zeros((M, D), np.float32)
        self.mp_valid = np.zeros(M, bool)
        self.mp_visible = np.zeros(M, np.int32)  # times predicted visible
        self.mp_found = np.zeros(M, np.int32)    # times matched by tracking
        self.mp_first_kf = np.full(M, -1, np.int32)
        self.mp_obs_count = np.zeros(M, np.int32)  # keyframe observations

        self.covis = np.zeros((K, K), np.int32)
        self._covis_scratch = None  # native covis_update mark buffer
        self.n_kf = 0
        self.n_mp = 0
        self._free_mp: list[int] = []
        self._free_kf: list[int] = []

    # ------------------------------------------------------------------
    # keyframes
    # ------------------------------------------------------------------
    def add_keyframe(self, R, t, feats, timestamp, obs=None, depth=None) -> int:
        """Insert a keyframe from a Features struct. Returns kf id."""
        if self._free_kf:
            k = self._free_kf.pop()
        else:
            k = self.n_kf
            if k >= self.k_max:
                raise RuntimeError("keyframe capacity exceeded")
            self.n_kf += 1
        self.kf_R[k] = np.asarray(R, np.float32)
        self.kf_t[k] = np.asarray(t, np.float32)
        self.kf_xy[k] = np.asarray(feats.xy, np.float32)
        self.kf_desc[k] = np.asarray(feats.desc, np.float32)
        self.kf_score[k] = np.asarray(feats.score, np.float32)
        self.kf_octave[k] = np.asarray(feats.octave, np.int32)
        self.kf_mask[k] = np.asarray(feats.mask, bool)
        g = np.asarray(feats.global_desc, np.float32)
        self.kf_gdesc[k, : len(g)] = g[: self.gdesc_dim]
        self.kf_timestamp[k] = timestamp
        self.kf_obs[k] = -1
        self.kf_depth[k] = 0.0 if depth is None else np.asarray(depth, np.float32)
        self.kf_valid[k] = True
        if obs is not None:
            obs = np.asarray(obs, np.int32)
            self.kf_obs[k] = obs
            np.add.at(self.mp_obs_count, obs[obs >= 0], 1)
            self.update_covisibility(k)
            # spanning-tree parent: strongest covisible (UpdateConnections
            # first-connection rule, reference src/KeyFrame.cc)
            w = self.covis[k].copy()
            w[~self.kf_valid] = 0
            w[k] = 0
            if w.max() > 0:
                self.kf_parent[k] = int(np.argmax(w))
        return k

    def remove_keyframe(self, k):
        """Cull a keyframe (KeyFrameCulling analogue). Children in the
        spanning tree are re-parented to the culled KF's parent
        (SetBadFlag's parent reassignment, reference src/KeyFrame.cc)."""
        self.kf_valid[k] = False
        obs = self.kf_obs[k]
        np.subtract.at(self.mp_obs_count, obs[obs >= 0], 1)
        self.kf_obs[k] = -1
        self.covis[k, :] = 0
        self.covis[:, k] = 0
        self.kf_parent[self.kf_parent == k] = self.kf_parent[k]
        self.kf_parent[k] = -1
        self.loop_edges = [e for e in self.loop_edges if k not in e]
        self._free_kf.append(k)

    def valid_kf_ids(self):
        return np.nonzero(self.kf_valid)[0]

    # ------------------------------------------------------------------
    # map points
    # ------------------------------------------------------------------
    def add_points(self, positions, descs, first_kf=-1):
        """Batch-insert map points. Returns array of assigned ids."""
        n = len(positions)
        ids = []
        for _ in range(n):
            if self._free_mp:
                ids.append(self._free_mp.pop())
            else:
                if self.n_mp >= self.m_max:
                    raise RuntimeError("map point capacity exceeded")
                ids.append(self.n_mp)
                self.n_mp += 1
        ids = np.asarray(ids, np.int32)
        self.mp_pos[ids] = np.asarray(positions, np.float32)
        self.mp_desc[ids] = np.asarray(descs, np.float32)
        self.mp_valid[ids] = True
        self.mp_visible[ids] = 1
        self.mp_found[ids] = 1
        self.mp_first_kf[ids] = first_kf
        return ids

    def remove_points(self, ids):
        ids = np.asarray(ids, int)
        if len(ids) == 0:
            return
        self.mp_valid[ids] = False
        # detach observations
        sel = np.isin(self.kf_obs, ids)
        self.kf_obs[sel] = -1
        self.mp_obs_count[ids] = 0
        self._free_mp.extend(int(i) for i in ids)

    # ------------------------------------------------------------------
    # observations / covisibility
    # ------------------------------------------------------------------
    def set_observation(self, kf, slot, mp_id):
        old = self.kf_obs[kf, slot]
        if old >= 0:
            self.mp_obs_count[old] -= 1
        self.kf_obs[kf, slot] = mp_id
        if mp_id >= 0:
            self.mp_obs_count[mp_id] += 1

    def assign_observations(self, kf, slots, mp_ids):
        """Vectorized observation assignment with obs-count upkeep."""
        slots = np.asarray(slots, int)
        mp_ids = np.asarray(mp_ids, np.int32)
        old = self.kf_obs[kf, slots]
        dec = old[old >= 0]
        np.subtract.at(self.mp_obs_count, dec, 1)
        self.kf_obs[kf, slots] = mp_ids
        inc = mp_ids[mp_ids >= 0]
        np.add.at(self.mp_obs_count, inc, 1)

    def update_covisibility(self, k):
        """Recompute covisibility weights of keyframe k against all others
        (UpdateConnections analogue: weight = #shared map points). Runs in
        the native host library when available (native/mapcore.cpp)."""
        from .. import native

        if self._covis_scratch is None:
            self._covis_scratch = np.zeros(self.m_max, np.uint8)
        native.covis_update(self.kf_obs, self.kf_valid, self.covis, k,
                            self.m_max, self._covis_scratch)

    def covisible_kfs(self, k, n=10, min_weight=15):
        """Best covisible keyframes of k (GetBestCovisibilityKeyFrames)."""
        w = self.covis[k].copy()
        w[~self.kf_valid] = 0
        order = np.argsort(-w)
        order = order[w[order] >= max(min_weight, 1)]
        return order[:n]

    def observing_slots(self, mp_ids):
        """For BA edge building: all (kf, slot) observing the given points.
        Returns (kf_idx, slot_idx, mp_idx) arrays. Native-accelerated."""
        from .. import native

        member = np.zeros(self.m_max, np.uint8)
        member[np.asarray(mp_ids, int)] = 1
        return native.observing_slots(self.kf_obs, self.kf_valid, member)

    def points_seen_by(self, kf_ids):
        """Union of map-point ids observed by the given keyframes."""
        obs = self.kf_obs[np.asarray(kf_ids, int)]
        ids = np.unique(obs[obs >= 0])
        return ids[self.mp_valid[ids]]

    # ------------------------------------------------------------------
    # persistence (SaveAtlas/LoadAtlas analogue)
    # ------------------------------------------------------------------
    def save(self, path):
        np.savez_compressed(
            path,
            **{f: getattr(self, f) for f in _ARRAY_FIELDS},
            n_kf=self.n_kf,
            n_mp=self.n_mp,
            free_mp=np.asarray(self._free_mp, np.int64),
            free_kf=np.asarray(self._free_kf, np.int64),
            loop_edges=np.asarray(self.loop_edges, np.int64).reshape(-1, 2),
            imu_flags=np.asarray([self.imu_initialized, self.viba1, self.viba2]),
            caps=np.asarray([self.k_max, self.m_max, self.n_slots, self.desc_dim, self.gdesc_dim]),
        )

    @staticmethod
    def load(path) -> "MapStore":
        z = np.load(path)
        caps = z["caps"]
        m = MapStore(*[int(c) for c in caps])
        for f in _ARRAY_FIELDS:
            if f in z:  # forward-compatible with older snapshots
                getattr(m, f)[...] = z[f]
        m.n_kf = int(z["n_kf"])
        m.n_mp = int(z["n_mp"])
        m._free_mp = [int(i) for i in z["free_mp"]]
        m._free_kf = [int(i) for i in z["free_kf"]]
        if "loop_edges" in z:
            m.loop_edges = [(int(a), int(b)) for a, b in z["loop_edges"]]
        if "imu_flags" in z:
            m.imu_initialized, m.viba1, m.viba2 = (bool(x) for x in z["imu_flags"])
        return m


_ARRAY_FIELDS = [
    "kf_R", "kf_t", "kf_valid", "kf_timestamp", "kf_xy", "kf_desc",
    "kf_score", "kf_octave", "kf_mask", "kf_gdesc", "kf_obs", "kf_parent",
    "kf_depth", "kf_vel", "kf_bg", "kf_ba", "kf_prev",
    "mp_pos", "mp_desc", "mp_valid", "mp_visible", "mp_found",
    "mp_first_kf", "mp_obs_count", "covis",
]

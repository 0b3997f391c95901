"""Per-frame tracking: the SLAM front-end state machine.

TPU-native re-design of the reference Tracking thread
(/root/reference/src/Tracking.cc): the irregular state machine stays in
host Python, while every per-frame compute block — projection matching,
brute-force matching, pose optimization — is a fixed-shape jitted kernel
(slam/search.py, optim/pose_opt.py).

States (Tracking.h:117-125): NOT_INITIALIZED -> OK -> (RECENTLY_)LOST.
Steps mirrored from Tracking::Track (Tracking.cc:1097-1636):
  MonocularInitialization (:1752) -> two-view RANSAC + init BA + median
    depth normalization (:1830-1915)
  TrackWithMotionModel (:2165): constant-velocity prediction, window 15
    (retry x2), >=20 matches in, pose opt, >=10 inliers out
  TrackReferenceKeyFrame (:2024): brute-force vs ref KF, >=15 matches,
    >=10 inliers
  TrackLocalMap (:2271): covisibility expansion, guided projection,
    pose opt, >=30 inliers (mono)
  NeedNewKeyFrame (:2390) / CreateNewKeyFrame (:2546)
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import lie
from ..geometry import cameras
from ..optim import pose_opt
from . import search
from .map import MapStore

NOT_INITIALIZED = 0
OK = 1
LOST = 2
RECENTLY_LOST = 3

_STATE_NAMES = {0: "NOT_INITIALIZED", 1: "OK", 2: "LOST", 3: "RECENTLY_LOST"}


def _orthonormalize_np(R):
    """Nearest rotation (Frobenius) via SVD — numpy twin of
    lie.orthonormalize for the host-side motion-model update."""
    U, _, Vt = np.linalg.svd(R.astype(np.float64))
    W = U @ Vt
    if np.linalg.det(W) < 0:
        U[:, -1] = -U[:, -1]
        W = U @ Vt
    return W.astype(np.float32)


@dataclasses.dataclass
class TrackerConfig:
    # matching
    motion_window: float = 15.0
    motion_window_retry: float = 30.0
    local_window: float = 4.0
    init_window: float = 100.0
    th_high: float = 0.75
    th_low: float = 0.6
    # acceptance gates (Tracking.cc)
    min_init_matches: int = 100
    # init matcher gates (SearchForInitialization, Matcher.cc:486): the
    # defaults assume trained-descriptor distinctiveness; weakly
    # distinctive descriptors (e.g. an unconverted CNN) need the ratio
    # test relaxed
    init_match_max_dist: float = 0.6
    init_match_ratio: float = 0.9
    min_motion_matches: int = 20
    min_ref_matches: int = 15
    min_pose_inliers: int = 10
    min_local_inliers: int = 30
    # keyframe policy
    max_frames_between_kf: int = 10
    min_frames_between_kf: int = 0
    kf_ref_ratio: float = 0.9
    # relocalization (Tracking::Relocalization, Tracking.cc:3024;
    # RECENTLY_LOST window time_recently_lost=3s -> frames at ~20Hz)
    min_reloc_matches: int = 15    # SearchByBoW gate (:3061)
    min_reloc_pnp_inliers: int = 10
    min_reloc_inliers: int = 50    # final PoseOptimization gate (:3199)
    recently_lost_frames: int = 60
    mature_map_kfs: int = 10       # >10 KFs -> RECENTLY_LOST else LOST (:1263)
    pnp_hyps: int = 256
    # stereo / RGB-D (Tracking::StereoInitialization, Tracking.cc:1639;
    # CreateNewKeyFrame close-point creation, :2546)
    th_depth: float = 35.0          # close/far split in scene units
    th_far: float = 0.0             # System.thFarPoints: drop deeper depths
    min_stereo_init_points: int = 100
    max_depth_points_per_kf: int = 100
    # stereo depth-edge weight base: bf = fx * baseline (pixel-equivalent
    # depth information, see factors.reproj_depth_residual). 0 = mono-only.
    bf: float = 0.0
    # capacities
    local_mp_cap: int = 4096
    # init quality
    min_init_points: int = 60
    # median parallax of the reconstructed points must clear this, or init
    # waits for more baseline (a garbage low-parallax map poisons tracking)
    min_init_med_parallax_deg: float = 1.5
    # marginalized LastFrame prior chain (ConstraintPoseImu,
    # Optimizer.cc:2960/4875); off -> the previous frame is hard-fixed
    vi_marg_prior: bool = True


@dataclasses.dataclass
class TrajEntry:
    """One tracked frame in the trajectory. Iterates as (ts, R, t) with the
    absolute pose recorded at track time; `recovered(...)` in
    utils/trajectory.py rebuilds the pose through the reference keyframe so
    loop/GBA corrections propagate to every past frame — the reference's
    relative-pose trajectory recovery (Tracking.cc:1604-1624,
    System::SaveTrajectoryTUM src/System.cc:512-)."""

    ts: float
    R: np.ndarray                      # absolute T_cw at track time
    t: np.ndarray
    store: object = None               # MapStore owning the reference KF
    ref_uid: int = -1                  # stable uid of the reference KF
    R_rel: Optional[np.ndarray] = None # T_frame o T_ref^{-1} at track time
    t_rel: Optional[np.ndarray] = None

    def __iter__(self):  # tuple-compat: (ts, R, t)
        return iter((self.ts, self.R, self.t))

    def recovered_pose(self):
        """(R, t) rebuilt via the reference KF's CURRENT pose; falls back to
        the track-time absolute pose when the reference chain is gone."""
        if self.store is None or self.ref_uid < 0 or self.R_rel is None:
            return self.R, self.t
        hit = self.store.resolve_uid(int(self.ref_uid))
        if hit is None:
            return self.R, self.t
        slot, R_ch, t_ch = hit
        # T_frame = T_rel o (T_chase o T_anchor)
        R_ref = R_ch @ self.store.kf_R[slot]
        t_ref = R_ch @ self.store.kf_t[slot] + t_ch
        return self.R_rel @ R_ref, self.R_rel @ t_ref + self.t_rel


@dataclasses.dataclass
class Frame:
    feats: object  # models.extractor.Features
    timestamp: float
    R: Optional[np.ndarray] = None  # world->cam
    t: Optional[np.ndarray] = None
    obs: Optional[np.ndarray] = None  # (N_slots,) mp id or -1
    depth: Optional[np.ndarray] = None  # (N_slots,) stereo/RGBD depth, 0=none
    v: Optional[np.ndarray] = None      # body velocity (VI mode)
    # fisheye-stereo right camera: (right Features, left-slot -> right-slot
    # match index) — becomes first-class right-bank observations at KF
    # creation (the reference's ToBody measurements)
    right: Optional[tuple] = None

    @property
    def n_feats(self):
        return int(np.asarray(self.feats.mask).sum())


class Tracker:
    def __init__(self, cam: cameras.Camera, store: MapStore, cfg: TrackerConfig = None,
                 mapper=None, loop_closer=None, vi=None, rng_seed: int = 0):
        self.cam = cam
        self.store = store
        self.cfg = cfg or TrackerConfig()
        self.mapper = mapper  # local_mapping.LocalMapper, set by System
        self.loop_closer = loop_closer  # loop_closing.LoopCloser or None
        self.vi = vi  # slam.vi.VIManager or None (visual-inertial mode)
        self._imu_since_kf: list = []  # raw (N,7) blocks since last KF
        self._last_kf = -1
        # LastFrame VI anchoring (PoseInertialOptimizationLastFrame,
        # Optimizer.cc:4875): the previous frame's optimized body state +
        # its frame-to-frame preintegration chain inter-KF information;
        # falls back to the LastKeyFrame anchor whenever the map moved
        # (store.map_change_idx, the reference's mbMapUpdated)
        self._vi_state = None          # (R_wb, p_wb, v, bg, ba)
        self._cur_imu_block = None     # raw rows for the current frame
        self._seen_change = -1
        # marginalized 15x15 prior carried between LastFrame VI solves
        # (ConstraintPoseImu, Optimizer.cc:2960/4875); reset on map moves
        self._vi_prior = None
        self._seen_big = -1
        self.state = NOT_INITIALIZED
        self.last_frame: Optional[Frame] = None
        self.init_ref: Optional[Frame] = None
        self.velocity = None  # (R_v, t_v): T_cur = T_v o T_last
        self.ref_kf = -1
        self.frames_since_kf = 0
        self.frame_id = 0
        self.n_inliers = 0
        self.frames_lost = 0
        self.n_relocalizations = 0
        self._key = jnp.asarray(np.random.default_rng(rng_seed).integers(0, 2**31, 2), jnp.uint32)
        self.trajectory = []  # TrajEntry per tracked frame
        # fused fast path (slam/fused.py): the whole per-frame visual
        # pipeline as one jitted program against the device-resident map
        c = self.cfg
        from .fused import FusedConfig
        self._fused_cfg = FusedConfig(
            motion_window=c.motion_window,
            motion_window_retry=c.motion_window_retry,
            local_window=c.local_window, th_high=c.th_high,
            min_motion_matches=c.min_motion_matches)
        self._local_ids = None  # next frame's local-map candidate ids
        # async pipeline wiring (slam/pipeline.py): when `worker` is set,
        # keyframes are enqueued instead of processed inline, and `lock` is
        # the shared map RLock (Map::mMutexMapUpdate discipline,
        # Tracking.cc:1190 takes it per frame)
        from .pipeline import NULL_LOCK
        self.lock = NULL_LOCK
        self.worker = None
        # localization-only mode (System::ActivateLocalizationMode,
        # include/System.h:84-263): track against the frozen map, never
        # insert keyframes or touch mapping
        self.localization_only = False

    # ------------------------------------------------------------------
    def reset_for_new_map(self, store: MapStore):
        """Re-point at a fresh MapStore after an Atlas map switch
        (CreateMapInAtlas / ResetActiveMap aftermath)."""
        self.store = store
        self.state = NOT_INITIALIZED
        self.last_frame = None
        self.init_ref = None
        self.velocity = None
        self.ref_kf = -1
        self.frames_since_kf = 0
        self.frames_lost = 0
        self.n_inliers = 0
        self._imu_since_kf = []
        self._last_kf = -1
        self._vi_state = None
        self._vi_prior = None
        self._seen_change = -1
        self._seen_big = -1
        self._local_ids = None
        if self.vi is not None:
            self.vi.store = store
            self.vi.kf_pre.clear()
            self.vi.kf_meas.clear()
            self.vi.first_kf_ts = None
            self.vi.stage = 0
            self.vi.bad_imu = False
            self.vi._dist_filtered = None
            self.vi._t_moving = 0.0

    # ------------------------------------------------------------------
    def track(self, feats, timestamp, depth=None, imu=None, right=None):
        """Main entry (GrabImage{Monocular,Stereo,RGBD} + Track analogue).
        depth: optional (N_slots,) per-keypoint depth (stereo/RGB-D).
        imu: optional (N,7) [ax ay az wx wy wz dt] measurements covering
        (t_prev, t] — the GrabImuData queue contents (Tracking.cc:921).
        right: optional (right Features, left->right match idx) from the
        fisheye-stereo associator (first-class right-bank observations).
        Returns (state, R, t)."""
        with self.lock:
            return self._track(feats, timestamp, depth, imu, right)

    def _track(self, feats, timestamp, depth=None, imu=None, right=None):
        # whole-map moves by the async workers (loop correction, GBA
        # propagation, inertial rescale/gravity alignment) invalidate the
        # tracker's frame-to-frame state: motion model, LastFrame VI
        # anchor, marginal prior. VI re-anchors on the last keyframe's
        # (corrected) state; visual-only falls back to the last pose with
        # a widened search (the fused tracker's retry window).
        big = self.store.big_change_idx
        if big != self._seen_big:
            if self._seen_big >= 0:
                self.velocity = None
                self._vi_state = None
                self._vi_prior = None
            self._seen_big = big
        if self.vi is not None and self.vi.bad_imu:
            # the mapper flagged an unrecoverable IMU init ('not enough
            # motion'): reset the active map (Tracking.cc:1108-1114,
            # mbBadImu -> ResetActiveMap)
            self.state = LOST
            self.frame_id += 1
            return self.state, None, None
        if depth is not None:
            depth = np.asarray(depth)
            if self.cfg.th_far > 0:  # System.thFarPoints (Settings.h)
                depth = np.where(depth > self.cfg.th_far, 0.0, depth)
        frame = Frame(feats=feats, timestamp=timestamp, depth=depth,
                      right=right)
        # timestamp-jump guards (Tracking.cc:1122-1160): a backward jump or
        # a long gap breaks the motion model / IMU integration — reset to
        # LOST so the Atlas layer recovers via a new map
        if self.last_frame is not None and self.state == OK:
            dt = timestamp - self.last_frame.timestamp
            max_gap = 1.0 if self.vi is not None else 5.0
            if dt < 0 or dt > max_gap:
                self.state = LOST
                self.frame_id += 1
                return self.state, None, None
        if self.vi is not None and imu is not None and len(imu):
            self._imu_since_kf.append(np.asarray(imu, np.float32))
            self._cur_imu_block = np.asarray(imu, np.float32)
        else:
            self._cur_imu_block = None
        if self.state == NOT_INITIALIZED:
            if frame.depth is not None:
                self._stereo_initialization(frame)
            else:
                self._monocular_initialization(frame)
        elif self.state == OK:
            handled = False
            if not self._vi_active():
                # fused fast path: one jitted program for the whole visual
                # pipeline (slam/fused.py). Returns False when its gates
                # fail, in which case the reference's staged fallbacks run.
                handled = self._track_fused(frame)
            if not handled:
                ok = self._track_frame(frame)
                if ok:
                    self._track_local_map(frame)
                else:
                    # a failed attempt may have written a garbage pose; a
                    # frame is only tracked if the full gate chain passed
                    frame.R = None
                    frame.t = None
            if frame.R is None:
                self._on_tracking_failure()
            else:
                if not self.localization_only and self._need_new_keyframe(frame):
                    self._create_keyframe(frame)
                self.last_frame = frame
        elif self.state == RECENTLY_LOST:
            if self._vi_active():
                # IMU prediction rides out short visual dropouts
                # (Tracking.cc:1285-1316): the state dead-reckons from the
                # last keyframe's chain; each frame attempts visual
                # re-acquisition from the predicted pose, and the window is
                # time-boxed before declaring LOST.
                recovered = False
                if (self.last_frame is not None
                        and self.last_frame.obs is not None):
                    recovered = self._track_frame(frame)
                    if recovered:
                        self._track_local_map(frame)
                        # a marginal recovery must NOT re-anchor the state:
                        # a keyframe created from a barely-passing pose
                        # poisons the IMU chain and every later prediction
                        recovered = (frame.R is not None
                                     and self.n_inliers
                                     >= self.cfg.min_local_inliers)
                if recovered:
                    self.state = OK
                    self.frames_lost = 0
                    self.last_frame = frame
                else:
                    # emit the IMU dead-reckoned pose (the reference keeps
                    # publishing the predicted state while RECENTLY_LOST)
                    R0, t0 = self._predicted_pose()
                    frame.R, frame.t = R0, t0
                    frame.obs = np.full(self.store.n_slots, -1, np.int32)
                    # the LastFrame anchor is stale after a skipped solve;
                    # force KF anchoring on the next attempt
                    self._vi_state = None
                    self.frames_lost += 1
                    if self.frames_lost > self.cfg.recently_lost_frames:
                        frame.R = None
                        frame.t = None
                        self.state = LOST
            elif self._relocalize(frame):
                self.state = OK
                self._track_local_map(frame)
                if frame.R is not None:
                    self.last_frame = frame
                    self.frames_since_kf = self.cfg.max_frames_between_kf  # re-anchor soon
                else:
                    self._on_tracking_failure()
            else:
                self.frames_lost += 1
                if self.frames_lost > self.cfg.recently_lost_frames:
                    self.state = LOST
        # LOST: terminal for this map; the Atlas layer (slam/atlas.py)
        # spawns a fresh map, mirroring CreateMapInAtlas (Tracking.cc:1328)
        if frame.R is not None:
            self.trajectory.append(self._traj_entry(frame, timestamp))
        self.frame_id += 1
        return self.state, frame.R, frame.t

    def _traj_entry(self, frame, timestamp) -> TrajEntry:
        """Record the frame against its reference KF (Tracking.cc:1604-1624:
        mlRelativeFramePoses) so later corrections reach it."""
        store = self.store
        e = TrajEntry(timestamp, frame.R.copy(), frame.t.copy())
        k = self.ref_kf
        if k >= 0 and store.kf_valid[k]:
            R_rel = frame.R @ store.kf_R[k].T
            e.store = store
            e.ref_uid = int(store.kf_uid[k])
            e.R_rel = R_rel
            e.t_rel = frame.t - R_rel @ store.kf_t[k]
        return e

    def _on_tracking_failure(self):
        """OK -> RECENTLY_LOST (mature map) or LOST (Tracking.cc:1263-1336).
        An IMU-initialized map always gets the RECENTLY_LOST window: the
        IMU carries the state through the dropout (Tracking.cc:1285)."""
        self._vi_prior = None
        if (self._vi_active()
                or self.store.kf_valid.sum() > self.cfg.mature_map_kfs):
            self.state = RECENTLY_LOST
            self.frames_lost = 0
        else:
            self.state = LOST

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------
    def _monocular_initialization(self, frame: Frame):
        from ..geometry import twoview

        cfg = self.cfg
        if self.init_ref is None or self.init_ref.n_feats < cfg.min_init_matches:
            self.init_ref = frame
            self._imu_since_kf = []  # buffer spans init_ref -> current
            return

        ref = self.init_ref
        # the matching + two-view RANSAC below touch no store state: run
        # them with the map lock RELEASED. Holding it through the repeated
        # (re)init attempts monopolizes the lock for ~90% of wall time and
        # starves the mapping worker — the fresh map then dies young for
        # lack of triangulated coverage, spiraling into more reinits.
        self.lock.release()
        try:
            idx, _ = search.search_for_initialization(
                ref.feats.xy, ref.feats.desc, ref.feats.mask,
                frame.feats.xy, frame.feats.desc, frame.feats.mask,
                window=cfg.init_window,
                max_dist=cfg.init_match_max_dist, ratio=cfg.init_match_ratio,
            )
            idx = np.asarray(idx)
        finally:
            self.lock.acquire()
        n_matches = int((idx >= 0).sum())
        if n_matches < cfg.min_init_matches:
            self.init_ref = frame
            self._imu_since_kf = []
            return

        # build padded match arrays in normalized coords
        slots1 = np.nonzero(idx >= 0)[0]
        slots2 = idx[slots1]
        xn1 = np.asarray(self.cam.unproject(ref.feats.xy))[:, :2]
        xn2 = np.asarray(self.cam.unproject(frame.feats.xy))[:, :2]
        N = len(idx)
        m1 = np.zeros((N, 2), np.float32)
        m2 = np.zeros((N, 2), np.float32)
        m1[: len(slots1)] = xn1[slots1]
        m2[: len(slots1)] = xn2[slots2]
        mask = np.arange(N) < len(slots1)

        self.lock.release()  # device-heavy H/F RANSAC: no store access
        try:
            res = twoview.reconstruct_two_views(
                jnp.asarray(m1), jnp.asarray(m2), jnp.asarray(mask),
                self._key, 1.0 / float(self.cam.fx),
            )
            res = {k: np.asarray(v) for k, v in res.items()}
        finally:
            self.lock.acquire()
        if (
            not bool(res["ok"])
            or int(res["n_good"]) < cfg.min_init_points
            or float(res["med_parallax_deg"]) < cfg.min_init_med_parallax_deg
        ):
            return

        good = np.asarray(res["good"])
        R21 = np.asarray(res["R21"])
        t21 = np.asarray(res["t21"])
        p3d = np.asarray(res["points"])  # in ref-camera (= world) frame

        self._create_initial_map(ref, frame, slots1, slots2, good, R21, t21, p3d)

    def _create_initial_map(self, ref, frame, slots1, slots2, good, R21, t21, p3d):
        """CreateInitialMapMonocular (Tracking.cc:1830): two KFs, points,
        init BA, median-depth scale normalization."""
        store = self.store
        g = np.nonzero(good[: len(slots1)])[0]
        pts = p3d[g]
        s1 = slots1[g]
        s2 = slots2[g]

        # descriptors: mean of both observations, renormalized
        d1 = np.asarray(ref.feats.desc)[s1]
        d2 = np.asarray(frame.feats.desc)[s2]
        d = d1 + d2
        d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)

        kf0 = store.add_keyframe(np.eye(3), np.zeros(3), ref.feats, ref.timestamp)
        kf1 = store.add_keyframe(R21, t21, frame.feats, frame.timestamp)
        ids = store.add_points(pts, d, first_kf=kf0)
        store.assign_observations(kf0, s1, ids)
        store.assign_observations(kf1, s2, ids)
        store.update_covisibility(kf1)

        # init global BA (20 its) + median depth normalization (:1884-1915).
        # The solve runs with the tracker's outer lock hold RELEASED (the
        # mapper takes the lock itself for its build/write-back sections):
        # holding it through a 20-iteration LM starves the mapping worker
        if self.mapper is not None:
            self.lock.release()
            try:
                self.mapper.initial_ba(kf0, kf1)
            finally:
                self.lock.acquire()
        depths = (store.mp_pos[ids] @ store.kf_R[kf0].T + store.kf_t[kf0])[:, 2]
        med = float(np.median(depths))
        if med <= 0:
            # degenerate init; roll back
            store.remove_points(ids)
            store.remove_keyframe(kf0)
            store.remove_keyframe(kf1)
            return
        store.kf_t[kf1] /= med
        store.mp_pos[ids] /= med
        store.mark_points_dirty(ids)

        frame.R = store.kf_R[kf1].copy()
        frame.t = store.kf_t[kf1].copy()
        obs = np.full(len(np.asarray(frame.feats.mask)), -1, np.int32)
        obs[s2] = ids
        frame.obs = obs
        self.ref_kf = kf1
        self.last_frame = frame
        self.velocity = None
        self.frames_since_kf = 0
        if self.vi is not None:
            # seed the IMU chain across the init pair (Tracking.cc's
            # mpImuPreintegratedFromLastKF handoff at initialization)
            meas = (np.concatenate(self._imu_since_kf, axis=0)
                    if self._imu_since_kf else np.zeros((0, 7), np.float32))
            pre = self.vi.integrate(meas)
            self.vi.first_kf_ts = float(ref.timestamp)
            self.vi.on_keyframe(kf1, kf0, pre, meas=meas)
            self._imu_since_kf = []
            self._last_kf = kf1
        self.state = OK

    # ------------------------------------------------------------------
    # stereo / RGB-D initialization (Tracking::StereoInitialization, :1639)
    # ------------------------------------------------------------------
    def _stereo_initialization(self, frame: Frame):
        """Depth makes scale observable: the very first frame with enough
        valid-depth keypoints seeds the map at metric scale."""
        cfg = self.cfg
        store = self.store
        ok = (
            np.asarray(frame.feats.mask)
            & (frame.depth > 0)
            & (frame.depth < cfg.th_depth)
        )
        slots = np.nonzero(ok)[0]
        if len(slots) < cfg.min_stereo_init_points:
            return
        frame.R = np.eye(3, dtype=np.float32)
        frame.t = np.zeros(3, np.float32)
        kf = store.add_keyframe(frame.R, frame.t, frame.feats, frame.timestamp,
                                depth=frame.depth)
        p_w = self._unproject_depth(frame, slots)
        desc = np.asarray(frame.feats.desc)[slots]
        ids = store.add_points(p_w, desc, first_kf=kf)
        store.assign_observations(kf, slots, ids)
        obs = np.full(store.n_slots, -1, np.int32)
        obs[slots] = ids
        frame.obs = obs
        self.ref_kf = kf
        self.last_frame = frame
        self.velocity = None
        self.frames_since_kf = 0
        if self.vi is not None:
            self.vi.first_kf_ts = float(frame.timestamp)
            self._imu_since_kf = []
            self._last_kf = kf
        self.state = OK

    def _unproject_depth(self, frame: Frame, slots):
        """World positions of keypoints from their depth (UnprojectStereo)."""
        xn = np.array(self.cam.unproject(frame.feats.xy))  # (N,3), z=1 rays
        p_c = xn[slots] * frame.depth[slots, None]
        R, t = frame.R, frame.t
        return (p_c - t[None, :]) @ R  # R^T (p_c - t), batched

    # ------------------------------------------------------------------
    # per-frame tracking
    # ------------------------------------------------------------------
    def _vi_active(self):
        return (self.vi is not None and self.store.imu_initialized
                and self._last_kf >= 0 and self.store.kf_valid[self._last_kf])

    def _pre_from_kf(self):
        """Preintegration last-KF -> now from the accumulated raw blocks
        (mpImuPreintegratedFromLastKF, Tracking.cc:986-1032)."""
        if self._imu_since_kf:
            meas = np.concatenate(self._imu_since_kf, axis=0)
        else:
            meas = np.zeros((0, 7), np.float32)
        bg = self.store.kf_bg[self._last_kf] if self._last_kf >= 0 else None
        ba = self.store.kf_ba[self._last_kf] if self._last_kf >= 0 else None
        return self.vi.integrate(meas, bg, ba)

    def _predicted_pose(self):
        if self._vi_active():
            # PredictStateIMU from the last keyframe (Tracking.cc:1041)
            pre = self._pre_from_kf()
            R_wb, p_wb, v = self.vi.predict(self._last_kf, pre)
            R, t = self.vi.body_to_cam(R_wb, p_wb)
            return R.astype(np.float32), t.astype(np.float32)
        R_l, t_l = self.last_frame.R, self.last_frame.t
        if self.velocity is None:
            return R_l.copy(), t_l.copy()
        R_v, t_v = self.velocity
        R = R_v @ R_l
        t = R_v @ t_l + t_v
        return R, t

    def _unlocked(self, fn):
        """Run a device dispatch + blocking fetch with the map lock
        RELEASED. The staged fallback paths otherwise hold the lock for
        their whole kernel wait — measured 300-900 ms per frame at
        production shapes on a 2-core host, starving the mapping/loop
        workers exactly like the fused-path wait used to (round 4 fixed
        only the fused path). Inputs must be GATHERED (numpy-copied)
        before the call; apply sections re-validate ids afterwards."""
        self.lock.release()
        try:
            return fn()
        finally:
            self.lock.acquire()

    def _revalidate_obs(self, obs):
        """Mask observations whose points were culled while a kernel ran
        off the lock."""
        store = self.store
        return np.where(
            (obs >= 0) & store.mp_valid[np.clip(obs, 0, store.m_max - 1)],
            obs, -1).astype(np.int32)

    def _pose_optimize_frame(self, frame, R0, t0):
        """Pose-only optimization over frame.obs. Returns inlier count.
        Observations with stereo/RGB-D depth get the 3-dof depth edge;
        with an initialized IMU the 15-d visual-inertial optimizer runs
        instead (PoseInertialOptimizationLastKeyFrame, Optimizer.cc:4491)."""
        store = self.store
        cfg = self.cfg
        obs = frame.obs
        valid = (obs >= 0) & np.asarray(frame.feats.mask)
        pts = store.mp_pos[np.clip(obs, 0, store.m_max - 1)]
        inv_sigma2 = 1.0 / (1.2 ** (2.0 * np.asarray(frame.feats.octave)))
        if self._vi_active():
            return self._pose_optimize_frame_vi(frame, R0, t0, pts, inv_sigma2, valid)
        if frame.depth is not None and cfg.bf > 0:
            z = np.where(frame.depth > 0, frame.depth, 0.0).astype(np.float32)
            wz = np.where(z > 0, cfg.bf / np.maximum(z, 1e-3) ** 2, 0.0)
            z_j, wz_j = jnp.asarray(z), jnp.asarray(wz.astype(np.float32))
        else:
            z_j = wz_j = jnp.zeros(len(obs))

        def run():  # all inputs gathered above; solve waits OFF the lock
            res = pose_opt.pose_optimize(
                self.cam.kind, self.cam.params,
                jnp.asarray(R0), jnp.asarray(t0),
                jnp.asarray(pts), frame.feats.xy,
                jnp.asarray(inv_sigma2), jnp.asarray(valid),
                z_meas=z_j, wz=wz_j,
            )
            return jax.device_get(res)

        res = self._unlocked(run)
        frame.R = np.array(res["R"])
        frame.t = np.array(res["t"])
        inlier = np.asarray(res["inlier"])
        frame.obs = self._revalidate_obs(np.where(inlier, obs, -1))
        return int(inlier.sum())

    def _pose_optimize_frame_vi(self, frame, R0, t0, pts, inv_sigma2, valid):
        """15-d state [R_wb p_wb v bg ba] with visual + inertial + bias-RW
        factors. Anchored at the LAST FRAME's optimized state (with its
        frame-to-frame preintegration) when the map has not moved since —
        the reference's PoseInertialOptimizationLastFrame alternation
        (Optimizer.cc:4875, chosen by mbMapUpdated at Tracking.cc:2292) —
        else at the last keyframe (…LastKeyFrame, :4491)."""
        from ..optim import inertial as VIOPT

        store = self.store
        vi = self.vi
        # The anchor (previous state + its preintegration) is computed ONCE
        # per frame and reused by the second (local-map) solve: anchoring
        # stage 2 on the _vi_state that stage 1 just advanced — and
        # re-applying the same IMU block — predicts one frame AHEAD, and
        # the stiff inertial edge then drags the pose ~v*dt off the visual
        # optimum every frame.
        if getattr(self, "_anchor_fid", -1) == self.frame_id:
            R1, p1, v1, bg1, ba1, pre, use_prior = self._frame_anchor
        else:
            map_updated = store.map_change_idx != self._seen_change
            self._seen_change = store.map_change_idx
            use_last_frame = (
                not map_updated and self._vi_state is not None
                and self._cur_imu_block is not None
                and len(self._cur_imu_block)
            )
            if use_last_frame:
                R1, p1, v1, bg1, ba1 = self._vi_state
                pre = vi.integrate(self._cur_imu_block, bg1, ba1)
            else:
                k = self._last_kf
                pre = self._pre_from_kf()
                R1, p1 = vi.cam_to_body(store.kf_R[k], store.kf_t[k])
                v1 = store.kf_vel[k]
                bg1, ba1 = store.kf_bg[k], store.kf_ba[k]
            use_prior = (use_last_frame and self._vi_prior is not None
                         and self.cfg.vi_marg_prior)
            self._frame_anchor = (R1, p1, v1, bg1, ba1, pre, use_prior)
            self._anchor_fid = self.frame_id
            if use_prior:
                self._frame_anchor_prior = self._vi_prior
        R2, p2 = vi.cam_to_body(R0, t0)
        v2 = frame.v if frame.v is not None else v1
        if use_prior:
            # LastFrame with the marginalized prior: both frame states
            # optimize jointly; the previous one is soft-anchored by the
            # 15x15 information from its own solve, and marginalizing it
            # out yields the next prior (ConstraintPoseImu chain,
            # Optimizer.cc:2960/4875)
            res = VIOPT.pose_inertial_optimize_marg(
                self.cam.kind, self.cam.params,
                vi.calib.Tbc_R, vi.calib.Tbc_t,
                jnp.asarray(R1), jnp.asarray(p1), jnp.asarray(v1),
                jnp.asarray(bg1), jnp.asarray(ba1),
                jnp.asarray(self._frame_anchor_prior),
                pre,
                jnp.asarray(R2), jnp.asarray(p2), jnp.asarray(v2),
                jnp.asarray(pts), frame.feats.xy,
                jnp.asarray(inv_sigma2), jnp.asarray(valid),
            )
            self._vi_prior = np.asarray(res["prior_info_out"])
        else:
            res = VIOPT.pose_inertial_optimize(
                self.cam.kind, self.cam.params,
                vi.calib.Tbc_R, vi.calib.Tbc_t,
                jnp.asarray(R1), jnp.asarray(p1), jnp.asarray(v1),
                jnp.asarray(bg1), jnp.asarray(ba1),
                pre,
                jnp.asarray(R2), jnp.asarray(p2), jnp.asarray(v2),
                jnp.asarray(pts), frame.feats.xy,
                jnp.asarray(inv_sigma2), jnp.asarray(valid),
            )
            # the posterior info of this (KF-anchored) solve seeds the
            # marginal-prior chain for the LastFrame path
            self._vi_prior = np.asarray(res["H"])
        frame.R, frame.t = vi.body_to_cam(np.asarray(res["R"]), np.asarray(res["p"]))
        frame.v = np.asarray(res["v"])
        self._vi_state = (np.asarray(res["R"]), np.asarray(res["p"]),
                          np.asarray(res["v"]), np.asarray(res["bg"]),
                          np.asarray(res["ba"]))
        inlier = np.asarray(res["inlier"])
        frame.obs = np.where(inlier, frame.obs, -1).astype(np.int32)
        return int(inlier.sum())

    def _track_frame(self, frame) -> bool:
        ok = self._track_with_motion_model(frame)
        if not ok:
            ok = self._track_reference_keyframe(frame)
        return ok

    def _track_with_motion_model(self, frame) -> bool:
        cfg = self.cfg
        store = self.store
        R0, t0 = self._predicted_pose()

        last_obs = self.last_frame.obs
        sel = last_obs >= 0
        mp_ids = np.unique(last_obs[sel])
        mp_ids = mp_ids[store.mp_valid[mp_ids]]
        if len(mp_ids) < 3:
            return False
        cap = self.cfg.local_mp_cap
        mp_pos, mp_desc, mp_valid, mp_ids_p = self._pad_mps(mp_ids, cap)

        def run_search():  # kernels wait OFF the lock (inputs captured)
            for radius in (cfg.motion_window, cfg.motion_window_retry):
                idx, _, _ = search.search_by_projection(
                    self.cam.kind, self.cam.params,
                    (self.cam.width, self.cam.height),
                    jnp.asarray(R0), jnp.asarray(t0),
                    mp_pos, mp_desc, mp_valid,
                    frame.feats.xy, frame.feats.desc, frame.feats.octave,
                    frame.feats.mask,
                    radius=radius, max_dist=cfg.th_high,
                )
                idx = np.asarray(idx)
                n = int((idx >= 0).sum())
                if n >= cfg.min_motion_matches:
                    break
            return idx, n

        idx, n = self._unlocked(run_search)
        if n < cfg.min_motion_matches:
            return False

        frame.obs = self._revalidate_obs(
            np.where(idx >= 0, mp_ids_p[np.clip(idx, 0, cap - 1)], -1))
        n_in = self._pose_optimize_frame(frame, R0, t0)
        self.n_inliers = n_in
        return n_in >= cfg.min_pose_inliers

    def _track_reference_keyframe(self, frame) -> bool:
        cfg = self.cfg
        store = self.store
        k = self.ref_kf
        if k < 0 or not store.kf_valid[k]:
            return False
        # numpy COPIES under the lock: kf rows can be overwritten by slot
        # reuse while the kernel waits off it, and CPU backends may
        # zero-copy alias views
        kf_obs = store.kf_obs[k].copy()
        maskB = (kf_obs >= 0) & store.kf_mask[k]
        descB = np.array(store.kf_desc[k])

        def run():
            idx, _ = search.search_brute_force(
                frame.feats.desc, frame.feats.mask,
                jnp.asarray(descB), jnp.asarray(maskB),
                max_dist=cfg.th_low, ratio=0.9,
            )
            return np.asarray(idx)

        idx = self._unlocked(run)
        n = int((idx >= 0).sum())
        if n < cfg.min_ref_matches:
            return False
        frame.obs = self._revalidate_obs(np.where(
            idx >= 0, kf_obs[np.clip(idx, 0, len(kf_obs) - 1)], -1))
        if self._vi_active():
            # after a dropout the last frame's pose is stale; the IMU
            # prediction is the right starting point (Tracking.cc:1285)
            R0, t0 = self._predicted_pose()
        else:
            R0, t0 = self.last_frame.R, self.last_frame.t
        n_in = self._pose_optimize_frame(frame, R0, t0)
        self.n_inliers = n_in
        return n_in >= cfg.min_pose_inliers

    # ------------------------------------------------------------------
    # fused fast path (slam/fused.py): the whole OK-state visual pipeline
    # as ONE jitted dispatch against the device-resident map mirror
    # ------------------------------------------------------------------
    def _track_fused(self, frame) -> bool:
        """Run motion-search -> pose-opt -> local-search -> pose-opt as one
        device program. Returns True when this path fully handled the frame
        (success, or a definitive tracking failure with frame.R = None);
        False to fall back to the staged reference pipeline
        (TrackReferenceKeyFrame etc.)."""
        from . import fused

        cfg = self.cfg
        store = self.store
        if self.last_frame is None or self.last_frame.obs is None:
            return False
        last_obs = self.last_frame.obs
        mp_ids = np.unique(last_obs[last_obs >= 0])
        mp_ids = mp_ids[store.mp_valid[mp_ids]]
        if len(mp_ids) < 3:
            return False
        if self._local_ids is None:
            self._update_local_set(last_obs)
            if self._local_ids is None:
                return False
        R0, t0 = self._predicted_pose()
        dm = fused.get_device_map(store)
        dm.sync()
        motion_ids = np.full(store.n_slots, -1, np.int32)
        n_m = min(len(mp_ids), store.n_slots)
        motion_ids[:n_m] = mp_ids[:n_m]
        if frame.depth is not None and cfg.bf > 0:
            z = np.where(frame.depth > 0, frame.depth, 0.0).astype(np.float32)
            wz = np.where(z > 0, cfg.bf / np.maximum(z, 1e-3) ** 2,
                          0.0).astype(np.float32)
        else:
            z = wz = np.zeros(store.n_slots, np.float32)
        out = fused.track_step(
            self.cam.kind, self.cam.params,
            float(self.cam.width), float(self.cam.height),
            R0, t0,
            dm.pos, dm.desc, dm.normal, dm.dmin, dm.dmax, dm.valid,
            motion_ids, self._local_ids,
            frame.feats.xy, frame.feats.desc, frame.feats.octave,
            frame.feats.mask, z, wz, self._fused_cfg)
        # ONE device->host transfer for the whole output dict: per-leaf
        # np.asarray costs a blocking sync + copy each (measured ~17 ms of
        # a 24 ms frame before batching)
        import jax

        # the WAIT runs with the map lock RELEASED: the tracker holds the
        # lock ~90% of a paced frame otherwise, and the (unfair) RLock then
        # starves the mapping worker for seconds — triangulation stalls,
        # coverage dies, tracking follows. The program was DISPATCHED under
        # the lock (its input buffers are pinned by the execution), so the
        # mapping worker may freely mutate the store while we wait.
        self.lock.release()
        try:
            out = jax.device_get(out)
        finally:
            self.lock.acquire()
        # a whole-map move (loop correction, GBA propagation, inertial
        # rescale) may have landed during the unlocked wait: the solved
        # pose is in the PRE-correction gauge (advisor r4 finding #4).
        # Discard it and fall back to the staged path — with the motion
        # model reset, the ref-KF route re-anchors on corrected geometry.
        if store.big_change_idx != self._seen_big:
            self._seen_big = store.big_change_idx
            self.velocity = None
            self._vi_state = None
            self._vi_prior = None
            return False
        n1, n_in1, n_in2 = (int(x) for x in out["stats"])
        if n1 < cfg.min_motion_matches or n_in1 < cfg.min_pose_inliers:
            return False  # staged fallbacks (ref-KF brute force) take over

        # cheap host copies: device_get buffers may be read-only and the
        # frame fields are mutated downstream
        frame.R = np.array(out["R"])
        frame.t = np.array(out["t"])
        frame.obs = np.array(out["obs"])
        # points culled by the worker during the unlocked wait are dead ids
        frame.obs = np.where(
            store.mp_valid[np.clip(frame.obs, 0, store.m_max - 1)]
            & (frame.obs >= 0), frame.obs, -1).astype(np.int32)
        self.n_inliers = n_in2

        # visibility / found statistics (parity with _track_local_map)
        vis = out["vis_local"]
        lids = self._local_ids
        store.mp_visible[lids[(lids >= 0) & vis]] += 1
        obs1 = out["obs1"]
        store.mp_visible[np.unique(obs1[obs1 >= 0])] += 1
        found = frame.obs[frame.obs >= 0]
        store.mp_found[found] += 1

        if n_in2 < cfg.min_local_inliers and n_in2 < cfg.min_pose_inliers:
            frame.R = None
            frame.t = None
            return True  # definitive failure; _on_tracking_failure handles
        # motion model + next frame's local candidate set (host, numpy)
        R_l, t_l = self.last_frame.R, self.last_frame.t
        R_v = _orthonormalize_np(frame.R @ R_l.T)
        self.velocity = (R_v, frame.t - R_v @ t_l)
        self._update_local_set(frame.obs)
        return True

    def _update_local_set(self, obs):
        """Compute the local-map candidate ids (UpdateLocalKeyFrames/Points,
        Tracking.cc:2760-3023) for the NEXT fused frame, and refresh the
        reference keyframe (most shared observations, :2962). Host-side
        integer bookkeeping only — no descriptors move."""
        store = self.store
        matched = np.unique(obs[obs >= 0])
        matched = matched[store.mp_valid[matched]]
        if len(matched) == 0:
            self._local_ids = None
            return
        kf_ids, _, _ = store.observing_slots(matched)
        if len(kf_ids) == 0:
            self._local_ids = None
            return
        counts = np.bincount(kf_ids, minlength=store.k_max)
        local_kfs = np.nonzero(counts)[0]
        self.ref_kf = int(local_kfs[np.argmax(counts[local_kfs])])
        extra = []
        for k in local_kfs[np.argsort(-counts[local_kfs])][:10]:
            extra.extend(store.covisible_kfs(k, n=10, min_weight=15))
        if extra:
            local_kfs = np.unique(np.concatenate(
                [local_kfs, np.asarray(extra, int)]))
        local_mps = store.points_seen_by(local_kfs)
        cap = self.cfg.local_mp_cap
        ids = np.full(cap, -1, np.int32)
        n = min(len(local_mps), cap)
        ids[:n] = local_mps[:n]
        self._local_ids = ids

    # ------------------------------------------------------------------
    # relocalization (Tracking::Relocalization, Tracking.cc:3024)
    # ------------------------------------------------------------------
    def _relocalize(self, frame) -> bool:
        """Global-descriptor retrieval -> brute-force matching vs candidate
        KF map points -> batched PnP RANSAC -> pose optimization. The
        reference pipeline (:3024-3210) with MLPnP replaced by the vmapped
        DLT RANSAC (optim/pnp.py)."""
        from ..optim import pnp
        from . import retrieval

        cfg = self.cfg
        store = self.store
        gd = np.asarray(frame.feats.global_desc)
        cands = retrieval.detect_relocalization_candidates(store, gd)
        for c in cands[:5]:
            kf_obs = store.kf_obs[c]
            maskB = (kf_obs >= 0) & store.kf_mask[c]
            if int(maskB.sum()) < cfg.min_reloc_matches:
                continue
            idx, _ = search.search_brute_force(
                frame.feats.desc, frame.feats.mask,
                jnp.asarray(store.kf_desc[c]), jnp.asarray(maskB),
                max_dist=cfg.th_low, ratio=0.9,
            )
            idx = np.asarray(idx)
            slots = np.nonzero(idx >= 0)[0]
            if len(slots) < cfg.min_reloc_matches:
                continue
            mp_ids = kf_obs[idx[slots]]
            ok_mp = store.mp_valid[mp_ids]
            slots, mp_ids = slots[ok_mp], mp_ids[ok_mp]
            if len(slots) < cfg.min_reloc_matches:
                continue

            N = store.n_slots
            pts = np.zeros((N, 3), np.float32)
            uv = np.zeros((N, 2), np.float32)
            inv_s2 = np.ones(N, np.float32)
            val = np.zeros(N, bool)
            n = len(slots)
            pts[:n] = store.mp_pos[mp_ids]
            uv[:n] = np.asarray(frame.feats.xy)[slots]
            oct_ = np.asarray(frame.feats.octave)[slots]
            inv_s2[:n] = 1.0 / (1.2 ** (2.0 * oct_))
            val[:n] = True

            key = jnp.asarray(
                np.random.default_rng(self.frame_id).integers(0, 2**31, 2),
                jnp.uint32,
            )
            res = pnp.pnp_ransac(
                self.cam.kind, self.cam.params,
                jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(inv_s2),
                jnp.asarray(val), key, n_hyps=cfg.pnp_hyps,
            )
            if int(res["n_inliers"]) < cfg.min_reloc_pnp_inliers:
                continue

            obs = np.full(N, -1, np.int32)
            obs[slots] = mp_ids
            frame.obs = obs
            n_in = self._pose_optimize_frame(
                frame, np.asarray(res["R"]), np.asarray(res["t"])
            )
            if n_in < cfg.min_reloc_pnp_inliers:
                frame.R = None
                frame.t = None
                continue  # nGood < 10 (Tracking.cc:3131)
            if n_in < cfg.min_reloc_inliers:
                n_in = self._reloc_escalate(frame, c, n_in)
            if n_in >= cfg.min_reloc_inliers:
                self.ref_kf = int(c)
                self.velocity = None
                self._local_ids = None
                self.n_inliers = n_in
                self.n_relocalizations += 1
                return True
            frame.R = None
            frame.t = None
        return False

    def _reloc_escalate(self, frame, c: int, n_in: int) -> int:
        """Widened-projection retry for a failing reloc candidate
        (Tracking.cc:3141-3169): when the first pose optimization lands
        10-50 inliers, project the candidate keyframe's map points at the
        estimated pose with a COARSE window (th=10, TH_HIGH), re-optimize;
        if that reaches 30-50, one more FINE pass (th=3, TH_LOW) and a
        final optimization. Recovers candidates whose brute-force match
        set was too small but whose pose estimate is already decent."""
        cfg = self.cfg
        store = self.store
        kf_obs = store.kf_obs[c]
        slots_c = np.nonzero((kf_obs >= 0) & store.kf_mask[c])[0]
        mp_c = kf_obs[slots_c]
        mp_c = np.unique(mp_c[store.mp_valid[mp_c]])
        if len(mp_c) == 0:
            return n_in
        N = store.n_slots
        pos, desc, valid, ids_p = self._pad_mps(mp_c, N)

        def extra_pass(radius, max_dist):
            """One guided-projection pass over the frame's FREE slots;
            returns the number of new observations claimed."""
            free = np.asarray(frame.feats.mask) & (frame.obs < 0)
            # exclude points the frame already carries (sFound)
            have = frame.obs[frame.obs >= 0]
            val2 = np.asarray(valid) & ~np.isin(ids_p, have)
            idx, _, _ = search.search_by_projection(
                self.cam.kind, self.cam.params,
                (self.cam.width, self.cam.height),
                jnp.asarray(frame.R), jnp.asarray(frame.t),
                pos, desc, jnp.asarray(val2),
                frame.feats.xy, frame.feats.desc, frame.feats.octave,
                jnp.asarray(free),
                radius=float(radius), max_dist=float(max_dist),
            )
            idx = np.asarray(idx)
            new_slots = np.nonzero((idx >= 0) & free)[0]
            if len(new_slots) == 0:
                return 0
            new_ids = ids_p[idx[new_slots]]
            _, first = np.unique(new_ids, return_index=True)
            uniq = np.zeros(len(new_ids), bool)
            uniq[first] = True
            new_slots, new_ids = new_slots[uniq], new_ids[uniq]
            frame.obs[new_slots] = new_ids
            return len(new_slots)

        from ..ops import matching as M

        n_add = extra_pass(10.0, M.TH_HIGH)
        if n_in + n_add < cfg.min_reloc_inliers:
            return n_in
        n_in = self._pose_optimize_frame(frame, frame.R, frame.t)
        if 30 < n_in < cfg.min_reloc_inliers:
            n_add = extra_pass(3.0, M.TH_LOW)
            if n_in + n_add >= cfg.min_reloc_inliers:
                n_in = self._pose_optimize_frame(frame, frame.R, frame.t)
        return n_in

    def _pad_mps(self, mp_ids, cap, with_stats=False):
        store = self.store
        mp_ids = mp_ids[:cap]
        n = len(mp_ids)
        pos = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, store.desc_dim), np.float32)
        valid = np.zeros(cap, bool)
        pos[:n] = store.mp_pos[mp_ids]
        desc[:n] = store.mp_desc[mp_ids]
        valid[:n] = True
        ids_p = np.full(cap, -1, np.int32)
        ids_p[:n] = mp_ids
        out = (jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(valid), ids_p)
        if not with_stats:
            return out
        normal = np.zeros((cap, 3), np.float32)
        dmin = np.zeros(cap, np.float32)
        dmax = np.zeros(cap, np.float32)
        normal[:n] = store.mp_normal[mp_ids]
        dmin[:n] = store.mp_dmin[mp_ids]
        dmax[:n] = store.mp_dmax[mp_ids]
        return out + (jnp.asarray(normal), jnp.asarray(dmin), jnp.asarray(dmax))

    def _track_local_map(self, frame):
        """UpdateLocalMap + SearchLocalPoints + final pose opt
        (Tracking.cc:2271-2388)."""
        cfg = self.cfg
        store = self.store

        # local keyframes: those observing current matches, plus covisibles
        matched = frame.obs[frame.obs >= 0]
        if len(matched) == 0:
            return
        kf_ids, _, mp_ids_obs = store.observing_slots(np.unique(matched))
        if len(kf_ids) == 0:
            return
        counts = np.bincount(kf_ids, minlength=store.k_max)
        local_kfs = np.nonzero(counts)[0]
        # ref kf = most shared observations (Tracking.cc:2962)
        self.ref_kf = int(local_kfs[np.argmax(counts[local_kfs])])
        extra = []
        for k in local_kfs[np.argsort(-counts[local_kfs])][:10]:
            extra.extend(store.covisible_kfs(k, n=10, min_weight=15))
        local_kfs = np.unique(np.concatenate([local_kfs, np.asarray(extra, int)])) if extra else local_kfs

        local_mps = store.points_seen_by(local_kfs)
        # exclude already-matched
        local_mps = local_mps[~np.isin(local_mps, matched)]
        if len(local_mps) > 0:
            cap = cfg.local_mp_cap
            (mp_pos, mp_desc, mp_valid, ids_p, mp_normal, mp_dmin,
             mp_dmax) = self._pad_mps(local_mps, cap, with_stats=True)

            def run():  # kernel waits OFF the lock (inputs captured)
                idx, _, proj_ok = search.search_by_projection(
                    self.cam.kind, self.cam.params,
                    (self.cam.width, self.cam.height),
                    jnp.asarray(frame.R), jnp.asarray(frame.t),
                    mp_pos, mp_desc, mp_valid,
                    frame.feats.xy, frame.feats.desc, frame.feats.octave,
                    frame.feats.mask,
                    radius=cfg.local_window, max_dist=cfg.th_high, ratio=1.0,
                    mp_normal=mp_normal, mp_dmin=mp_dmin, mp_dmax=mp_dmax,
                )
                return np.asarray(idx), np.asarray(proj_ok)

            idx, proj_ok = self._unlocked(run)
            # visibility statistics (visible = projected in frustum)
            vis_ids = ids_p[proj_ok[: len(ids_p)] & (ids_p >= 0)]
            store.mp_visible[vis_ids[store.mp_valid[vis_ids]]] += 1
            new = (idx >= 0) & (frame.obs < 0)
            frame.obs = self._revalidate_obs(np.where(
                new, ids_p[np.clip(idx, 0, cap - 1)], frame.obs))

        n_in = self._pose_optimize_frame(frame, frame.R, frame.t)
        self.n_inliers = n_in
        found = frame.obs[frame.obs >= 0]
        store.mp_found[found] += 1
        store.mp_visible[np.unique(matched)] += 1

        if n_in < cfg.min_local_inliers:
            # keep the pose but flag low quality; reference transitions to
            # RECENTLY_LOST via a similar gate
            if n_in < cfg.min_pose_inliers:
                frame.R = None
                frame.t = None
                return
        # motion model update. R_v must be re-orthonormalized: se3_inverse
        # is a transpose, so any non-orthonormality of the frame rotations
        # would be injected into next frame's prediction and compound
        # geometrically (see lie.orthonormalize)
        R_l, t_l = self.last_frame.R, self.last_frame.t
        Rl_inv, tl_inv = lie.se3_inverse(jnp.asarray(R_l), jnp.asarray(t_l))
        R_v, t_v = lie.se3_mul(jnp.asarray(frame.R), jnp.asarray(frame.t), Rl_inv, tl_inv)
        self.velocity = (np.asarray(lie.orthonormalize(R_v)), np.asarray(t_v))

    # ------------------------------------------------------------------
    # keyframe policy
    # ------------------------------------------------------------------
    def _need_new_keyframe(self, frame) -> bool:
        """Tracking::NeedNewKeyFrame (Tracking.cc:2390-2545), all
        conditions: c1a (max frames), c1b (min frames + mapper idle),
        c1c (depth sensors: weak tracking / close-point starvation),
        c2 (ref-ratio), c3 (inertial 0.5 s cadence), c4 (inertial low
        inliers), plus the pre-IMU-init 0.25 s cadence and the
        mapper-busy drop policy."""
        cfg = self.cfg
        store = self.store
        self.frames_since_kf += 1
        if self.ref_kf < 0:
            return False
        vi_mode = self.vi is not None
        is_depth = frame.depth is not None
        # inertial maps before IMU init: fixed 0.25 s cadence (:2392-2400)
        if vi_mode and not store.imu_initialized:
            return (self._last_kf >= 0 and
                    frame.timestamp - store.kf_timestamp[self._last_kf] >= 0.25)
        n_kfs = int(store.kf_valid.sum())
        # reference KF's well-observed points (TrackedMapPoints(nMinObs))
        min_obs = 3 if n_kfs > 2 else 2
        ref_mp = store.kf_obs[self.ref_kf]
        ref_mp = ref_mp[ref_mp >= 0]
        n_ref = int((store.mp_obs_count[ref_mp] >= min_obs).sum())
        # "idle" = nothing WAITING (the worker may be mid-keyframe): this
        # worker defers its BA while keyframes queue (pipeline.py), so a
        # short queue means the new KF's association stages run promptly.
        # The reference's stricter thread-idle test assumes a mapping
        # thread that cannot defer work (LocalMapping.cc:140).
        mapper_idle = self.worker is None or self.worker.queue_size() < 2

        need_close = False
        if is_depth:
            close = ((frame.depth > 0) & (frame.depth < cfg.th_depth)
                     & np.asarray(frame.feats.mask))
            tracked_close = int((close & (frame.obs >= 0)).sum())
            need_close = tracked_close < 100 and int(
                (close & (frame.obs < 0)).sum()) > 70

        th_ref = 0.75 if is_depth else cfg.kf_ref_ratio  # mono 0.9 (:2470)
        if n_kfs < 2:
            th_ref = 0.4
        if vi_mode and not is_depth:  # IMU_MONOCULAR (:2476-2482)
            th_ref = 0.75 if self.n_inliers > 350 else cfg.kf_ref_ratio

        c1a = self.frames_since_kf >= cfg.max_frames_between_kf
        c1b = (self.frames_since_kf >= cfg.min_frames_between_kf
               and mapper_idle)
        c1c = (is_depth and not vi_mode
               and (self.n_inliers < 0.25 * n_ref or need_close))
        c2 = ((self.n_inliers < th_ref * n_ref or need_close)
              and self.n_inliers > 15)
        c3 = (vi_mode and self._last_kf >= 0 and
              frame.timestamp - store.kf_timestamp[self._last_kf] >= 0.5)
        c4 = vi_mode and not is_depth and 15 < self.n_inliers < 75
        if not (((c1a or c1b or c1c) and c2) or c3 or c4):
            return False
        if mapper_idle:
            return True
        # mapping busy (:2524-2543): InterruptBA — abort the in-flight
        # local BA so the mapper frees up and the NEXT frame's c1b can
        # insert (Tracking.cc:2527-2535; without this, monocular keyframe
        # creation starves whenever mapping keeps pace with the camera).
        if self.mapper is not None:
            self.mapper.abort_ba = True
        # insert while the queue is short. The reference drops monocular
        # keyframes here because its mapping thread may discard queued KFs
        # wholesale (EmptyQueue); this worker processes the queue strictly
        # in order, so a short queue is safe for monocular too — and on a
        # slow host dropping them starves the map until tracking dies.
        return self.worker is not None and self.worker.queue_size() < 3

    def _create_keyframe(self, frame):
        store = self.store
        # capacity growth happens inside add_keyframe (MapStore doubles
        # itself rather than silently dropping coverage on long sequences)
        k = store.add_keyframe(frame.R, frame.t, frame.feats, frame.timestamp,
                               obs=frame.obs, depth=frame.depth)
        self.ref_kf = k
        self.frames_since_kf = 0
        self._local_ids = None  # recompute from the refreshed observations
        if frame.depth is not None:
            self._create_depth_points(frame, k)
        if frame.right is not None and store.has_right:
            # right-camera keypoints of matched left slots become
            # first-class observations (the reference's ToBody edges)
            fr, ridx = frame.right
            sel = (frame.obs >= 0) & (np.asarray(ridx) >= 0)
            slots_l = np.nonzero(sel)[0]
            if len(slots_l):
                rs = np.asarray(ridx)[slots_l]
                store.set_right_observations(
                    k, rs, frame.obs[slots_l],
                    np.asarray(fr.xy)[rs], np.asarray(fr.octave)[rs])
        if self.vi is not None:
            if self._last_kf >= 0:
                # preintegrate with the previous KF's bias BEFORE switching
                meas = (np.concatenate(self._imu_since_kf, axis=0)
                        if self._imu_since_kf else np.zeros((0, 7), np.float32))
                pre = self._pre_from_kf()
                self.vi.on_keyframe(k, self._last_kf, pre, meas=meas)
            if frame.v is not None:
                store.kf_vel[k] = frame.v
            self._imu_since_kf = []
            self._last_kf = k
        if self.worker is not None:
            # async pipeline: hand the keyframe to the mapping worker
            # (LocalMapping::InsertKeyFrame, LocalMapping.cc:317) and keep
            # tracking — refinements land in the store and reach the
            # tracker through the shared map under the lock
            self.worker.enqueue(store, k)
            return
        if self.mapper is not None:
            self.mapper.process_keyframe(k)
        if self.loop_closer is not None:
            # LocalMapping -> LoopClosing handoff (LocalMapping.cc:283);
            # synchronous in round 1
            closed = self.loop_closer.process_keyframe(k)
            if closed:
                # a correction moved the whole map; restart the motion model
                self.velocity = None
        if self.vi is not None:
            # staged IMU initialization (LocalMapping.cc:200-275); a stage
            # rescales/rotates the whole map, so refresh the frame state
            if self.vi.maybe_initialize(frame.timestamp):
                frame.v = store.kf_vel[k].copy()
                self.velocity = None
        if self.mapper is not None or self.loop_closer is not None or self.vi is not None:
            # tracking continues from the (possibly) BA/loop-refined pose
            frame.R = store.kf_R[k].copy()
            frame.t = store.kf_t[k].copy()
            frame.obs = store.kf_obs[k].copy()

    def _create_depth_points(self, frame, k):
        """Seed close map points from depth on keyframe insertion
        (Tracking::CreateNewKeyFrame, Tracking.cc:2546: nearest ~100 close
        points whose slot has no map point yet)."""
        cfg = self.cfg
        store = self.store
        free = (
            np.asarray(frame.feats.mask)
            & (store.kf_obs[k] < 0)
            & (frame.depth > 0)
            & (frame.depth < cfg.th_depth)
        )
        slots = np.nonzero(free)[0]
        if len(slots) == 0:
            return
        order = np.argsort(frame.depth[slots])
        slots = slots[order[: cfg.max_depth_points_per_kf]]
        p_w = self._unproject_depth(frame, slots)
        desc = np.asarray(frame.feats.desc)[slots]
        ids = store.add_points(p_w, desc, first_kf=k)  # grows at capacity
        store.assign_observations(k, slots, ids)
        frame.obs[slots] = ids

"""SLAM system facade — the public API.

TPU-native analogue of the reference System class
(/root/reference/include/System.h:84-263, src/System.cc): construction
wires extractor + tracker + local mapper around one MapStore;
`track_monocular(image, t)` is the per-frame entry
(System::TrackMonocular, System.cc:345); trajectory savers emit the TUM
format (System::SaveTrajectoryTUM / SaveKeyFrameTrajectoryTUM,
System.cc:512-...); `save_map`/`load_map` replace SaveAtlas/LoadAtlas
boost archives with .npz snapshots.

Round-1 scope: monocular, single map, no loop closing / IMU. The
reference's thread trio runs here as synchronous stages; async overlap is
a later milestone (SURVEY.md §7.10).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..geometry import cameras
from .atlas import Atlas
from .local_mapping import LocalMapper, MapperConfig
from .loop_closing import LoopCloser, LoopCloserConfig
from .map import MapStore
from .tracking import LOST, Tracker, TrackerConfig
from .vi import VIConfig, VIManager


@dataclasses.dataclass
class SystemConfig:
    k_max: int = 256          # keyframe capacity
    m_max: int = 32768        # map point capacity
    n_slots: int = 1024       # keypoint slots per frame
    desc_dim: int = 256
    gdesc_dim: int = 4096
    loop_closing: bool = True  # the reference's `loopClosing: 1` toggle
    # async mapping/loop pipeline (the reference's thread trio,
    # System.cc:137-183; slam/pipeline.py). Works in visual-inertial mode
    # too: the staged IMU init runs on the worker; its whole-map rescale
    # is observed by the tracker through store.big_change_idx (it resets
    # the motion model and re-anchors VI tracking on the last keyframe's
    # corrected state).
    async_mapping: bool = False
    # stereo rig (Settings: Stereo.b / depth gates)
    baseline: float = 0.0      # metres; 0 = no stereo rig
    depth_factor: float = 1.0  # RGB-D raw-to-metres (RGBD.DepthMapFactor)
    # non-rectified (fisheye) stereo rig: right camera + right-in-left
    # extrinsic (the reference's mpCamera2 + Tlr paths, Frame.cc:1138)
    cam_right: object = None           # geometry.cameras.Camera or None
    T_lr: object = None                # (R_lr (3,3), t_lr (3,)) or None
    # RGB-D virtual baseline for depth-edge weighting (the reference's
    # Camera.bf serves both stereo and RGB-D)
    virtual_baseline: float = 0.08
    tracker: TrackerConfig = dataclasses.field(default_factory=TrackerConfig)
    mapper: MapperConfig = dataclasses.field(default_factory=MapperConfig)
    loop: LoopCloserConfig = dataclasses.field(default_factory=LoopCloserConfig)
    vi: VIConfig = dataclasses.field(default_factory=VIConfig)


class SLAMSystem:
    """Monocular SLAM. `extractor(image) -> Features` is injected — the
    real HF-Net extractor (models/extractor.py) or a test fake
    (models/fake.py); this is the BaseModel seam SURVEY.md §4 calls for."""

    def __init__(self, cam: cameras.Camera, extractor, cfg: SystemConfig = None,
                 imu_calib=None):
        """imu_calib: geometry.imu.ImuCalib enables visual-inertial mode
        (the reference's IMU_MONOCULAR / IMU_STEREO sensor variants)."""
        self.cam = cam
        self.extractor = extractor
        self.cfg = cfg or SystemConfig()
        self.imu_calib = imu_calib
        c = self.cfg
        self.atlas = Atlas(c.k_max, c.m_max, c.n_slots, c.desc_dim, c.gdesc_dim)
        # depth-edge weight base bf = fx * b (stereo rig or RGB-D virtual
        # baseline); only observations that actually carry depth use it
        bf = float(cam.fx) * (c.baseline if c.baseline > 0 else c.virtual_baseline)
        c.tracker.bf = bf
        c.mapper.bf = bf
        self.mapper = LocalMapper(cam, self.store, c.mapper)
        if c.cam_right is not None and c.T_lr is not None:
            # fisheye-stereo rig: right-camera keypoints become first-class
            # observations with ToBody edges in BA (VERDICT r3 missing #4).
            # Stored extrinsic is x_r = R_rl x_l + t_rl.
            R_lr, t_lr = (np.asarray(c.T_lr[0], np.float32),
                          np.asarray(c.T_lr[1], np.float32))
            assert c.cam_right.kind == cam.kind, \
                "rig cameras must share the projection model kind"
            c.mapper.rig = (R_lr.T, -R_lr.T @ t_lr,
                            np.asarray(c.cam_right.params, np.float32))
            self.store.enable_right_bank()
        self.loop_closer = (
            LoopCloser(cam, self.store, c.loop, mapper=self.mapper)
            if c.loop_closing else None
        )
        self.vi = (VIManager(imu_calib, self.store, c.vi)
                   if imu_calib is not None else None)
        if self.vi is not None:
            # cross-wiring for the visual-inertial BA paths: the mapper's
            # window BA goes inertial once the IMU is initialized, and the
            # staged init runs FullInertialBA through the mapper
            self.mapper.vim = self.vi
            self.vi.mapper = self.mapper
        self.tracker = Tracker(cam, self.store, c.tracker, mapper=self.mapper,
                               loop_closer=self.loop_closer, vi=self.vi)
        if self.loop_closer is not None:
            self.loop_closer.system = self  # enables cross-map merges
        self._traj_mark = 0
        self.viewer = None  # optional utils.viewer.LiveViewer
        self.worker = None
        self.loop_worker = None
        self.gba_worker = None
        if c.async_mapping:
            from .pipeline import GBAWorker, LoopWorker, MappingWorker

            self.worker = MappingWorker(self)
            self.tracker.worker = self.worker
            self.tracker.lock = self.worker.map_lock
            self.mapper.lock = self.worker.map_lock
            if self.loop_closer is not None:
                self.loop_closer.lock = self.worker.map_lock
                self.loop_closer.mapping_worker = self.worker
                # dedicated LoopClosing thread (System.cc:160): place
                # recognition/corrections never block triangulation
                self.loop_worker = LoopWorker(self)
                # detached, abortable global BA (the reference's transient
                # GBA thread): loop corrections return immediately and the
                # solve overlaps tracking + mapping
                self.gba_worker = GBAWorker(self.mapper)
                self.loop_closer.gba_worker = self.gba_worker

    @property
    def store(self) -> MapStore:
        return self.atlas.active

    # ------------------------------------------------------------------
    def track_monocular(self, image, timestamp: float):
        """Feed one frame. Returns (state, R_cw, t_cw) — pose may be None."""
        feats = self.extractor(image)
        return self.track_features(feats, timestamp)

    def track_stereo(self, image_left, image_right, timestamp: float):
        """Stereo frame (System::TrackStereo analogue): extract both
        images, associate for depth, then track. A rectified rig uses the
        row-band matcher; a rig with `cam_right` + `T_lr` configured (e.g.
        TUM-VI's non-overlapping KB8 fisheyes) uses descriptor matching +
        two-view triangulation through each camera's own model
        (Frame::ComputeStereoFishEyeMatches, Frame.cc:1138)."""
        from ..ops import stereo as S

        fl = self.extractor(image_left)
        fr = self.extractor(image_right)
        if self.cfg.cam_right is not None and self.cfg.T_lr is not None:
            cr = self.cfg.cam_right
            R_lr, t_lr = self.cfg.T_lr
            depth, idx, _ = S.match_stereo_fisheye(
                self.cam.kind, self.cam.params, cr.kind, cr.params,
                fl.xy, fl.desc, fl.octave, fl.mask,
                fr.xy, fr.desc, fr.octave, fr.mask,
                jnp.asarray(R_lr), jnp.asarray(t_lr),
            )
            # right keypoints of matched pairs become first-class
            # observations at keyframes (ToBody edges; VERDICT r3 #4)
            return self.track_features(fl, timestamp,
                                       depth=np.asarray(depth),
                                       right=(fr, np.asarray(idx)))
        depth, _ = S.match_stereo(
            fl.xy, fl.desc, fl.octave, fl.mask,
            fr.xy, fr.desc, fr.octave, fr.mask,
            fx=float(self.cam.fx), baseline=self.cfg.baseline,
        )
        return self.track_features(fl, timestamp, depth=np.asarray(depth))

    def track_rgbd(self, image, depth_image, timestamp: float):
        """RGB-D frame (System::TrackRGBD analogue)."""
        from ..ops import stereo as S

        feats = self.extractor(image)
        depth = S.depth_at_keypoints(
            jnp.asarray(depth_image), feats.xy, self.cfg.depth_factor
        )
        return self.track_features(feats, timestamp, depth=np.asarray(depth))

    def track_monocular_inertial(self, image, timestamp: float, imu):
        """Mono-inertial frame (System::TrackMonocular with vImuMeas):
        imu = (N,7) [ax ay az wx wy wz dt] covering (t_prev, t]."""
        feats = self.extractor(image)
        return self.track_features(feats, timestamp, imu=imu)

    def track_stereo_inertial(self, image_left, image_right,
                              timestamp: float, imu):
        """Stereo-inertial frame (System::TrackStereo with vImuMeas):
        stereo depth (rectified row-search or fisheye triangulation, see
        track_stereo) + the IMU measurement block."""
        from ..ops import stereo as S

        fl = self.extractor(image_left)
        fr = self.extractor(image_right)
        if self.cfg.cam_right is not None and self.cfg.T_lr is not None:
            cr = self.cfg.cam_right
            R_lr, t_lr = self.cfg.T_lr
            depth, _, _ = S.match_stereo_fisheye(
                self.cam.kind, self.cam.params, cr.kind, cr.params,
                fl.xy, fl.desc, fl.octave, fl.mask,
                fr.xy, fr.desc, fr.octave, fr.mask,
                jnp.asarray(R_lr), jnp.asarray(t_lr),
            )
        else:
            depth, _ = S.match_stereo(
                fl.xy, fl.desc, fl.octave, fl.mask,
                fr.xy, fr.desc, fr.octave, fr.mask,
                fx=float(self.cam.fx), baseline=self.cfg.baseline,
            )
        return self.track_features(fl, timestamp, depth=np.asarray(depth),
                                   imu=imu)

    def install_mesh(self, mesh, dist_min_kfs: int = 48,
                     retrieval_min_kfs: int = 64):
        """Route big compute over a jax.sharding.Mesh: global BA through
        the distributed Schur solver (parallel/dist_ba.py) and place-
        recognition scans through the KF-axis-sharded matmul
        (parallel/retrieval.py). Single-chip behavior is unchanged below
        the size thresholds."""
        self.mapper.mesh = mesh
        self.mapper.dist_min_kfs = dist_min_kfs
        self._mesh = (mesh, dist_min_kfs, retrieval_min_kfs)
        for m in self.atlas.maps:
            m.retrieval_mesh = mesh
            m.retrieval_min_kfs = retrieval_min_kfs

    def activate_localization_mode(self):
        """System::ActivateLocalizationMode: track against the frozen map —
        no keyframes, no mapping, no loop closing (mapping worker idles)."""
        with self.tracker.lock:
            self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        """System::DeactivateLocalizationMode: resume full SLAM."""
        with self.tracker.lock:
            self.tracker.localization_only = False

    def finish(self):
        """Drain the async mapping + loop + GBA queues (no-op in sync
        mode). Call before reading final map state or saving trajectories.
        Order is topological: mapping feeds loop, loop feeds GBA."""
        if self.worker is not None:
            self.worker.drain()
        if self.loop_worker is not None:
            self.loop_worker.drain()
        if self.gba_worker is not None:
            self.gba_worker.drain()

    def start_webviewer(self, host="127.0.0.1", port=0, **kw):
        """Launch the live in-browser viewer (the reference's Pangolin
        window thread, src/System.cc:175-183 + src/Viewer.cc:162-196) and
        attach it as this system's frame hook. Returns the viewer; open
        `viewer.url` in a browser."""
        from ..utils.webviewer import WebViewer

        lock = self.worker.map_lock if self.worker is not None else None
        self.viewer = WebViewer(host=host, port=port, lock=lock, **kw)
        return self.viewer

    def shutdown(self):
        """System::Shutdown analogue: drain and stop the worker threads."""
        if self.viewer is not None and hasattr(self.viewer, "close"):
            self.viewer.release()
            self.viewer.close()
        if self.worker is not None:
            self.worker.drain()
            self.worker.stop()
        if self.loop_worker is not None:
            self.loop_worker.drain()
            self.loop_worker.stop()
        if self.gba_worker is not None:
            self.gba_worker.drain()
            self.gba_worker.stop()

    def track_features(self, feats, timestamp: float, depth=None, imu=None,
                       right=None):
        """Feed pre-extracted features (testing / offline pipelines)."""
        if self.viewer is not None:
            # live observability + step-by-step gate (utils.viewer.LiveViewer;
            # the reference's Viewer thread + Tracking::SetStepByStep)
            self.viewer.on_frame(self.store, self.tracker)
        if self.cam.dist is not None:
            # keypoint undistortion (Frame::UndistortKeyPoints,
            # src/Frame.cc): everything downstream works in the ideal
            # pinhole frame. Depth (RGB-D) was already sampled at the raw
            # pixel, which is where the sensor measured it.
            feats = feats._replace(xy=self.cam.undistort(feats.xy))
        out = self.tracker.track(feats, timestamp, depth=depth, imu=imu,
                                 right=right)
        if out[0] == LOST:
            self._handle_lost()
        return out

    # ------------------------------------------------------------------
    def _handle_lost(self):
        """Multi-map recovery (SURVEY.md §5.3): a mature map is stored and a
        fresh one starts (CreateMapInAtlas, Tracking.cc:1328); an immature
        one (<=10 KFs) is discarded in place (ResetActiveMap, :1323)."""
        with self.tracker.lock:
            mature = self.store.kf_valid.sum() > self.cfg.tracker.mature_map_kfs
            if mature:
                store = self.atlas.create_new_map()
            else:
                store = self.atlas.reset_active_map()
            self._rewire(store)
            self.tracker.reset_for_new_map(store)
            self._traj_mark = len(self.tracker.trajectory)

    # ------------------------------------------------------------------
    def execute_merge(self, target_idx: int, k: int, cand: int,
                      R_cm, t_cm, s_cm, win_mps) -> bool:
        """Weld the active map into atlas map `target_idx` via the matched
        Sim3 (LoopClosing::MergeLocal, LoopClosing.cc:1355; the inertial
        MergeLocal2 path, :1923, adds the scale and gravity gates). Called
        by the loop closer when place recognition hits a stored map."""
        from .. import lie
        from . import merging

        active = self.store
        target = self.atlas.maps[target_idx]
        G = merging.compute_world_transform(active, target, k, cand,
                                            R_cm, t_cm, s_cm)
        if active.imu_initialized and target.imu_initialized:
            # inertial<->inertial welding (LoopClosing.cc:140-159): the
            # world transform must preserve metric scale...
            Rg, tg, sg = G
            if not (0.90 <= sg <= 1.1):
                return False  # "scale bad estimated. Abort merging"
            if active.viba1:
                # ... and gravity: force yaw-only, unit scale
                import jax.numpy as jnp

                phi = np.asarray(lie.so3_log(jnp.asarray(Rg)))
                phi[0] = 0.0
                phi[1] = 0.0
                Rg = np.asarray(lie.so3_exp(jnp.asarray(phi)))
                G = (Rg, tg, 1.0)
        kf_remap, mp_remap = merging.merge_into(active, target, G)
        if k not in kf_remap:
            return False
        k_new = kf_remap[k]

        # rebuild covisibility of the transplanted keyframes
        for b in kf_remap.values():
            target.update_covisibility(b)

        # atlas surgery: target becomes active, the absorbed map is dropped
        self.atlas.maps = [m for m in self.atlas.maps if m is not active]
        self.atlas.active_idx = self.atlas.maps.index(target)
        self._rewire(target)

        # tracker continuity in the merged frame
        tr = self.tracker
        tr.store = target
        tr.ref_kf = k_new
        tr._last_kf = k_new if tr.vi is not None else tr._last_kf
        tr.velocity = None
        if tr.last_frame is not None:
            tr.last_frame.R = target.kf_R[k_new].copy()
            tr.last_frame.t = target.kf_t[k_new].copy()
            tr.last_frame.obs = target.kf_obs[k_new].copy()
        target.bump_change()  # the weld moved geometry under the tracker
        tr._vi_state = None
        if tr.vi is not None:
            tr.vi.store = target
            # chain preintegrations follow their keyframes into the target
            # id space (they are body-frame quantities — invariant to the
            # world transform)
            tr.vi.kf_pre = {kf_remap[a]: pre for a, pre in tr.vi.kf_pre.items()
                            if a in kf_remap}
            tr.vi.kf_meas = {kf_remap[a]: m for a, m in tr.vi.kf_meas.items()
                             if a in kf_remap}
            tr._imu_since_kf = []
        # re-anchor the trajectory segment recorded in the absorbed map:
        # absolute fallbacks move into the target world frame, and the
        # per-frame reference-KF links follow the transplanted keyframes
        # (relative translations rescale by 1/s since the map scale changed)
        Rg, tg, sg = G
        tg = np.asarray(tg)
        mark = getattr(self, "_traj_mark", 0)
        for e in tr.trajectory[mark:]:
            R_new = e.R @ Rg.T
            e.R, e.t = R_new, e.t / sg - R_new @ (tg / sg)
            if getattr(e, "store", None) is active and e.ref_uid >= 0:
                old_slot = active._uid_slot.get(int(e.ref_uid))
                new_slot = kf_remap.get(old_slot) if old_slot is not None else None
                if new_slot is None:
                    e.store = None  # chain broken; absolute fallback stands
                else:
                    e.store = target
                    e.ref_uid = int(target.kf_uid[new_slot])
                    e.t_rel = e.t_rel / sg
            elif getattr(e, "store", None) is active:
                e.store = None

        # the welding passes (seam fuse + window BA + global polish) run in
        # weld_after_merge, OFF this lock-held surgery section — holding
        # the map lock through them blocked tracking for ~7 s per merge at
        # production shapes (and the seam fuse's internal lock release is
        # a no-op at RLock depth 2)
        return k_new

    def weld_after_merge(self, k_new: int, win_mps) -> None:
        """Welding passes after the merge surgery (the reference's
        welding-window BA + SearchAndFuse inside MergeLocal,
        LoopClosing.cc:1355-): seam fuse, window BA, global polish.
        Call WITHOUT holding the map lock — every stage manages its own
        locking, so tracking overlaps the solves; mapping stays paused by
        the caller (the reference keeps LocalMapping stopped through the
        weld, but never Tracking)."""
        target = self.store
        if self.loop_closer is not None:
            with self.loop_closer.lock:
                if target is self.store and target.kf_valid[k_new]:
                    window = [k_new] + [
                        int(j) for j in target.covisible_kfs(
                            k_new, n=8, min_weight=1)]
                    self.loop_closer._fuse_loop_points(
                        window, np.asarray(win_mps))
        if self.mapper is not None:
            if target.imu_initialized and self.mapper.vim is not None:
                # MergeInertialBA analogue (Optimizer.cc:3948): VI window
                # BA around the weld instead of the visual welding BA
                self.mapper.local_inertial_ba(k_new, self.mapper.vim)
            else:
                self.mapper.local_ba(k_new)
                lc = self.cfg.loop
                anchor = int(target.valid_kf_ids()[0])
                self.mapper.run_global_ba(
                    fixed_ids=[anchor], rounds=lc.gba_rounds,
                    kf_cap=lc.gba_kf_cap, mp_cap=lc.gba_mp_cap,
                    edge_cap=lc.gba_edge_cap,
                )

    def _rewire(self, store):
        if getattr(self, "_mesh", None) is not None:
            store.retrieval_mesh = self._mesh[0]
            store.retrieval_min_kfs = self._mesh[2]
        if self.cfg.mapper.rig is not None:
            store.enable_right_bank()  # stereo rig: fresh maps keep ToBody
        self.mapper.store = store
        self.mapper.recent_points = []
        self.mapper.kf_born = {}
        self.tracker.store = store
        if self.loop_closer is not None:
            self.loop_closer.store = store
            self.loop_closer._reset_pending()
        if self.vi is not None:
            self.vi.store = store

    # ------------------------------------------------------------------
    @property
    def trajectory(self):
        return self.tracker.trajectory

    def trajectory_tum(self) -> str:
        """TUM format: `t tx ty tz qx qy qz qw` (camera-to-world), matching
        System::SaveTrajectoryTUM's convention (System.cc:512). Poses are
        rebuilt through each frame's reference KF so loop/GBA corrections
        reach every past frame (Tracking.cc:1604-1624)."""
        from ..utils import trajectory as TJ

        return "\n".join(TJ.tum_lines(TJ.recovered(self.tracker.trajectory))) + "\n"

    def save_trajectory(self, path, fmt: str = "tum"):
        """fmt: tum | euroc | kitti (SaveTrajectory{TUM,EuRoC,KITTI})."""
        from ..utils import trajectory as TJ

        TJ.save(path, self.tracker.trajectory, fmt)

    def save_keyframe_trajectory(self, path, fmt: str = "tum"):
        """SaveKeyFrameTrajectoryTUM analogue: keyframe poses only."""
        from ..utils import trajectory as TJ

        TJ.save(path, TJ.keyframe_trajectory(self.store), fmt)

    # ------------------------------------------------------------------
    def save_map(self, path):
        """Single-map .npz snapshot of the active map."""
        self.store.save(path)

    def load_map(self, path):
        """Replace the active map with a .npz snapshot."""
        store = MapStore.load(path)
        self.atlas.maps[self.atlas.active_idx] = store
        self._rewire(store)

    def save_atlas(self, path):
        """Whole-session snapshot (SaveAtlas analogue): all maps + manifest."""
        self.atlas.save(path)

    def load_atlas(self, path):
        self.atlas = Atlas.load(path)
        self._rewire(self.atlas.active)

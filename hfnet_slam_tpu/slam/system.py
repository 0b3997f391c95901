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

from .. import lie
from ..geometry import cameras
from .local_mapping import LocalMapper, MapperConfig
from .map import MapStore
from .tracking import Tracker, TrackerConfig


@dataclasses.dataclass
class SystemConfig:
    k_max: int = 256          # keyframe capacity
    m_max: int = 32768        # map point capacity
    n_slots: int = 1024       # keypoint slots per frame
    desc_dim: int = 256
    gdesc_dim: int = 4096
    tracker: TrackerConfig = dataclasses.field(default_factory=TrackerConfig)
    mapper: MapperConfig = dataclasses.field(default_factory=MapperConfig)


class SLAMSystem:
    """Monocular SLAM. `extractor(image) -> Features` is injected — the
    real HF-Net extractor (models/extractor.py) or a test fake
    (models/fake.py); this is the BaseModel seam SURVEY.md §4 calls for."""

    def __init__(self, cam: cameras.Camera, extractor, cfg: SystemConfig = None):
        self.cam = cam
        self.extractor = extractor
        self.cfg = cfg or SystemConfig()
        c = self.cfg
        self.store = MapStore(c.k_max, c.m_max, c.n_slots, c.desc_dim, c.gdesc_dim)
        self.mapper = LocalMapper(cam, self.store, c.mapper)
        self.tracker = Tracker(cam, self.store, c.tracker, mapper=self.mapper)

    # ------------------------------------------------------------------
    def track_monocular(self, image, timestamp: float):
        """Feed one frame. Returns (state, R_cw, t_cw) — pose may be None."""
        feats = self.extractor(image)
        return self.tracker.track(feats, timestamp)

    def track_features(self, feats, timestamp: float):
        """Feed pre-extracted features (testing / offline pipelines)."""
        return self.tracker.track(feats, timestamp)

    # ------------------------------------------------------------------
    @property
    def trajectory(self):
        return self.tracker.trajectory

    def trajectory_tum(self) -> str:
        """TUM format: `t tx ty tz qx qy qz qw` (camera-to-world), matching
        System::SaveTrajectoryTUM's convention (System.cc:512)."""
        lines = []
        for ts, R_cw, t_cw in self.tracker.trajectory:
            R_wc = R_cw.T
            t_wc = -R_cw.T @ t_cw
            q = np.asarray(lie.rot_to_quat(R_wc))  # (w,x,y,z)
            lines.append(
                f"{ts:.6f} {t_wc[0]:.7f} {t_wc[1]:.7f} {t_wc[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}"
            )
        return "\n".join(lines) + "\n"

    def save_trajectory(self, path):
        with open(path, "w") as f:
            f.write(self.trajectory_tum())

    # ------------------------------------------------------------------
    def save_map(self, path):
        self.store.save(path)

    def load_map(self, path):
        self.store = MapStore.load(path)
        self.mapper.store = self.store
        self.tracker.store = self.store

"""Run configuration: reference-compatible YAML settings.

Replaces the reference's Settings class (/root/reference/src/Settings.cc,
include/Settings.h:41-236): one versioned YAML file per run
(`File.version: "1.0"`), flat dotted keys, camera calibration, IMU noise,
extractor knobs, atlas load/save names. The reference parses it with
cv::FileStorage; this module preprocesses the OpenCV dialect
(`%YAML:1.0` header, `!!opencv-matrix` tags) into plain YAML so the same
files — e.g. Examples/Monocular/EuRoC.yaml — load unchanged.

`build_system(...)` turns a Settings into the framework's native config
objects (geometry/cameras.Camera + slam/system.SystemConfig).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Optional

import numpy as np

SENSOR_MONOCULAR = "monocular"
SENSOR_STEREO = "stereo"
SENSOR_RGBD = "rgbd"
SENSOR_IMU_MONOCULAR = "imu-monocular"
SENSOR_IMU_STEREO = "imu-stereo"


def _preprocess_opencv_yaml(text: str) -> str:
    """Strip the cv::FileStorage dialect so yaml.safe_load accepts it."""
    text = re.sub(r"^%YAML[:\s][\d.]+\s*\n", "", text)
    text = text.replace("!!opencv-matrix", "")
    return text


def load_yaml(path) -> dict:
    import yaml

    with open(path) as f:
        raw = f.read()
    data = yaml.safe_load(_preprocess_opencv_yaml(raw)) or {}
    return data


def _mat(node) -> Optional[np.ndarray]:
    """Decode an (ex-)opencv-matrix node {rows, cols, dt, data}."""
    if node is None:
        return None
    if isinstance(node, dict) and "data" in node:
        return np.asarray(node["data"], np.float64).reshape(
            int(node["rows"]), int(node["cols"])
        )
    return np.asarray(node, np.float64)


@dataclasses.dataclass
class Settings:
    """Typed view of one YAML config (Settings.h's getters)."""

    # camera
    camera_type: str = "PinHole"      # PinHole | Rectified | KannalaBrandt8
    fx: float = 0.0
    fy: float = 0.0
    cx: float = 0.0
    cy: float = 0.0
    dist: tuple = ()                  # k1 k2 p1 p2 [k3] or KB8 k1-k4
    width: int = 0
    height: int = 0
    new_width: int = 0                # optional resize (Camera.newWidth)
    new_height: int = 0
    fps: float = 30.0
    rgb: bool = True
    # stereo
    baseline: float = 0.0             # Stereo.b
    th_depth: float = 35.0            # Stereo.ThDepth (in baseline units)
    # second camera (non-rectified / fisheye stereo rigs: TUM-VI):
    # Camera2.* intrinsics + Stereo.T_c1_c2 (right-in-left extrinsic)
    cam2: tuple = ()                  # (fx, fy, cx, cy) or empty
    dist2: tuple = ()
    T_c1_c2: Optional[np.ndarray] = None
    # RGBD
    depth_map_factor: float = 1.0
    # IMU
    T_b_c: Optional[np.ndarray] = None
    noise_gyro: float = 1.7e-4
    noise_acc: float = 2.0e-3
    gyro_walk: float = 1.9e-5
    acc_walk: float = 3.0e-3
    imu_frequency: float = 200.0
    # extractor (Settings.h:99-104)
    extractor_type: str = "HFNetTPU"
    model_path: str = ""
    n_features: int = 1000
    n_levels: int = 4
    scale_factor: float = 1.2
    threshold: float = 0.01
    # system
    loop_closing: bool = True
    load_atlas: str = ""
    save_atlas: str = ""
    th_far_points: float = 0.0

    @staticmethod
    def from_yaml(path, sensor: str = SENSOR_MONOCULAR) -> "Settings":
        d = load_yaml(path)
        version = str(d.get("File.version", ""))
        if version not in ("1.0", ""):
            raise ValueError(f"unsupported settings version {version!r}")

        def g(key, default=None):
            return d.get(key, default)

        dist_keys = ["Camera1.k1", "Camera1.k2", "Camera1.p1", "Camera1.p2",
                     "Camera1.k3", "Camera1.k4"]
        dist = tuple(float(d[k]) for k in dist_keys if k in d)

        s = Settings(
            camera_type=str(g("Camera.type", "PinHole")),
            fx=float(g("Camera1.fx", 0.0)), fy=float(g("Camera1.fy", 0.0)),
            cx=float(g("Camera1.cx", 0.0)), cy=float(g("Camera1.cy", 0.0)),
            dist=dist,
            width=int(g("Camera.width", 0)), height=int(g("Camera.height", 0)),
            new_width=int(g("Camera.newWidth", 0) or 0),
            new_height=int(g("Camera.newHeight", 0) or 0),
            fps=float(g("Camera.fps", 30.0)),
            rgb=bool(g("Camera.RGB", 1)),
            baseline=float(g("Stereo.b", 0.0) or 0.0),
            th_depth=float(g("Stereo.ThDepth", 35.0) or 35.0),
            cam2=(tuple(float(d[k]) for k in
                        ("Camera2.fx", "Camera2.fy", "Camera2.cx",
                         "Camera2.cy"))
                  if "Camera2.fx" in d else ()),
            dist2=tuple(float(d[k]) for k in
                        ("Camera2.k1", "Camera2.k2", "Camera2.p1",
                         "Camera2.p2", "Camera2.k3", "Camera2.k4")
                        if k in d),
            T_c1_c2=_mat(g("Stereo.T_c1_c2")),
            depth_map_factor=float(g("RGBD.DepthMapFactor", 1.0) or 1.0),
            T_b_c=_mat(g("IMU.T_b_c1")),
            noise_gyro=float(g("IMU.NoiseGyro", 1.7e-4) or 1.7e-4),
            noise_acc=float(g("IMU.NoiseAcc", 2.0e-3) or 2.0e-3),
            gyro_walk=float(g("IMU.GyroWalk", 1.9e-5) or 1.9e-5),
            acc_walk=float(g("IMU.AccWalk", 3.0e-3) or 3.0e-3),
            imu_frequency=float(g("IMU.Frequency", 200.0) or 200.0),
            extractor_type=str(g("Extractor.type", "HFNetTPU")),
            model_path=str(g("Extractor.modelPath", "")),
            n_features=int(g("Extractor.nFeatures", 1000)),
            n_levels=int(g("Extractor.nLevels", 4)),
            scale_factor=float(g("Extractor.scaleFactor", 1.2)),
            threshold=float(g("Extractor.threshold", 0.01)),
            loop_closing=bool(g("loopClosing", 1)),
            load_atlas=str(g("System.LoadAtlasFromFile", "") or ""),
            save_atlas=str(g("System.SaveAtlasToFile", "") or ""),
            th_far_points=float(g("System.thFarPoints", 0.0) or 0.0),
        )
        s.sensor = sensor
        return s

    # ------------------------------------------------------------------
    def make_camera(self):
        """Build the geometry camera. A distorted PinHole rig carries its
        radial-tangential coefficients; the system undistorts keypoints
        once per frame (the reference pre-undistorts too,
        Frame::UndistortKeyPoints). `Rectified` means the images were
        already undistorted upstream."""
        from ..geometry import cameras

        w = self.new_width or self.width
        h = self.new_height or self.height
        sx = w / self.width if self.width else 1.0
        sy = h / self.height if self.height else 1.0
        if self.camera_type in ("PinHole", "Rectified"):
            dist = self.dist if (self.camera_type == "PinHole" and
                                 any(self.dist)) else None
            return cameras.pinhole(self.fx * sx, self.fy * sy,
                                   self.cx * sx, self.cy * sy, w, h,
                                   dist=dist)
        if self.camera_type == "KannalaBrandt8":
            k = (list(self.dist) + [0.0] * 4)[:4]
            return cameras.kb8(self.fx * sx, self.fy * sy,
                               self.cx * sx, self.cy * sy, *k, w, h)
        raise ValueError(f"unknown camera type {self.camera_type}")

    def make_camera_right(self):
        """Second camera of a non-rectified stereo rig (Camera2.*), or
        None. Used with Stereo.T_c1_c2 by the fisheye stereo matcher
        (ops/stereo.match_stereo_fisheye; the reference's mpCamera2)."""
        if not self.cam2:
            return None
        from ..geometry import cameras

        w = self.new_width or self.width
        h = self.new_height or self.height
        sx = w / self.width if self.width else 1.0
        sy = h / self.height if self.height else 1.0
        fx, fy, cx, cy = self.cam2
        if self.camera_type == "KannalaBrandt8":
            k = (list(self.dist2) + [0.0] * 4)[:4]
            return cameras.kb8(fx * sx, fy * sy, cx * sx, cy * sy, *k, w, h)
        dist = self.dist2 if any(self.dist2) else None
        return cameras.pinhole(fx * sx, fy * sy, cx * sx, cy * sy, w, h,
                               dist=dist)

    def make_imu_calib(self):
        import jax.numpy as jnp

        from ..geometry import imu

        sf = float(np.sqrt(self.imu_frequency))
        Tbc = self.T_b_c if self.T_b_c is not None else np.eye(4)
        return imu.ImuCalib(
            sigma_g=jnp.asarray(self.noise_gyro * sf),
            sigma_a=jnp.asarray(self.noise_acc * sf),
            sigma_gw=jnp.asarray(self.gyro_walk / sf),
            sigma_aw=jnp.asarray(self.acc_walk / sf),
            Tbc_R=jnp.asarray(Tbc[:3, :3]),
            Tbc_t=jnp.asarray(Tbc[:3, 3]),
        )

    def make_system_config(self, **overrides):
        from ..slam.system import SystemConfig

        cfg = SystemConfig(
            loop_closing=self.loop_closing,
            baseline=self.baseline,
            depth_factor=(1.0 / self.depth_map_factor
                          if self.depth_map_factor > 1.0 else 1.0),
        )
        cfg.tracker.th_depth = (
            self.th_depth * self.baseline if self.baseline > 0 else self.th_depth
        )
        cfg.tracker.th_far = self.th_far_points
        # keyframe cadence: the reference sets mMaxFrames = fps
        # (Tracking.cc newParameterLoader), i.e. at most ~1 s between KFs
        if self.fps > 0:
            cfg.tracker.max_frames_between_kf = int(round(self.fps))
        # non-rectified stereo rig (TUM-VI fisheye): second camera +
        # right-in-left extrinsic for match_stereo_fisheye
        if self.cam2 and self.T_c1_c2 is not None:
            cfg.cam_right = self.make_camera_right()
            T = np.asarray(self.T_c1_c2, np.float64)
            cfg.T_lr = (T[:3, :3].astype(np.float32),
                        T[:3, 3].astype(np.float32))
            if cfg.baseline <= 0:
                cfg.baseline = float(np.linalg.norm(T[:3, 3]))
        for k, v in overrides.items():
            setattr(cfg, k, v)
        return cfg

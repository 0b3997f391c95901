"""Dataset loaders: EuRoC, TUM-VI, TUM-RGBD sequence readers.

Replaces the reference's per-example LoadImages/LoadIMU helpers
(/root/reference/Examples/Monocular/mono_euroc.cc,
Examples/Monocular-Inertial/mono_inertial_euroc.cc,
Examples/RGB-D/rgbd_tum.cc) and the timestamp association script
(/root/reference/evaluation/associate.py). Images decode lazily via PIL
to grayscale float arrays; IMU rows are [ax ay az wx wy wz] batches per
frame interval, ready for geometry/imu.integrate.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np


def load_image_gray(path) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), np.float32)


@dataclasses.dataclass
class Sequence:
    """A loaded sequence: image paths + timestamps (+ optional depth/IMU)."""

    image_paths: list
    timestamps: np.ndarray                 # seconds
    depth_paths: Optional[list] = None
    depth_factor: float = 1.0
    imu: Optional[np.ndarray] = None       # (M,7) [t ax ay az wx wy wz]

    def __len__(self):
        return len(self.image_paths)

    def image(self, i) -> np.ndarray:
        return load_image_gray(self.image_paths[i])

    def depth(self, i) -> np.ndarray:
        from PIL import Image

        with Image.open(self.depth_paths[i]) as im:
            return np.asarray(im, np.float32) / self.depth_factor

    def imu_between(self, t0: float, t1: float) -> np.ndarray:
        """IMU rows with t in (t0, t1] as (N,7) [ax ay az wx wy wz dt]
        blocks, dt of each sample to the next (midpointable); mirrors the
        per-frame vImuMeas collection in mono_inertial_euroc.cc."""
        if self.imu is None:
            return np.zeros((0, 7), np.float32)
        t = self.imu[:, 0]
        sel = (t > t0) & (t <= t1)
        rows = self.imu[sel]
        if len(rows) == 0:
            return np.zeros((0, 7), np.float32)
        ts = np.concatenate([[t0], rows[:, 0]])
        dt = np.diff(ts)
        out = np.zeros((len(rows), 7), np.float32)
        out[:, :6] = rows[:, 1:7]
        out[:, 6] = dt
        return out


# ---------------------------------------------------------------------------
# EuRoC (ASL format)
# ---------------------------------------------------------------------------

def load_euroc(seq_dir, cam: str = "cam0", with_imu: bool = False) -> Sequence:
    """`seq_dir` = .../MH_01_easy/mav0. Timestamps from data.csv
    (nanoseconds), like mono_euroc.cc's LoadImages."""
    cam_dir = os.path.join(seq_dir, cam)
    csv = os.path.join(cam_dir, "data.csv")
    names, stamps = [], []
    with open(csv) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            ts, name = line.strip().split(",")[:2]
            names.append(os.path.join(cam_dir, "data", name))
            stamps.append(int(ts) * 1e-9)
    imu = None
    if with_imu:
        imu_csv = os.path.join(seq_dir, "imu0", "data.csv")
        rows = []
        with open(imu_csv) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                v = [float(x) for x in line.strip().split(",")]
                # EuRoC columns: t[ns], wx, wy, wz, ax, ay, az
                rows.append([v[0] * 1e-9, v[4], v[5], v[6], v[1], v[2], v[3]])
        imu = np.asarray(rows, np.float64)
    return Sequence(names, np.asarray(stamps), imu=imu)


# ---------------------------------------------------------------------------
# TUM-RGBD
# ---------------------------------------------------------------------------

def _read_tum_list(path):
    entries = []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.strip().split()
            entries.append((float(parts[0]), parts[1]))
    return entries


def associate(a, b, max_dt: float = 0.02):
    """Greedy nearest-timestamp association (evaluation/associate.py)."""
    pairs = []
    j = 0
    used = set()
    for ta, pa in a:
        best, best_dt = None, max_dt
        for k in range(max(j - 5, 0), len(b)):
            tb, pb = b[k]
            dt = abs(tb - ta)
            if dt < best_dt and k not in used:
                best, best_dt = k, dt
            if tb > ta + max_dt:
                break
        if best is not None:
            used.add(best)
            j = best
            pairs.append((ta, pa, b[best][0], b[best][1]))
    return pairs


def load_tum_rgbd(seq_dir, depth_factor: float = 5000.0) -> Sequence:
    """TUM-RGBD: associate rgb.txt and depth.txt by timestamp
    (rgbd_tum.cc + associate.py)."""
    rgb = _read_tum_list(os.path.join(seq_dir, "rgb.txt"))
    dep = _read_tum_list(os.path.join(seq_dir, "depth.txt"))
    pairs = associate(rgb, dep)
    return Sequence(
        image_paths=[os.path.join(seq_dir, p) for _, p, _, _ in pairs],
        timestamps=np.asarray([t for t, _, _, _ in pairs]),
        depth_paths=[os.path.join(seq_dir, p) for _, _, _, p in pairs],
        depth_factor=depth_factor,
    )


# ---------------------------------------------------------------------------
# TUM-VI (same ASL layout as EuRoC)
# ---------------------------------------------------------------------------

def load_tum_vi(seq_dir, cam: str = "cam0", with_imu: bool = True) -> Sequence:
    return load_euroc(seq_dir, cam=cam, with_imu=with_imu)

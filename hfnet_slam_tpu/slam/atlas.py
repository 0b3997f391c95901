"""Atlas: the multi-map container and lost-recovery policy.

Replaces the reference's Atlas (/root/reference/src/Atlas.cc,
include/Atlas.h:50): the active map plus stored maps, map creation on
tracking loss (CreateMapInAtlas, Tracking.cc:1328,1590), discard of
immature maps (ResetActiveMap, :1323-1327), and whole-session persistence
(SaveAtlas/LoadAtlas boost archives -> one .npz per map + a manifest).

The signature ORB-SLAM3 recovery mechanism (SURVEY.md §5.3): when tracking
is LOST on a mature map, the map is stored and a fresh one starts; when
place recognition later finds the stored map again, loop closing merges
them. Round-1 scope implements store/create/switch + persistence; the
map-merge itself is staged with the loop-closing milestones.
"""
from __future__ import annotations

import json
import os

from .map import MapStore


class Atlas:
    def __init__(self, k_max, m_max, n_slots, desc_dim, gdesc_dim):
        self._caps = (k_max, m_max, n_slots, desc_dim, gdesc_dim)
        self.maps: list[MapStore] = [MapStore(*self._caps)]
        self.active_idx = 0

    # ------------------------------------------------------------------
    @property
    def active(self) -> MapStore:
        return self.maps[self.active_idx]

    def n_maps(self) -> int:
        return len(self.maps)

    def create_new_map(self) -> MapStore:
        """Store the current map and start a fresh one (CreateMapInAtlas)."""
        self.maps.append(MapStore(*self._caps))
        self.active_idx = len(self.maps) - 1
        return self.active

    def reset_active_map(self) -> MapStore:
        """Discard the active map in place (ResetActiveMap: immature maps
        are thrown away rather than stored, Tracking.cc:1575-1588)."""
        self.maps[self.active_idx] = MapStore(*self._caps)
        return self.active

    def remove_bad_maps(self, min_kfs: int = 3):
        """Drop stored maps too small to ever merge (Atlas::RemoveBadMaps)."""
        keep = []
        for i, m in enumerate(self.maps):
            if i == self.active_idx or m.kf_valid.sum() >= min_kfs:
                keep.append(m)
        self.active_idx = keep.index(self.maps[self.active_idx])
        self.maps = keep

    # ------------------------------------------------------------------
    # persistence (SaveAtlas/LoadAtlas analogue; .osa -> directory of .npz)
    # ------------------------------------------------------------------
    def save(self, path):
        os.makedirs(path, exist_ok=True)
        for i, m in enumerate(self.maps):
            m.save(os.path.join(path, f"map_{i}.npz"))
        # integrity digest per map file (System::CalculateCheckSum,
        # reference src/System.cc SaveAtlas writes an MD5 beside the archive)
        sums = {f"map_{i}.npz": _md5(os.path.join(path, f"map_{i}.npz"))
                for i in range(len(self.maps))}
        manifest = {"n_maps": len(self.maps), "active": self.active_idx,
                    "caps": list(self._caps), "version": 1, "md5": sums}
        with open(os.path.join(path, "atlas.json"), "w") as f:
            json.dump(manifest, f)

    @staticmethod
    def load(path, verify: bool = True) -> "Atlas":
        with open(os.path.join(path, "atlas.json")) as f:
            manifest = json.load(f)
        if verify and "md5" in manifest:
            for name, want in manifest["md5"].items():
                got = _md5(os.path.join(path, name))
                if got != want:
                    raise IOError(
                        f"atlas snapshot corrupted: {name} md5 {got} != {want}")
        atlas = Atlas(*manifest["caps"])
        atlas.maps = [
            MapStore.load(os.path.join(path, f"map_{i}.npz"))
            for i in range(manifest["n_maps"])
        ]
        atlas.active_idx = manifest["active"]
        return atlas


def _md5(path: str) -> str:
    import hashlib

    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()

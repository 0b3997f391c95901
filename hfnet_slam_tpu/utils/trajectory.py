"""Trajectory export in the reference's three formats.

Mirrors System::SaveTrajectoryTUM / SaveTrajectoryEuRoC /
SaveTrajectoryKITTI and the KeyFrame variants
(/root/reference/src/System.cc:512-...):

  TUM:   `t tx ty tz qx qy qz qw` (timestamp seconds, camera-to-world)
  EuRoC: same fields but timestamp in nanoseconds and comma context of the
         EuRoC evaluation scripts (we keep space-separated like the
         reference's SaveTrajectoryEuRoC output)
  KITTI: 12 numbers per line — row-major 3x4 camera-to-world matrix
"""
from __future__ import annotations

import numpy as np

from .. import lie


def _cam_to_world(R_cw, t_cw):
    R_wc = np.asarray(R_cw).T
    t_wc = -R_wc @ np.asarray(t_cw)
    return R_wc, t_wc


def tum_lines(traj):
    """traj: iterable of (timestamp, R_cw, t_cw). Returns list[str]."""
    import jax.numpy as jnp

    lines = []
    for ts, R_cw, t_cw in traj:
        R_wc, t_wc = _cam_to_world(R_cw, t_cw)
        q = np.asarray(lie.rot_to_quat(jnp.asarray(R_wc)))  # wxyz
        lines.append(
            f"{ts:.6f} {t_wc[0]:.7f} {t_wc[1]:.7f} {t_wc[2]:.7f} "
            f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}"
        )
    return lines


def euroc_lines(traj):
    """EuRoC variant: nanosecond integer timestamps (System.cc EuRoC saver)."""
    import jax.numpy as jnp

    lines = []
    for ts, R_cw, t_cw in traj:
        R_wc, t_wc = _cam_to_world(R_cw, t_cw)
        q = np.asarray(lie.rot_to_quat(jnp.asarray(R_wc)))
        lines.append(
            f"{int(round(ts * 1e9))} {t_wc[0]:.7f} {t_wc[1]:.7f} {t_wc[2]:.7f} "
            f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}"
        )
    return lines


def kitti_lines(traj):
    """KITTI: row-major 3x4 [R_wc | t_wc] per line, no timestamps."""
    lines = []
    for _, R_cw, t_cw in traj:
        R_wc, t_wc = _cam_to_world(R_cw, t_cw)
        T = np.concatenate([R_wc, t_wc[:, None]], axis=1).reshape(-1)
        lines.append(" ".join(f"{v:.9e}" for v in T))
    return lines


_FORMATS = {"tum": tum_lines, "euroc": euroc_lines, "kitti": kitti_lines}


def recovered(traj):
    """Rebuild every frame's pose through its reference keyframe's CURRENT
    pose (the reference's save-time trajectory recovery,
    src/System.cc:512-: each frame's relative pose composed onto the
    possibly loop/GBA-corrected KF pose). Plain (ts, R, t) tuples and
    entries whose reference chain is gone fall back to their track-time
    absolute pose."""
    out = []
    for e in traj:
        if hasattr(e, "recovered_pose"):
            R, t = e.recovered_pose()
            out.append((e.ts, R, t))
        else:
            out.append(tuple(e))
    return out


def recovered_resolved(traj, store=None):
    """Like recovered(), but ONLY entries whose reference-keyframe chain
    still resolves into the current map (no absolute-pose fallbacks).
    Entries from discarded/reset maps live in a different gauge — mixing
    them into one ATE makes the number meaningless. `store` (optional)
    additionally restricts to entries anchored in that map. Returns
    (recovered_entries, live_entries, resolved_fraction) — live = the
    track-time poses of the SAME frames, so pre/post-correction ATEs
    compare like with like."""
    out = []
    live = []
    n = 0
    for e in traj:
        n += 1
        if not hasattr(e, "recovered_pose"):
            continue
        if e.store is None or e.ref_uid < 0 or e.R_rel is None:
            continue
        if store is not None and e.store is not store:
            continue
        if e.store.resolve_uid(int(e.ref_uid)) is None:
            continue
        R, t = e.recovered_pose()
        out.append((e.ts, R, t))
        live.append((e.ts, e.R, e.t))
    return out, live, (len(out) / n if n else 0.0)


def save(path, traj, fmt: str = "tum"):
    lines = _FORMATS[fmt](recovered(traj))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def keyframe_trajectory(store):
    """(timestamp, R_cw, t_cw) per valid keyframe, timestamp-ordered
    (SaveKeyFrameTrajectoryTUM analogue)."""
    ids = store.valid_kf_ids()
    order = np.argsort(store.kf_timestamp[ids])
    ids = ids[order]
    return [(float(store.kf_timestamp[k]), store.kf_R[k].copy(),
             store.kf_t[k].copy()) for k in ids]

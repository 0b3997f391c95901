"""Map merging: welding the active map into a matched stored map.

The reference's signature multi-map mechanism (LoopClosing::MergeLocal,
/root/reference/src/LoopClosing.cc:1355): when place recognition matches a
keyframe of the ACTIVE map into a STORED map, the active map is
Sim3-transformed into the stored map's frame and absorbed — keyframes,
landmarks, observations, covisibility and the IMU chain move over;
duplicated landmarks in the welding window fuse; a welding-window BA
polishes the seam. Inertial welds (MergeLocal2, LoopClosing.cc:1923) gate
the transform on scale/gravity in slam/system.py::execute_merge and run
the window VI-BA (MergeInertialBA analogue) after the weld.

With the struct-of-arrays MapStore the merge is array surgery: transform,
copy rows, remap ids — no pointer fix-ups.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import lie
from .map import MapStore


class _FeatShim:
    """Features-shaped view of stored keyframe arrays (for add_keyframe)."""

    def __init__(self, store: MapStore, k: int):
        self.xy = store.kf_xy[k]
        self.desc = store.kf_desc[k]
        self.score = store.kf_score[k]
        self.octave = store.kf_octave[k]
        self.mask = store.kf_mask[k]
        self.global_desc = store.kf_gdesc[k]


def compute_world_transform(active: MapStore, target: MapStore,
                            k: int, cand: int, R_cm, t_cm, s_cm):
    """G = S_{b<-a}: Sim3 mapping active-map world coords into target-map
    world coords. From the matched Sim3 S_cm (candidate-camera -> current-
    camera): the current KF's pose in the target world is
    S_kb = S_cm o T_cand^b, and G = S_kb^{-1} o T_k^a."""
    Rc, tc = target.kf_R[cand], target.kf_t[cand]
    R_kb = R_cm @ Rc
    t_kb = s_cm * (R_cm @ tc) + t_cm
    s_kb = s_cm
    Ri, ti, si = lie.sim3_inverse(jnp.asarray(R_kb), jnp.asarray(t_kb),
                                  jnp.asarray(float(s_kb)))
    Rk, tk = active.kf_R[k], active.kf_t[k]
    G = lie.sim3_mul(Ri, ti, si, jnp.asarray(Rk), jnp.asarray(tk),
                     jnp.asarray(1.0))
    R, t, s = (np.asarray(G[0]), np.asarray(G[1]), float(G[2]))
    return R, t, s


def merge_into(active: MapStore, target: MapStore, G, cam=None):
    """Move every valid keyframe/landmark of `active` into `target`,
    transformed by G = (R, t, s): p_b = s R p_a + t. Returns
    (kf_remap, mp_remap) dicts (active id -> target id). The target store
    GROWS when active+target exceed its capacity — the reference's
    MergeLocal moves everything (LoopClosing.cc:1355-1922); nothing is
    silently dropped."""
    Rg, tg, sg = G
    Rg = np.asarray(Rg, np.float32)
    tg = np.asarray(tg, np.float32)
    sg = float(sg)

    # ---- landmarks (add_points grows the target at capacity) ----------
    mp_ids = np.nonzero(active.mp_valid)[0]
    mp_remap = {}
    if len(mp_ids):
        pos_b = sg * (active.mp_pos[mp_ids] @ Rg.T) + tg
        new_ids = target.add_points(pos_b, active.mp_desc[mp_ids])
        # add_points seeds visible/found at 1; carry the real statistics
        target.mp_visible[new_ids] = active.mp_visible[mp_ids]
        target.mp_found[new_ids] = active.mp_found[mp_ids]
        mp_remap = {int(a): int(b) for a, b in zip(mp_ids, new_ids)}

    # ---- keyframes (timestamp order keeps chains meaningful) ----------
    kf_ids = active.valid_kf_ids()
    kf_ids = kf_ids[np.argsort(active.kf_timestamp[kf_ids])]
    kf_remap = {}
    lut = np.full(active.m_max, -1, np.int32)
    for a, b in mp_remap.items():
        lut[a] = b
    for a in kf_ids:
        # pose: T' = T_a o G^{-1}, scale folded into translation ([R, t/s])
        # (add_keyframe grows the target's keyframe capacity when full)
        Ra, ta = active.kf_R[a], active.kf_t[a]
        Rn = Ra @ Rg.T
        tn = ta / sg - Rn @ (tg / sg)
        obs_old = active.kf_obs[a]
        obs_new = np.where(obs_old >= 0, lut[np.clip(obs_old, 0, active.m_max - 1)], -1)
        b = target.add_keyframe(
            Rn, tn, _FeatShim(active, int(a)),
            float(active.kf_timestamp[a]),
            obs=obs_new.astype(np.int32),
            depth=active.kf_depth[a] * sg,  # depths scale with the map
        )
        target.kf_vel[b] = sg * (active.kf_vel[a] @ Rg.T)
        target.kf_bg[b] = active.kf_bg[a]
        target.kf_ba[b] = active.kf_ba[a]
        kf_remap[int(a)] = int(b)
    # parents + IMU chain + first-observer bookkeeping in the new id space
    for a, b in kf_remap.items():
        p = int(active.kf_parent[a])
        target.kf_parent[b] = kf_remap.get(p, -1)
        target.kf_prev[b] = kf_remap.get(int(active.kf_prev[a]), -1)
    # inertial state flags travel with the stronger map (MergeLocal2 keeps
    # the merged map inertial-initialized, LoopClosing.cc:1923-)
    target.imu_initialized = target.imu_initialized or active.imu_initialized
    target.viba1 = target.viba1 or active.viba1
    target.viba2 = target.viba2 or active.viba2
    for a, b in mp_remap.items():
        f = int(active.mp_first_kf[a])
        target.mp_first_kf[b] = kf_remap.get(f, -1)
    for a, b in store_loop_edges(active, kf_remap):
        target.loop_edges.append((a, b))
    return kf_remap, mp_remap


def store_loop_edges(active: MapStore, kf_remap):
    out = []
    for a, b in active.loop_edges:
        if a in kf_remap and b in kf_remap:
            out.append((kf_remap[a], kf_remap[b]))
    return out

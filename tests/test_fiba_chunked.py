"""Chunked-FIBA quality versus the joint solution at 400 keyframes.

VERDICT r4 next #7: the overlapping-chunk Gauss-Seidel sweep that handles
maps past `fiba_max_joint` when no distributed route is available
(local_mapping.full_inertial_ba, fiba_dist=False) had no quality test
beyond 80 KFs. Here a 400-KF inertial chain — past the 256 joint cap —
is solved both ways with the SAME schedule:

  * chunked sweep (fiba_dist=False, window 48 / overlap 8, 2 sweeps);
  * ONE joint problem through the distributed engine
    (parallel/dist_vi_ba.py on the virtual 8-device mesh) as the oracle —
    the reference's uncapped FullInertialBA semantics
    (/root/reference/src/Optimizer.cc:392-813).

Documented bound (measured ~2.5x quality gap): the chunked sweep must
land within 0.03 m mean camera-center deviation of the joint solution on
this 15 m trajectory, and the joint solve must be at least as accurate —
the reason full_inertial_ba routes distributed by default (fiba_dist).
"""
import dataclasses
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hfnet_slam_tpu.geometry import cameras, imu as IMU
from hfnet_slam_tpu.slam.local_mapping import LocalMapper, MapperConfig
from hfnet_slam_tpu.slam.map import MapStore

pytestmark = pytest.mark.slow

N_KF = 400
STEPS = 10
DT = 0.01
N_SLOTS = 64
GRAV = np.asarray(IMU.GRAVITY_VEC)


def np_so3_exp(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def simulate(n_kf):
    R, p, v = np.eye(3), np.zeros(3), np.zeros(3)
    kf_R, kf_p, kf_v = [R.copy()], [p.copy()], [v.copy()]
    links = []
    w_fn = lambda t: np.array([0.05 * np.sin(t), 0.3, 0.08 * np.cos(2 * t)])
    a_fn = lambda t: np.array([0.6 * np.cos(0.8 * t), 0.5 * np.sin(1.3 * t),
                               0.9 * np.cos(0.7 * t)])
    for l in range(n_kf - 1):
        meas = np.zeros((STEPS, 7), np.float32)
        for i in range(STEPS):
            t = (l * STEPS + i) * DT
            w = w_fn(t)
            a_w = a_fn(t)
            meas[i, :3] = R.T @ (a_w - GRAV)
            meas[i, 3:6] = w
            meas[i, 6] = DT
            p = p + v * DT + 0.5 * a_w * DT * DT
            v = v + a_w * DT
            R = R @ np_so3_exp(w * DT)
        links.append(meas)
        kf_R.append(R.copy())
        kf_p.append(p.copy())
        kf_v.append(v.copy())
    return np.stack(kf_R), np.stack(kf_p), np.stack(kf_v), links


def body_to_cam(R_wb, p_wb):  # Tbc = identity in this scenario
    R_cw = R_wb.T
    return R_cw, -R_cw @ p_wb


def build_scene():
    kf_R, kf_p, kf_v, links = simulate(N_KF)
    cam = cameras.pinhole(200.0, 200.0, 128.0, 96.0, 256, 192)
    rng = np.random.default_rng(0)
    anchors = kf_p[::10]
    fwd = np.stack([kf_R[i][:, 2] for i in range(0, N_KF, 10)])
    pts = np.concatenate([a + f[None, :] * 8.0 + rng.normal(0, 2.5, (6, 3))
                          for a, f in zip(anchors, fwd)]).astype(np.float32)
    M = len(pts)
    store = MapStore(k_max=512, m_max=4096, n_slots=N_SLOTS, desc_dim=8,
                     gdesc_dim=8)
    ids = store.add_points(pts, np.eye(M, 8, dtype=np.float32))
    for k in range(N_KF):
        R_cw, t_cw = body_to_cam(kf_R[k], kf_p[k])
        pc = pts @ R_cw.T + t_cw
        uv = np.asarray(cam.project(jnp.asarray(pc)))
        ok = ((pc[:, 2] > 1.0) & (pc[:, 2] < 30.0)
              & (uv[:, 0] >= 0) & (uv[:, 0] < 256)
              & (uv[:, 1] >= 0) & (uv[:, 1] < 192))
        sel = np.nonzero(ok)[0][:N_SLOTS]
        f = types.SimpleNamespace(
            xy=np.zeros((N_SLOTS, 2), np.float32),
            desc=np.zeros((N_SLOTS, 8), np.float32),
            score=np.ones(N_SLOTS, np.float32),
            octave=np.zeros(N_SLOTS, np.int32),
            mask=np.zeros(N_SLOTS, bool),
            global_desc=np.zeros(8, np.float32))
        f.xy[: len(sel)] = uv[sel]
        f.mask[: len(sel)] = True
        obs = np.full(N_SLOTS, -1, np.int32)
        obs[: len(sel)] = ids[sel]
        kk = store.add_keyframe(R_cw, t_cw, f, float(k) * STEPS * DT,
                                obs=obs)
        store.kf_vel[kk] = kf_v[k]
        store.kf_prev[kk] = kk - 1 if k > 0 else -1

    calib = IMU.default_calib(freq=1.0 / DT)

    class VimDouble:
        def __init__(self):
            self.calib = calib
            self.kf_pre = {}

        def cam_to_body(self, R_cw, t_cw):
            return R_cw.T, -(R_cw.T @ t_cw)

        def body_to_cam(self, R_wb, p_wb):
            return body_to_cam(R_wb, p_wb)

        def reintegrate_chain(self):
            pass

    vim = VimDouble()
    for k in range(1, N_KF):
        blk = links[k - 1]
        vim.kf_pre[k] = IMU.integrate(jnp.asarray(blk),
                                      jnp.ones(len(blk), bool), calib,
                                      jnp.zeros(3), jnp.zeros(3))

    # perturb everything but KF 0 (gauge)
    for k in range(1, N_KF):
        Rn = kf_R[k] @ np_so3_exp(rng.normal(0, 0.005, 3))
        pn = kf_p[k] + rng.normal(0, 0.02, 3)
        store.kf_R[k], store.kf_t[k] = body_to_cam(Rn, pn)
    store.mp_pos[ids] = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    return cam, store, vim, kf_p


def centers(store):
    return np.stack([-store.kf_R[k].T @ store.kf_t[k] for k in range(N_KF)])


def test_chunked_within_bound_of_joint_oracle():
    cam, store, vim, kf_p = build_scene()
    snap = {f: getattr(store, f).copy()
            for f in ("kf_R", "kf_t", "kf_vel", "kf_bg", "kf_ba", "mp_pos")}
    pre_err = float(np.mean(np.linalg.norm(centers(store) - kf_p, axis=1)))
    assert pre_err > 0.02  # the perturbation is real

    rounds = ((4, True), (4, False))

    def run(fiba_dist):
        for f, v in snap.items():
            getattr(store, f)[...] = v
        cfg = MapperConfig(fiba_max_joint=64, fiba_dist=fiba_dist,
                           fiba_rounds=rounds, fiba_kf_cap=48,
                           iba_mp_cap=2048, iba_edge_cap=16384)
        mapper = LocalMapper(cam, store, cfg)
        mapper.full_inertial_ba(vim)
        c = centers(store)
        return c, float(np.mean(np.linalg.norm(c - kf_p, axis=1)))

    c_chunk, err_chunk = run(fiba_dist=False)
    c_joint, err_joint = run(fiba_dist=True)

    # both routes improve on the perturbed map
    assert err_chunk < 0.7 * pre_err, (err_chunk, pre_err)
    assert err_joint < 0.7 * pre_err, (err_joint, pre_err)
    # the joint (distributed, uncapped) solution is at least as accurate —
    # this is why full_inertial_ba routes distributed by default
    assert err_joint <= err_chunk + 1e-4, (err_joint, err_chunk)
    # documented bound: the Gauss-Seidel approximation stays within 0.03 m
    # mean camera-center deviation of the joint solution (~15 m path)
    dev = float(np.mean(np.linalg.norm(c_chunk - c_joint, axis=1)))
    assert dev < 0.03, dev

"""Device-resident keyframe bank (slam/fused.DeviceKFBank).

Round 4's per-keyframe mapping re-uploaded the full neighbor keypoint
banks from host numpy on every keyframe (~35-70 MB, 1.39 s/KF of device
time at production shapes — VERDICT r4 weak #2). The banked kernels gather
those tables in-graph instead. These tests pin (a) the bank's incremental
sync against the MapStore ground truth through add / observe / cull /
slot-reuse / grow, and (b) bit-equivalence of the banked triangulate/fuse
kernels against the host-packed originals they replace.
"""
import types

import numpy as np
import jax.numpy as jnp
import pytest

from hfnet_slam_tpu.geometry import cameras
from hfnet_slam_tpu.slam import fused
from hfnet_slam_tpu.slam.map import MapStore


def make_cam():
    return cameras.pinhole(300.0, 300.0, 160.0, 120.0, 320, 240)


def rand_feats(rng, n, d, n_valid=None):
    f = types.SimpleNamespace()
    f.xy = rng.uniform(0, 300, (n, 2)).astype(np.float32)
    f.desc = rng.standard_normal((n, d)).astype(np.float32)
    f.desc /= np.linalg.norm(f.desc, axis=1, keepdims=True)
    f.score = rng.uniform(0, 1, n).astype(np.float32)
    f.octave = rng.integers(0, 4, n).astype(np.int32)
    f.mask = np.ones(n, bool)
    if n_valid is not None:
        f.mask[n_valid:] = False
    f.global_desc = rng.standard_normal(d).astype(np.float32)
    return f


def make_store(rng, n_kf=4, n=64, d=16, k_max=8, m_max=512):
    store = MapStore(k_max=k_max, m_max=m_max, n_slots=n, desc_dim=d,
                     gdesc_dim=d)
    for i in range(n_kf):
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.3 * i, 0.0, 0.0], np.float32)
        store.add_keyframe(R, t, rand_feats(rng, n, d), float(i))
    pos = rng.uniform(-3, 3, (100, 3)).astype(np.float32)
    pos[:, 2] += 8.0
    desc = rng.standard_normal((100, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    ids = store.add_points(pos, desc)
    for k in range(n_kf):
        slots = rng.choice(n, 40, replace=False)
        store.assign_observations(k, slots, ids[rng.choice(100, 40, replace=False)])
    return store


def assert_bank_matches(bank, store, cam):
    np.testing.assert_array_equal(np.asarray(bank.xy), store.kf_xy)
    np.testing.assert_array_equal(np.asarray(bank.desc), store.kf_desc)
    np.testing.assert_array_equal(np.asarray(bank.octave), store.kf_octave)
    np.testing.assert_array_equal(np.asarray(bank.mask), store.kf_mask)
    np.testing.assert_array_equal(np.asarray(bank.obs), store.kf_obs)
    xn_ref = np.asarray(cameras.unproject(
        cam.kind, cam.params, jnp.asarray(store.kf_xy)))[..., :2]
    np.testing.assert_allclose(np.asarray(bank.xn), xn_ref, atol=1e-6)


def test_bank_incremental_sync_matches_store():
    rng = np.random.default_rng(0)
    cam = make_cam()
    store = make_store(rng)
    bank = fused.get_kf_bank(store, cam)
    bank.sync()
    assert_bank_matches(bank, store, cam)

    # obs-only change -> row scatter
    store.assign_observations(1, np.arange(8), np.full(8, -1, np.int32))
    bank.sync()
    assert_bank_matches(bank, store, cam)

    # cull a KF, then REUSE its slot with fresh features
    store.remove_keyframe(2)
    bank.sync()
    assert_bank_matches(bank, store, cam)
    k2 = store.add_keyframe(np.eye(3, dtype=np.float32),
                            np.zeros(3, np.float32),
                            rand_feats(rng, store.n_slots, store.desc_dim,
                                       n_valid=50), 9.0)
    assert k2 == 2  # slot reuse
    bank.sync()
    assert_bank_matches(bank, store, cam)

    # point removal detaches observations -> obs rows dirty
    seen = store.kf_obs[0]
    store.remove_points(np.unique(seen[seen >= 0])[:5])
    bank.sync()
    assert_bank_matches(bank, store, cam)


def test_bank_survives_capacity_growth():
    rng = np.random.default_rng(1)
    cam = make_cam()
    store = make_store(rng, n_kf=4, k_max=4)
    bank = fused.get_kf_bank(store, cam)
    bank.sync()
    # adding one more KF triggers grow_keyframes (doubling)
    store.add_keyframe(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                       rand_feats(rng, store.n_slots, store.desc_dim), 5.0)
    assert store.k_max == 8
    bank.sync()
    assert np.asarray(bank.desc).shape[0] == 8
    assert_bank_matches(bank, store, cam)


def test_triangulate_banked_equals_host_packed():
    rng = np.random.default_rng(2)
    cam = make_cam()
    store = make_store(rng)
    bank = fused.get_kf_bank(store, cam)
    bank.sync()
    k = 0
    keep = [1, 2, 3]
    B = 4
    N, D = store.n_slots, store.desc_dim
    Rk, tk = store.kf_R[k], store.kf_t[k]

    def xn_of(j):
        return np.asarray(cameras.unproject(
            cam.kind, cam.params, jnp.asarray(store.kf_xy[j])))[:, :2]

    xn_j = np.zeros((B, N, 2), np.float32)
    desc_j = np.zeros((B, N, D), np.float32)
    sig2_j = np.ones((B, N), np.float32)
    free_j = np.zeros((B, N), bool)
    R21 = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    t21 = np.zeros((B, 3), np.float32)
    nbr = np.full(B, -1, np.int32)
    for bi, j in enumerate(keep):
        nbr[bi] = j
        xn_j[bi] = xn_of(j)
        desc_j[bi] = store.kf_desc[j]
        sig2_j[bi] = (1.2 ** (2.0 * store.kf_octave[j])).astype(np.float32)
        free_j[bi] = store.kf_mask[j] & (store.kf_obs[j] < 0)
        R21[bi] = store.kf_R[j] @ Rk.T
        t21[bi] = store.kf_t[j] - R21[bi] @ tk
    sig2_k = (1.2 ** (2.0 * store.kf_octave[k])).astype(np.float32)
    free_k = store.kf_mask[k] & (store.kf_obs[k] < 0)
    f_px = float(cam.fx)

    ref = fused.triangulate_pairs_batch(
        xn_of(k), store.kf_desc[k], sig2_k, free_k,
        xn_j, desc_j, sig2_j, free_j, R21, t21, f_px)
    got = fused.triangulate_banked(
        k, nbr, R21, t21,
        bank.desc, bank.octave, bank.mask, bank.xn, bank.obs, f_px)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    np.testing.assert_allclose(np.asarray(ref[2]), np.asarray(got[2]),
                               atol=1e-5)


def test_fuse_banked_equals_host_packed():
    rng = np.random.default_rng(3)
    cam = make_cam()
    store = make_store(rng)
    bank = fused.get_kf_bank(store, cam)
    bank.sync()
    dm = fused.get_device_map(store)
    dm.sync()
    pairs = [(0, 1), (1, 0), (2, 3), (3, 2)]
    P, N, D = 4, store.n_slots, store.desc_dim
    R_t = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    t_t = np.zeros((P, 3), np.float32)
    xy_t = np.zeros((P, N, 2), np.float32)
    desc_t = np.zeros((P, N, D), np.float32)
    oct_t = np.zeros((P, N), np.int32)
    free_t = np.zeros((P, N), bool)
    cand = np.full((P, N), -1, np.int32)
    tgt_ids = np.full(P, -1, np.int32)
    src_ids = np.full(P, -1, np.int32)
    for pi, (tgt, src) in enumerate(pairs):
        tgt_ids[pi], src_ids[pi] = tgt, src
        R_t[pi], t_t[pi] = store.kf_R[tgt], store.kf_t[tgt]
        xy_t[pi] = store.kf_xy[tgt]
        desc_t[pi] = store.kf_desc[tgt]
        oct_t[pi] = store.kf_octave[tgt]
        free_t[pi] = store.kf_mask[tgt] & (store.kf_obs[tgt] < 0)
        cand[pi] = store.kf_obs[src]
    args = (cam.kind, cam.params, float(cam.width), float(cam.height))
    ref = np.asarray(fused.fuse_pairs_batch(
        *args, R_t, t_t, xy_t, desc_t, oct_t, free_t, cand,
        dm.pos, dm.desc, dm.valid))
    got = np.asarray(fused.fuse_neighbors_banked(
        *args, tgt_ids, src_ids, R_t, t_t,
        bank.xy, bank.desc, bank.octave, bank.mask, bank.obs,
        dm.pos, dm.desc, dm.valid))
    np.testing.assert_array_equal(ref, got)

    # loop-fuse variant: ALL masked slots fusable, explicit candidate set
    loop_mps = np.unique(store.kf_obs[1][store.kf_obs[1] >= 0])[:16]
    C = 32
    cand2 = np.full((P, C), -1, np.int32)
    cand2[:, : len(loop_mps)] = loop_mps
    for pi, (tgt, _) in enumerate(pairs):
        free_t[pi] = store.kf_mask[tgt]
    ref2 = np.asarray(fused.fuse_pairs_batch(
        *args, R_t, t_t, xy_t, desc_t, oct_t, free_t, cand2,
        dm.pos, dm.desc, dm.valid, max_dist=0.75))
    got2 = np.asarray(fused.fuse_targets_banked(
        *args, tgt_ids, cand2, R_t, t_t,
        bank.xy, bank.desc, bank.octave, bank.mask,
        dm.pos, dm.desc, dm.valid, max_dist=0.75))
    np.testing.assert_array_equal(ref2, got2)

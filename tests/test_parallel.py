"""Distributed BA on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from hfnet_slam_tpu import lie
from hfnet_slam_tpu.geometry import cameras
from hfnet_slam_tpu.parallel import dist_ba


def make_problem(rng, K=4, M=64, noise=5.0):
    cam = cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
    pts = np.stack([rng.uniform(-4, 4, M), rng.uniform(-3, 3, M), rng.uniform(6, 14, M)], 1)
    poses = []
    for k in range(K):
        R = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.02, 3))))
        t = np.array([0.3 * k, 0.0, 0.0]) + rng.normal(0, 0.02, 3)
        poses.append((R, t))
    kf_idx, pt_idx, uv = [], [], []
    for k, (R, t) in enumerate(poses):
        pc = pts @ R.T + t
        u = np.asarray(cam.project(jnp.asarray(pc))) + rng.normal(0, 0.3, (M, 2))
        for m in range(M):
            if pc[m, 2] > 1:
                kf_idx.append(k)
                pt_idx.append(m)
                uv.append(u[m])
    # perturb geometry: BA must pull it back
    pts_n = pts + rng.normal(0, noise * 0.1, pts.shape)
    poses_R = np.stack([p[0] for p in poses]).astype(np.float32)
    poses_t = np.stack([p[1] for p in poses]).astype(np.float32)
    fixed = np.zeros(K, bool)
    fixed[:2] = True
    return cam, poses_R, poses_t, fixed, pts, pts_n, (
        np.asarray(kf_idx, np.int32), np.asarray(pt_idx, np.int32),
        np.asarray(uv, np.float32))


def test_dist_lm_step_matches_geometry():
    rng = np.random.default_rng(0)
    cam, poses_R, poses_t, fixed, pts_true, pts_n, (kf_idx, pt_idx, uv) = make_problem(rng)
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
    E = len(kf_idx)
    prob, (owner, local, ok) = dist_ba.partition_edges(
        n_dev, len(poses_R), 16, 64, poses_R, poses_t, fixed,
        pts_n.astype(np.float32), kf_idx, pt_idx, uv,
        np.ones(E, np.float32), np.ones(E, bool))
    mesh = Mesh(np.array(jax.devices()), ("ba",))

    cur = prob
    lam = 1e-3
    for it in range(8):
        pr, pt_, pp, lam, _c, _ok = dist_ba.dist_lm_step(
            cam.kind, cam.params, cur, mesh, lam=lam)
        cur = cur._replace(poses_R=pr, poses_t=pt_, points=pp)
    # gather points back to global order and compare to ground truth
    pp = np.asarray(pp)
    M = len(pts_true)
    rec = np.zeros((M, 3))
    for m in range(M):
        rec[m] = pp[owner[m], local[m]]
    err_before = np.linalg.norm(pts_n - pts_true, axis=1).mean()
    err_after = np.linalg.norm(rec - pts_true, axis=1).mean()
    # with 0.3 px noise over a ~1 m camera span at ~10 m depth the ML floor
    # is ~0.1 m; the 0.5 m perturbation must shrink close to it
    assert err_after < 0.35 * err_before, (err_before, err_after)

    # and the distributed solve must agree with the single-device engine
    from hfnet_slam_tpu.optim import ba as sba
    E = len(kf_idx)
    sprob = sba.BAProblem(
        poses_R=jnp.asarray(poses_R), poses_t=jnp.asarray(poses_t),
        fixed=jnp.asarray(fixed), points=jnp.asarray(pts_n.astype(np.float32)),
        kf_idx=jnp.asarray(kf_idx), pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv), inv_sigma2=jnp.ones(E), valid=jnp.ones(E, bool))
    sout, _ = sba.ba_iterate(cam.kind, cam.params, sprob, 8, True, 5.991)
    err_single = np.linalg.norm(np.asarray(sout.points) - pts_true, axis=1).mean()
    assert abs(err_single - err_after) < 0.2 * err_single + 0.02


def test_partition_round_trips_points():
    rng = np.random.default_rng(1)
    cam, poses_R, poses_t, fixed, pts_true, pts_n, (kf_idx, pt_idx, uv) = make_problem(rng, M=32)
    E = len(kf_idx)
    prob, (owner, local, ok) = dist_ba.partition_edges(
        8, len(poses_R), 8, 32, poses_R, poses_t, fixed,
        pts_n.astype(np.float32), kf_idx, pt_idx, uv,
        np.ones(E, np.float32), np.ones(E, bool))
    pp = np.asarray(prob.points)
    for m in range(32):
        np.testing.assert_allclose(pp[owner[m], local[m]], pts_n[m], rtol=1e-6)
    assert int(np.asarray(prob.valid).sum()) <= E


def test_dist_bundle_adjust_schedule_converges():
    """dist_bundle_adjust: LM schedule + outlier classification. Cost must
    decrease, outlier edges must be flagged, and poses must agree with the
    single-device engine."""
    rng = np.random.default_rng(2)
    cam, poses_R, poses_t, fixed, pts_true, pts_n, (kf_idx, pt_idx, uv) = \
        make_problem(rng)
    E = len(kf_idx)
    # corrupt 5% of the observations: the classification must drop them
    n_out = E // 20
    bad = rng.choice(E, n_out, replace=False)
    uv = uv.copy()
    uv[bad] += rng.uniform(40, 80, (n_out, 2)).astype(np.float32)
    prob, (owner, local, ok) = dist_ba.partition_edges(
        8, len(poses_R), 16, 64, poses_R, poses_t, fixed,
        pts_n.astype(np.float32), kf_idx, pt_idx, uv,
        np.ones(E, np.float32), np.ones(E, bool))
    mesh = Mesh(np.array(jax.devices()), ("ba",))
    out, edge_valid, costs = dist_ba.dist_bundle_adjust(
        cam.kind, cam.params, prob, mesh, rounds=((12, True), (8, False)))
    assert costs[-1] < costs[0] * 0.5, costs
    n_kept = int(edge_valid.sum())
    n_in = int(np.asarray(prob.valid).sum())
    assert n_kept < n_in  # the gross outliers were flagged
    assert n_kept > 0.8 * n_in
    pp = np.asarray(out.points)
    rec = np.stack([pp[owner[m], local[m]] for m in range(len(pts_true))])
    err_after = np.linalg.norm(rec - pts_true, axis=1).mean()
    err_before = np.linalg.norm(pts_n - pts_true, axis=1).mean()
    assert err_after < 0.55 * err_before
    # ... and the distributed engine matches the single-device engine on
    # the SAME problem (the real contract: same math, sharded)
    from hfnet_slam_tpu.optim import ba as sba
    sprob = sba.BAProblem(
        poses_R=jnp.asarray(poses_R), poses_t=jnp.asarray(poses_t),
        fixed=jnp.asarray(fixed), points=jnp.asarray(pts_n.astype(np.float32)),
        kf_idx=jnp.asarray(kf_idx), pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv), inv_sigma2=jnp.ones(E), valid=jnp.ones(E, bool),
        z_meas=jnp.zeros(E), wz=jnp.zeros(E))
    sout = sba.bundle_adjust(cam.kind, cam.params, sprob,
                             rounds=((12, True), (8, False)))
    err_single = np.linalg.norm(np.asarray(sout.points) - pts_true,
                                axis=1).mean()
    assert abs(err_after - err_single) < 0.05 * err_single + 0.01


class TestMultihost:
    """Multi-host runtime helpers (parallel/multihost.py). Single-process
    here — the degenerate case every helper must support — with the
    mesh/axis layout identical to the multi-process one."""

    def test_initialize_is_noop_single_process(self):
        from hfnet_slam_tpu.parallel import multihost
        assert multihost.initialize() is False

    def test_meshes(self):
        from hfnet_slam_tpu.parallel import multihost
        mesh = multihost.make_mesh()
        assert mesh.axis_names == ("kf",)
        assert mesh.devices.size == len(jax.devices())
        hm = multihost.make_hybrid_mesh()
        assert hm.axis_names == ("host", "kf")
        assert hm.devices.shape == (1, len(jax.devices()))

    def test_process_shard_covers_axis(self):
        from hfnet_slam_tpu.parallel import multihost
        lo, hi = multihost.process_shard(256)
        assert (lo, hi) == (0, 256)
        # simulated 3-process split covers [0, n) without overlap
        spans = [multihost.process_shard(100, i, 3) for i in range(3)]
        assert spans[0][0] == 0 and spans[-1][1] == 100
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b == c

    def test_global_array_and_sharded_retrieval(self):
        from hfnet_slam_tpu.parallel import multihost, retrieval
        mesh = multihost.make_mesh()
        rng = np.random.default_rng(0)
        rows = rng.normal(size=(64, 16)).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        g = multihost.global_array(rows, mesh)
        np.testing.assert_allclose(np.asarray(g), rows, rtol=1e-6)
        db, vm = retrieval.make_sharded_db(mesh, rows, np.ones(64, bool))
        idx, vals = retrieval.top_candidates(mesh, rows[:2], db, vm, n=3)
        assert int(idx[0, 0]) == 0 and int(idx[1, 0]) == 1

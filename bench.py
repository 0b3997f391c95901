"""Headline benchmark: HF-Net full-pyramid feature extraction latency.

Reference baseline (BASELINE.md): TensorRT FP16 on RTX 2070 Max-Q extracts
the full 4-level pyramid (1000 keypoints, EuRoC 752x480) in 7.53 ms —
the dominant per-frame cost of the ~50 FPS SLAM loop.

Here the same workload runs as ONE bf16 XLA program on a TPU chip: each
pyramid level at its native resolution (global head for level 0 only),
conv backbone + heads, in-graph NMS, per-level top-K and bilinear
descriptor sampling (models/extractor.py).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1 means faster than the reference's 7.53 ms.
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hfnet")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MS = 7.53  # TRT FP16, Examples/Utility/test_extractors.cc:40-48


def main():
    import sys

    from hfnet_slam_tpu.models import hfnet
    from hfnet_slam_tpu.models.extractor import HFExtractor

    smoke = "--smoke" in sys.argv
    if smoke:
        # hermetic CPU smoke; the env's JAX_PLATFORMS is overridden by the
        # axon plugin, so force via config
        jax.config.update("jax_platforms", "cpu")
    params = hfnet.init_params(jax.random.PRNGKey(0))
    # EuRoC 752x480 grayscale, 1000 features over 4 levels (EuRoC.yaml:67-80)
    hw, nf, nl = ((96, 128), 100, 2) if smoke else ((480, 752), 1000, 4)
    ext = HFExtractor(
        params, hw, n_features=nf, n_levels=nl,
        scale_factor=1.2, pad_to=1024, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 255, hw).astype(np.float32))

    # warm-up / compile
    for _ in range(3):
        feats = ext(image)
        jax.block_until_ready(feats.desc)

    # Sustained per-frame extraction time: N frames enqueued back-to-back
    # with one device sync at the end. This measures the device pipeline
    # (what the SLAM loop sees with async dispatch) and is robust to the
    # axon tunnel's ~25 ms per-blocked-sync overhead, which would otherwise
    # dominate: a 0.7 ms matmul also "takes" 26 ms when synced per call.
    reps = 3 if smoke else 5
    n = 5 if smoke else 30
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = ext(image)
        jax.block_until_ready(out.desc)
        best = min(best, (time.perf_counter() - t0) * 1e3 / n)
    ms = best
    line = {
        "metric": "pyramid_extraction_latency",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }
    line["extra"] = kernel_latencies(smoke)
    if "--no-e2e" not in sys.argv:
        try:
            fps_slam, n_kf = slam_loop_fps(smoke)
            # pipeline model: extraction (device) + SLAM stack per frame.
            # The reference's ~50 FPS (README.md:15-17) is the same workload
            # on an RTX 2070 Max-Q with three CPU worker threads.
            total_ms = ms + 1000.0 / fps_slam
            line["extra"].update({
                "slam_stack_fps": round(fps_slam, 2),
                "slam_e2e_fps": round(1000.0 / total_ms, 2),
                "e2e_vs_50fps": round((1000.0 / total_ms) / 50.0, 3),
                "keyframes": n_kf,
            })
        except Exception as e:  # never lose the headline metric
            line["extra"]["slam_e2e_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(line))


def _time_dispatch(fn, out_leaf, reps=3, n=20):
    """Best per-call time of n back-to-back dispatches with one sync
    (tunnel-robust, same pattern as the extraction loop above)."""
    for _ in range(2):
        jax.block_until_ready(out_leaf(fn()))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out_leaf(out))
        best = min(best, (time.perf_counter() - t0) * 1e3 / n)
    return best


def kernel_latencies(smoke: bool) -> dict:
    """Hot-kernel latencies at reference workload sizes (the pieces the
    reference times separately: BFMatcher-L2 pair matching ~5.46 ms,
    PoseOptimization, local BA, KeyFrameDatabase full-DB scan ~245 ms —
    Comparison/README.md:42-66, test_match_global_feats.cc:3-9)."""
    from hfnet_slam_tpu import lie
    from hfnet_slam_tpu.geometry import cameras
    from hfnet_slam_tpu.ops import matching
    from hfnet_slam_tpu.optim import ba, pose_opt

    rng = np.random.default_rng(0)
    N, D = (256, 64) if smoke else (1024, 256)
    dA = rng.standard_normal((N, D)).astype(np.float32)
    dA /= np.linalg.norm(dA, axis=1, keepdims=True)
    dB = rng.standard_normal((N, D)).astype(np.float32)
    dB /= np.linalg.norm(dB, axis=1, keepdims=True)
    mask = jnp.ones(N, bool)
    dA, dB = jnp.asarray(dA), jnp.asarray(dB)

    match = jax.jit(lambda: matching.match_descriptors(dA, mask, dB, mask))
    out = {"match_pair_ms": round(_time_dispatch(match, lambda o: o[0]), 3)}

    if not smoke and jax.default_backend() == "tpu":
        from hfnet_slam_tpu.ops import pallas_match

        fused = jax.jit(
            lambda: pallas_match.match_descriptors_fused(dA, mask, dB, mask))
        out["match_pair_fused_ms"] = round(
            _time_dispatch(fused, lambda o: o[0]), 3)

    # pose-only optimization at tracking size (PoseOptimization analogue)
    cam = cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
    pts = np.stack([rng.uniform(-4, 4, N), rng.uniform(-3, 3, N),
                    rng.uniform(5, 15, N)], 1).astype(np.float32)
    R0 = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.01, 0.03])), np.float32)
    t0 = np.array([0.05, -0.02, 0.01], np.float32)
    uv = np.asarray(cam.project(jnp.asarray(pts))) + rng.normal(0, 0.5, (N, 2))
    args = (jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(pts),
            jnp.asarray(uv.astype(np.float32)), jnp.ones(N), mask)
    popt = lambda: pose_opt.pose_optimize(cam.kind, cam.params, *args)
    out["pose_opt_ms"] = round(_time_dispatch(popt, lambda o: o["t"]), 3)

    # local-BA LM schedule at mapper window size (LocalBundleAdjustment)
    K, M, E = (4, 128, 512) if smoke else (16, 2048, 8192)
    mp = np.stack([rng.uniform(-6, 6, M), rng.uniform(-4, 4, M),
                   rng.uniform(5, 18, M)], 1).astype(np.float32)
    kf_i = rng.integers(0, K, E).astype(np.int32)
    pt_i = rng.integers(0, M, E).astype(np.int32)
    poses_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    poses_t = np.stack([np.array([0.2 * k, 0, 0], np.float32) for k in range(K)])
    pc = np.einsum("eij,ej->ei", poses_R[kf_i], mp[pt_i]) + poses_t[kf_i]
    uv_e = np.asarray(cam.project(jnp.asarray(pc))).astype(np.float32)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    prob = ba.with_depth_defaults(ba.BAProblem(
        poses_R=jnp.asarray(poses_R),
        poses_t=jnp.asarray(poses_t + rng.normal(0, 0.01, poses_t.shape).astype(np.float32)),
        fixed=jnp.asarray(fixed), points=jnp.asarray(mp),
        kf_idx=jnp.asarray(kf_i), pt_idx=jnp.asarray(pt_i),
        uv=jnp.asarray(uv_e), inv_sigma2=jnp.ones(E),
        valid=jnp.ones(E, bool), z_meas=jnp.zeros(E), wz=jnp.zeros(E)))
    lba = lambda: ba.ba_iterate(cam.kind, cam.params, prob, 4, True, 5.991)
    out["local_ba_4it_ms"] = round(
        _time_dispatch(lba, lambda o: o[0].poses_t, n=5), 3)

    # full-DB retrieval scan (KeyFrameDatabase::DetectNBestCandidates)
    Kdb, G = (64, 64) if smoke else (256, 4096)
    g = rng.standard_normal((Kdb, G)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    gj, vm = jnp.asarray(g), jnp.ones(Kdb, bool)
    q = gj[:1]
    scan = jax.jit(lambda: matching.global_scores_batch(q, gj, vm))
    out["retrieval_scan_ms"] = round(_time_dispatch(scan, lambda o: o), 3)
    return out


def slam_loop_fps(smoke: bool):
    """Sustained frames/s of the full SLAM stack (tracking + ASYNC mapping
    + loop closing, slam/pipeline.py) on a synthetic browse sequence with
    the deterministic fake extractor. Measures everything except CNN
    extraction, which is timed separately above (the two compose into the
    end-to-end pipeline estimate).

    The stack runs on the HOST CPU backend, matching the reference's
    deployment shape (its tracking/mapping/loop threads are CPU C++;
    only the CNN is on the accelerator). Under the axon tunnel every
    blocked device sync costs ~25 ms that a co-located TPU host never
    pays, so timing the many small per-frame kernels through the tunnel
    would measure the tunnel, not the framework."""
    import contextlib

    ctx = contextlib.nullcontext()
    if jax.default_backend() != "cpu":
        ctx = jax.default_device(jax.devices("cpu")[0])
    with ctx:
        return _slam_loop_fps_body(smoke)


def _slam_loop_fps_body(smoke: bool):
    from hfnet_slam_tpu.geometry import cameras
    from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
    from hfnet_slam_tpu.slam.local_mapping import MapperConfig
    from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
    from hfnet_slam_tpu.slam.tracking import TrackerConfig

    cam = cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
    world = SyntheticWorld.cloud(seed=5, n_landmarks=1400, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=64)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=480, seed=7)
    cfg = SystemConfig(
        k_max=128, m_max=8192, n_slots=512, desc_dim=64, gdesc_dim=64,
        async_mapping=True,
        tracker=TrackerConfig(local_mp_cap=1024, min_init_med_parallax_deg=4.0),
        mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                            tri_neighbors=5),
    )
    sys_ = SLAMSystem(cam, ext, cfg)
    n_frames = 30 if smoke else 120

    def gt_pose(i):
        th = 0.010 * i
        r = 10.0
        c = np.array([r * np.sin(th), 0.4 * np.sin(0.07 * i), r - r * np.cos(th)])
        fwd = np.array([0.0, 0.0, r]) - c
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        R_wc = np.stack([right, np.cross(fwd, right), fwd], 1)
        return R_wc.T.astype(np.float32), (-R_wc.T @ c).astype(np.float32)

    # warm-up: initialize + compile every kernel on a prefix
    for i in range(12):
        sys_.track_features(ext(*gt_pose(i)), 0.05 * i)
    sys_.finish()
    t0 = time.perf_counter()
    for i in range(12, n_frames):
        sys_.track_features(ext(*gt_pose(i)), 0.05 * i)
    dt = time.perf_counter() - t0  # tracking-thread rate: mapping overlaps
    sys_.finish()
    n_kf = int(sys_.store.kf_valid.sum())
    sys_.shutdown()
    return (n_frames - 12) / dt, n_kf


if __name__ == "__main__":
    main()

"""Async visual-inertial pipeline + IMU prediction through dropouts
(VERDICT r2 items 6+7).

The reference keeps predicting the state from the IMU while RECENTLY_LOST
(Tracking.cc:1285-1316) and chains inter-keyframe information through the
marginalized ConstraintPoseImu prior (Optimizer.cc:2960/4875). These tests
drive the synthetic VI rig through (a) the async mapping pipeline, (b) a
1-second visual blackout, and (c) an A/B of the marginal-prior chain.
"""
import numpy as np
import pytest
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy e2e tier

from hfnet_slam_tpu import lie
from hfnet_slam_tpu.evaluation import ate
from hfnet_slam_tpu.geometry import cameras
from hfnet_slam_tpu.geometry import imu as IMU
from hfnet_slam_tpu.models.extractor import Features
from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
from hfnet_slam_tpu.slam.local_mapping import MapperConfig
from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
from hfnet_slam_tpu.slam.tracking import LOST, OK, RECENTLY_LOST, TrackerConfig
from hfnet_slam_tpu.slam.vi import VIConfig

GRAV = np.array([0.0, -9.81, 0.0])
IMU_DT, FRAME_DT = 0.005, 0.1


def pose_at(t, radius=10.0, rate=0.4, bob=0.4):
    th = rate * t
    target = np.array([0.0, 0.0, radius])
    c = np.array([radius * np.sin(th), bob * np.sin(1.4 * t),
                  radius - radius * np.cos(th)])
    fwd = target - c
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    R_wc = np.stack([right, np.cross(fwd, right), fwd], 1)
    return R_wc, c


def synth_imu(t0, t1):
    rows = []
    n = int(round((t1 - t0) / IMU_DT))
    for i in range(1, n + 1):
        t = t0 + i * IMU_DT
        h = IMU_DT
        R, c = pose_at(t)
        _, c_p = pose_at(t - h)
        R_n, c_n = pose_at(t + h)
        a_w = (c_n - 2 * c + c_p) / (h * h)
        w_b = np.asarray(lie.so3_log(jnp.asarray(R.T @ R_n))) / h
        rows.append(np.concatenate([R.T @ (a_w - GRAV), w_b, [h]]))
    return np.asarray(rows, np.float32)


def build_vi_system(async_mapping=False, vi_marg_prior=True):
    cam = cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
    world = SyntheticWorld.cloud(seed=5, n_landmarks=1400, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=64)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=480, seed=7)
    cfg = SystemConfig(
        k_max=128, m_max=8192, n_slots=512, desc_dim=64, gdesc_dim=64,
        loop_closing=False, async_mapping=async_mapping,
        tracker=TrackerConfig(local_mp_cap=2048,
                              min_init_med_parallax_deg=2.0,
                              vi_marg_prior=vi_marg_prior),
        mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                            tri_neighbors=5),
        vi=VIConfig(t_init=1.5, t_viba1=3.5, t_viba2=8.0, min_kfs_for_init=6,
                    meas_cap=512),
    )
    return SLAMSystem(cam, ext, cfg,
                      imu_calib=IMU.default_calib(freq=1.0 / IMU_DT)), ext


def blank_features(n_slots=512, desc_dim=64, gdesc_dim=64):
    """A frame the matcher can do nothing with (total visual dropout)."""
    g = np.ones(gdesc_dim, np.float32) / np.sqrt(gdesc_dim)
    return Features(
        xy=np.zeros((n_slots, 2), np.float32),
        score=np.zeros(n_slots, np.float32),
        octave=np.zeros(n_slots, np.int32),
        desc=np.zeros((n_slots, desc_dim), np.float32),
        mask=np.zeros(n_slots, bool),
        global_desc=g,
    )


def drive(sys_, ext, frames):
    """frames: iterable of (index, blackout?) pairs."""
    states, est, gtc, when = [], [], [], []
    for i, blackout in frames:
        t = i * FRAME_DT
        R_wc, c = pose_at(t)
        R_cw = R_wc.T.astype(np.float32)
        feats = (blank_features() if blackout
                 else ext(R_cw, (-R_cw @ c).astype(np.float32)))
        imu_rows = synth_imu(t - FRAME_DT, t) if i > 0 else None
        st, Re, te = sys_.track_features(feats, t, imu=imu_rows)
        states.append(st)
        if Re is not None:
            est.append(-Re.T @ te)
            gtc.append(c)
            when.append(i)
    return states, np.asarray(est), np.asarray(gtc), np.asarray(when)


def test_async_vi_with_imu_dropout():
    """ASYNC VI pipeline end-to-end with a 1 s blackout mid-run: the IMU
    dead-reckons through it, the system re-acquires visually, never goes
    LOST, and the post-recovery trajectory stays metric."""
    sys_, ext = build_vi_system(async_mapping=True)
    plan = [(i, False) for i in range(60)] \
        + [(i, True) for i in range(60, 70)] \
        + [(i, False) for i in range(70, 90)]
    states, est, gtc, when = drive(sys_, ext, plan)
    sys_.finish()
    assert sys_.store.imu_initialized, "async staged init never ran"
    assert LOST not in states, "blackout must not kill the map"
    assert RECENTLY_LOST in states[60:70], "dropout not detected"
    # recovery: solidly OK after the blackout (brief RECENTLY_LOST blips
    # with immediate IMU re-acquisition are acceptable — the reference's
    # VI tracking shows the same under async map updates)
    post = states[72:]
    assert np.mean([s == OK for s in post]) >= 0.8, f"post-dropout: {post}"
    assert all(s == OK for s in states[-6:]), f"not OK at end: {states[-6:]}"
    # poses were emitted THROUGH the blackout (IMU dead reckoning)
    emitted = set(when.tolist())
    assert all(i in emitted for i in range(61, 70)), "prediction gap"
    # dead-reckoned segment stays consistent (exact IMU here): rigid-align
    # the map frame to GT on the pre-dropout window (the gravity-aligned
    # world is rotated relative to GT), then check the blackout segment
    pre_w = (when >= 30) & (when < 60)
    R_al, t_al, _ = ate.align_horn(est[pre_w], gtc[pre_w], with_scale=False)
    dr = np.isin(when, np.arange(60, 70))
    est_dr = (R_al @ est[dr].T).T + t_al
    err_dr = np.linalg.norm(est_dr - gtc[dr], axis=1)
    assert err_dr.max() < 1.0, f"dead-reckoning drifted {err_dr.max():.2f} m"
    # post-recovery metric accuracy (scale-free alignment: metric scale
    # must come from the IMU)
    late = when >= 72
    err = ate.ate_rmse(est[late], gtc[late], with_scale=False)
    assert err < 0.5, f"post-recovery metric ATE {err:.3f}"
    sys_.shutdown()


def test_marginal_prior_lowers_interkf_error():
    """A/B: the marginalized LastFrame prior chain vs hard-fixed anchoring
    (vi_marg_prior=False). Inter-keyframe frames should track at least as
    accurately WITH the chained information (Optimizer.cc:4875)."""
    errs = {}
    for label, use_prior in (("prior", True), ("fixed", False)):
        sys_, ext = build_vi_system(vi_marg_prior=use_prior)
        plan = [(i, False) for i in range(78)]
        states, est, gtc, when = drive(sys_, ext, plan)
        assert sys_.store.imu_initialized
        late = when > 52
        errs[label] = ate.ate_rmse(est[late], gtc[late], with_scale=False)
        sys_.shutdown()
    # non-inferiority with a real margin: the chained prior must not hurt,
    # and in this noise regime it should help
    assert errs["prior"] <= errs["fixed"] * 1.05 + 5e-3, errs


def test_not_enough_motion_resets_map():
    """IMU init failure gate (LocalMapping.cc:150-210 + Tracking.cc:
    1108-1114): a rig that stops moving before scale is trustworthy flags
    bad_imu; Tracking resets the active map instead of retrying forever
    on an unobservable problem."""
    from hfnet_slam_tpu.slam.tracking import NOT_INITIALIZED

    sys_, ext = build_vi_system()
    t_stop = 2.5  # init fires ~1.7 s; motion stops well before the
    #               10-moving-seconds excitation window completes

    def pose_h(t):
        return pose_at(min(t, t_stop))

    def imu_h(t0, t1):
        rows = []
        n = int(round((t1 - t0) / IMU_DT))
        for i in range(1, n + 1):
            t = t0 + i * IMU_DT
            h = IMU_DT
            R, c = pose_h(t)
            _, c_p = pose_h(t - h)
            R_n, c_n = pose_h(t + h)
            a_w = (c_n - 2 * c + c_p) / (h * h)
            w_b = np.asarray(lie.so3_log(jnp.asarray(R.T @ R_n))) / h
            rows.append(np.concatenate([R.T @ (a_w - GRAV), w_b, [h]]))
        return np.asarray(rows, np.float32)

    tripped = False
    # 80 frames: the post-init gate filters the TWO-link distance sum
    # (reference LocalMapping.cc:146-157) seeded while the rig still moved;
    # the 0.5-per-KF decay needs ~7 stationary keyframes to cross 0.02
    for i in range(80):
        t = i * FRAME_DT
        R_wc, c = pose_h(t)
        R_cw = R_wc.T.astype(np.float32)
        feats = ext(R_cw, (-R_cw @ c).astype(np.float32))
        sys_.track_features(feats, t, imu=imu_h(t - FRAME_DT, t) if i > 0
                            else None)
        tripped = tripped or sys_.vi.bad_imu \
            or sys_.tracker.state == NOT_INITIALIZED and i > 30
    assert tripped, "bad_imu gate never fired on a motion-starved rig"
    # the reset landed: the active map is fresh (no IMU init carried over)
    assert not sys_.store.imu_initialized
    assert sys_.vi.stage == 0
    sys_.shutdown()

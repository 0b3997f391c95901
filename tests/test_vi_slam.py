"""End-to-end mono-inertial SLAM: IMU init recovers metric scale.

The hermetic analogue of the reference's EuRoC mono-inertial runs
(Examples/Monocular-Inertial/mono_inertial_euroc.cc): a FakeExtractor
provides features while consistent synthetic IMU (gyro + accelerometer
with gravity) streams between frames; after the staged initialization
(LocalMapping::InitializeIMU analogue in slam/vi.py) the monocular map
must become METRIC — ATE is checked WITHOUT scale correction.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e tier

import jax
import jax.numpy as jnp

from hfnet_slam_tpu import lie
from hfnet_slam_tpu.geometry import cameras, imu as IMU


FRAME_DT = 0.05       # 20 Hz camera
IMU_DT = 0.005        # 200 Hz IMU
GRAV = np.asarray(IMU.GRAVITY_VEC)  # (0,0,-9.81)


def pose_at(t, radius=10.0, rate=0.4, bob=0.4):
    """Analytic browse trajectory: lateral arc facing the cloud center.
    rate in rad/s (angle th = rate * t)."""
    th = rate * t
    target = np.array([0.0, 0.0, radius])
    c = np.array([
        radius * np.sin(th),
        bob * np.sin(1.4 * t),
        radius - radius * np.cos(th),
    ])
    fwd = target - c
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd); right /= np.linalg.norm(right)
    upv = np.cross(fwd, right)
    R_wc = np.stack([right, upv, fwd], 1)
    return R_wc, c


def synth_imu(t0, t1):
    """IMU rows [ax..az wx..wz dt] for body==camera over (t0, t1]."""
    rows = []
    n = int(round((t1 - t0) / IMU_DT))
    for i in range(1, n + 1):
        t = t0 + i * IMU_DT
        h = IMU_DT
        R, c = pose_at(t)
        R_p, c_p = pose_at(t - h)
        R_n, c_n = pose_at(t + h)
        a_w = (c_n - 2 * c + c_p) / (h * h)
        w_b = np.asarray(lie.so3_log(jnp.asarray(R.T @ R_n))) / h
        f_b = R.T @ (a_w - GRAV)
        rows.append(np.concatenate([f_b, w_b, [h]]))
    return np.asarray(rows, np.float32)


@pytest.fixture(scope="module")
def vi_run():
    from hfnet_slam_tpu.models.fake import FakeExtractor, SyntheticWorld
    from hfnet_slam_tpu.slam.local_mapping import MapperConfig
    from hfnet_slam_tpu.slam.system import SLAMSystem, SystemConfig
    from hfnet_slam_tpu.slam.tracking import TrackerConfig
    from hfnet_slam_tpu.slam.vi import VIConfig

    cam = cameras.pinhole(450.0, 450.0, 320.0, 240.0, 640, 480)
    world = SyntheticWorld.cloud(seed=5, n_landmarks=1400, extent=16.0,
                                 center=(0, 0, 10.0), desc_dim=64)
    ext = FakeExtractor(world, cam, pad_to=512, noise_px=0.3,
                        desc_noise=0.03, max_landmarks_per_frame=480, seed=7)
    calib = IMU.default_calib(freq=1.0 / IMU_DT)
    cfg = SystemConfig(
        k_max=128, m_max=8192, n_slots=512, desc_dim=64, gdesc_dim=64,
        loop_closing=False,
        tracker=TrackerConfig(local_mp_cap=2048, min_init_med_parallax_deg=2.0),
        mapper=MapperConfig(ba_kf_cap=16, ba_mp_cap=2048, ba_edge_cap=8192,
                            tri_neighbors=5),
        vi=VIConfig(t_init=1.5, t_viba1=3.5, t_viba2=8.0, min_kfs_for_init=6,
                    meas_cap=512),
    )
    sys_ = SLAMSystem(cam, ext, cfg, imu_calib=calib)

    n_frames = 110
    est_c, gt_c, stamps = [], [], []
    for i in range(n_frames):
        t = i * FRAME_DT
        R_wc, c = pose_at(t)
        R_cw = R_wc.T.astype(np.float32)
        t_cw = (-R_cw @ c).astype(np.float32)
        feats = ext(R_cw, t_cw)
        imu_rows = synth_imu(t - FRAME_DT, t) if i > 0 else None
        st, Re, te = sys_.track_features(feats, t, imu=imu_rows)
        if Re is not None:
            est_c.append(-Re.T @ te)
            gt_c.append(c)
            stamps.append(i)
    return sys_, np.asarray(est_c), np.asarray(gt_c), np.asarray(stamps)


def test_imu_initializes(vi_run):
    sys_, est, gtc, stamps = vi_run
    assert sys_.store.imu_initialized
    assert sys_.vi.stage >= 2  # init + VIBA1 refinement ran
    # gravity alignment: in the post-init world, gravity is -z, so the
    # trajectory's up direction (world y pre-alignment) maps near +z... the
    # alignment rotation is internal; check velocities are plausible instead
    kfs = sys_.store.valid_kf_ids()
    v = sys_.store.kf_vel[kfs]
    speed = np.linalg.norm(v, axis=1)
    # GT speed ~ radius * rate = 4 m/s
    assert 2.0 < np.median(speed[-8:]) < 6.0, f"speeds {speed[-8:]}"


def test_metric_scale_recovered(vi_run):
    from hfnet_slam_tpu.evaluation import ate

    sys_, est, gtc, stamps = vi_run
    # only frames after init (map was rescaled at init; earlier trajectory
    # entries are in the pre-init frame)
    late = stamps > 60
    assert late.sum() > 30
    err_noscale = ate.ate_rmse(est[late], gtc[late], with_scale=False)
    err_scale = ate.ate_rmse(est[late], gtc[late], with_scale=True)
    path = np.linalg.norm(np.diff(gtc[late], axis=0), axis=1).sum()
    # metric ATE must be small in ABSOLUTE terms — scale came from the IMU
    assert err_noscale < 0.05 * path, f"metric ATE {err_noscale:.3f} over {path:.1f} m"
    # and not much worse than the scale-corrected one (scale ~ right)
    assert err_noscale < 3.0 * err_scale + 0.05


def test_tracks_whole_sequence(vi_run):
    sys_, est, gtc, stamps = vi_run
    assert len(est) > 95
    assert sys_.atlas.n_maps() == 1  # never lost into a new map

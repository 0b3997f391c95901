"""Visual-inertial manager: IMU plumbing, staged initialization, alignment.

TPU-native re-design of the reference's IMU integration spread across
Tracking (PreintegrateIMU/PredictStateIMU, /root/reference/src/Tracking.cc:
927-1089) and LocalMapping's staged initialization (InitializeIMU ->
InertialOptimization -> ApplyScaledRotation -> FullInertialBA,
src/LocalMapping.cc:1359-1613, staged at init / VIBA1@5s / VIBA2@15s,
:200-275).

Staging: each init/refinement stage runs the whitened inertial-only
solver (optim/inertial.inertial_init) with poses fixed — gravity
direction, scale, biases and velocities — then aligns the map and
polishes with the full 15-dof visual-inertial BA
(optim/vi_ba.vi_bundle_adjust via LocalMapper.full_inertial_ba), the
FullInertialBA call at LocalMapping.cc:1493. After initialization the
mapper's window BA switches to LocalInertialBA
(LocalMapper.local_inertial_ba).

The body frame: camera-in-body extrinsic T_bc comes from ImuCalib; all
MapStore poses remain world->camera; this module converts at the boundary.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .. import lie
from ..geometry import imu as IMU
from ..optim import inertial as VI
from .map import MapStore


@dataclasses.dataclass
class VIConfig:
    # staging times (LocalMapping.cc:200-275)
    t_init: float = 2.0        # first init attempt after this much KF time
    t_viba1: float = 5.0
    t_viba2: float = 15.0
    prior_g_init: float = 1e2
    prior_a_init: float = 1e10  # pin acc bias at first init
    prior_g_viba1: float = 1.0
    prior_a_viba1: float = 1e5
    min_kfs_for_init: int = 8
    min_scale: float = 1e-1    # abort gate (LocalMapping.cc:1457)
    chain_cap: int = 64        # max KFs in one init problem
    meas_cap: int = 256        # padded measurements per preintegration call
    # periodic mono scale refinement after full init (ScaleRefinement,
    # LocalMapping.cc:1615, fired ~every 10 s at :255-275)
    scale_refine_interval: float = 10.0
    scale_refine_tol: float = 0.002  # apply only if |s-1| exceeds this
    # reintegrate a chain preintegration when the optimized bias moved this
    # far from its linearization point (Preintegrated::Reintegrate,
    # reference src/ImuTypes.cc:168, fired after InertialOptimization at
    # src/Optimizer.cc:3217/3382; below these the first-order Jacobian
    # correction in imu.delta_* is accurate)
    reint_bg_tol: float = 1e-3
    reint_ba_tol: float = 1e-2
    # IMU init failure gates (LocalMapping.cc:150-210): a map whose
    # keyframes barely move cannot observe scale/gravity — flag bad_imu so
    # Tracking resets the active map (Tracking.cc:1108-1114)
    min_motion_init: float = 0.03   # inter-KF distance pre-init (:202)
    min_motion_run: float = 0.02    # filtered distance post-init (:156)
    motion_window_t: float = 10.0   # the mTinit<10s window (:156)


class VIManager:
    """Owns the IMU calib, per-keyframe chain preintegrations, and the
    staged initialization state for the active map."""

    def __init__(self, calib: IMU.ImuCalib, store: MapStore, cfg: VIConfig = None):
        self.calib = calib
        self.store = store
        self.cfg = cfg or VIConfig()
        # per-KF preintegration from its chain predecessor (mpImuPreintegrated)
        self.kf_pre: dict[int, IMU.Preintegrated] = {}
        # raw (N,7) measurement blocks backing kf_pre (mvMeasurements) so a
        # large bias update can re-run the integration scan exactly
        self.kf_meas: dict[int, np.ndarray] = {}
        self.first_kf_ts: float = None
        self.stage = 0  # 0 = visual only, 1 = initialized, 2 = viba1, 3 = viba2
        self.mapper = None  # LocalMapper, set by System — runs FullInertialBA
        self._last_refine_ts: float = None
        # IMU failure flag (LocalMapping::mbBadImu): set by the motion
        # gates below; Tracking resets the active map when it sees it
        self.bad_imu = False
        self._dist_filtered: float = None
        self._t_moving = 0.0

    # ------------------------------------------------------------------
    # frame-level helpers
    # ------------------------------------------------------------------
    def integrate(self, meas: np.ndarray, bg=None, ba=None) -> IMU.Preintegrated:
        """Preintegrate an (N,7) [ax ay az wx wy wz dt] block (padded to
        cfg.meas_cap so all calls share one compiled scan)."""
        cap = max(self.cfg.meas_cap, len(meas))
        m = np.zeros((cap, 7), np.float32)
        mask = np.zeros(cap, bool)
        m[: len(meas)] = meas
        mask[: len(meas)] = True
        return IMU.integrate(
            jnp.asarray(m), jnp.asarray(mask), self.calib,
            jnp.zeros(3) if bg is None else jnp.asarray(bg),
            jnp.zeros(3) if ba is None else jnp.asarray(ba),
        )

    def cam_to_body(self, R_cw, t_cw):
        """World->camera -> body state (R_wb, p_wb).

        T_bc maps camera coords to body coords (the YAML's IMU.T_b_c1:
        "transformation from camera to body-frame"). Then
        T_wb = T_wc o T_bc^{-1}: R_wb = R_wc R_bc^T,
        p_wb = c_w - R_wc R_bc^T t_bc."""
        R_bc = np.asarray(self.calib.Tbc_R)
        t_bc = np.asarray(self.calib.Tbc_t)
        R_wc = np.asarray(R_cw).T
        c_w = -R_wc @ np.asarray(t_cw)
        R_wb = R_wc @ R_bc.T
        p_wb = c_w - R_wb @ t_bc
        return R_wb, p_wb

    def body_to_cam(self, R_wb, p_wb):
        R_cw, t_cw = VI.body_to_cam(
            jnp.asarray(R_wb), jnp.asarray(p_wb),
            self.calib.Tbc_R, self.calib.Tbc_t,
        )
        return np.asarray(R_cw), np.asarray(t_cw)

    # ------------------------------------------------------------------
    # keyframe chain
    # ------------------------------------------------------------------
    def on_keyframe(self, k: int, prev_kf: int, pre: IMU.Preintegrated,
                    meas: np.ndarray = None):
        """Record the chain preintegration prev_kf -> k (InsertKeyFrame's
        mpImuPreintegratedFromLastKF handoff). `meas` is the raw block the
        preintegration was built from; keeping it enables exact
        reintegration after bias updates."""
        store = self.store
        store.kf_prev[k] = prev_kf
        self.kf_pre[k] = pre
        if meas is not None:
            self.kf_meas[k] = np.asarray(meas, np.float32)
        if self.first_kf_ts is None:
            self.first_kf_ts = float(store.kf_timestamp[k])
        if prev_kf >= 0 and store.imu_initialized:
            # propagate state to the new KF if tracking hasn't already
            if not np.any(store.kf_vel[k]):
                store.kf_vel[k] = store.kf_vel[prev_kf]
            store.kf_bg[k] = store.kf_bg[prev_kf]
            store.kf_ba[k] = store.kf_ba[prev_kf]

    def chain(self):
        """Ordered list of (kf, pre) pairs along the IMU chain."""
        store = self.store
        ids = store.valid_kf_ids()
        order = np.argsort(store.kf_timestamp[ids])
        ids = [int(i) for i in ids[order]]
        out = []
        for k in ids:
            p = int(store.kf_prev[k])
            if p >= 0 and store.kf_valid[p] and k in self.kf_pre:
                out.append((p, k, self.kf_pre[k]))
        return out

    # ------------------------------------------------------------------
    # staged initialization (LocalMapping::InitializeIMU analogue)
    # ------------------------------------------------------------------
    def check_motion_gates(self):
        """IMU init failure gates (LocalMapping.cc:150-210): pre-init, a
        new chain pair whose camera centers barely moved means scale is
        unobservable ('Not enough motion for initializing. Reseting...');
        post-init (until VIBA2), a low-pass-filtered inter-KF distance
        below threshold inside the first-10-motion-seconds window flags
        the same. Sets self.bad_imu; Tracking resets the active map."""
        store = self.store
        cfg = self.cfg
        links = self.chain()
        if not links:
            return

        def link_dist(a, b):
            ca = -store.kf_R[a].T @ store.kf_t[a]
            cb = -store.kf_R[b].T @ store.kf_t[b]
            return float(np.linalg.norm(cb - ca))

        p, k, _ = links[-1]
        d1 = link_dist(p, k)
        # post-init the reference sums the last TWO chain-link distances
        # before comparing against the 0.05/0.02 thresholds
        # (LocalMapping.cc:146-157); the pre-init gate is single-link vs
        # 0.03 (:202-210). A single-link post-init gate is ~2x stricter
        # and trips bad_imu on slow-but-valid sequences.
        d = d1
        if len(links) >= 2:
            p2, k2, _ = links[-2]
            d += link_dist(p2, k2)
        if self.stage == 0:
            if (len(links) + 1 >= cfg.min_kfs_for_init
                    and d1 < cfg.min_motion_init):
                self.bad_imu = True
        elif not store.viba2:
            self._dist_filtered = (d if self._dist_filtered is None
                                   else 0.5 * d + 0.5 * self._dist_filtered)
            if d > 0.05:
                self._t_moving += float(store.kf_timestamp[k]
                                        - store.kf_timestamp[p])
            if (self._t_moving < cfg.motion_window_t
                    and self._dist_filtered < cfg.min_motion_run):
                self.bad_imu = True
                self._dist_filtered = None

    def maybe_initialize(self, now_ts: float) -> bool:
        """Try the appropriate stage; returns True when a stage ran."""
        store = self.store
        cfg = self.cfg
        if self.first_kf_ts is None:
            return False
        self.check_motion_gates()
        if self.bad_imu:
            return False
        elapsed = now_ts - self.first_kf_ts
        if self.stage == 0 and elapsed >= cfg.t_init:
            return self._run_stage(cfg.prior_g_init, cfg.prior_a_init,
                                   fix_scale=False, stage=1)
        if self.stage == 1 and elapsed >= cfg.t_viba1:
            return self._run_stage(cfg.prior_g_viba1, cfg.prior_a_viba1,
                                   fix_scale=False, stage=2)
        if self.stage == 2 and elapsed >= cfg.t_viba2:
            ran = self._run_stage(0.0, 0.0, fix_scale=False, stage=3)
            if ran:
                self._last_refine_ts = now_ts
            return ran
        if self.stage == 3:
            if self._last_refine_ts is None:
                self._last_refine_ts = now_ts
            elif now_ts - self._last_refine_ts >= cfg.scale_refine_interval:
                self._last_refine_ts = now_ts
                return self._scale_refinement()
        return False

    def _scale_refinement(self) -> bool:
        """Periodic mono scale/gravity-direction refinement
        (LocalMapping::ScaleRefinement, LocalMapping.cc:1615): inertial-only
        solve with biases pinned (huge priors); the map is re-aligned only
        when the scale estimate drifts beyond tol (|s-1| > 0.002)."""
        store = self.store
        cfg = self.cfg
        links = self.chain()
        if len(links) + 1 < cfg.min_kfs_for_init:
            return False
        links = links[-cfg.chain_cap:]
        kf_ids = [links[0][0]] + [k for _, k, _ in links]
        for n in range(1, len(links)):
            if links[n][0] != links[n - 1][1]:
                return False
        R_wb = np.zeros((len(kf_ids), 3, 3), np.float32)
        p_wb = np.zeros((len(kf_ids), 3), np.float32)
        for n, k in enumerate(kf_ids):
            R_wb[n], p_wb[n] = self.cam_to_body(store.kf_R[k], store.kf_t[k])
        pres = jax.tree.map(lambda *xs: jnp.stack(xs), *[p for _, _, p in links])
        res = VI.inertial_init(
            jnp.asarray(R_wb), jnp.asarray(p_wb), pres,
            prior_g=1e10, prior_a=1e10, fix_scale=False,
        )
        s = float(res["scale"])
        if not np.isfinite(s) or s < cfg.min_scale:
            return False
        if abs(s - 1.0) <= cfg.scale_refine_tol:
            return False  # already consistent; nothing to apply
        Rwg = np.asarray(res["Rwg"])
        self.apply_scaled_rotation(Rwg.T, s)
        v = np.asarray(res["v"]) @ Rwg
        for n, k in enumerate(kf_ids):
            store.kf_vel[k] = v[n]
        return True

    def _run_stage(self, prior_g, prior_a, fix_scale, stage) -> bool:
        store = self.store
        cfg = self.cfg
        links = self.chain()
        if len(links) + 1 < cfg.min_kfs_for_init:
            return False
        links = links[-cfg.chain_cap:]
        # consecutive-chain check: each link's prev must be the previous kf
        kf_ids = [links[0][0]] + [k for _, k, _ in links]
        for n in range(1, len(links)):
            if links[n][0] != links[n - 1][1]:
                return False  # broken chain (culling); retry later

        R_wb = np.zeros((len(kf_ids), 3, 3), np.float32)
        p_wb = np.zeros((len(kf_ids), 3), np.float32)
        for n, k in enumerate(kf_ids):
            R_wb[n], p_wb[n] = self.cam_to_body(store.kf_R[k], store.kf_t[k])
        pres = jax.tree.map(lambda *xs: jnp.stack(xs), *[p for _, _, p in links])

        res = VI.inertial_init(
            jnp.asarray(R_wb), jnp.asarray(p_wb), pres,
            prior_g=max(prior_g, 1e-3), prior_a=max(prior_a, 1e-3),
            fix_scale=fix_scale,
        )
        s = float(res["scale"])
        if not np.isfinite(s) or s < cfg.min_scale:
            return False  # not enough motion (LocalMapping.cc:1457-1462)

        Rwg = np.asarray(res["Rwg"])
        self.apply_scaled_rotation(Rwg.T, s)
        # the solver already works at metric scale (it scales the positions
        # internally), so velocities only need the world rotation:
        # v' = Rgw v = Rwg^T v  (row form: v @ Rwg)
        v = np.asarray(res["v"]) @ Rwg
        for n, k in enumerate(kf_ids):
            store.kf_vel[k] = v[n]
            store.kf_bg[k] = np.asarray(res["bg"])
            store.kf_ba[k] = np.asarray(res["ba"])
        # relinearize chain preintegrations at the optimized bias when the
        # jump exceeds the first-order-validity tolerance (the reference
        # reintegrates every chain KF right after InertialOptimization,
        # src/Optimizer.cc:3217/3382 -> ImuTypes.cc:168 Reintegrate)
        self.reintegrate_chain()
        store.imu_initialized = True
        store.viba1 = stage >= 2
        store.viba2 = stage >= 3
        self.stage = stage
        # full visual-inertial BA polish after alignment (InitializeIMU's
        # FullInertialBA call, LocalMapping.cc:1493-1495, with the stage's
        # bias priors)
        if self.mapper is not None:
            self.mapper.full_inertial_ba(self, prior_g=prior_g,
                                         prior_a=prior_a)
        return True

    def reintegrate_chain(self) -> int:
        """Re-run the integration scan for every chain preintegration whose
        linearization bias drifted beyond tolerance from its predecessor
        KF's current bias estimate (Preintegrated::Reintegrate,
        src/ImuTypes.cc:168). Exact — replaces the first-order Jacobian
        correction with a fresh scan over the retained raw measurements.
        Returns the number of preintegrations recomputed."""
        store = self.store
        cfg = self.cfg
        n = 0
        for k, pre in list(self.kf_pre.items()):
            meas = self.kf_meas.get(k)
            p = int(store.kf_prev[k])
            if meas is None or p < 0 or not store.kf_valid[p]:
                continue
            bg, ba = store.kf_bg[p], store.kf_ba[p]
            dbg = np.linalg.norm(np.asarray(pre.bg0) - bg)
            dba = np.linalg.norm(np.asarray(pre.ba0) - ba)
            if dbg <= cfg.reint_bg_tol and dba <= cfg.reint_ba_tol:
                continue
            self.kf_pre[k] = self.integrate(meas, bg, ba)
            n += 1
        return n

    def apply_scaled_rotation(self, Rgw: np.ndarray, s: float):
        """Rotate the world so gravity is -z and rescale to metric units
        (Map::ApplyScaledRotation, reference include/Map.h:118): for every
        KF pose T_cw -> T_cw' with world points p -> s Rgw p.

        T_cw' = T_cw o T_w'w^{-1} with T_w'w = [s Rgw | 0]:
          R_cw' = R_cw Rgw^T,  t_cw' = s t_cw  (rotation absorbs Rgw).
        """
        store = self.store
        ids = store.valid_kf_ids()
        for k in ids:
            store.kf_R[k] = store.kf_R[k] @ Rgw.T
            store.kf_t[k] = s * store.kf_t[k]
        sel = store.mp_valid
        store.mp_pos[sel] = s * (store.mp_pos[sel] @ Rgw.T)
        store.kf_vel[ids] = s * (store.kf_vel[ids] @ Rgw.T)
        store.bump_change()

    # ------------------------------------------------------------------
    def predict(self, k_or_state, pre: IMU.Preintegrated):
        """PredictStateIMU from a keyframe id or an explicit body state."""
        store = self.store
        if isinstance(k_or_state, (int, np.integer)):
            k = int(k_or_state)
            R_wb, p_wb = self.cam_to_body(store.kf_R[k], store.kf_t[k])
            v, bg, ba = store.kf_vel[k], store.kf_bg[k], store.kf_ba[k]
        else:
            R_wb, p_wb, v, bg, ba = k_or_state
        R2, p2, v2 = IMU.predict_state(
            jnp.asarray(R_wb), jnp.asarray(p_wb), jnp.asarray(v),
            jnp.asarray(bg), jnp.asarray(ba), pre,
        )
        return np.asarray(R2), np.asarray(p2), np.asarray(v2)

"""IMU preintegration on manifold, pure JAX.

Replaces the reference's IMU::Preintegrated
(/root/reference/src/ImuTypes.cc, include/ImuTypes.h:143-251): delta
rotation/velocity/position between keyframes, the 15x15 covariance, and
the bias Jacobians (JRg, JVg, JVa, JPg, JPa) that let optimizers correct
the deltas for a new bias estimate without re-integration
(GetDeltaRotation/Velocity/Position, ImuTypes.cc).

TPU design: measurements are integrated with one `lax.scan` over a padded
(N,7) array [acc(3), gyro(3), dt] — the reference's per-measurement C++
loop (IntegrateNewMeasurement) becomes a single compiled scan; a whole
batch of frame intervals can be vmapped. State ordering in the covariance
matches the reference: [dR(3), dV(3), dP(3), bg(3), ba(3)].

GRAVITY_VALUE = 9.81 (include/ImuTypes.h:43).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie

GRAVITY = 9.81
GRAVITY_VEC = jnp.array([0.0, 0.0, -GRAVITY])


class ImuCalib(NamedTuple):
    """Noise densities scaled to discrete form (Settings -> Tracking.cc:
    705-706 multiplies by sqrt(freq))."""

    sigma_g: jnp.ndarray   # gyro noise (rad/s/sqrt(Hz) * sqrt(freq))
    sigma_a: jnp.ndarray   # acc noise
    sigma_gw: jnp.ndarray  # gyro random walk
    sigma_aw: jnp.ndarray  # acc random walk
    Tbc_R: jnp.ndarray     # camera-to-body rotation (3,3): x_b = R x_c + t
    Tbc_t: jnp.ndarray     # camera-to-body translation (3,)


def default_calib(sigma_g=1.7e-4, sigma_a=2.0e-3, sigma_gw=1.9e-5,
                  sigma_aw=3.0e-3, freq=200.0):
    import numpy as np

    sf = float(np.sqrt(freq))
    return ImuCalib(
        sigma_g=jnp.asarray(sigma_g * sf),
        sigma_a=jnp.asarray(sigma_a * sf),
        sigma_gw=jnp.asarray(sigma_gw / sf),
        sigma_aw=jnp.asarray(sigma_aw / sf),
        Tbc_R=jnp.eye(3),
        Tbc_t=jnp.zeros(3),
    )


class Preintegrated(NamedTuple):
    """Preintegrated deltas over an interval, at linearization bias b0."""

    dT: jnp.ndarray    # scalar total time
    dR: jnp.ndarray    # (3,3)
    dV: jnp.ndarray    # (3,)
    dP: jnp.ndarray    # (3,)
    C: jnp.ndarray     # (15,15) covariance [dR dV dP bg ba]
    JRg: jnp.ndarray   # (3,3) d(dR)/d(bg)
    JVg: jnp.ndarray   # (3,3)
    JVa: jnp.ndarray   # (3,3)
    JPg: jnp.ndarray   # (3,3)
    JPa: jnp.ndarray   # (3,3)
    bg0: jnp.ndarray   # (3,) linearization gyro bias
    ba0: jnp.ndarray   # (3,) linearization acc bias


def empty_preintegrated(bg0=None, ba0=None) -> Preintegrated:
    z3 = jnp.zeros(3)
    return Preintegrated(
        dT=jnp.asarray(0.0), dR=jnp.eye(3), dV=z3, dP=z3,
        C=jnp.zeros((15, 15)),
        JRg=jnp.zeros((3, 3)), JVg=jnp.zeros((3, 3)), JVa=jnp.zeros((3, 3)),
        JPg=jnp.zeros((3, 3)), JPa=jnp.zeros((3, 3)),
        bg0=z3 if bg0 is None else jnp.asarray(bg0),
        ba0=z3 if ba0 is None else jnp.asarray(ba0),
    )


@partial(jax.jit, static_argnames=())
def integrate(meas: jnp.ndarray, mask: jnp.ndarray, calib: ImuCalib,
              bg0, ba0) -> Preintegrated:
    """Integrate a padded measurement block.

    Args:
      meas: (N,7) rows [ax ay az, wx wy wz, dt].
      mask: (N,) bool — padding rows are skipped.
      bg0, ba0: (3,) linearization biases.

    Mirrors IMU::Preintegrated::IntegrateNewMeasurement (ImuTypes.cc):
    position/velocity first (using the pre-update dR), covariance via the
    (A, B) transition, then the rotation update and its Jacobian.
    """
    Nga = jnp.diag(jnp.concatenate([
        jnp.full(3, calib.sigma_g ** 2), jnp.full(3, calib.sigma_a ** 2)
    ]))
    NgaWalk = jnp.diag(jnp.concatenate([
        jnp.full(3, calib.sigma_gw ** 2), jnp.full(3, calib.sigma_aw ** 2)
    ]))

    def step(st: Preintegrated, row):
        m, valid = row
        a = m[:3] - ba0
        w = m[3:6] - bg0
        dt = m[6]

        ahat = lie.hat(a)
        # position & velocity use pre-update dR
        dP = st.dP + st.dV * dt + 0.5 * (st.dR @ a) * dt * dt
        dV = st.dV + (st.dR @ a) * dt

        # covariance transition (A,B) for [dR dV dP] block + noise
        A = jnp.eye(9)
        B = jnp.zeros((9, 6))
        A = A.at[3:6, 0:3].set(-st.dR @ ahat * dt)
        A = A.at[6:9, 0:3].set(-0.5 * st.dR @ ahat * dt * dt)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
        B = B.at[3:6, 3:6].set(st.dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * st.dR * dt * dt)

        # bias Jacobians (pre-rotation-update, like the reference)
        JPa = st.JPa + st.JVa * dt - 0.5 * st.dR * dt * dt
        JPg = st.JPg + st.JVg * dt - 0.5 * st.dR @ ahat @ st.JRg * dt * dt
        JVa = st.JVa - st.dR * dt
        JVg = st.JVg - st.dR @ ahat @ st.JRg * dt

        # rotation update
        phi = w * dt
        dRi = lie.so3_exp(phi)
        Jr = lie.so3_right_jacobian(phi)
        A = A.at[0:3, 0:3].set(dRi.T)
        B = B.at[0:3, 0:3].set(Jr * dt)

        C9 = A @ st.C[:9, :9] @ A.T + B @ Nga @ B.T
        C = st.C.at[:9, :9].set(C9)
        C = C.at[9:, 9:].add(NgaWalk)

        dR = lie.normalize_rotation(st.dR @ dRi)
        JRg = dRi.T @ st.JRg - Jr * dt

        new = Preintegrated(
            dT=st.dT + dt, dR=dR, dV=dV, dP=dP, C=C,
            JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa,
            bg0=st.bg0, ba0=st.ba0,
        )
        # padding rows leave the state untouched
        out = jax.tree.map(lambda n, o: jnp.where(valid, n, o), new, st)
        return out, None

    init = empty_preintegrated(bg0, ba0)
    final, _ = jax.lax.scan(step, init, (meas, mask))
    return final


# ---------------------------------------------------------------------------
# bias-corrected getters (ImuTypes.cc GetDelta{Rotation,Velocity,Position})
# ---------------------------------------------------------------------------

def delta_rotation(pre: Preintegrated, bg):
    db = bg - pre.bg0
    return pre.dR @ lie.so3_exp(pre.JRg @ db)


def delta_velocity(pre: Preintegrated, bg, ba):
    return pre.dV + pre.JVg @ (bg - pre.bg0) + pre.JVa @ (ba - pre.ba0)


def delta_position(pre: Preintegrated, bg, ba):
    return pre.dP + pre.JPg @ (bg - pre.bg0) + pre.JPa @ (ba - pre.ba0)


# ---------------------------------------------------------------------------
# state prediction (Tracking::PredictStateIMU analogue, Tracking.cc:1041)
# ---------------------------------------------------------------------------

def predict_state(R_wb, p_wb, v_w, bg, ba, pre: Preintegrated):
    """Propagate a body state through a preintegrated interval.
    Returns (R_wb', p_wb', v_w')."""
    t = pre.dT
    g = GRAVITY_VEC
    R2 = lie.normalize_rotation(R_wb @ delta_rotation(pre, bg))
    v2 = v_w + g * t + R_wb @ delta_velocity(pre, bg, ba)
    p2 = p_wb + v_w * t + 0.5 * g * t * t + R_wb @ delta_position(pre, bg, ba)
    return R2, p2, v2


# ---------------------------------------------------------------------------
# inertial residual (G2oTypes EdgeInertial analogue, include/G2oTypes.h:495)
# ---------------------------------------------------------------------------

def inertial_residual(R1, p1, v1, bg1, ba1, R2, p2, v2, pre: Preintegrated):
    """9-d residual [eR eV eP] between consecutive body states.
    States are world-frame body poses (R_wb, p_wb) and velocities."""
    t = pre.dT
    g = GRAVITY_VEC
    dR = delta_rotation(pre, bg1)
    dV = delta_velocity(pre, bg1, ba1)
    dP = delta_position(pre, bg1, ba1)
    eR = lie.so3_log(dR.T @ R1.T @ R2)
    eV = R1.T @ (v2 - v1 - g * t) - dV
    eP = R1.T @ (p2 - p1 - v1 * t - 0.5 * g * t * t) - dP
    return jnp.concatenate([eR, eV, eP])


def information_9(pre: Preintegrated):
    """Information of the 9-d inertial residual = inv(C[:9,:9]),
    symmetrized and floored like EdgeInertial's constructor."""
    C = 0.5 * (pre.C[:9, :9] + pre.C[:9, :9].T) + 1e-12 * jnp.eye(9)
    return jnp.linalg.inv(C)


def merge(pre1: Preintegrated, meas, mask, calib: ImuCalib) -> Preintegrated:
    """Append measurements to an existing preintegration
    (MergePrevious analogue used by KF culling, LocalMapping.cc:1214, is
    re-integration in the reference too — Reintegrate())."""
    more = integrate(meas, mask, calib, pre1.bg0, pre1.ba0)
    return compose(pre1, more)


def compose(a: Preintegrated, b: Preintegrated) -> Preintegrated:
    """Chain two preintegrated intervals (same linearization bias)."""
    dR = a.dR @ b.dR
    dV = a.dV + a.dR @ b.dV
    dP = a.dP + a.dV * b.dT + a.dR @ b.dP
    # first-order covariance/Jacobian composition
    JRg = b.dR.T @ a.JRg + b.JRg
    JVg = a.JVg + a.dR @ b.JVg - a.dR @ lie.hat(b.dV) @ a.JRg
    JVa = a.JVa + a.dR @ b.JVa
    JPg = a.JPg + a.JVg * b.dT + a.dR @ b.JPg - a.dR @ lie.hat(b.dP) @ a.JRg
    JPa = a.JPa + a.JVa * b.dT + a.dR @ b.JPa
    C = a.C + b.C  # coarse upper bound; exact propagation via re-integrate
    return Preintegrated(
        dT=a.dT + b.dT, dR=lie.normalize_rotation(dR), dV=dV, dP=dP, C=C,
        JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa, bg0=a.bg0, ba0=a.ba0,
    )

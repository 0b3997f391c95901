"""Camera models: Pinhole and Kannala-Brandt-8 fisheye, pure JAX.

TPU-native re-design of the reference's GeometricCamera virtual interface
(/root/reference/include/CameraModels/GeometricCamera.h:61-89,
 src/CameraModels/Pinhole.cpp, src/CameraModels/KannalaBrandt8.cpp).

Instead of virtual dispatch, a camera is a small static-kind record with a
flat parameter vector; all functions broadcast over leading point axes and
are jit/vmap/grad-safe. Projection Jacobians are closed-form (they sit on
the per-frame hot path inside Gauss-Newton).

Param layout:
  PINHOLE: [fx, fy, cx, cy]
  KB8:     [fx, fy, cx, cy, k0, k1, k2, k3]   (theta-polynomial fisheye)

Lens distortion (radial-tangential, the reference's Pinhole + cv dist
coefficients) is handled by undistorting keypoints once per frame
(Frame::UndistortKeyPoints, /root/reference/src/Frame.cc) — the rest of
the pipeline then works in the ideal pinhole frame. `Camera.dist` holds
[k1, k2, p1, p2, k3] when the rig is distorted; see undistort_points().
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

PINHOLE = 0
KB8 = 1

_Z_MIN = 1e-6


@dataclasses.dataclass(frozen=True)
class Camera:
    """Static camera description. `kind` is a Python int (static under jit)."""

    kind: int
    params: jnp.ndarray  # (4,) or (8,)
    width: int
    height: int
    # radial-tangential coefficients [k1,k2,p1,p2,k3] for a distorted
    # PINHOLE rig; None = ideal (rectified / KB8 handles its own model)
    dist: Optional[jnp.ndarray] = None

    def project(self, pc):
        return project(self.kind, self.params, pc)

    def unproject(self, uv):
        return unproject(self.kind, self.params, uv)

    def project_jac(self, pc):
        return project_jac(self.kind, self.params, pc)

    def undistort(self, uv):
        """Distorted pixel keypoints -> ideal-pinhole pixels (identity when
        the rig has no distortion)."""
        if self.dist is None:
            return uv
        return undistort_points(self.params, self.dist, uv)

    @property
    def fx(self):
        return self.params[0]

    @property
    def fy(self):
        return self.params[1]

    @property
    def K(self):
        fx, fy, cx, cy = self.params[0], self.params[1], self.params[2], self.params[3]
        return jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], dtype=self.params.dtype)


def pinhole(fx, fy, cx, cy, width, height, dist=None):
    """dist: optional radial-tangential coefficients (k1,k2[,p1,p2[,k3]])."""
    d = None
    if dist is not None:
        d = np_pad_dist(dist)
        if not float(jnp.abs(d).max()):
            d = None
    return Camera(PINHOLE, jnp.array([fx, fy, cx, cy], dtype=jnp.float32),
                  width, height, dist=d)


def np_pad_dist(dist):
    """Normalize distortion coefficients to a (5,) [k1,k2,p1,p2,k3] array."""
    d = jnp.zeros(5, jnp.float32)
    vals = jnp.asarray(tuple(dist), jnp.float32)
    return d.at[: vals.shape[0]].set(vals[:5])


def kb8(fx, fy, cx, cy, k0, k1, k2, k3, width, height):
    return Camera(KB8, jnp.array([fx, fy, cx, cy, k0, k1, k2, k3], dtype=jnp.float32), width, height)


# ---------------------------------------------------------------------------
# functional API (kind is static)
# ---------------------------------------------------------------------------

def project(kind, params, pc):
    """Camera-frame points (...,3) -> pixels (...,2).

    Points behind the camera are clamped to z = _Z_MIN (mask separately with
    pc[...,2] > 0; cf. Pinhole::project which assumes z>0).
    """
    if kind == PINHOLE:
        fx, fy, cx, cy = params[0], params[1], params[2], params[3]
        z = jnp.maximum(pc[..., 2], _Z_MIN)
        u = fx * pc[..., 0] / z + cx
        v = fy * pc[..., 1] / z + cy
        return jnp.stack([u, v], axis=-1)
    elif kind == KB8:
        fx, fy, cx, cy = params[0], params[1], params[2], params[3]
        k = params[4:8]
        x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
        r2 = x * x + y * y
        r = jnp.sqrt(jnp.maximum(r2, _Z_MIN * _Z_MIN))
        theta = jnp.arctan2(r, z)
        th2 = theta * theta
        d = theta * (1.0 + th2 * (k[0] + th2 * (k[1] + th2 * (k[2] + th2 * k[3]))))
        scale = d / r
        # at r ~ 0: d/r -> (theta/r) -> 1/z' ; handle by direct pinhole limit
        small = r2 < 1e-10
        scale = jnp.where(small, 1.0 / jnp.maximum(z, _Z_MIN), scale)
        u = fx * scale * x + cx
        v = fy * scale * y + cy
        return jnp.stack([u, v], axis=-1)
    raise ValueError(f"unknown camera kind {kind}")


def unproject(kind, params, uv):
    """Pixels (...,2) -> unit-depth bearing (...,3) with z = 1."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    if kind == PINHOLE:
        return jnp.stack([mx, my, jnp.ones_like(mx)], axis=-1)
    elif kind == KB8:
        k = params[4:8]
        # invert d(theta) = r_d by Newton iteration (KannalaBrandt8::unproject
        # uses 10 iterations; fixed count keeps it jit-friendly)
        r_d = jnp.sqrt(jnp.maximum(mx * mx + my * my, 1e-16))
        r_d_c = jnp.minimum(r_d, jnp.pi / 2.0)  # clamp like the reference

        def newton(theta, _):
            th2 = theta * theta
            poly = 1.0 + th2 * (k[0] + th2 * (k[1] + th2 * (k[2] + th2 * k[3])))
            d = theta * poly
            dd = 1.0 + th2 * (3 * k[0] + th2 * (5 * k[1] + th2 * (7 * k[2] + th2 * 9 * k[3])))
            theta = theta - (d - r_d_c) / dd
            return theta, None

        theta, _ = jax.lax.scan(newton, r_d_c, None, length=10)
        # divide by the clamped radius exactly like the reference
        # (KannalaBrandt8.cpp:139: scale = tan(theta)/theta_d with clamped
        # theta_d); pixels outside the valid fisheye circle give the same
        # out-of-model result as the reference.
        scale = jnp.tan(theta) / jnp.maximum(r_d_c, 1e-12)
        return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)
    raise ValueError(f"unknown camera kind {kind}")


def project_jac(kind, params, pc):
    """d(uv)/d(pc): (...,3) -> (...,2,3) closed-form."""
    if kind == PINHOLE:
        fx, fy = params[0], params[1]
        x, y = pc[..., 0], pc[..., 1]
        z = jnp.maximum(pc[..., 2], _Z_MIN)
        zinv = 1.0 / z
        zinv2 = zinv * zinv
        zero = jnp.zeros_like(x)
        row_u = jnp.stack([fx * zinv, zero, -fx * x * zinv2], axis=-1)
        row_v = jnp.stack([zero, fy * zinv, -fy * y * zinv2], axis=-1)
        return jnp.stack([row_u, row_v], axis=-2)
    elif kind == KB8:
        # closed-form after KannalaBrandt8::projectJac
        fx, fy = params[0], params[1]
        k = params[4:8]
        x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
        r2 = jnp.maximum(x * x + y * y, 1e-12)
        r = jnp.sqrt(r2)
        r3 = r2 * r
        theta = jnp.arctan2(r, z)
        th2 = theta * theta
        f_t = theta * (1.0 + th2 * (k[0] + th2 * (k[1] + th2 * (k[2] + th2 * k[3]))))
        fd_t = 1.0 + th2 * (3 * k[0] + th2 * (5 * k[1] + th2 * (7 * k[2] + th2 * 9 * k[3])))
        zz_rr = z * z + r2
        dtheta_dx = x * z / (r * zz_rr)
        dtheta_dy = y * z / (r * zz_rr)
        dtheta_dz = -r / zz_rr
        g = f_t / r
        dg_dx = (fd_t * dtheta_dx * r - f_t * x / r) / r2
        dg_dy = (fd_t * dtheta_dy * r - f_t * y / r) / r2
        dg_dz = fd_t * dtheta_dz / r
        # u = fx * g * x + cx
        row_u = jnp.stack(
            [fx * (g + x * dg_dx), fx * x * dg_dy, fx * x * dg_dz], axis=-1
        )
        row_v = jnp.stack(
            [fy * y * dg_dx, fy * (g + y * dg_dy), fy * y * dg_dz], axis=-1
        )
        return jnp.stack([row_u, row_v], axis=-2)
    raise ValueError(f"unknown camera kind {kind}")


# ---------------------------------------------------------------------------
# radial-tangential lens distortion (pinhole rigs; Frame::UndistortKeyPoints)
# ---------------------------------------------------------------------------

def _radtan_apply(dist, x, y):
    """Forward distortion on normalized coords: ideal (x,y) -> distorted."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return xd, yd


def distort_points(params, dist, uv):
    """Ideal-pinhole pixels (...,2) -> distorted pixels (the raw-sensor
    model; used by tests to synthesize distorted observations)."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    xd, yd = _radtan_apply(dist, x, y)
    return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1)


@partial(jax.jit)
def undistort_points(params, dist, uv):
    """Distorted pixels (...,2) -> ideal-pinhole pixels.

    Fixed-point inverse of the radial-tangential model (the reference uses
    cv::undistortPoints, an identical iteration): start at the distorted
    normalized coords and iterate x <- (xd - tangential(x)) / radial(x).
    10 iterations converge to <1e-4 px for EuRoC-grade distortion
    (k1=-0.28, /root/reference/Examples/Monocular/EuRoC.yaml:28-31)."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy

    def step(xy, _):
        x, y = xy
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        inv = 1.0 / jnp.maximum(radial, 1e-3)
        return ((xd - dx) * inv, (yd - dy) * inv), None

    (x, y), _ = jax.lax.scan(step, (xd, yd), None, length=10)
    return jnp.stack([fx * x + cx, fy * y + cy], axis=-1)


def in_image(cam: Camera, uv, margin=0.0):
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )

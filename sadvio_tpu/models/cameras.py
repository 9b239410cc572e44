"""Camera projection models: pinhole, double-sphere, equidistant fisheye, omni.

TPU-native re-design of the reference sensor models
(reference: cpp/src/data/sensors/Camera.cpp:15-139, DoubleSphere.cpp,
fisheye.cpp [equidistant + unified-sphere Omni]).  Differences from the
reference, on purpose:

* Models are immutable pytree dataclasses; projection is a pure function
  batched over points via broadcasting -- no per-object state.
* Only the pinhole Jacobian is hand-derived (hot path, mirrors
  Camera.cpp:84-139); the exotic models use jax.jacfwd, which XLA fuses --
  the idiomatic JAX replacement for hand-written C++ Jacobians.
* Projection returns a validity mask instead of throwing / returning false
  (behind-camera, out-of-bounds, NaN checks as in Camera.cpp:59-82).

All functions operate on camera-frame points ``p_c`` (...,3) and pixel
coords ``uv`` (...,2).  World-chain helpers at the bottom compose body pose
and sensor extrinsics and expose the 2x6 / 2x3 Jacobians the BA factors need.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from sadvio_tpu.utils import geometry as geo

_Z_MIN = 1e-4


@struct.dataclass
class Pinhole:
    """K-based pinhole. params: fx, fy, cx, cy; image size static."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = struct.field(pytree_node=False, default=752)
    height: int = struct.field(pytree_node=False, default=480)

    def project(self, p_c):
        """(...,3) -> uv (...,2), valid (...,) bool.

        Mirrors Camera::project bounds/behind checks (Camera.cpp:59-82).
        """
        x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
        zs = jnp.where(jnp.abs(z) < _Z_MIN, _Z_MIN, z)
        u = self.fx * x / zs + self.cx
        v = self.fy * y / zs + self.cy
        uv = jnp.stack([u, v], axis=-1)
        valid = (z > _Z_MIN) & _in_bounds(uv, self.width, self.height)
        return uv, valid

    def project_jac(self, p_c):
        """Returns uv, J (...,2,3) = d uv / d p_c, valid.

        Hand-derived (hot path), semantics of Camera.cpp:84-139.
        """
        x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
        zs = jnp.where(jnp.abs(z) < _Z_MIN, _Z_MIN, z)
        iz = 1.0 / zs
        iz2 = iz * iz
        zero = jnp.zeros_like(x)
        J = jnp.stack(
            [
                jnp.stack([self.fx * iz, zero, -self.fx * x * iz2], axis=-1),
                jnp.stack([zero, self.fy * iz, -self.fy * y * iz2], axis=-1),
            ],
            axis=-2,
        )
        uv, valid = self.project(p_c)
        return uv, J, valid

    def backproject(self, uv):
        """Pixel -> unit ray in camera frame (Camera::getRayCamera)."""
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        r = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        return r / jnp.linalg.norm(r, axis=-1, keepdims=True)

    @property
    def focal(self):
        return 0.5 * (self.fx + self.fy)


@struct.dataclass
class DoubleSphere:
    """Double-sphere model (alpha, xi) (reference DoubleSphere.cpp)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    alpha: jnp.ndarray
    xi: jnp.ndarray
    width: int = struct.field(pytree_node=False, default=752)
    height: int = struct.field(pytree_node=False, default=480)

    def _project_raw(self, p_c):
        x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
        d1 = jnp.sqrt(x * x + y * y + z * z)
        zz = self.xi * d1 + z
        d2 = jnp.sqrt(x * x + y * y + zz * zz)
        denom = self.alpha * d2 + (1.0 - self.alpha) * zz
        denom = jnp.where(jnp.abs(denom) < _Z_MIN, _Z_MIN, denom)
        u = self.fx * x / denom + self.cx
        v = self.fy * y / denom + self.cy
        return jnp.stack([u, v], axis=-1)

    def project(self, p_c):
        uv = self._project_raw(p_c)
        x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
        d1 = jnp.sqrt(x * x + y * y + z * z)
        # validity region of the DS model: z > -w2 * d1
        w1 = jnp.where(self.alpha <= 0.5, self.alpha / (1 - self.alpha), (1 - self.alpha) / self.alpha)
        w2 = (w1 + self.xi) / jnp.sqrt(2 * w1 * self.xi + self.xi * self.xi + 1)
        valid = (z > -w2 * d1) & _in_bounds(uv, self.width, self.height)
        return uv, valid

    def project_jac(self, p_c):
        uv, valid = self.project(p_c)
        J = _autodiff_point_jac(self._project_raw, p_c)
        return uv, J, valid

    def backproject(self, uv):
        mx = (uv[..., 0] - self.cx) / self.fx
        my = (uv[..., 1] - self.cy) / self.fy
        r2 = mx * mx + my * my
        mz = (1.0 - self.alpha * self.alpha * r2) / (
            self.alpha * jnp.sqrt(jnp.maximum(1.0 - (2 * self.alpha - 1.0) * r2, 0.0)) + 1.0 - self.alpha
        )
        s = (mz * self.xi + jnp.sqrt(jnp.maximum(mz * mz + (1 - self.xi * self.xi) * r2, 0.0))) / (mz * mz + r2)
        ray = jnp.stack([s * mx, s * my, s * mz - self.xi], axis=-1)
        return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

    @property
    def focal(self):
        return 0.5 * (self.fx + self.fy)


@struct.dataclass
class Fisheye:
    """Equidistant (Kannala-Brandt k1..k4) fisheye (reference fisheye.cpp)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    k3: jnp.ndarray
    k4: jnp.ndarray
    width: int = struct.field(pytree_node=False, default=752)
    height: int = struct.field(pytree_node=False, default=480)

    def _project_raw(self, p_c):
        x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
        r = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(r, z)
        t2 = theta * theta
        theta_d = theta * (1 + t2 * (self.k1 + t2 * (self.k2 + t2 * (self.k3 + t2 * self.k4))))
        rs = jnp.where(r < _Z_MIN, _Z_MIN, r)
        scale = jnp.where(r < _Z_MIN, 1.0 / jnp.where(jnp.abs(z) < _Z_MIN, _Z_MIN, z), theta_d / rs)
        u = self.fx * x * scale + self.cx
        v = self.fy * y * scale + self.cy
        return jnp.stack([u, v], axis=-1)

    def project(self, p_c):
        uv = self._project_raw(p_c)
        # fisheye sees forward hemisphere and beyond; gate on fov ~ pi*0.95
        x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
        theta = jnp.arctan2(jnp.sqrt(x * x + y * y), z)
        valid = (theta < jnp.pi * 0.49 * 2) & _in_bounds(uv, self.width, self.height)
        return uv, valid

    def project_jac(self, p_c):
        uv, valid = self.project(p_c)
        J = _autodiff_point_jac(self._project_raw, p_c)
        return uv, J, valid

    def backproject(self, uv, iters: int = 8):
        """Invert theta_d(theta) by fixed-count Newton (jit-safe)."""
        mx = (uv[..., 0] - self.cx) / self.fx
        my = (uv[..., 1] - self.cy) / self.fy
        theta_d = jnp.sqrt(mx * mx + my * my)

        def body(_, th):
            t2 = th * th
            f = th * (1 + t2 * (self.k1 + t2 * (self.k2 + t2 * (self.k3 + t2 * self.k4)))) - theta_d
            fp = 1 + t2 * (3 * self.k1 + t2 * (5 * self.k2 + t2 * (7 * self.k3 + t2 * 9 * self.k4)))
            return th - f / jnp.where(jnp.abs(fp) < _Z_MIN, _Z_MIN, fp)

        theta = jax.lax.fori_loop(0, iters, body, theta_d)
        rd = jnp.where(theta_d < _Z_MIN, 1.0, theta_d)
        s = jnp.sin(theta) / rd
        ray = jnp.stack(
            [jnp.where(theta_d < _Z_MIN, 0.0, s * mx), jnp.where(theta_d < _Z_MIN, 0.0, s * my), jnp.cos(theta)],
            axis=-1,
        )
        return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

    @property
    def focal(self):
        return 0.5 * (self.fx + self.fy)


@struct.dataclass
class Omni:
    """Unified-sphere (Mei) model: xi + radtan distortion (reference Omni)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    xi: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    width: int = struct.field(pytree_node=False, default=752)
    height: int = struct.field(pytree_node=False, default=480)

    def _project_raw(self, p_c):
        x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
        d = jnp.sqrt(x * x + y * y + z * z)
        denom = self.xi * d + z
        denom = jnp.where(jnp.abs(denom) < _Z_MIN, _Z_MIN, denom)
        mx, my = x / denom, y / denom
        # radtan
        r2 = mx * mx + my * my
        rad = 1 + self.k1 * r2 + self.k2 * r2 * r2
        dx = 2 * self.p1 * mx * my + self.p2 * (r2 + 2 * mx * mx)
        dy = self.p1 * (r2 + 2 * my * my) + 2 * self.p2 * mx * my
        u = self.fx * (mx * rad + dx) + self.cx
        v = self.fy * (my * rad + dy) + self.cy
        return jnp.stack([u, v], axis=-1)

    def project(self, p_c):
        uv = self._project_raw(p_c)
        x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
        d = jnp.sqrt(x * x + y * y + z * z)
        valid = (self.xi * d + z > _Z_MIN) & _in_bounds(uv, self.width, self.height)
        return uv, valid

    def project_jac(self, p_c):
        uv, valid = self.project(p_c)
        J = _autodiff_point_jac(self._project_raw, p_c)
        return uv, J, valid

    def backproject(self, uv):
        # undistort is approximated by fixed-point iteration on radtan
        mx = (uv[..., 0] - self.cx) / self.fx
        my = (uv[..., 1] - self.cy) / self.fy
        ux, uy = mx, my
        for _ in range(5):
            r2 = ux * ux + uy * uy
            rad = 1 + self.k1 * r2 + self.k2 * r2 * r2
            dx = 2 * self.p1 * ux * uy + self.p2 * (r2 + 2 * ux * ux)
            dy = self.p1 * (r2 + 2 * uy * uy) + 2 * self.p2 * ux * uy
            ux = (mx - dx) / rad
            uy = (my - dy) / rad
        r2 = ux * ux + uy * uy
        xi = self.xi
        mz = (xi + jnp.sqrt(jnp.maximum(1 + (1 - xi * xi) * r2, 0.0))) / (1 + r2) - xi
        ray = jnp.stack([ux, uy, mz + 0 * ux], axis=-1)
        # unified sphere: point on sphere = (s*ux, s*uy, s - xi) form
        s = (mz + xi)
        ray = jnp.stack([s * ux, s * uy, mz], axis=-1)
        return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

    @property
    def focal(self):
        return 0.5 * (self.fx + self.fy)


def _in_bounds(uv, width, height):
    u, v = uv[..., 0], uv[..., 1]
    return (u >= 0) & (u < width) & (v >= 0) & (v < height) & jnp.isfinite(u) & jnp.isfinite(v)


def _autodiff_point_jac(fn, p_c):
    """d fn / d p_c for a (...,3)->(...,2) projection via jacfwd on flat points."""
    flat = p_c.reshape(-1, 3)
    J = jax.vmap(jax.jacfwd(fn))(flat)
    return J.reshape(*p_c.shape[:-1], 2, 3)


# ---------------------------------------------------------------------------
# World chain: body pose + sensor extrinsics -> pixel + BA Jacobians
# ---------------------------------------------------------------------------


def world_to_cam(R_w_f, t_w_f, R_f_s, t_f_s, p_w):
    """Camera-frame coordinates of world points.

    T_w_f: body pose (world-from-frame); T_f_s: sensor extrinsics
    (frame-from-sensor, EuRoC's T_BS).  p_c = T_f_s^-1 T_w_f^-1 p_w.
    """
    R_s_f, t_s_f = geo.pose_inverse(R_f_s, t_f_s)
    p_f = jnp.einsum("...ji,...j->...i", R_w_f, p_w - t_w_f)
    return jnp.einsum("...ij,...j->...i", R_s_f, p_f) + t_s_f


def project_world_jac(model, R_w_f, t_w_f, R_f_s, t_f_s, p_w):
    """Project world point and return BA Jacobians.

    Returns uv (...,2), J_pose (...,2,6) wrt the body-pose retraction
    dx=[omega,nu] (geo.pose_retract), J_lmk (...,2,3) wrt p_w, valid.

    Chain (semantics of Camera.cpp:84-139 re-derived for our convention):
      p_f = R^T (p_w - t);  under retraction T'=(R Exp(w), t + R nu):
        d p_f / d omega = skew(p_f),   d p_f / d nu = -I,
        d p_f / d p_w   = R^T.
      p_c = R_sf p_f + t_sf  ->  chain with model Jacobian J_m = duv/dp_c.
    """
    R_s_f, t_s_f = geo.pose_inverse(R_f_s, t_f_s)
    p_f = jnp.einsum("...ji,...j->...i", R_w_f, p_w - t_w_f)
    p_c = jnp.einsum("...ij,...j->...i", R_s_f, p_f) + t_s_f
    uv, J_m, valid = model.project_jac(p_c)
    J_pc_pf = R_s_f  # (...,3,3)
    J_uv_pf = J_m @ J_pc_pf
    J_omega = J_uv_pf @ geo.skew(p_f)
    J_nu = -J_uv_pf
    J_pose = jnp.concatenate([J_omega, J_nu], axis=-1)
    Rt = jnp.swapaxes(R_w_f, -1, -2)
    J_lmk = J_uv_pf @ Rt
    return uv, J_pose, J_lmk, valid


def project_world(model, R_w_f, t_w_f, R_f_s, t_f_s, p_w):
    p_c = world_to_cam(R_w_f, t_w_f, R_f_s, t_f_s, p_w)
    return model.project(p_c)


def bearing_world(model, R_w_f, t_w_f, R_f_s, t_f_s, uv):
    """Pixel -> unit bearing ray in world frame (AFeature::computeBearingVectors)."""
    ray_c = model.backproject(uv)
    ray_f = jnp.einsum("...ij,...j->...i", R_f_s, ray_c)
    return jnp.einsum("...ij,...j->...i", R_w_f, ray_f)


def make_pinhole(fx, fy, cx, cy, width=752, height=480, dtype=jnp.float32):
    return Pinhole(
        fx=jnp.asarray(fx, dtype), fy=jnp.asarray(fy, dtype),
        cx=jnp.asarray(cx, dtype), cy=jnp.asarray(cy, dtype),
        width=width, height=height,
    )

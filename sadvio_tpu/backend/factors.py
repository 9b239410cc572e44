"""Residual library for the visual-inertial factor graph.

TPU-native re-design of the reference's Ceres cost functions
(reference: cpp/include/isaeslam/optimizers/residuals.hpp:10-717 and
BundleAdjustmentCERESAnalytic.h:41-195).  Each factor is a pure residual
function of the involved states; Jacobians are obtained either hand-derived
(reprojection hot path, models/cameras.project_world_jac) or by jacfwd over
the retraction at zero delta -- exact, and fused by XLA.

All residuals are returned *whitened* (multiplied by the factor's sqrt
information) so the solver can treat everything as unit-variance least
squares.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sadvio_tpu.models import cameras
from sadvio_tpu.models import imu as imu_mod
from sadvio_tpu.utils import geometry as geo


def huber_weight(r_norm, delta: float = 1.345):
    """IRLS weight of the Huber loss on a whitened residual norm.

    Reference uses HuberLoss(sqrt(1.345)) on reprojection factors
    (AOptimizer.cpp:104-107).
    """
    safe = jnp.maximum(r_norm, 1e-12)
    return jnp.minimum(1.0, delta / safe)


def reprojection_residual(model, R_w_f, t_w_f, R_f_s, t_f_s, p_w, uv_meas, sigma_px):
    """Whitened pixel reprojection residual + hand-derived Jacobians.

    Semantics of ReprojectionErrCeres_pointxd_dx
    (BundleAdjustmentCERESAnalytic.h:41-98) under our retraction.
    Returns r (...,2), J_pose (...,2,6), J_lmk (...,2,3), valid.
    """
    uv, J_pose, J_lmk, valid = cameras.project_world_jac(
        model, R_w_f, t_w_f, R_f_s, t_f_s, p_w
    )
    inv_s = 1.0 / sigma_px
    r = (uv_meas - uv) * inv_s
    # residual = (meas - h(x))/sigma  =>  J_r = -J_h / sigma
    return r, -J_pose * inv_s, -J_lmk * inv_s, valid


def reprojection_residual_numeric(
    model, R_w_f, t_w_f, R_f_s, t_f_s, p_w, uv_meas, sigma_px, eps=1e-3
):
    """Central-finite-difference reprojection linearization.

    Analog of the reference's numeric-diff fallback optimizer
    (BundleAdjustmentCERESNumeric.{h,cpp}): same residual as
    `reprojection_residual`, but J_pose/J_lmk come from central differences
    of the projection under the optimizer retraction (geo.pose_retract for
    the 6 pose dims, Euclidean steps for the 3 landmark dims) instead of the
    hand chain rule.  Exists as an autodiff-free correctness baseline; the
    analytic path is the hot path.  Returns r, J_pose, J_lmk, valid with the
    same shapes/conventions as `reprojection_residual`.
    """
    uv0, valid = cameras.project_world(model, R_w_f, t_w_f, R_f_s, t_f_s, p_w)
    inv_s = 1.0 / sigma_px
    r = (uv_meas - uv0) * inv_s

    def h_pose(dx):
        Rp, tp = geo.pose_retract(R_w_f, t_w_f, dx)
        uv, _ = cameras.project_world(model, Rp, tp, R_f_s, t_f_s, p_w)
        return uv

    def h_lmk(dp):
        uv, _ = cameras.project_world(model, R_w_f, t_w_f, R_f_s, t_f_s, p_w + dp)
        return uv

    batch = jnp.broadcast_shapes(
        R_w_f.shape[:-2], t_w_f.shape[:-1], p_w.shape[:-1]
    )
    dt_ = p_w.dtype

    def fd(h, n):
        cols = []
        for i in range(n):
            e = jnp.zeros(batch + (n,), dt_).at[..., i].set(eps)
            cols.append((h(e) - h(-e)) / (2.0 * eps))
        return jnp.stack(cols, axis=-1)  # (...,2,n)

    J_pose = fd(h_pose, 6)
    J_lmk = fd(h_lmk, 3)
    # residual = (meas - h(x))/sigma  =>  J_r = -J_h / sigma
    return r, -J_pose * inv_s, -J_lmk * inv_s, valid


def angular_residual(model, R_w_f, t_w_f, R_f_s, t_f_s, p_w, ray_meas, sigma):
    """Bearing-vector residual on the tangent plane of the observed ray.

    Semantics of the AngularAdjustmentCERESAnalytic residual
    (AngularAdjustmentCERESAnalytic.h:45-120): project the difference between
    predicted and observed unit bearings onto an orthonormal basis of the
    plane orthogonal to the observed ray.  Used for fisheye/omni rigs where
    pixel error is anisotropic.  ray_meas: (...,3) unit, in sensor frame.
    """
    p_c = cameras.world_to_cam(R_w_f, t_w_f, R_f_s, t_f_s, p_w)
    n = jnp.linalg.norm(p_c, axis=-1, keepdims=True)
    pred = p_c / jnp.maximum(n, 1e-9)
    # tangent basis of ray_meas
    a = jnp.where(
        jnp.abs(ray_meas[..., 0:1]) < 0.9,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], p_c.dtype), ray_meas.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], p_c.dtype), ray_meas.shape),
    )
    b1 = jnp.cross(ray_meas, a)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = jnp.cross(ray_meas, b1)
    diff = pred - ray_meas
    r = jnp.stack([jnp.sum(diff * b1, -1), jnp.sum(diff * b2, -1)], axis=-1) / sigma
    valid = n[..., 0] > 1e-6
    return r, valid


def _tangent_basis(ray):
    """Orthonormal (...,2,3) basis of the plane orthogonal to unit ray."""
    a = jnp.where(
        jnp.abs(ray[..., 0:1]) < 0.9,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], ray.dtype), ray.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], ray.dtype), ray.shape),
    )
    b1 = jnp.cross(ray, a)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-12)
    b2 = jnp.cross(ray, b1)
    return jnp.stack([b1, b2], axis=-2)


def angular_residual_jac(R_w_f, t_w_f, R_f_s, t_f_s, p_w, ray_meas, sigma):
    """Whitened bearing residual + hand Jacobians (angular BA hot path).

    Semantics of AngularAdjustmentCERESAnalytic.h:45-120: the difference
    between the predicted unit bearing and the observed ray, projected onto
    the observed ray's tangent basis.  Works for any camera model / FoV
    (the measurement is the backprojected ray, model-independent here).
    Returns r (...,2), J_pose (...,2,6), J_lmk (...,2,3), valid.
    """
    R_s_f, t_s_f = geo.pose_inverse(R_f_s, t_f_s)
    p_f = jnp.einsum("...ji,...j->...i", R_w_f, p_w - t_w_f)
    p_c = jnp.einsum("...ij,...j->...i", R_s_f, p_f) + t_s_f
    n = jnp.linalg.norm(p_c, axis=-1, keepdims=True)
    ns = jnp.maximum(n, 1e-9)
    pred = p_c / ns
    B = _tangent_basis(ray_meas)  # (...,2,3)
    inv_s = 1.0 / sigma
    r = jnp.einsum("...ab,...b->...a", B, ray_meas - pred) * inv_s
    # d pred / d p_c = (I - pred pred^T) / |p_c|
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p_c.dtype), B.shape[:-2] + (3, 3))
    P = (eye - pred[..., :, None] * pred[..., None, :]) / ns[..., None]
    J_pc = jnp.einsum("...ab,...bc->...ac", B, P)  # (...,2,3)
    J_pf = J_pc @ R_s_f
    J_omega = J_pf @ geo.skew(p_f)
    J_nu = -J_pf
    J_h = jnp.concatenate([J_omega, J_nu], axis=-1)
    Rt = jnp.swapaxes(R_w_f, -1, -2)
    J_lmk_h = J_pf @ Rt
    valid = n[..., 0] > 1e-6
    # residual = (meas - h)/sigma  =>  J_r = -J_h / sigma
    return r, -J_h * inv_s, -J_lmk_h * inv_s, valid


def imu_factor_residual(pre, W, R_i, p_i, v_i, ba_i, bg_i, R_j, p_j, v_j, g=None):
    """Whitened 9-dof preintegration residual (residuals.hpp IMUFactor:133-245)."""
    r = imu_mod.residual(pre, R_i, p_i, v_i, ba_i, bg_i, R_j, p_j, v_j, g)
    return W @ r


def bias_rw_residual(ba_i, bg_i, ba_j, bg_j, dt, acc_walk, gyr_walk):
    """Bias random-walk residual (residuals.hpp IMUBiasFactor:247-300)."""
    sdt = jnp.sqrt(jnp.maximum(dt, 1e-6))
    ra = (ba_j - ba_i) / (acc_walk * sdt)
    rg = (bg_j - bg_i) / (gyr_walk * sdt)
    return jnp.concatenate([ra, rg])


def pose_prior_residual(R, t, R0, t0, sqrt_info):
    """6-dof pose prior on the retraction (residuals.hpp PosePriordx:601-633)."""
    dx = geo.pose_local(R0, t0, R, t)
    return sqrt_info @ dx


def state_prior_residual(R, t, v, ba, bg, R0, t0, v0, ba0, bg0, sqrt_info15):
    """15-dof VIO state prior (residuals.hpp IMUPriordx:634-700)."""
    dx = geo.pose_local(R0, t0, R, t)
    r = jnp.concatenate([dx, v - v0, ba - ba0, bg - bg0])
    return sqrt_info15 @ r


def lmk_prior_residual(p, p0, sqrt_info):
    """Absolute landmark prior (residuals.hpp Landmark3DPrior:506-527)."""
    return sqrt_info @ (p - p0)


def lmk_lmk_residual(p_a, p_b, d_ab, sqrt_info):
    """Relative landmark-landmark factor (LandmarkToLandmarkFactor:528-560)."""
    return sqrt_info @ ((p_a - p_b) - d_ab)


def pose_lmk_residual(R, t, p_w, p_f0, sqrt_info):
    """Landmark prior in frame coordinates (PoseToLandmarkFactor:561-600).

    p_f0 is the landmark's position expressed in the keyframe at
    linearization: r = W (R^T (p_w - t) - p_f0).
    """
    p_f = jnp.einsum("...ji,...j->...i", R, p_w - t)
    return sqrt_info @ (p_f - p_f0)


def relative_pose_residual(R_i, t_i, R_j, t_j, dx_meas, sqrt_info):
    """Relative 6-dof pose factor (residuals.hpp Relative6DPose:70-132).

    dx_meas is the expected retraction from frame i to frame j:
    r = W (local(T_i^-1 T_j) - dx_meas) on our SO3xR3 chart.
    """
    Ri_inv, ti_inv = geo.pose_inverse(R_i, t_i)
    Rij, tij = geo.pose_compose(Ri_inv, ti_inv, R_j, t_j)
    dx = jnp.concatenate([geo.so3_log(Rij), tij], axis=-1)
    return sqrt_info @ (dx - dx_meas)


def scale_prior_residual(log_scale, log_scale0, weight):
    """Scale prior for monocular VI init (residuals.hpp scalePrior:702-717)."""
    return weight * (log_scale - log_scale0)


def motion2d_residual(R_i, t_i, R_j, t_j, motion_2d, dt, sqrt_info):
    """Planar (UGV) odometry prior (residuals.hpp Motion2DFactor:10-69).

    motion_2d = (v_x, omega_z): over dt the body is expected to advance
    dx = v_x*dt along its own x axis while yawing dtheta = omega_z*dt,
    staying in plane.  r = W * local(T_i . T_delta, T_j) on our SO3xR3
    chart (the reference whitens the same constraint on its se3 vec chart).
    """
    dtype = R_i.dtype
    dx = motion_2d[..., 0] * dt
    dth = motion_2d[..., 1] * dt
    c, s = jnp.cos(dth), jnp.sin(dth)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    Rd = jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    ).astype(dtype)
    td = jnp.stack([dx, zero, zero], axis=-1).astype(dtype)
    Rp, tp = geo.pose_compose(R_i, t_i, Rd, td)
    return jnp.einsum("...ab,...b->...a", sqrt_info, geo.pose_local(Rp, tp, R_j, t_j))

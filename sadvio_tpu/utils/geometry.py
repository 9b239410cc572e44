"""SO(3)/SE(3) Lie-group math for the TPU-native VIO engine.

Pure-JAX, broadcast-capable re-design of the reference geometry utilities
(reference: cpp/include/utilities/geometry.h:17-346).  All functions accept
arbitrary leading batch dimensions and are jit/vmap/grad-safe: no data-dependent
branching, singularities handled with Taylor switches via `jnp.where` on safe
operands.

Conventions (differ from the reference on purpose -- documented once here and
verified by finite differences in tests/test_geometry.py):

* Poses are world-from-body: ``T_w_f = (R, t)`` with ``x_w = R @ x_f + t``.
* The optimization perturbation is the *decoupled right* (body-frame) delta
  ``dx = [omega, nu] in R^6``:  ``T' = (R @ Exp(omega), t + R @ nu)``.
  This is the SO(3)xR^3 retraction used by Forster-style preintegration and
  gives clean analytic Jacobians for both reprojection and IMU factors.
* se3 vectors are ordered rotation-first ``[w, v]`` like the reference's
  parameter blocks (cpp/include/isaeslam/optimizers/parametersBlock.hpp:8-46).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix, batched. w: (...,3) -> (...,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def _theta_split(theta2):
    """(small, theta_safe): JVP-safe angle from squared angle.

    ``sqrt`` has an infinite derivative at 0, and NaN tangents leak through
    ``jnp.where`` branches under jacfwd/jacrev.  All trig coefficients must
    therefore be evaluated on ``theta_safe`` (clamped operand, finite
    derivative everywhere) and small-angle branches must be polynomials in
    ``theta2`` (smooth), never in ``theta``.
    """
    small = theta2 < _EPS
    theta_safe = jnp.sqrt(jnp.where(small, 1.0, theta2))
    return small, theta_safe


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (...,3) axis-angle -> (...,3,3) rotation.

    Semantics of reference geometry.h exp_so3 (geometry.h:131-150), re-derived.
    JVP-safe at w = 0 exactly (see _theta_split).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small, theta = _theta_split(theta2)
    W = skew(w)
    W2 = W @ W
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)[..., None, None]
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues: (...,3,3) -> (...,3) axis-angle.

    Robust for angles in [0, pi); near-pi handled with the trace formula plus
    a diagonal extraction fallback.
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    # vee of skew-symmetric part: v = 2 sin(theta) * axis
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    vn2 = jnp.sum(v * v, axis=-1)  # = 4 sin^2(theta)
    # JVP-safe theta: atan2 on guarded operands (arccos'(+-1) is infinite,
    # and NaN tangents would leak through both where-branches via theta)
    small = vn2 < _EPS  # theta near 0 *or* near pi
    vn = jnp.sqrt(jnp.where(small, 1.0, vn2))
    theta = jnp.arctan2(0.5 * vn, cos_t)
    # generic: theta / (2 sin theta) * v = (theta / vn) * v
    generic = (theta / vn)[..., None] * v
    # theta ~ 0: polynomial in vn2 only (theta^2 ~ vn2/4)
    taylor = 0.5 * (1.0 + vn2 / 24.0)[..., None] * v
    near_pi = cos_t < -0.999995
    # near pi: w = theta * axis, axis from largest diagonal of (R + I)/2;
    # theta = pi - arcsin(|v|/2)
    theta_pi = jnp.pi - jnp.arcsin(jnp.clip(0.5 * jnp.sqrt(jnp.maximum(vn2, 1e-20)), 0.0, 1.0))
    B = (R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)) * 0.5
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(B, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = col / jnp.linalg.norm(col, axis=-1, keepdims=True).clip(_EPS)
    # fix sign using v (v = 2 sin(theta) axis >= 0 component alignment)
    sign = jnp.where(jnp.sum(axis * v, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    pi_branch = theta_pi[..., None] * axis * sign
    out = jnp.where(small[..., None], taylor, generic)
    return jnp.where(near_pi[..., None], pi_branch, out)


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3) (geometry.h so3_leftJacobian semantics)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small, theta = _theta_split(theta2)
    W = skew(w)
    W2 = W @ W
    safe_t2 = jnp.where(small, 1.0, theta2)
    safe_t3 = safe_t2 * theta
    a_raw = (1.0 - jnp.cos(theta)) / safe_t2
    a = jnp.where(small, 0.5 - theta2 / 24.0, a_raw)[..., None, None]
    b_raw = (theta - jnp.sin(theta)) / safe_t3
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, b_raw)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def so3_right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian J_r(w) = J_l(-w)."""
    return so3_left_jacobian(-w)


def so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)
    small, theta = _theta_split(theta2)
    W = skew(w)
    W2 = W @ W
    half = 0.5 * theta
    # coefficient c = (1 - (theta/2) cot(theta/2)) / theta^2  -> classic form
    safe_t2 = jnp.where(small, 1.0, theta2)
    cot = half / jnp.tan(half)
    c_raw = (1.0 - cot) / safe_t2
    c = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, c_raw)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + c * W2


def so3_right_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    return so3_left_jacobian_inv(-w)


# ---------------------------------------------------------------------------
# SE(3) as (R, t) pairs -- world-from-body poses
# ---------------------------------------------------------------------------


def pose_identity(batch_shape=(), dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return R, t


def pose_compose(Ra, ta, Rb, tb):
    """(Ra,ta) o (Rb,tb): first apply b, then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def pose_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def pose_apply(R, t, p):
    """Apply pose to points. p: (...,3)."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def so3_orthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """One Newton step toward the orthogonal polar factor: R(3I - R^T R)/2.

    Quadratic convergence: an f32 rounding defect of 1e-7 drops below f32
    resolution.  MUST be applied wherever rotations re-enter persistent
    state: a *symmetric* defect E in R scales projected geometry like a
    depth bias, and feedback loops of the form R @ R^T (e.g. constant-
    velocity prediction composed with a relative pose extracted from the
    same R) amplify it by exactly 2x per pass -- empirically the drift
    doubled per frame until the pose estimator diverged.
    """
    RtR = jnp.swapaxes(R, -1, -2) @ R
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    return R @ (1.5 * eye - 0.5 * RtR)


def pose_retract(R, t, dx):
    """Decoupled right retraction: dx = [omega, nu] (body frame).

    T' = (R Exp(omega), t + R nu).  This is the optimizer update used by all
    factors in sadvio_tpu.backend.factors.  The result is re-orthonormalized
    (see so3_orthonormalize) so iterated retraction cannot walk off SO(3).
    """
    omega, nu = dx[..., :3], dx[..., 3:6]
    Rn = so3_orthonormalize(R @ so3_exp(omega))
    return Rn, t + jnp.einsum("...ij,...j->...i", R, nu)


def pose_local(Ra, ta, Rb, tb):
    """Inverse of retraction: dx s.t. retract((Ra,ta), dx) == (Rb,tb)."""
    omega = so3_log(jnp.swapaxes(Ra, -1, -2) @ Rb)
    nu = jnp.einsum("...ji,...j->...i", Ra, tb - ta)
    return jnp.concatenate([omega, nu], axis=-1)


def se3_exp(xi: jnp.ndarray):
    """Full SE(3) exponential. xi = [w, v] -> (R, t) with t = J_l(w) v."""
    w, v = xi[..., :3], xi[..., 3:6]
    R = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(w), v)
    return R, t


def se3_log(R, t):
    w = so3_log(R)
    v = jnp.einsum("...ij,...j->...i", so3_left_jacobian_inv(w), t)
    return jnp.concatenate([w, v], axis=-1)


def pose_to_matrix(R, t):
    """(...,3,3),(...,3) -> (...,4,4) homogeneous."""
    batch = R.shape[:-2]
    M = jnp.zeros((*batch, 4, 4), dtype=R.dtype)
    M = M.at[..., :3, :3].set(R)
    M = M.at[..., :3, 3].set(t)
    M = M.at[..., 3, 3].set(1.0)
    return M


def matrix_to_pose(M):
    return M[..., :3, :3], M[..., :3, 3]


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w,x,y,z) -> rotation matrix, batched."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w,x,y,z); branch-free Shepperd variant."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, pick numerically best
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], -1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5
    c0 = jnp.stack([qw[..., 0], (m21 - m12) / (4 * qw[..., 0]), (m02 - m20) / (4 * qw[..., 0]), (m10 - m01) / (4 * qw[..., 0])], -1)
    c1 = jnp.stack([(m21 - m12) / (4 * qw[..., 1]), qw[..., 1], (m01 + m10) / (4 * qw[..., 1]), (m02 + m20) / (4 * qw[..., 1])], -1)
    c2 = jnp.stack([(m02 - m20) / (4 * qw[..., 2]), (m01 + m10) / (4 * qw[..., 2]), qw[..., 2], (m12 + m21) / (4 * qw[..., 2])], -1)
    c3 = jnp.stack([(m10 - m01) / (4 * qw[..., 3]), (m02 + m20) / (4 * qw[..., 3]), (m12 + m21) / (4 * qw[..., 3]), qw[..., 3]], -1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    scores = jnp.stack([tr, m00, m11, m22], -1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def barycentric_coords(p, a, b, c):
    """2D barycentric coordinates of p in triangle (a,b,c); all (...,2).

    Semantics of the reference's point-in-triangle helper (geometry.h:262-300).
    Returns (u, v, w) with u+v+w=1; inside iff all >= 0.
    """
    v0 = b - a
    v1 = c - a
    v2 = p - a
    d00 = jnp.sum(v0 * v0, -1)
    d01 = jnp.sum(v0 * v1, -1)
    d11 = jnp.sum(v1 * v1, -1)
    d20 = jnp.sum(v2 * v0, -1)
    d21 = jnp.sum(v2 * v1, -1)
    denom = d00 * d11 - d01 * d01
    denom = jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
    v = (d11 * d20 - d01 * d21) / denom
    w = (d00 * d21 - d01 * d20) / denom
    u = 1.0 - v - w
    return u, v, w


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) inverse of batched 3x3 matrices.

    ~100x faster than jnp.linalg.inv on TPU for large batches (LU with
    pivoting lowers to sequential scalar code; this is pure VPU math).
    Used for the per-landmark Schur blocks, which are damped SPD by
    construction (det > 0).
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    det = jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    adj = jnp.stack([
        jnp.stack([A00, A01, A02], -1),
        jnp.stack([A10, A11, A12], -1),
        jnp.stack([A20, A21, A22], -1),
    ], -2)
    return adj / det[..., None, None]

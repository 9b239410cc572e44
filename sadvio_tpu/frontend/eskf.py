"""Error-state Kalman frame-rate pose update.

TPU-native re-design of the reference ESKF estimator
(reference: cpp/src/estimator/ESKFEstimator.cpp -- IMU velocity/translation/
rotation updates:113-151, then *sequential* per-landmark reprojection EKF
updates on the se3 error state:159-178, covariance returned as _dT_cov).

Difference on purpose: the reference's sequential scalar EKF updates are a
loop over landmarks; here the same posterior is computed in *information
form* -- one batched linearization over all landmark observations plus the
IMU prior, solved as a 6x6 system, iterated a fixed small number of times
(IEKF).  For linear-Gaussian measurements sequential EKF and one batch
update are algebraically identical; the iteration recovers the nonlinear
refinement the reference gets from processing measurements one by one.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sadvio_tpu.models import cameras
from sadvio_tpu.utils import geometry as geo


@partial(jax.jit, static_argnames=("iters",))
def eskf_update(model, R_f_s, t_f_s, R_prior, t_prior, P_prior,
                lmk_w, uv, valid, sigma_px=1.0, *, iters: int = 2,
                gate_px: float = 3.0):
    """Fuse a pose prior (IMU/motion prediction + 6x6 covariance) with
    landmark reprojections.

    Returns (R, t, P_post, n_used).  P ordering matches the retraction
    dx = [omega, nu] (body frame).
    """
    P_inv = jnp.linalg.inv(P_prior + jnp.eye(6, dtype=P_prior.dtype) * 1e-12)
    inv_r2 = 1.0 / (sigma_px * sigma_px)

    def body(carry, _):
        R, t = carry
        uv_hat, J_pose, _, vis = cameras.project_world_jac(
            model, R, t, R_f_s, t_f_s, lmk_w
        )
        r = uv - uv_hat
        rn = jnp.linalg.norm(r, axis=-1)
        w = (valid & vis & (rn < gate_px)).astype(r.dtype) * inv_r2
        H = jnp.einsum("nai,naj->ij", w[:, None, None] * J_pose, J_pose)
        b = jnp.einsum("nai,na->i", w[:, None, None] * J_pose, r)
        # prior anchors the error state at the prediction: r_prior = local
        # delta from (R_prior, t_prior) to the current linearization point
        dx_prior = geo.pose_local(R_prior, t_prior, R, t)
        A = P_inv + H
        rhs = b - P_inv @ dx_prior
        dx = jnp.linalg.solve(A, rhs)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)
        Rn, tn = geo.pose_retract(R, t, dx)
        return (Rn, tn), w

    (R, t), ws = jax.lax.scan(body, (R_prior, t_prior), None, length=iters)
    # posterior covariance at the final linearization
    _, J_pose, _, vis = cameras.project_world_jac(model, R, t, R_f_s, t_f_s, lmk_w)
    uv_hat, _ = cameras.project_world(model, R, t, R_f_s, t_f_s, lmk_w)
    rn = jnp.linalg.norm(uv - uv_hat, axis=-1)
    w = (valid & vis & (rn < gate_px)).astype(uv.dtype) * inv_r2
    H = jnp.einsum("nai,naj->ij", w[:, None, None] * J_pose, J_pose)
    P_post = jnp.linalg.inv(P_inv + H)
    return R, t, P_post, jnp.sum(w > 0)


def imu_prior_covariance(pre_cov, dT_cov_floor=1e-6):
    """6x6 pose prior covariance from the 9x9 preintegration covariance.

    Extracts the (dphi, dp) blocks (ESKFEstimator uses the propagated IMU
    uncertainty as the prediction covariance, ESKFEstimator.cpp:113-151).
    """
    P = jnp.zeros((6, 6), pre_cov.dtype)
    P = P.at[:3, :3].set(pre_cov[0:3, 0:3])
    P = P.at[:3, 3:].set(pre_cov[0:3, 6:9])
    P = P.at[3:, :3].set(pre_cov[6:9, 0:3])
    P = P.at[3:, 3:].set(pre_cov[6:9, 6:9])
    return P + jnp.eye(6, dtype=pre_cov.dtype) * dT_cov_floor

"""Non-overlapping field-of-view stereo: metric scale from rigidity.

TPU-native re-design of the reference's nofov machinery
(reference: cpp/src/slamNonOverlappingFov.cpp -- scaleEstimationRANSAC:423,
isDegenerativeMotion:634, dual-camera outlierRemoval:355; paper: ASTRA 2023).

Two rigidly-mounted cameras look in opposite directions (no shared FoV).
Each camera's epipolar geometry observes body motion up to its own scale;
the rigid extrinsic lever arm couples them and makes metric scale
observable -- except for degenerate motions (pure translation, or rotation
whose axis passes through the second camera's lever).

The 1-point scheme is closed-form per feature and therefore fully batchable:
with body motion (R_b, s * d) (d a unit direction from camera-0's essential
matrix), camera-1's relative translation is affine in s,
    t_1(s) = a + s b,   a = R_s1^T (R_b - I) t_s1,  b = R_s1^T d
and the epipolar constraint of each cam-1 correspondence
    t_1(s) . m_i = 0,   m_i = (R_1 rk_i) x rc_i
gives one scale hypothesis s_i = -(a.m_i)/(b.m_i).  Voting is one masked
(N x N) reduction (replaces the reference's sequential RANSAC loop).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sadvio_tpu.utils import geometry as geo


def cam1_motion_terms(R_b, d_unit, R_f_s1, t_f_s1):
    """(R_1, a, b): camera-1 relative rotation and affine translation terms."""
    R_s1 = R_f_s1
    R_1 = R_s1.T @ R_b @ R_s1
    a = R_s1.T @ ((R_b - jnp.eye(3, dtype=R_b.dtype)) @ t_f_s1)
    b = R_s1.T @ d_unit
    return R_1, a, b


@partial(jax.jit, static_argnames=())
def scale_ransac(R_b, d_unit, R_f_s1, t_f_s1, rays1_kf, rays1_cur, valid,
                 inlier_angle_deg=0.5, min_inliers=8):
    """1-point RANSAC metric scale (scaleEstimationRANSAC semantics).

    R_b: body rotation between keyframe and current; d_unit: unit body
    translation direction (from cam0 essential); rays1_*: cam-1 bearing rays
    (N,3) at the keyframe / current frame.  Returns (s, inliers, ok).
    """
    R_1, a, b = cam1_motion_terms(R_b, d_unit, R_f_s1, t_f_s1)
    # T_rel maps cur-cam1 coords into kf-cam1 coords (x_kf = R_1 x_cur + t_1):
    # coplanarity of rk, t_1, R_1 rc gives t_1 . ((R_1 rc) x rk) = 0
    m = jnp.cross(jnp.einsum("ij,nj->ni", R_1, rays1_cur), rays1_kf)  # (N,3)
    am = m @ a
    bm = m @ b
    # per-feature closed-form hypothesis
    s_hyp = -am / jnp.where(jnp.abs(bm) < 1e-9, 1e-9, bm)
    hyp_ok = valid & (jnp.abs(bm) > 1e-6) & jnp.isfinite(s_hyp)

    def vote(s):
        t1 = a + s * b
        err = _epi_angle(R_1, t1, rays1_kf, rays1_cur)
        return jnp.sum(valid & (err < jnp.deg2rad(inlier_angle_deg)))

    votes = jax.vmap(vote)(s_hyp) * hyp_ok
    best = jnp.argmax(votes)
    s0 = s_hyp[best]
    # refine: weighted least squares over inliers of the winning hypothesis
    t1 = a + s0 * b
    err = _epi_angle(R_1, t1, rays1_kf, rays1_cur)
    inl = valid & (err < jnp.deg2rad(inlier_angle_deg))
    w = inl.astype(s_hyp.dtype)
    # minimize sum w ((a + s b) . m_hat)^2 with m_hat = m / |m|
    mn = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-9)
    am_n = mn @ a
    bm_n = mn @ b
    denom = jnp.sum(w * bm_n * bm_n)
    s = -jnp.sum(w * am_n * bm_n) / jnp.where(denom < 1e-12, 1e-12, denom)
    ok = (votes[best] >= min_inliers) & jnp.isfinite(s)
    return s, inl, ok


@partial(jax.jit, static_argnames=("n_grid",))
def scale_grid(R_b, d_unit, R_f_s1, t_f_s1, rays1_kf, rays1_cur, valid,
               s_lo, s_hi, *, n_grid: int = 512, huber_deg: float = 0.3,
               min_inliers: int = 8, inlier_angle_deg: float = 0.5):
    """Robust grid M-estimator of the metric scale.

    The closed-form 1-point least squares (scale_ransac) regresses on the
    noisy coefficient b.m and suffers errors-in-variables attenuation (the
    estimate shrinks toward zero) once ray noise is comparable to the
    lever-arm signal.  Minimizing the robust epipolar *angular* error over a
    dense log grid of s (batched, one vmap -- TPU-friendly) is consistent:
    noise enters the cost additively instead of multiplying the regressor.
    Both signs of s are scanned.  Returns (s, inliers, ok).
    """
    R_1, a, b = cam1_motion_terms(R_b, d_unit, R_f_s1, t_f_s1)
    half = n_grid // 2
    grid = jnp.geomspace(jnp.maximum(s_lo, 1e-6), jnp.maximum(s_hi, 1e-5), half)
    s_grid = jnp.concatenate([grid, -grid])
    hub = jnp.deg2rad(huber_deg)

    def cost(s):
        err = _epi_angle(R_1, a + s * b, rays1_kf, rays1_cur)
        rho = jnp.where(err < hub, err * err, 2 * hub * err - hub * hub)
        return jnp.sum(jnp.where(valid, rho, 0.0))

    costs = jax.vmap(cost)(s_grid)
    i = jnp.argmin(costs)
    s = s_grid[i]
    # parabolic refinement on the local triple (log-spaced grid: refine in
    # the raw s coordinate of the neighbours)
    im = jnp.clip(i - 1, 0, n_grid - 1)
    ip = jnp.clip(i + 1, 0, n_grid - 1)
    x0, x1, x2 = s_grid[im], s_grid[i], s_grid[ip]
    c0, c1, c2 = costs[im], costs[i], costs[ip]
    denom = (x0 - x1) * (x0 - x2) * (x1 - x2)
    A = (x2 * (c1 - c0) + x1 * (c0 - c2) + x0 * (c2 - c1)) / jnp.where(
        jnp.abs(denom) < 1e-18, 1e-18, denom)
    B = (x2 * x2 * (c0 - c1) + x1 * x1 * (c2 - c0) + x0 * x0 * (c1 - c2)
         ) / jnp.where(jnp.abs(denom) < 1e-18, 1e-18, denom)
    s_par = -B / jnp.where(jnp.abs(A) < 1e-18, 1e-18, 2 * A)
    same_bracket = (s_par > jnp.minimum(x0, x2)) & (s_par < jnp.maximum(x0, x2))
    # refine only inside one monotone half of the grid: the +s and -s halves
    # are concatenated, so a triple spanning the seam (or a clipped endpoint
    # duplicating x1) fits a meaningless parabola
    same_half = (im // half == i // half) & (ip // half == i // half) \
        & (im != i) & (ip != i)
    s = jnp.where((A > 0) & same_bracket & same_half, s_par, s)

    err = _epi_angle(R_1, a + s * b, rays1_kf, rays1_cur)
    inl = valid & (err < jnp.deg2rad(inlier_angle_deg))
    ok = (jnp.sum(inl) >= min_inliers) & jnp.isfinite(s)
    return s, inl, ok


def _epi_angle(R_1, t1, rays_kf, rays_cur):
    """Angular distance of the kf ray from the epipolar plane (kf frame)."""
    n = jnp.cross(jnp.broadcast_to(t1, rays_cur.shape),
                  jnp.einsum("ij,nj->ni", R_1, rays_cur))
    nn = jnp.maximum(jnp.linalg.norm(n, axis=-1), 1e-9)
    s = jnp.abs(jnp.sum(n * rays_kf, axis=-1)) / nn
    return jnp.arcsin(jnp.clip(s, 0.0, 1.0))


def is_degenerate_motion(R_b, d_unit, R_f_s1, t_f_s1, min_lever=1e-3,
                         min_angle_deg=3.0):
    """Scale-observability gate (isDegenerativeMotion:634 semantics).

    Scale is unobservable when the rotation-induced lever displacement
    a = R_s1^T (R_b - I) t_s1 is (near) zero -- pure translation, identity
    rotation, or rotation axis through the camera-1 lever -- or when a is
    (anti)parallel to b (the two translation components are
    indistinguishable).
    """
    _, a, b = cam1_motion_terms(R_b, d_unit, R_f_s1, t_f_s1)
    na = jnp.linalg.norm(a)
    lever_ok = na > min_lever
    cosab = jnp.abs(jnp.dot(a, b)) / jnp.maximum(na * jnp.linalg.norm(b), 1e-12)
    angle_ok = cosab < jnp.cos(jnp.deg2rad(min_angle_deg))
    return ~(lever_ok & angle_ok)

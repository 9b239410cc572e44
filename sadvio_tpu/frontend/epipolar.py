"""Epipolar geometry: angular filtering + batched essential-matrix RANSAC.

TPU-native re-design of the reference's epipolar tools
(reference: cpp/src/slamCore.cpp:224-251 epipolarFiltering with a 0.5 deg
angular gate; cpp/src/estimator/EpipolarPoseEstimator.cpp:66-130
cv::findEssentialMat RANSAC on normalized rays with a >=5px flow gate;
EpipolarPoseEstimatorCustom.cpp:175-240 hand-rolled 8-point + essential-space
projection).

The 8-point solve, essential projection, decomposition and cheirality test
are all batched over hypotheses with vmap -- fixed iteration count replaces
the data-dependent RANSAC loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sadvio_tpu.utils import geometry as geo


def epipolar_angular_error(R_ab, t_ab, rays_a, rays_b):
    """Angular distance (rad) of ray_b from the epipolar plane of ray_a.

    T_ab maps coordinates of frame b into frame a (pose of b in a).
    Plane normal n = t_ab x (R_ab r_b); error = |asin(n_hat . r_a)|.
    """
    rb_in_a = jnp.einsum("ij,...j->...i", R_ab, rays_b)
    n = jnp.cross(jnp.broadcast_to(t_ab, rb_in_a.shape), rb_in_a)
    nn = jnp.linalg.norm(n, axis=-1)
    n_hat = n / jnp.maximum(nn, 1e-9)[..., None]
    s = jnp.abs(jnp.sum(n_hat * rays_a, axis=-1))
    return jnp.arcsin(jnp.clip(s, 0.0, 1.0))


def epipolar_filter(R_ab, t_ab, rays_a, rays_b, valid, max_angle_deg=0.5):
    """Outlier gate at a fixed angular threshold (slamCore.cpp:224-251)."""
    err = epipolar_angular_error(R_ab, t_ab, rays_a, rays_b)
    # degenerate when translation ~ 0: keep everything (plane undefined)
    tiny_t = jnp.linalg.norm(t_ab) < 1e-6
    return valid & (tiny_t | (err < jnp.deg2rad(max_angle_deg)))


def _eight_point(rays_a, rays_b, w):
    """Weighted 8-point essential estimate from unit rays. (N,3)x2, w (N,)."""
    # constraint: rb^T E ra = 0; build A (N,9) with kron(ra, rb)
    A = (rays_a[:, None, :] * rays_b[:, :, None]).reshape(-1, 9)  # rows: rb_i ra_j
    A = A * w[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[-1].reshape(3, 3)
    # project to essential space: singular values (1,1,0)
    U, S, Vt2 = jnp.linalg.svd(E)
    E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0])) @ Vt2
    return E


def _sampson(E, rays_a, rays_b):
    Ex = jnp.einsum("ij,nj->ni", E, rays_a)
    Etx = jnp.einsum("ji,nj->ni", E, rays_b)
    num = jnp.sum(rays_b * Ex, axis=-1) ** 2
    den = Ex[:, 0] ** 2 + Ex[:, 1] ** 2 + Etx[:, 0] ** 2 + Etx[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def decompose_essential(E, rays_a, rays_b, valid):
    """Pick (R, t) among the 4 decompositions by cheirality voting.

    The 8-point system here solves ``rb^T E ra = 0``; for the classic
    decomposition convention (x2^T E x1 = 0 with x2 = R x1 + t) that makes
    the decomposed pair the *b-from-a* transform: x_b = R_ba x_a + t_ba.
    Cheirality is voted in that frame, then the result is inverted so the
    return value is T_ab = (R, t) with |t| = 1 mapping b-frame coords into
    a-frame -- the relative-motion convention of EpipolarPoseEstimator
    (recoverPose, EpipolarPoseEstimator.cpp:66-130).
    """
    U, _, Vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    U = U * jnp.where(d < 0, -1.0, 1.0)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]

    def count_cheirality(R_ba, t_ba):
        # express everything in frame a: cam a at origin with rays ra; cam b
        # center o2 = -R_ba^T t_ba, ray directions R_ba^T rb
        o2 = -R_ba.T @ t_ba
        d2 = jnp.einsum("ji,nj->ni", R_ba, rays_b)
        d1 = rays_a
        m00 = jnp.sum(d1 * d1, -1)
        m01 = -jnp.sum(d1 * d2, -1)
        m11 = jnp.sum(d2 * d2, -1)
        q0 = jnp.sum(d1 * o2, -1)
        q1 = -jnp.sum(d2 * o2, -1)
        det = m00 * m11 - m01 * m01
        z1 = (m11 * q0 - m01 * q1) / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        z2 = (m00 * q1 - m01 * q0) / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        return jnp.sum((z1 > 0) & (z2 > 0) & valid)

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    votes = jnp.stack([count_cheirality(R, tt) for R, tt in cands])
    best = jnp.argmax(votes)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    R_ba, t_ba = Rs[best], ts[best]
    R_ab = R_ba.T
    t_ab = -R_ba.T @ t_ba
    return R_ab, t_ab, votes[best]


@partial(jax.jit, static_argnames=("n_hyp",))
def essential_ransac(rays_a, rays_b, valid, key, *, n_hyp: int = 64,
                     thresh: float = 1e-5, min_inliers: int = 15):
    """Batched-hypothesis essential RANSAC on bearing rays.

    Returns (R, t_unit, inliers, ok): T_ab relative pose up to scale.
    Replaces cv::findEssentialMat + recoverPose (EpipolarPoseEstimator.cpp).
    """
    N = rays_a.shape[0]
    keys = jax.random.split(key, n_hyp)

    def hyp(k):
        idx = jax.random.randint(k, (8,), 0, N)
        w = jnp.zeros((N,)).at[idx].set(1.0) * valid
        E = _eight_point(rays_a, rays_b, w)
        err = _sampson(E, rays_a, rays_b)
        inl = valid & (err < thresh)
        return E, jnp.sum(inl)

    Es, scores = jax.vmap(hyp)(keys)
    best = jnp.argmax(scores)
    E = Es[best]
    # re-estimate on inliers (one refit pass)
    err = _sampson(E, rays_a, rays_b)
    inl = valid & (err < thresh)
    E = _eight_point(rays_a, rays_b, inl.astype(rays_a.dtype))
    err = _sampson(E, rays_a, rays_b)
    inl = valid & (err < thresh)
    R, t, votes = decompose_essential(E, rays_a, rays_b, inl)
    ok = (jnp.sum(inl) >= min_inliers) & (votes >= jnp.sum(inl) * 0.7)
    return R, t, inl, ok

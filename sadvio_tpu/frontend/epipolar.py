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


# ---------------------------------------------------------------------------
# homography path (planar / low-parallax fallback)
# ---------------------------------------------------------------------------


def _homography_dlt(rays_a, rays_b, w):
    """Weighted DLT on normalized coordinates x = ray/ray_z. (N,3)x2 -> (3,3).

    Semantics of the cv::findHomography call in the reference's fallback
    helper (EpipolarPoseEstimator.cpp:8-21), batched and mask-weighted.
    """
    xa = rays_a / jnp.maximum(rays_a[:, 2:3], 1e-9)
    xb = rays_b / jnp.maximum(rays_b[:, 2:3], 1e-9)
    x, y = xa[:, 0], xa[:, 1]
    u, v = xb[:, 0], xb[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], -1)
    r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)  # (2N,9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    H = vt[-1].reshape(3, 3)
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-9, 1e-9, H[2, 2])


def _transfer_error(H, rays_a, rays_b):
    """Symmetric squared transfer error in normalized coordinates."""
    xa = rays_a / jnp.maximum(rays_a[:, 2:3], 1e-9)
    xb = rays_b / jnp.maximum(rays_b[:, 2:3], 1e-9)
    fb = xa @ H.T
    fb = fb / jnp.where(jnp.abs(fb[:, 2:3]) < 1e-9, 1e-9, fb[:, 2:3])
    Hi = jnp.linalg.inv(H)
    fa = xb @ Hi.T
    fa = fa / jnp.where(jnp.abs(fa[:, 2:3]) < 1e-9, 1e-9, fa[:, 2:3])
    return (jnp.sum((fb[:, :2] - xb[:, :2]) ** 2, -1)
            + jnp.sum((fa[:, :2] - xa[:, :2]) ** 2, -1))


def decompose_homography(H, rays_a, rays_b, valid):
    """Faugeras-Lustman decomposition H = R + t n^T / d on normalized coords.

    Counterpart of cv::decomposeHomographyMat +
    filterHomographyDecompByVisibleRefpoints in the reference fallback
    (EpipolarPoseEstimator.cpp:30-57): builds the 4 physical (R, t, n)
    candidates and picks the one with the best cheirality + visibility
    (n pointing toward camera a) vote.  Returns (R_ab, t_ab unit, n_a,
    votes) with T_ab = pose of b in a's frame, matching essential_ransac.
    """
    U, S, Vt = jnp.linalg.svd(H)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    # normalize by the middle singular value
    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    x1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / denom, 0.0, None))
    x3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / denom, 0.0, None))

    def cand(e1, e3):
        sin_t = (d1 - d3) * x1 * x3 * e1 * e3 / jnp.maximum(d2, 1e-12)
        cos_t = (d1 * x3 * x3 + d3 * x1 * x1) / jnp.maximum(d2, 1e-12)
        Rp = jnp.asarray(
            [[cos_t, 0.0, -sin_t], [0.0, 1.0, 0.0], [sin_t, 0.0, cos_t]])
        np_ = jnp.asarray([x1 * e1, 0.0, x3 * e3])
        tp = (d1 - d3) * jnp.asarray([x1 * e1, 0.0, -x3 * e3])
        R = s * U @ Rp @ Vt
        t = U @ tp
        n = Vt.T @ np_
        # convention: plane normal points toward camera a (n_z > 0)
        flip = jnp.where(n[2] < 0, -1.0, 1.0)
        return R, t * flip, n * flip

    cands = [cand(e1, e3) for e1 in (1.0, -1.0) for e3 in (1.0, -1.0)]

    xa = rays_a / jnp.maximum(rays_a[:, 2:3], 1e-9)

    def vote(Rtn):
        R_ba, t_ba, n = Rtn
        # visibility: plane in front of camera a for the observed points
        vis = (xa @ n) > 0
        # cheirality via midpoint depths under (R_ba, t_ba)
        ra = rays_a
        rb = (R_ba.T @ rays_b.T).T  # b rays in a's frame
        t_ab = -R_ba.T @ t_ba
        d = jnp.sum(ra * rb, -1)
        q0 = jnp.sum(ra * t_ab, -1)
        q1 = jnp.sum(rb * t_ab, -1)
        det = 1.0 - d * d
        z1 = (q0 - d * q1) / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        z2 = (d * q0 - q1) / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        return jnp.sum(vis & (z1 > 0) & (z2 > 0) & valid)

    votes = jnp.stack([vote(c) for c in cands])
    best = jnp.argmax(votes)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    ns = jnp.stack([c[2] for c in cands])
    R_ba, t_ba, n = Rs[best], ts[best], ns[best]
    tn = jnp.linalg.norm(t_ba)
    t_ba = t_ba / jnp.maximum(tn, 1e-12)
    R_ab = R_ba.T
    t_ab = -R_ba.T @ t_ba
    # pure rotation (d1~d2~d3): t is unobservable, report zero
    pure_rot = (d1 - d3) / jnp.maximum(d2, 1e-12) < 1e-4
    t_ab = jnp.where(pure_rot, jnp.zeros(3), t_ab)
    return R_ab, t_ab, n, votes[best]


@partial(jax.jit, static_argnames=("n_hyp",))
def homography_ransac(rays_a, rays_b, valid, key, *, n_hyp: int = 64,
                      thresh: float = 2e-5, min_inliers: int = 12):
    """Batched-hypothesis homography RANSAC + decomposition.

    The planar / low-parallax fallback of the reference
    (estimateMotionWithHomography, EpipolarPoseEstimator.cpp:8-64).
    Returns (R_ab, t_ab unit, n_plane, inliers, ok).
    """
    N = rays_a.shape[0]
    keys = jax.random.split(key, n_hyp)

    def hyp(k):
        idx = jax.random.randint(k, (4,), 0, N)
        w = jnp.zeros((N,)).at[idx].set(1.0) * valid
        H = _homography_dlt(rays_a, rays_b, w)
        err = _transfer_error(H, rays_a, rays_b)
        return H, jnp.sum(valid & (err < thresh))

    Hs, scores = jax.vmap(hyp)(keys)
    H = Hs[jnp.argmax(scores)]
    err = _transfer_error(H, rays_a, rays_b)
    inl = valid & (err < thresh)
    H = _homography_dlt(rays_a, rays_b, inl.astype(rays_a.dtype))
    err = _transfer_error(H, rays_a, rays_b)
    inl = valid & (err < thresh)
    R, t, n, votes = decompose_homography(H, rays_a, rays_b, inl)
    ok = (jnp.sum(inl) >= min_inliers) & (votes >= jnp.sum(inl) * 0.7)
    return R, t, n, inl, ok

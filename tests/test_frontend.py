"""Front-end tests: detection, KLT, matching, triangulation, epipolar, PnP.

Synthetic-image and synthetic-geometry worlds (reference pattern:
association_test.cpp, nofov_test.cpp fixtures).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.frontend import detect, epipolar, klt, match, pnp, triangulate
from sadvio_tpu.models import cameras
from sadvio_tpu.utils import geometry as geo


def checker_texture(rng, H=120, W=160, n_blobs=60):
    """Random smooth blob image with strong corners."""
    img = np.zeros((H, W), np.float32)
    ys = rng.integers(10, H - 10, n_blobs)
    xs = rng.integers(10, W - 10, n_blobs)
    for y, x in zip(ys, xs):
        img[y - 3 : y + 3, x - 3 : x + 3] += rng.uniform(50, 150)
    # mild smoothing
    k = np.ones((3, 3)) / 9
    from scipy.signal import convolve2d

    img = convolve2d(img, k, mode="same").astype(np.float32)
    return img


def test_detect_finds_corners(rng):
    img = checker_texture(rng)
    uv, s, valid = detect.detect_features(jnp.asarray(img), gh=4, gw=5, k_per_cell=4)
    n = int(valid.sum())
    assert n > 20
    # detected points must be on high-score pixels
    sc = np.asarray(detect.fast_score(jnp.asarray(img)))
    uvn = np.asarray(uv)[np.asarray(valid)]
    vals = sc[uvn[:, 1].astype(int), uvn[:, 0].astype(int)]
    assert (vals > 0).all()


def test_detect_occupancy(rng):
    img = checker_texture(rng)
    uv1, s1, v1 = detect.detect_features(jnp.asarray(img), gh=4, gw=5, k_per_cell=4)
    uv2, s2, v2 = detect.detect_features(
        jnp.asarray(img), existing_uv=uv1, existing_valid=v1, gh=4, gw=5, k_per_cell=4
    )
    # no new detection within radius 5 of an existing one
    a = np.asarray(uv1)[np.asarray(v1)]
    b = np.asarray(uv2)[np.asarray(v2)]
    if len(b) and len(a):
        d = np.abs(a[None] - b[:, None]).max(-1).min(1)
        assert d.min() > 4.9


def test_klt_tracks_shift(rng):
    img0 = checker_texture(rng)
    dx, dy = 3.0, -2.0
    # shift by integer + bilinear-friendly subpixel
    img1 = np.roll(np.roll(img0, int(dy), 0), int(dx), 1).astype(np.float32)
    uv0, s, v0 = detect.detect_features(jnp.asarray(img0), gh=4, gw=5, k_per_cell=3)
    p0 = klt.build_pyramid(jnp.asarray(img0), 3)
    p1 = klt.build_pyramid(jnp.asarray(img1), 3)
    uv1, valid, err = klt.track(tuple(p0), tuple(p1), uv0, uv0, v0)
    nv = int(valid.sum())
    assert nv > 10
    flow = np.asarray(uv1 - uv0)[np.asarray(valid)]
    np.testing.assert_allclose(flow.mean(0), [dx, dy], atol=0.2)


def test_match_descriptors(rng):
    img = checker_texture(rng)
    sm = detect.smooth3(jnp.asarray(img))
    uv, s, v = detect.detect_features(jnp.asarray(img), gh=4, gw=5, k_per_cell=3)
    desc = detect.brief_describe(sm, uv)
    # match against itself with slight predicted offset: identity expected
    idx, dist = match.match(desc, uv, v, desc, uv, v, search_radius=20.0)
    idxn = np.asarray(idx)
    vn = np.asarray(v)
    matched = idxn[vn]
    good = matched >= 0
    assert good.mean() > 0.8
    assert (matched[good] == np.where(vn)[0][good]).mean() > 0.95


def make_two_view(rng, n=64, baseline=(0.5, 0.1, 0.0), rot=0.1):
    p_w = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 9, n)
    ], -1).astype(np.float32)
    R_ab = np.asarray(geo.so3_exp(jnp.asarray(rng.standard_normal(3) * rot, jnp.float32)))
    t_ab = np.asarray(baseline, np.float32)
    rays_a = p_w / np.linalg.norm(p_w, axis=-1, keepdims=True)
    p_b = (p_w - t_ab) @ R_ab  # x_b = R^T (x_a - t)
    rays_b = p_b / np.linalg.norm(p_b, axis=-1, keepdims=True)
    return jnp.asarray(p_w), jnp.asarray(R_ab), jnp.asarray(t_ab), \
        jnp.asarray(rays_a), jnp.asarray(rays_b)


def test_epipolar_filter(rng):
    p_w, R_ab, t_ab, rays_a, rays_b = make_two_view(rng)
    valid = jnp.ones(rays_a.shape[0], bool)
    keep = epipolar.epipolar_filter(R_ab, t_ab, rays_a, rays_b, valid)
    assert np.asarray(keep).all()
    # corrupt half the rays
    rb = np.asarray(rays_b).copy()
    rb[::2] = np.roll(rb[::2], 1, 0)
    keep2 = epipolar.epipolar_filter(R_ab, t_ab, rays_a, jnp.asarray(rb), valid)
    k2 = np.asarray(keep2)
    assert k2[1::2].mean() > 0.95
    assert k2[::2].mean() < 0.3


def test_essential_ransac(rng):
    p_w, R_ab, t_ab, rays_a, rays_b = make_two_view(rng, n=96)
    rb = np.asarray(rays_b).copy()
    rb[:10] = np.roll(rb[:10], 1, 0)  # outliers
    valid = jnp.ones(96, bool)
    R, t, inl, ok = epipolar.essential_ransac(
        rays_a, jnp.asarray(rb), valid, jax.random.PRNGKey(0)
    )
    assert bool(ok)
    # compare up-to-scale translation direction and rotation
    t_true = np.asarray(t_ab) / np.linalg.norm(np.asarray(t_ab))
    tn = np.asarray(t)
    assert min(np.linalg.norm(tn - t_true), np.linalg.norm(tn + t_true)) < 0.05
    dR = np.asarray(geo.so3_log(jnp.asarray(np.asarray(R).T @ np.asarray(R_ab), jnp.float32)))
    assert np.abs(dR).max() < 0.02


def test_triangulate_midpoint(rng):
    p_w, R_ab, t_ab, rays_a, rays_b = make_two_view(rng, n=32)
    # two cameras: a at origin, b at t_ab with rotation R_ab
    origins = jnp.stack([jnp.zeros(3), t_ab])  # (2,3)
    rays_b_w = jnp.einsum("ij,nj->ni", R_ab, rays_b)
    rays = jnp.stack([rays_a, rays_b_w])  # (2,N,3)
    valid = jnp.ones((2, 32), bool)
    p, ok = triangulate.stereo_triangulate(origins, rays, valid)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_w), atol=1e-2)


def test_triangulate_degenerate(rng):
    # parallel rays from the same origin -> degenerate
    rays = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (2, 4, 3))
    origins = jnp.zeros((2, 3))
    p, ok = triangulate.stereo_triangulate(origins, rays, jnp.ones((2, 4), bool))
    assert not np.asarray(ok).any()


def test_pnp_ransac(rng):
    model = cameras.make_pinhole(458.0, 457.0, 367.0, 248.0)
    n = 96
    p_w = jnp.asarray(np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 9, n)
    ], -1), jnp.float32)
    R_true = geo.so3_exp(jnp.asarray([0.02, -0.05, 0.01], jnp.float32))
    t_true = jnp.asarray([0.3, -0.1, 0.2], jnp.float32)
    Rfs, tfs = geo.pose_identity()
    uv, valid = cameras.project_world(model, R_true, t_true, Rfs, tfs, p_w)
    # 15% outliers
    uvn = np.asarray(uv).copy()
    uvn[:14] += rng.uniform(20, 60, (14, 2))
    R0, t0 = geo.pose_retract(R_true, t_true, jnp.asarray([0.03, -0.02, 0.01, 0.1, -0.05, 0.08]))
    R, t, inl, ok, cov = pnp.pnp_ransac(
        model, Rfs, tfs, p_w, jnp.asarray(uvn), valid, R0, t0, jax.random.PRNGKey(1)
    )
    assert bool(ok)
    d = np.asarray(geo.pose_local(R, t, R_true, t_true))
    assert np.abs(d).max() < 1e-3
    assert np.asarray(inl)[14:].mean() > 0.9
    assert np.asarray(inl)[:14].mean() < 0.2


def test_homography_ransac_planar_scene(rng):
    """Planar-scene fallback (estimateMotionWithHomography semantics):
    recover R, unit t and the plane normal from a pure plane."""
    import jax
    from sadvio_tpu.frontend import epipolar
    from sadvio_tpu.utils import geometry as geo

    n_true = np.asarray([0.1, -0.05, 1.0])
    n_true = n_true / np.linalg.norm(n_true)
    d = 5.0
    # points on the plane n.X = d
    xy = rng.uniform(-2.5, 2.5, (120, 2))
    z = (d - xy @ n_true[:2]) / n_true[2]
    X = np.concatenate([xy, z[:, None]], -1).astype(np.float32)

    R_ab = np.asarray(geo.so3_exp(jnp.asarray([0.04, -0.06, 0.02])))
    t_ab = np.asarray([0.4, 0.1, -0.2], np.float32)
    # camera a at origin; b at (R_ab, t_ab) in a's frame
    Xa = X
    Xb = (Xa - t_ab) @ R_ab  # R^T (X - t)
    rays_a = jnp.asarray(Xa / np.linalg.norm(Xa, axis=-1, keepdims=True))
    rays_b = jnp.asarray(Xb / np.linalg.norm(Xb, axis=-1, keepdims=True))
    valid = jnp.ones((120,), bool)

    R, t, n, inl, ok = epipolar.homography_ransac(
        rays_a.astype(jnp.float32), rays_b.astype(jnp.float32), valid,
        jax.random.PRNGKey(0))
    assert bool(ok), int(jnp.sum(inl))
    np.testing.assert_allclose(np.asarray(R), R_ab, atol=5e-3)
    t_dir = t_ab / np.linalg.norm(t_ab)
    np.testing.assert_allclose(np.asarray(t), t_dir, atol=2e-2)
    np.testing.assert_allclose(np.abs(np.asarray(n) @ n_true), 1.0, atol=1e-2)


def test_depth_init_rgbd():
    """RGBD path (initLandmarkWithDepth): mean of depth-backprojections."""
    origins = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]])
    p_true = jnp.asarray([0.5, 0.2, 4.0])
    d0 = p_true - origins[0, 0]
    d1 = p_true - origins[0, 1]
    dirs = jnp.stack([d0 / jnp.linalg.norm(d0), d1 / jnp.linalg.norm(d1)])[None]
    depths = jnp.asarray([[jnp.linalg.norm(d0), jnp.linalg.norm(d1)]])
    p, ok = triangulate.depth_init(origins, dirs, depths,
                                   jnp.asarray([[True, True]]))
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(p[0]), np.asarray(p_true), atol=1e-5)
    # invalid depths are ignored; all-invalid -> not ok
    p2, ok2 = triangulate.depth_init(origins, dirs,
                                     jnp.asarray([[0.0, -1.0]]),
                                     jnp.asarray([[True, True]]))
    assert not bool(ok2[0])

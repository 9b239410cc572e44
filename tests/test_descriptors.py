"""Descriptor zoo tests: rotation invariance, matching, blob response."""

import jax.numpy as jnp
import numpy as np

from sadvio_tpu.frontend import descriptors as dsc


def _hamming(a, b):
    """a,b: (N,W) uint32 packed -> (N,) bit distance."""
    x = np.bitwise_xor(np.asarray(a), np.asarray(b))
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def _texture(H=160, W=160, seed=2):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (H // 8, W // 8))
    img = np.kron(img, np.ones((8, 8)))  # blocky texture, strong gradients
    return img.astype(np.float32)


def _rotate_image(img, deg, center):
    """Inverse-map bilinear rotation (numpy, test-side forward model)."""
    H, W = img.shape
    th = np.deg2rad(deg)
    ct, st = np.cos(th), np.sin(th)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    dx, dy = xs - center[0], ys - center[1]
    # dest pixel <- source at inverse rotation
    sx = center[0] + ct * dx + st * dy
    sy = center[1] - st * dx + ct * dy
    x0 = np.clip(np.floor(sx).astype(int), 0, W - 2)
    y0 = np.clip(np.floor(sy).astype(int), 0, H - 2)
    fu, fv = np.clip(sx - x0, 0, 1), np.clip(sy - y0, 0, 1)
    out = (img[y0, x0] * (1 - fu) * (1 - fv) + img[y0, x0 + 1] * fu * (1 - fv)
           + img[y0 + 1, x0] * (1 - fu) * fv + img[y0 + 1, x0 + 1] * fu * fv)
    return out.astype(np.float32)


def test_orb_rotation_invariance():
    img = _texture()
    center = (80.0, 80.0)
    uv = jnp.asarray([[80.0, 80.0], [70.0, 90.0], [95.0, 75.0]])
    d0 = dsc.orb_describe(jnp.asarray(img), uv)

    deg = 35.0
    img_r = _rotate_image(img, deg, center)
    # feature positions under the same (forward) rotation about center
    th = np.deg2rad(deg)
    ct, st = np.cos(th), np.sin(th)
    p = np.asarray(uv) - center
    uv_r = jnp.asarray(np.stack([ct * p[:, 0] - st * p[:, 1],
                                 st * p[:, 0] + ct * p[:, 1]], -1) + center)
    d1 = dsc.orb_describe(jnp.asarray(img_r), uv_r)
    ham = _hamming(d0, d1)
    assert ham.mean() < 70, ham  # random pairs average ~128/256

    # unoriented BRIEF on the same rotation must be much worse
    from sadvio_tpu.frontend.detect import brief_describe, smooth3
    b0 = brief_describe(smooth3(jnp.asarray(img)), uv)
    b1 = brief_describe(smooth3(jnp.asarray(img_r)), uv_r)
    assert _hamming(b0, b1).mean() > ham.mean()


def test_brisk_matches_under_rotation():
    img = _texture(seed=5)
    pts = jnp.asarray([[60.0, 60.0], [100.0, 70.0], [75.0, 105.0],
                       [90.0, 95.0]])
    d0 = dsc.brisk_describe(jnp.asarray(img), pts)
    img_r = _rotate_image(img, 25.0, (80.0, 80.0))
    th = np.deg2rad(25.0)
    ct, st = np.cos(th), np.sin(th)
    p = np.asarray(pts) - 80.0
    pts_r = jnp.asarray(np.stack([ct * p[:, 0] - st * p[:, 1],
                                  st * p[:, 0] + ct * p[:, 1]], -1) + 80.0)
    d1 = dsc.brisk_describe(jnp.asarray(img_r), pts_r)
    # nearest neighbour by Hamming must be the true correspondence
    D = np.zeros((4, 4))
    for i in range(4):
        for j in range(4):
            D[i, j] = _hamming(np.asarray(d0[i:i + 1]),
                               np.asarray(d1[j:j + 1]))[0]
    assert (D.argmin(axis=1) == np.arange(4)).all(), D


def test_hessian_blob_score():
    img = np.zeros((96, 96), np.float32)
    ys, xs = np.mgrid[0:96, 0:96]
    img += 200.0 * np.exp(-(((xs - 30) ** 2 + (ys - 40) ** 2) / (2 * 4.0**2)))
    s = np.asarray(dsc.hessian_score(jnp.asarray(img)))
    v, u = np.unravel_index(s.argmax(), s.shape)
    assert abs(u - 30) <= 2 and abs(v - 40) <= 2


def test_orientation_points_at_gradient():
    # intensity ramp along +x -> centroid angle ~ 0
    img = jnp.asarray(np.tile(np.arange(64, dtype=np.float32), (64, 1)))
    th = dsc.orientation(img, jnp.asarray([[32.0, 32.0]]))
    assert abs(float(th[0])) < 0.1

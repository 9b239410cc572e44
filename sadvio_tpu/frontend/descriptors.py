"""Descriptor zoo: oriented BRIEF (ORB), BRISK-style pattern, blob scores.

TPU-native counterparts of the reference's OpenCV detector/descriptor
wrappers (reference: cpp/src/featuredetectors/opencv_detectors/* --
cvORBFeatureDetector, cvBRISKFeatureDetector, cvKAZEFeatureDetector,
cvFASTFeatureDetector [FAST + ORB descriptors], cvGFTTFeatureDetector,
cvShiTomasiFeatureDetector; descriptor batch compute at
aOpenCVFeatureDetector.cpp:149-151).

The wrappers configure OpenCV implementations; what the pipeline actually
consumes is (a) a corner/blob score family and (b) a binary descriptor with
a Hamming distance (afeaturematcher.cpp getDist).  frontend/detect.py holds
FAST and Shi-Tomasi/GFTT scores and unoriented BRIEF; this module adds the
remaining families, all batched over feature slots:

- `orientation` + `orb_describe`: ORB = intensity-centroid orientation +
  rotated BRIEF pairs (rBRIEF), one gather per feature, no per-feature loop.
- `brisk_describe`: BRISK's concentric sampling rings with ring-scaled
  smoothing; short pairs -> 512 bits, long pairs -> gradient orientation.
- `hessian_score`: determinant-of-Hessian multi-scale blob score, the
  detector family of KAZE/BRISK (the reference's cvKAZE wrapper) without
  the nonlinear scale space (diffusion adds nothing on a VPU: the Gaussian
  pyramid is fused convs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sadvio_tpu.frontend.detect import _brief_offsets, bilinear_sample, smooth3

# ---------------------------------------------------------------------------
# ORB: intensity-centroid orientation + rotated BRIEF
# ---------------------------------------------------------------------------

_ORB_PAIRS = _brief_offsets(n_bits=256, patch=24, seed=11)  # (2,256,2)


def _disc_offsets(radius: int):
    ys, xs = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    keep = xs**2 + ys**2 <= radius**2
    return jnp.asarray(np.stack([xs[keep], ys[keep]], -1), jnp.float32)


_DISC15 = _disc_offsets(15)


def orientation(img, uv, *, radius: int = 15):
    """Intensity-centroid angle per feature (ORB'11 / IC_Angle): theta =
    atan2(m01, m10) over a radius-15 disc.  uv (N,2) -> (N,) rad."""
    disc = _DISC15 if radius == 15 else _disc_offsets(radius)
    pts = uv[:, None, :] + disc[None]  # (N,P,2)
    w = bilinear_sample(img, pts)  # (N,P)
    m10 = jnp.sum(w * disc[None, :, 0], axis=-1)
    m01 = jnp.sum(w * disc[None, :, 1], axis=-1)
    return jnp.arctan2(m01, m10)


def _pack_bits(bits):
    n, nb = bits.shape
    bits = bits.reshape(n, nb // 32, 32).astype(jnp.uint32)
    weights = (1 << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.uint32)


def orb_describe(img, uv, theta=None):
    """256-bit rBRIEF packed (N,8) uint32: BRIEF pairs rotated per-feature
    by the intensity-centroid angle (steered BRIEF, the cvORB wrapper's
    descriptor).  Pass theta to reuse a precomputed orientation."""
    img_s = smooth3(img)
    if theta is None:
        theta = orientation(img_s, uv)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    R = jnp.stack([jnp.stack([ct, -st], -1), jnp.stack([st, ct], -1)], -2)

    def rot(pairs):  # (256,2) static -> (N,256,2)
        return jnp.einsum("nij,bj->nbi", R, pairs)

    pa = uv[:, None, :] + rot(_ORB_PAIRS[0])
    pb = uv[:, None, :] + rot(_ORB_PAIRS[1])
    bits = bilinear_sample(img_s, pa) > bilinear_sample(img_s, pb)
    return _pack_bits(bits)


# ---------------------------------------------------------------------------
# BRISK: concentric ring pattern, ring-scaled smoothing
# ---------------------------------------------------------------------------


def _brisk_pattern():
    """60-point pattern (BRISK'11): center + 4 rings; per-point sigma grows
    with ring radius.  Returns pts (60,2), sigma_level (60,) in {0,1,2},
    and the static short/long pair index tables."""
    pts = [(0.0, 0.0)]
    lv = [0]
    for ring, (r, n, level) in enumerate(
            [(2.9, 10, 0), (4.9, 14, 1), (7.4, 15, 1), (10.8, 20, 2)]):
        for i in range(n):
            a = 2 * np.pi * i / n + (ring % 2) * np.pi / n
            pts.append((r * np.cos(a), r * np.sin(a)))
            lv.append(level)
    pts = np.asarray(pts, np.float32)
    lv = np.asarray(lv, np.int32)
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    iu, ju = np.triu_indices(len(pts), k=1)
    dist = d[iu, ju]
    short = np.argsort(dist)[:512]  # densest 512 short pairs
    long_ = np.where(dist > 9.0)[0]
    return (jnp.asarray(pts), jnp.asarray(lv),
            jnp.asarray(np.stack([iu[short], ju[short]], -1)),
            jnp.asarray(np.stack([iu[long_], ju[long_]], -1)))


_BRISK_PTS, _BRISK_LV, _BRISK_SHORT, _BRISK_LONG = _brisk_pattern()


def _blur_stack(img):
    s1 = smooth3(img)
    s2 = smooth3(smooth3(s1))
    s3 = smooth3(smooth3(smooth3(s2)))
    return jnp.stack([s1, s2, s3])  # effective sigma grows per level


def brisk_describe(img, uv):
    """512-bit BRISK-style descriptor packed (N,16) uint32, rotation
    compensated by the long-pair gradient direction (BRISK'11 sec. III)."""
    stack = _blur_stack(img)

    lv_onehot = jax.nn.one_hot(_BRISK_LV, 3, dtype=img.dtype)  # (60,3)

    def sample_at(pts_rot):
        # (N,60,2) pattern points; each point sampled from its blur level
        vals = jax.vmap(lambda im: bilinear_sample(im, pts_rot))(stack)
        return jnp.einsum("lnp,pl->np", vals, lv_onehot)

    # pass 1: unrotated samples -> orientation from long pairs
    pts0 = uv[:, None, :] + _BRISK_PTS[None]
    v0 = sample_at(pts0)  # (N,60)
    pi = _BRISK_PTS[_BRISK_LONG[:, 0]]
    pj = _BRISK_PTS[_BRISK_LONG[:, 1]]
    dp = pi - pj
    nrm = jnp.linalg.norm(dp, axis=-1, keepdims=True)
    gdir = dp / jnp.maximum(nrm, 1e-6)
    dv = v0[:, _BRISK_LONG[:, 0]] - v0[:, _BRISK_LONG[:, 1]]  # (N,L)
    g = jnp.einsum("nl,li->ni", dv / jnp.maximum(nrm[:, 0][None, :], 1e-6), gdir)
    theta = jnp.arctan2(g[:, 1], g[:, 0])

    # pass 2: rotated pattern -> short-pair comparisons
    ct, st = jnp.cos(theta), jnp.sin(theta)
    R = jnp.stack([jnp.stack([ct, -st], -1), jnp.stack([st, ct], -1)], -2)
    pts1 = uv[:, None, :] + jnp.einsum("nij,pj->npi", R, _BRISK_PTS)
    v1 = sample_at(pts1)
    bits = v1[:, _BRISK_SHORT[:, 0]] > v1[:, _BRISK_SHORT[:, 1]]
    return _pack_bits(bits)


# ---------------------------------------------------------------------------
# determinant-of-Hessian multi-scale blob score (KAZE-family detector)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_scales",))
def hessian_score(img, n_scales: int = 3):
    """max_s det(Hessian(G_s * img)) -- scale-normalized blob response."""
    def hess_det(im):
        ixx = im[:-2, 1:-1] - 2 * im[1:-1, 1:-1] + im[2:, 1:-1]
        iyy = im[1:-1, :-2] - 2 * im[1:-1, 1:-1] + im[1:-1, 2:]
        ixy = 0.25 * (im[2:, 2:] - im[2:, :-2] - im[:-2, 2:] + im[:-2, :-2])
        d = ixx * iyy - ixy * ixy
        return jnp.pad(d, 1)

    out = jnp.zeros_like(img)
    im = img
    scale = 1.0
    for _ in range(n_scales):
        im = smooth3(smooth3(im))
        scale *= 2.0  # sigma^2 normalization per octave-ish level
        out = jnp.maximum(out, scale * hess_det(im))
    return jnp.maximum(out, 0.0)

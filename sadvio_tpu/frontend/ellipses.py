"""Coded-ellipse fiducial markers: detection, decoding, pattern grouping, pose.

TPU-native re-design of the reference's EllipsePattern stack
(reference: cpp/include/isaeslam/featuredetectors/custom_detectors/extractor/
ellipsepattern/EllipsePatternExtractor.cpp:13-406 [adaptive threshold +
findContours + fitEllipse + homography ring read + circular-correlation
decode + 4/16-marker pattern grouping];
cpp/src/featuredetectors/custom_detectors/EllipsePatternFeatureDetector.cpp;
cpp/include/isaeslam/data/features/EllipsePattern2D.h;
ModelEllipsePattern3D in cpp/include/isaeslam/data/landmarks/Model3D.h).

Contour walking + per-contour fitEllipse do not map to a TPU.  The same
output contract (ellipse center/axes/angle, decoded marker ID, marker
orientation, grouped 4-marker patterns) is produced with batched fixed-shape
stages:
  1. Bernsen-style local threshold (min/max pools) -> dark-blob mask.
  2. Connected components by iterative 8-neighbour max-propagation
     (lax.while_loop over a 3x3 max pool -- O(blob diameter) cheap VPU steps).
  3. Per-blob raw moments via one segment_sum scatter; ellipse center/axes/
     angle in closed form from the 2x2 second-moment eigensystem (replaces
     cv::fitEllipse; exact for filled ellipses).
  4. Ellipticity gate pi*a*b/area in [0.95, 1.05]
     (EllipsePatternExtractor.cpp:79-81).
  5. Code ring read: bilinear samples on the affine circle->ellipse map at
     radius_ratio (the homography of :95-157 restricted to the marker plane
     IS this affine map); local white/black levels from the 1.15a / 0.75a
     rings; one (K,128) comparison.
  6. Decode: circular correlation of the 128-sample ring against the
     extended 8-bit sync word as one (128,) masked matmul; 16-bit payload by
     majority over 8-sample slots (:201-263).
  7. Pattern grouping (4 markers, IDs 6401/6402/6403/64xx at the corners of
     a square of side 4a): masked pairwise predicted-center test
     (:325-377), no per-detection loops.

Marker code format (clean re-spec, same family as the reference): the ring
holds 16 slots x 8 samples; slots 0..7 carry the sync word "10110010"
(EllipsePatternExtractor.h:138), slots 8..15 the payload (MSB first); the
reported ID is 6400 + payload, preserving the reference's 6400..6500
numbering (:210-216).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sadvio_tpu.frontend.detect import bilinear_sample

SYNC_WORD = (1, 0, 1, 1, 0, 0, 1, 0)  # EllipsePatternExtractor.h:138
N_RING = 128            # samples around the code ring (:137 nb_points=128)
N_SLOTS = 16            # code slots (sync 8 + payload 8)
RADIUS_RATIO = 1.68     # code ring radius / semi-major (:135)
WHITE_RATIO = 1.15      # white reference ring (:140)
BLACK_RATIO = 0.75      # black reference ring (:141)
ID_BASE = 6400


# ---------------------------------------------------------------------------
# 1-2: dark-blob mask + connected components
# ---------------------------------------------------------------------------


def _pool(img, k, op, init):
    return jax.lax.reduce_window(img, init, op, (k, k), (1, 1), "SAME")


def binarize_dark(img, *, block: int = 31, contrast_tsh: float = 25.0):
    """Dark-blob mask: Bernsen local threshold with a global fallback.

    Replaces cv::adaptiveThreshold(MEAN_C) + hole-contour semantics
    (EllipsePatternExtractor.cpp:52): a pixel is foreground when darker than
    the local (min+max)/2 in high-contrast areas, or darker than the global
    midrange in flat areas (so filled blob interiors stay solid).
    """
    lmin = _pool(img, block, jax.lax.min, jnp.inf)
    lmax = _pool(img, block, jax.lax.max, -jnp.inf)
    local_t = 0.5 * (lmin + lmax)
    global_t = 0.5 * (jnp.min(img) + jnp.max(img))
    t = jnp.where(lmax - lmin > contrast_tsh, local_t, global_t)
    return img < t


def connected_components(fg, *, max_iters: int = 512):
    """8-connected labels by max-propagation.  Returns (H,W) int32; 0 = bg.

    Each foreground pixel starts as its own linear index + 1; a 3x3 max pool
    propagates the component maximum until fixed point (O(blob diameter)
    iterations, each a cheap VPU pool).
    """
    H, W = fg.shape
    seed = (jnp.arange(H * W, dtype=jnp.int32) + 1).reshape(H, W)
    lab0 = jnp.where(fg, seed, 0)

    def cond(carry):
        lab, changed, i = carry
        return changed & (i < max_iters)

    def body(carry):
        lab, _, i = carry
        nxt = jnp.where(fg, _pool(lab, 3, jax.lax.max, jnp.int32(0)), 0)
        return nxt, jnp.any(nxt != lab), i + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (lab0, jnp.asarray(True), 0))
    return lab


# ---------------------------------------------------------------------------
# 3-4: moment-based ellipse fit over fixed-capacity blob slots
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_blobs", "min_area", "max_area"))
def blob_ellipses(labels, *, n_blobs: int = 32, min_area: int = 10,
                  max_area: int = 20000):
    """Fit an ellipse to each of the n_blobs largest components.

    Returns center (K,2) [u,v], axes (K,2) [a>=b semi-axes], theta (K,)
    [major-axis angle, rad], area (K,), valid (K,) -- valid includes the
    ellipticity gate of EllipsePatternExtractor.cpp:72-81.
    """
    H, W = labels.shape
    seg = labels.reshape(-1)
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    x = xs.reshape(-1)
    y = ys.reshape(-1)
    ns = H * W + 1
    vals = jnp.stack(
        [jnp.ones_like(x), x, y, x * x, x * y, y * y], axis=-1)
    sums = jax.ops.segment_sum(vals, seg, num_segments=ns)  # (ns, 6)
    count = sums[:, 0].at[0].set(0.0)  # drop background

    top, lab_ids = jax.lax.top_k(count, n_blobs)
    m = sums[lab_ids]  # (K, 6)
    n = jnp.maximum(m[:, 0], 1.0)
    cx, cy = m[:, 1] / n, m[:, 2] / n
    # central second moments (of the filled region)
    mxx = m[:, 3] / n - cx * cx
    mxy = m[:, 4] / n - cx * cy
    myy = m[:, 5] / n - cy * cy
    # eigensystem of [[mxx,mxy],[mxy,myy]] in closed form
    tr = 0.5 * (mxx + myy)
    d = jnp.sqrt(jnp.maximum((0.5 * (mxx - myy)) ** 2 + mxy * mxy, 0.0))
    l1 = jnp.maximum(tr + d, 1e-12)
    l2 = jnp.maximum(tr - d, 1e-12)
    # uniform filled ellipse: second moment lambda = (semi_axis)^2 / 4
    a = 2.0 * jnp.sqrt(l1)
    b = 2.0 * jnp.sqrt(l2)
    theta = 0.5 * jnp.arctan2(2.0 * mxy, mxx - myy)

    area = m[:, 0]
    ellipticity = jnp.pi * a * b / jnp.maximum(area, 1.0)
    valid = ((area >= min_area) & (area <= max_area)
             & (ellipticity > 0.95) & (ellipticity < 1.05))
    center = jnp.stack([cx, cy], axis=-1)
    axes = jnp.stack([a, b], axis=-1)
    return center, axes, theta, area, valid


# ---------------------------------------------------------------------------
# 5-6: code ring read + decode
# ---------------------------------------------------------------------------


def _ring_points(center, axes, theta, ratio):
    """(K, N_RING, 2) sample points on the affine circle->ellipse map.

    phi runs 2pi -> 0 (the reference's clockwise convention,
    EllipsePatternExtractor.cpp:137 linspace(2pi, 0, 128)).
    """
    phi = jnp.linspace(2.0 * jnp.pi, 0.0, N_RING, endpoint=False)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    a = ratio * axes[:, 0:1]
    b = ratio * axes[:, 1:2]
    ex = a * cp[None, :]
    ey = b * sp[None, :]
    ct, st = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
    u = center[:, 0:1] + ct * ex - st * ey
    v = center[:, 1:2] + st * ex + ct * ey
    return jnp.stack([u, v], axis=-1)


def read_codes(img, center, axes, theta):
    """Binary ring codes (K, N_RING) -- black=1 (:186-189) -- plus the
    local white/black reference levels."""
    ring = bilinear_sample(img, _ring_points(center, axes, theta, RADIUS_RATIO))
    white = jnp.mean(
        bilinear_sample(img, _ring_points(center, axes, theta, WHITE_RATIO)),
        axis=-1)
    black = jnp.mean(
        bilinear_sample(img, _ring_points(center, axes, theta, BLACK_RATIO)),
        axis=-1)
    code = ring < (0.5 * (white + black))[:, None]
    contrast_ok = white - black > 10.0
    return code.astype(jnp.float32), contrast_ok


def decode_codes(codes):
    """Decode (K, N_RING) rings -> id (K,), orientation (K,), ok (K,).

    Circular correlation against the extended sync word
    (EllipsePatternExtractor.cpp:201-212, 265-307) as one (K,128) x
    (128,128,64)-free gather-matmul; payload by majority over 8-sample
    slots (:233-263); id = 6400 + payload.
    """
    per = N_RING // N_SLOTS  # 8 samples per slot
    sync = jnp.asarray(SYNC_WORD, jnp.float32)
    ext = jnp.repeat(sync, per)  # (64,) extended sync
    n_ext = ext.shape[0]
    # all circular shifts: idx[o, j] = (o + j) mod N_RING
    idx = (jnp.arange(N_RING)[:, None] + jnp.arange(n_ext)[None, :]) % N_RING
    shifted = codes[:, idx]  # (K, 128, 64)
    score = jnp.sum((shifted - ext[None, None, :]) ** 2, axis=-1)  # (K,128)
    offset = jnp.argmin(score, axis=-1)  # (K,)
    orientation = offset.astype(jnp.float32) / N_RING * 2.0 * jnp.pi

    # majority-compress 16 slots of 8 samples starting at offset
    sl = (offset[:, None] + jnp.arange(N_RING)[None, :]) % N_RING
    aligned = jnp.take_along_axis(codes, sl, axis=1)  # (K, 128)
    slots = aligned.reshape(-1, N_SLOTS, per).mean(axis=-1) > 0.5  # (K,16)
    sync_ok = jnp.all(slots[:, :8] == (sync > 0.5)[None, :], axis=-1)
    weights = (1 << jnp.arange(7, -1, -1, dtype=jnp.int32))
    payload = jnp.sum(slots[:, 8:].astype(jnp.int32) * weights[None, :], axis=-1)
    return ID_BASE + payload, orientation, sync_ok


@partial(jax.jit, static_argnames=("n_blobs",))
def detect_coded_ellipses(img, *, n_blobs: int = 32):
    """Full single-image marker detection -> fixed-capacity slots.

    Returns dict: center (K,2), axes (K,2), theta (K,) [marker orientation:
    ellipse angle - ring offset - pi/2, the convention of
    EllipsePatternExtractor.cpp:185], id (K,), valid (K,).
    """
    fg = binarize_dark(img)
    labels = connected_components(fg)
    center, axes, theta, area, valid = blob_ellipses(labels, n_blobs=n_blobs)
    codes, contrast_ok = read_codes(img, center, axes, theta)
    ids, ring_orient, sync_ok = decode_codes(codes)
    marker_theta = theta - ring_orient - 0.5 * jnp.pi
    valid = valid & sync_ok & contrast_ok
    return {"center": center, "axes": axes, "theta": marker_theta,
            "id": ids, "valid": valid}


# ---------------------------------------------------------------------------
# 7: pattern grouping (4 markers at the corners of a square of side 4a)
# ---------------------------------------------------------------------------


def group_patterns_4(det, *, max_patterns: int = 8, scale: float = 4.0):
    """Group detections into 4-marker patterns.

    Mirrors extract_pattern_4 (EllipsePatternExtractor.cpp:325-377): marker
    6401 anchors the pattern; 6402 is predicted at +y' (orientation+pi/2),
    6403 at +x', and the ID marker (6400+id) at the diagonal; all at
    distance scale*a.  Returns uv (P,4,2) corner centers in the order
    [E1,E2,E3,EN] (the ModelEllipsePattern3D vertex order (0,0),(0,1),
    (1,0),(1,1)), pattern id (P,), valid (P,).
    """
    c, a = det["center"], det["axes"][:, 0]
    th, ids, valid = det["theta"], det["id"], det["valid"]
    K = c.shape[0]

    # predicted corner offsets per anchor (K,2) each (:368-371)
    off_y = jnp.stack([scale * a * jnp.cos(-th + jnp.pi / 2),
                       -scale * a * jnp.sin(-th + jnp.pi / 2)], axis=-1)
    off_x = jnp.stack([scale * a * jnp.cos(-th),
                       -scale * a * jnp.sin(-th)], axis=-1)
    c2p = c + off_y
    c3p = c + off_x
    cnp_ = c + off_x + off_y
    tol = scale * a  # (:372) gate: |c - pred| < scale*a

    dist = lambda p: jnp.linalg.norm(c[None, :, :] - p[:, None, :], axis=-1)

    def best(pred_c, want_id=None):
        d = dist(pred_c)  # (K anchors, K candidates)
        ok = valid[None, :] & (d < tol[:, None])
        if want_id is not None:
            ok = ok & (ids[None, :] == want_id)
        else:
            ok = ok & (ids[None, :] >= ID_BASE) \
                 & (ids[None, :] != ID_BASE + 1) & (ids[None, :] != ID_BASE + 2) \
                 & (ids[None, :] != ID_BASE + 3)
        d = jnp.where(ok, d, jnp.inf)
        j = jnp.argmin(d, axis=-1)
        found = jnp.isfinite(jnp.min(d, axis=-1))
        return j, found

    j2, f2 = best(c2p, ID_BASE + 2)
    j3, f3 = best(c3p, ID_BASE + 3)
    jn, fn = best(cnp_, None)

    anchor_ok = valid & (ids == ID_BASE + 1) & f2 & f3 & fn
    # fixed-capacity pattern slots: top max_patterns anchors by validity/area
    score = jnp.where(anchor_ok, a, -1.0)
    _, sel = jax.lax.top_k(score, max_patterns)
    p_valid = anchor_ok[sel]
    uv = jnp.stack([c[sel], c[j2[sel]], c[j3[sel]], c[jn[sel]]], axis=1)
    pid = ids[jn[sel]] - ID_BASE
    return uv, pid, p_valid


def match_patterns(ids_a, valid_a, ids_b, valid_b):
    """Match pattern detections across images by decoded ID (the reference
    matches EllipsePattern2D descriptors = pattern IDs,
    EllipsePatternFeatureDetector.cpp:32-35).  Returns idx_b (P,), ok (P,)."""
    eq = (ids_a[:, None] == ids_b[None, :]) & valid_a[:, None] & valid_b[None, :]
    idx = jnp.argmax(eq, axis=-1)
    ok = jnp.any(eq, axis=-1)
    return idx, ok


# ---------------------------------------------------------------------------
# pattern landmark: planar pose from the 4 corners (ModelEllipsePattern3D)
# ---------------------------------------------------------------------------

# ModelEllipsePattern3D vertices (Model3D.h:56-63), scaled by the physical
# pattern side length; order matches group_patterns_4 output.
MODEL_CORNERS = np.asarray(
    [[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]], np.float32)


def _homography_dlt(xy, uv):
    """H (3,3) mapping plane coords xy (4,2) -> pixels uv (4,2) by DLT."""
    def rows(p, q):
        x, y = p
        u, v = q
        r1 = jnp.asarray([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
        r2 = jnp.asarray([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
        return jnp.stack([r1, r2])

    A = jnp.concatenate([rows(xy[i], uv[i]) for i in range(4)], axis=0)
    _, _, vt = jnp.linalg.svd(A)
    return vt[-1].reshape(3, 3)


def pattern_pose(K, uv4, side: float = 1.0):
    """Planar pose (R_c_p, t_c_p) of a pattern from its 4 corner pixels.

    Homography decomposition with known intrinsics: H' = K^-1 H has columns
    [r1, r2, t] up to scale; R is the nearest rotation (SVD orthonormalize).
    This initializes the Model3D landmark pose the reference stores on
    EllipsePattern landmarks (alandmarkinitializer.cpp model-point path).
    """
    xy = jnp.asarray(MODEL_CORNERS) * side
    H = _homography_dlt(xy, uv4)
    Hn = jnp.linalg.solve(K, H)
    s = 0.5 * (jnp.linalg.norm(Hn[:, 0]) + jnp.linalg.norm(Hn[:, 1]))
    s = jnp.where(Hn[2, 2] < 0, -s, s)  # keep the pattern in front (t_z > 0)
    Hn = Hn / jnp.where(jnp.abs(s) < 1e-12, 1e-12, s)
    r1, r2, t = Hn[:, 0], Hn[:, 1], Hn[:, 2]
    R0 = jnp.stack([r1, r2, jnp.cross(r1, r2)], axis=-1)
    u, _, vt = jnp.linalg.svd(R0)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    R = (u * jnp.asarray([1.0, 1.0, d])[None, :]) @ vt
    return R, t

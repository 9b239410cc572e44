"""Semantic bounding-box features and 3D box landmarks.

TPU-native re-design of the reference's semantic BBox stack
(reference: cpp/src/featuredetectors/custom_detectors/
semanticBBoxFeatureDetector.cpp [detections provided externally by the data
provider — "GT detection already set in frame by provider"];
cpp/src/featurematchers/semanticBBoxFeatureTracker.cpp:9-31 [match-based
tracking with an unbounded search box, L1 descriptor distance];
cpp/src/landmarkinitializer/semanticBBoxlandmarkInitializer.cpp:9-28
[pose taken from the provider, single-feature init returns nullptr];
cpp/include/isaeslam/data/features/BBox2d.h;
cpp/include/isaeslam/data/landmarks/BBox3d.h + ModelBBox3D unit cube in
cpp/include/isaeslam/data/landmarks/Model3D.h:69-82).

Detections enter as fixed-capacity arrays (the provider surface):
corners (N,2,2) [[u0,v0],[u1,v1]] with u0<u1, v0<v1, integer class labels,
scores, and a validity mask.  Matching is one masked IoU matrix + label
gate + mutual-best — no per-detection loops.  Beyond the reference (whose
single-view init is a stub), two-view center triangulation + metric scale
from the projected extents initializes a full BBox3d (center + per-axis
scale) without ground truth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sadvio_tpu.frontend import triangulate as tri

# ModelBBox3D unit-cube vertices (Model3D.h:69-82)
CUBE = jnp.asarray(
    [[0.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [1.0, 1.0, 0.0],
     [0.0, 0.0, 1.0], [0.0, 1.0, 1.0], [1.0, 0.0, 1.0], [1.0, 1.0, 1.0]],
    jnp.float32)


def iou_matrix(boxes_a, boxes_b):
    """Pairwise IoU.  boxes: (N,2,2) [[u0,v0],[u1,v1]] -> (Na,Nb)."""
    lo = jnp.maximum(boxes_a[:, None, 0], boxes_b[None, :, 0])
    hi = jnp.minimum(boxes_a[:, None, 1], boxes_b[None, :, 1])
    wh = jnp.maximum(hi - lo, 0.0)
    inter = wh[..., 0] * wh[..., 1]

    def area(b):
        d = jnp.maximum(b[:, 1] - b[:, 0], 0.0)
        return d[:, 0] * d[:, 1]

    union = area(boxes_a)[:, None] + area(boxes_b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def match_bboxes(boxes_a, labels_a, valid_a, boxes_b, labels_b, valid_b,
                 *, min_iou: float = 0.1):
    """Label-gated mutual-best IoU matching.

    The reference matches bbox descriptors with an unbounded search box
    (semanticBBoxFeatureTracker.cpp:28 match(..., 1000, 1000)); here the
    descriptor test is an exact class-label equality and the geometric
    affinity is IoU.  Returns idx_b (Na,), ok (Na,).
    """
    iou = iou_matrix(boxes_a, boxes_b)
    ok = (labels_a[:, None] == labels_b[None, :]) \
        & valid_a[:, None] & valid_b[None, :] & (iou > min_iou)
    aff = jnp.where(ok, iou, -1.0)
    best_b = jnp.argmax(aff, axis=1)
    best_a = jnp.argmax(aff, axis=0)
    mutual = best_a[best_b] == jnp.arange(boxes_a.shape[0])
    found = jnp.max(aff, axis=1) > 0.0
    return best_b, mutual & found


def _center(boxes):
    return 0.5 * (boxes[:, 0] + boxes[:, 1])


def triangulate_bbox(cam, boxes_a, valid_a, R_ws_a, t_ws_a,
                     boxes_b, valid_b, R_ws_b, t_ws_b):
    """Two-view BBox3d init: center by midpoint triangulation of the box
    center rays, metric per-axis scale from the pixel extents at the
    triangulated depth (size = depth * extent / f).

    Matched boxes row-aligned (a[i] <-> b[i]).  The reference cannot init a
    box without ground truth (semanticBBoxlandmarkInitializer.cpp:24-27
    returns nullptr); this replaces that stub with a real two-view solve
    while `pose_from_provider` below covers the reference's GT path.
    Returns center (N,3) world, scale (N,3), ok (N,).
    """
    ca, cb = _center(boxes_a), _center(boxes_b)
    n = ca.shape[0]
    ray_a = (R_ws_a @ cam.backproject(ca)[..., None])[..., 0]  # world frame
    ray_b = (R_ws_b @ cam.backproject(cb)[..., None])[..., 0]
    origins = jnp.stack([jnp.broadcast_to(t_ws_a, (n, 3)),
                         jnp.broadcast_to(t_ws_b, (n, 3))], axis=1)
    dirs = jnp.stack([ray_a, ray_b], axis=1)
    mask = jnp.stack([valid_a, valid_b], axis=1)
    p_w, ok = tri.midpoint_triangulate(origins, dirs, mask)
    # depth in camera a
    p_a = jnp.einsum("ji,nj->ni", R_ws_a, p_w - t_ws_a[None, :])
    depth = jnp.maximum(p_a[:, 2], 1e-6)
    ext = jnp.maximum(boxes_a[:, 1] - boxes_a[:, 0], 0.0)  # (N,2) px
    f = jnp.stack([jnp.reshape(cam.fx, ()), jnp.reshape(cam.fy, ())])
    wh = depth[:, None] * ext / f[None, :]
    scale = jnp.concatenate([wh, wh[:, 1:2]], axis=-1)  # depth extent ~ height
    return p_w, scale, ok & valid_a & valid_b


def pose_from_provider(T_w_s, p_s, valid):
    """The reference's GT path: landmark pose = sensor-to-world * provided
    pose (semanticBBoxlandmarkInitializer.cpp:13-15).  p_s: (N,3) box
    centers in sensor frame."""
    R, t = T_w_s
    return (R @ p_s[..., None])[..., 0] + t, valid


def project_box(cam, R_ws, t_ws, center_w, scale, valid):
    """Project a BBox3d back to a 2D box: min/max over the 8 scaled cube
    corners (the Model3D contract — model points transformed by the
    landmark pose, ALandmark model-point projection).  Axis-aligned box in
    the world frame, like the reference's ModelBBox3D.

    Returns boxes (N,2,2), ok (N,).
    """
    corners_w = center_w[:, None, :] + (CUBE[None] - 0.5) * scale[:, None, :]
    p_s = jnp.einsum("ji,nkj->nki", R_ws, corners_w - t_ws[None, None, :])
    uv, ok = jax.vmap(lambda p: cam.project(p))(p_s)
    lo = jnp.min(uv, axis=1)
    hi = jnp.max(uv, axis=1)
    return jnp.stack([lo, hi], axis=1), valid & jnp.all(ok, axis=1)

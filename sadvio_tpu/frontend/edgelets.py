"""Edgelet features: oriented edge points (point + tangent direction).

TPU-native re-design of the reference edgelet stack
(reference: cpp/src/featuredetectors/custom_detectors edgelet detector --
gradient-based; data/features Edgelet2D [pixel + orientation];
data/landmarks Edgelet3D [3D point + unit direction]; edgelet landmark
initializer [point triangulation + direction from the edge tangents]).

Detection: gradient magnitude with non-maximum suppression *along the
gradient direction* (edges, not corners), grid-bucketed top-k like the
point detector.  The 3D direction comes from intersecting the two viewing
planes that contain each view's edge tangent -- algebraically the same
plane-intersection as line triangulation with an infinitesimal segment
(frontend.lines.triangulate_line degenerates to exactly this).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sadvio_tpu.frontend import detect as det_mod
from sadvio_tpu.frontend import lines as lines_mod
from sadvio_tpu.utils import geometry as geo


@partial(jax.jit, static_argnames=("gh", "gw", "k_per_cell"))
def detect_edgelets(img, *, grad_tsh: float = 12.0, gh: int = 8, gw: int = 12,
                    k_per_cell: int = 4):
    """Oriented edge points.  Returns uv (N,2), dir2d (N,2) unit tangent,
    score (N,), valid (N,) with N = gh*gw*k_per_cell."""
    gx, gy = lines_mod._sobel(img)
    mag = jnp.sqrt(gx * gx + gy * gy)

    # NMS along the gradient (normal) direction: a pixel survives if it
    # beats its two neighbours along (gx,gy)
    nx = gx / jnp.maximum(mag, 1e-9)
    ny = gy / jnp.maximum(mag, 1e-9)
    H, W = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=img.dtype),
                          jnp.arange(W, dtype=img.dtype), indexing="ij")
    fwd = det_mod.bilinear_sample(mag, jnp.stack([xs + nx, ys + ny], -1))
    bwd = det_mod.bilinear_sample(mag, jnp.stack([xs - nx, ys - ny], -1))
    score = jnp.where((mag >= fwd) & (mag >= bwd) & (mag > grad_tsh), mag, 0.0)

    uv, s, valid = det_mod.grid_topk(
        score, jnp.ones((H, W), bool), gh, gw, k_per_cell
    )
    gxs = det_mod.bilinear_sample(gx, uv)
    gys = det_mod.bilinear_sample(gy, uv)
    g = jnp.stack([gxs, gys], -1)
    gn = jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
    n_hat = g / gn
    tangent = jnp.stack([-n_hat[:, 1], n_hat[:, 0]], -1)  # 90 deg from normal
    return uv, tangent, s, valid


def match_edgelets(uv_a, dir_a, valid_a, uv_b, dir_b, valid_b,
                   search_px=15.0, max_angle_deg=15.0):
    """Proximity + tangent-angle matching (EdgeletFeatureMatcher semantics).

    Edge tangents are orientation-ambiguous (180 deg): compare |cos|.
    """
    d2 = jnp.sum((uv_a[:, None] - uv_b[None, :]) ** 2, -1)
    cosang = jnp.abs(jnp.einsum("ai,bi->ab", dir_a, dir_b))
    ok = (
        (d2 < search_px * search_px)
        & (cosang > jnp.cos(jnp.deg2rad(max_angle_deg)))
        & valid_a[:, None] & valid_b[None, :]
    )
    score = jnp.where(ok, d2, jnp.inf)
    best = jnp.argmin(score, 1)
    best_b = jnp.argmin(score, 0)
    mutual = best_b[best] == jnp.arange(uv_a.shape[0])
    hit = mutual & jnp.isfinite(jnp.min(score, 1)) & valid_a
    return jnp.where(hit, best, -1).astype(jnp.int32), jnp.min(score, 1)


def triangulate_edgelet(cam_a, cam_b, R_ws_a, t_ws_a, R_ws_b, t_ws_b,
                        uv_a, dir_a, uv_b, dir_b, eps_px=2.0):
    """3D edgelet (point + unit direction) from two oriented observations.

    The position is the two-view midpoint of the center rays; the direction
    intersects the two tangent planes via an infinitesimal virtual segment
    through lines.triangulate_line.
    """
    from sadvio_tpu.frontend import triangulate as tri_mod

    ra = cam_a.backproject(uv_a)
    rb = cam_b.backproject(uv_b)
    ra_w = jnp.einsum("ij,...j->...i", R_ws_a, ra)
    rb_w = jnp.einsum("ij,...j->...i", R_ws_b, rb)
    origins = jnp.stack([
        jnp.broadcast_to(t_ws_a, ra_w.shape), jnp.broadcast_to(t_ws_b, rb_w.shape)
    ], -2)
    dirs = jnp.stack([ra_w, rb_w], -2)
    p_w, ok_p = tri_mod.midpoint_triangulate(
        origins, dirs, jnp.ones(dirs.shape[:-1], bool), det_eps=1e-6
    )

    ends_a = jnp.stack([uv_a - eps_px * dir_a, uv_a + eps_px * dir_a], -2)
    ends_b = jnp.stack([uv_b - eps_px * dir_b, uv_b + eps_px * dir_b], -2)
    q0, q1, ok_l = lines_mod.triangulate_line(
        cam_a, cam_b, R_ws_a, t_ws_a, R_ws_b, t_ws_b, ends_a, ends_b,
        cond_min=0.0,
    )
    d = q1 - q0
    dn = jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    return p_w, d / dn, ok_p & ok_l

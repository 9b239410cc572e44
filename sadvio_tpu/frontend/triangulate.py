"""Multi-view midpoint triangulation, batched over candidate tracks.

TPU-native re-design of the reference landmark initializer
(reference: cpp/src/landmarkinitializer/Point3DlandmarkInitializer.cpp:8-98 --
ray-based 3x3 linear system:18-39, determinant degeneracy gate:72,
front-of-camera + range gates:91-93; orchestration semantics of
alandmarkinitializer.cpp:56-129).

Given per-observation ray directions (world frame, unit) and camera centers,
the midpoint solve is: minimize sum_i || (I - d_i d_i^T)(x - o_i) ||^2
=> A x = b with A = sum (I - d d^T), b = sum (I - d d^T) o.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def midpoint_triangulate(origins, dirs, mask, det_eps=1e-4,
                         min_depth=0.1, max_depth=40.0):
    """origins, dirs: (...,M,3); mask: (...,M).  Returns (p (...,3), ok).

    ok combines: >=2 valid rays, non-degenerate A (determinant gate like
    Point3DlandmarkInitializer.cpp:72), cheirality (in front of every
    contributing camera), and depth range.
    """
    m = mask[..., None, None].astype(origins.dtype)
    eye = jnp.eye(3, dtype=origins.dtype)
    ddt = dirs[..., :, None] * dirs[..., None, :]
    Pi = (eye - ddt) * m  # (...,M,3,3)
    A = jnp.sum(Pi, axis=-3)
    b = jnp.einsum("...mij,...mj->...i", Pi, origins)
    det = jnp.linalg.det(A)
    n_rays = jnp.sum(mask, axis=-1)
    ok_sys = (n_rays >= 2) & (jnp.abs(det) > det_eps)
    A_safe = jnp.where(ok_sys[..., None, None], A, eye)
    p = jnp.linalg.solve(A_safe, b[..., None])[..., 0]

    # cheirality + depth for every contributing ray
    rel = p[..., None, :] - origins
    depth = jnp.sum(rel * dirs, axis=-1)  # (...,M)
    ok_ray = (~mask) | ((depth > min_depth) & (depth < max_depth))
    ok = ok_sys & jnp.all(ok_ray, axis=-1)
    return p, ok


def stereo_triangulate(rig_origins_w, rays_w, valid, det_eps=1e-4,
                       max_depth=40.0):
    """Convenience wrapper: triangulate one landmark per feature slot from a
    multi-camera rig observation set.

    rig_origins_w: (C,3) camera centers in world; rays_w: (C,N,3) unit rays in
    world; valid: (C,N).  Returns (p (N,3), ok (N,)).  det(A) = 2 sin^2(angle)
    for two rays, so det_eps is an effective minimum-parallax gate -- loosen
    it for small-baseline two-view bootstrap triangulation.
    """
    origins = jnp.broadcast_to(rig_origins_w[:, None, :], rays_w.shape)
    return midpoint_triangulate(
        jnp.moveaxis(origins, 0, -2), jnp.moveaxis(rays_w, 0, -2),
        jnp.moveaxis(valid, 0, -1), det_eps=det_eps, max_depth=max_depth,
    )


def depth_init(origins, dirs, depths, mask, min_depth=0.1, max_depth=40.0):
    """RGBD landmark init: average the per-view depth-backprojected points.

    Semantics of Point3DLandmarkInitializer::initLandmarkWithDepth
    (Point3DlandmarkInitializer.cpp:101-123): each observation contributes
    origin + depth * ray; the landmark is the masked mean.  origins, dirs:
    (...,M,3) world-frame; depths: (...,M) metric along-ray depths (<=0 or
    out-of-range measurements are ignored).  Returns (p (...,3), ok).
    """
    good = mask & (depths > min_depth) & (depths < max_depth)
    w = good.astype(origins.dtype)[..., None]
    pts = origins + dirs * depths[..., None]
    n = jnp.sum(w, axis=-2)
    p = jnp.sum(pts * w, axis=-2) / jnp.maximum(n, 1.0)
    return p, n[..., 0] >= 1

"""Pyramidal inverse-compositional Lucas-Kanade tracking, batched.

TPU-native replacement for cv::calcOpticalFlowPyrLK as used by the reference
tracker (reference: cpp/src/featurematchers/Point2DFeatureTracker.cpp:10-139:
pyramidal LK with OPTFLOW_USE_INITIAL_FLOW + MIN_EIGENVALS, forward-backward
consistency < 0.5 px, per-sensor cached pyramids).

Design: inverse-compositional LK -- template gradients and the 2x2 normal
matrix are computed once per feature per level; each iteration only gathers
the target patch (bilinear) and solves the closed-form 2x2 system.  Features
are batched with vmap; iterations are a fixed-count fori_loop (masked
convergence), levels a static Python loop -- one fused XLA kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sadvio_tpu.frontend.detect import bilinear_sample


def build_pyramid(img, levels: int = 3):
    """List of images, level 0 = full res; 2x2 average-pool downsampling."""
    pyr = [img]
    for _ in range(levels - 1):
        x = pyr[-1]
        H, W = x.shape
        x = x[: H - H % 2, : W - W % 2].reshape(H // 2, 2, W // 2, 2).mean((1, 3))
        pyr.append(x)
    return pyr


def _patch_coords(radius: int):
    r = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([dx.reshape(-1), dy.reshape(-1)], axis=-1)  # (S,2) in (u,v)


def _templates(img0, uv0, warp, radius: int, min_eig: float):
    """Per-feature warped template patch, gradients and 2x2 normal matrix.

    Returns T/gx/gy (N,S,S), nrm (N,4)=[a,b,c,inv_det], good_grad (N,).
    Runs once per frame (cheap); the per-iteration sampling is what the
    Pallas path accelerates.
    """
    offs = _patch_coords(radius)  # (S^2,2)
    S = 2 * radius + 1

    def one(uv0_i, A_i):
        pts = uv0_i[None] + offs @ A_i.T
        T = bilinear_sample(img0, pts)
        ex = A_i @ jnp.array([0.5, 0.0])
        ey = A_i @ jnp.array([0.0, 0.5])
        gx = bilinear_sample(img0, pts + ex) - bilinear_sample(img0, pts - ex)
        gy = bilinear_sample(img0, pts + ey) - bilinear_sample(img0, pts - ey)
        a = jnp.sum(gx * gx)
        b = jnp.sum(gx * gy)
        c = jnp.sum(gy * gy)
        det = a * c - b * b
        tr = a + c
        eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        good_grad = eig_min / offs.shape[0] > min_eig
        inv_det = jnp.where(jnp.abs(det) < 1e-9, 0.0, 1.0 / det)
        nrm = jnp.stack([a, b, c, inv_det])
        return T.reshape(S, S), gx.reshape(S, S), gy.reshape(S, S), nrm, good_grad

    return jax.vmap(one)(uv0, warp)


def _track_level(img0, img1, uv0, uv1, warp, radius: int, iters: int,
                 min_eig: float, use_pallas: bool = False):
    """One pyramid level of IC-LK for all features. uv in this level's scale.

    ``warp`` (N,2,2) maps target-patch offsets to template-patch offsets
    (SVO-style affine reference-patch warp).  It is dimensionless, so the
    same matrix applies at every pyramid level.  Identity = classic LK.
    """
    T, gx, gy, nrm, good_grad = _templates(img0, uv0, warp, radius, min_eig)
    H, W = img1.shape
    S = 2 * radius + 1

    if use_pallas:
        from sadvio_tpu.ops import klt_kernel

        out = klt_kernel.lk_iterate(img1, uv1, T, gx, gy, nrm, iters=iters)
        uv = out[:, :2]
        err = out[:, 2]
    else:
        offs = _patch_coords(radius)

        def one(uv1_i, T_i, gx_i, gy_i, nrm_i):
            a, b, c, inv_det = nrm_i
            Tf, gxf, gyf = T_i.reshape(-1), gx_i.reshape(-1), gy_i.reshape(-1)

            def body(_, uv):
                I = bilinear_sample(img1, uv[None] + offs)
                e = I - Tf
                bx = jnp.sum(e * gxf)
                by = jnp.sum(e * gyf)
                du = (c * bx - b * by) * inv_det
                dv = (a * by - b * bx) * inv_det
                return uv - jnp.stack([du, dv])

            uv = jax.lax.fori_loop(0, iters, body, uv1_i)
            I = bilinear_sample(img1, uv[None] + offs)
            return uv, jnp.mean(jnp.abs(I - Tf))

        uv, err = jax.vmap(one)(uv1, T, gx, gy, nrm)

    inb = (
        (uv[:, 0] >= radius) & (uv[:, 0] < W - radius)
        & (uv[:, 1] >= radius) & (uv[:, 1] < H - radius)
    )
    return uv, good_grad & inb, err


@partial(jax.jit, static_argnames=("levels", "radius", "iters", "use_pallas"))
def track(pyr0, pyr1, uv0, uv_init, valid0, *, levels: int = 3, radius: int = 7,
          iters: int = 10, min_eig: float = 1e-3, fb_thresh: float = 0.5,
          max_err: float = 20.0, warp=None, use_pallas: bool = False):
    """Track features uv0 from pyramid pyr0 to pyr1 with initial guess uv_init.

    Returns (uv1, valid, err).  Forward-backward consistency < fb_thresh px
    (Point2DFeatureTracker.cpp:104-106).  pyr0/pyr1: tuples from
    build_pyramid (cached per sensor like the reference's _pyramids).

    ``warp`` (N,2,2), optional: per-feature affine template warp (maps
    target-patch offsets to template-patch offsets).  Supply the
    geometry-predicted warp when the camera moves toward/away from the
    scene -- pure-translation LK otherwise picks up a radial scale bias
    that masquerades as forward translation in the pose solve.
    """
    N = uv0.shape[0]
    if warp is None:
        warp = jnp.broadcast_to(jnp.eye(2), (N, 2, 2))
    # inverse warp for the backward pass; guard singular warps
    det = warp[:, 0, 0] * warp[:, 1, 1] - warp[:, 0, 1] * warp[:, 1, 0]
    good_w = (det > 0.25) & (det < 4.0) & jnp.all(jnp.isfinite(warp), (1, 2))
    eye = jnp.broadcast_to(jnp.eye(2), (N, 2, 2))
    warp = jnp.where(good_w[:, None, None], warp, eye)
    inv = jnp.stack([
        jnp.stack([warp[:, 1, 1], -warp[:, 0, 1]], -1),
        jnp.stack([-warp[:, 1, 0], warp[:, 0, 0]], -1),
    ], -2) / jnp.where(good_w, det, 1.0)[:, None, None]

    def run(pa, pb, uv_a, uv_b0, A):
        uv = uv_b0 / (2 ** (levels - 1))
        ok = jnp.ones(uv_a.shape[0], bool)
        err = jnp.zeros(uv_a.shape[0], jnp.float32)
        for lvl in range(levels - 1, -1, -1):
            s = 2.0 ** lvl
            H_l, W_l = pb[lvl].shape
            # the Pallas window kernel needs the level image to contain one
            # full (WIN_Y, WIN_X) window; tiny coarse levels use the XLA path
            pallas_l = use_pallas and H_l >= 32 and W_l >= 256
            uv, ok_l, err = _track_level(
                pa[lvl], pb[lvl], uv_a / s, uv, A, radius, iters, min_eig,
                use_pallas=pallas_l,
            )
            ok = ok & ok_l
            if lvl > 0:
                uv = uv * 2.0
        return uv, ok, err

    uv1, ok_f, err = run(pyr0, pyr1, uv0, uv_init, warp)
    uv0_back, ok_b, _ = run(pyr1, pyr0, uv1, uv0, inv)
    fb = jnp.linalg.norm(uv0_back - uv0, axis=-1)
    valid = valid0 & ok_f & ok_b & (fb < fb_thresh) & (err < max_err)
    return uv1, valid, err

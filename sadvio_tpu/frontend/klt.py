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
    """List of images, level 0 = full res; 2x2 average-pool downsampling.

    Sub-levels are edge-padded up to the Pallas LK window (32, 256) so the
    whole pyramid tracks on the kernel path (a 256-lane window with 128-lane
    DMA snapping is the minimum that keeps >=64 lanes of margin around the
    feature).  Level 0 is never padded; true sub-level dims are recomputed
    from level 0 by the consumers (pyramid_dims)."""
    pyr = [img]
    for _ in range(levels - 1):
        x = pyr[-1]
        H, W = x.shape
        x = x[: H - H % 2, : W - W % 2].reshape(H // 2, 2, W // 2, 2).mean((1, 3))
        pyr.append(x)
    out = [pyr[0]]
    for x in pyr[1:]:
        H, W = x.shape
        ph, pw = max(32 - H, 0), max(256 - W, 0)
        # edge replicate via broadcast+concat (jnp.pad mode="edge" lowers to
        # a slower gather on TPU)
        if pw:
            x = jnp.concatenate([x, jnp.broadcast_to(x[:, -1:], (H, pw))], 1)
        if ph:
            x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (ph, x.shape[1]))], 0)
        out.append(x)
    return out


def pyramid_dims(shape0, levels: int):
    """True (H, W) of each pyramid level given the level-0 shape."""
    dims = [tuple(shape0)]
    for _ in range(levels - 1):
        h, w = dims[-1]
        dims.append(((h - h % 2) // 2, (w - w % 2) // 2))
    return dims


def _patch_coords(radius: int):
    r = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([dx.reshape(-1), dy.reshape(-1)], axis=-1)  # (S,2) in (u,v)


def _templates(img0, uv0, warp, radius: int, min_eig: float):
    """Per-feature warped template patch, gradients and 2x2 normal matrix.

    Returns T/gx/gy (N,S,S), nrm (N,4)=[a,b,c,inv_det], good_grad (N,).

    ONE bilinear gather of an (S+2)^2 halo patch per feature; gradients are
    central differences of the warped patch itself.  The warped grid has
    target-pixel spacing along its axes, so differences along patch axes ARE
    the target-coordinate derivatives IC-LK needs (dT/du = nabla I0 . A e_u)
    -- this replaces the previous 5 gather passes (T, +-x, +-y) with 1 at
    identical semantics (0.5 px central steps -> 1.0 px central steps).
    """
    S = 2 * radius + 1
    rh = radius + 1
    r = jnp.arange(-rh, rh + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    offs2 = jnp.stack([dx.reshape(-1), dy.reshape(-1)], axis=-1)  # ((S+2)^2,2)
    Sh = S + 2
    H, W = img0.shape
    # per-feature aligned window sized for a scale<=2 warped halo patch;
    # warps beyond that are rejected upstream (track()'s det gate)
    WS = min(2 * (2 * rh + 2) + 2, H, W)

    # TPU-idiomatic sampling: one aligned dynamic-slice window per feature,
    # then bilinear interpolation as separable row/col one-hot weight
    # matrices contracted against the window -- einsums the MXU executes,
    # instead of (S+2)^2 scattered HBM gathers per feature.
    pts = uv0[:, None, :] + jnp.einsum("sj,nij->nsi", offs2, warp)
    base = jnp.floor(jnp.min(pts, axis=1)) - 1.0
    base = jnp.clip(base, 0.0, jnp.asarray([W - WS, H - WS], jnp.float32))
    bi = base.astype(jnp.int32)
    wins = jax.vmap(
        lambda b: jax.lax.dynamic_slice(img0, (b[1], b[0]), (WS, WS))
    )(bi)

    loc = pts - base[:, None, :]
    ix = jnp.floor(loc[..., 0]).astype(jnp.int32)
    iy = jnp.floor(loc[..., 1]).astype(jnp.int32)
    fx = loc[..., 0] - ix.astype(jnp.float32)
    fy = loc[..., 1] - iy.astype(jnp.float32)
    ix = jnp.clip(ix, 0, WS - 2)
    iy = jnp.clip(iy, 0, WS - 2)
    # bilinear weights factorize as w(r,c) = wy(r) * wx(c): two small
    # (N,S2,WS) one-hot operands instead of one (N,S2,WS^2) -- ~15x less
    # HBM traffic for the same MXU contraction (this einsum pair is the
    # whole-frame KLT cost on TPU, so the factorization matters)
    rowW = (jax.nn.one_hot(iy, WS) * (1 - fy)[..., None]
            + jax.nn.one_hot(iy + 1, WS) * fy[..., None])
    colW = (jax.nn.one_hot(ix, WS) * (1 - fx)[..., None]
            + jax.nn.one_hot(ix + 1, WS) * fx[..., None])
    tmp = jnp.einsum("nsr,nrc->nsc", rowW, wins)
    P = jnp.einsum("nsc,nsc->ns", tmp, colW).reshape(-1, Sh, Sh)

    T = P[:, 1:-1, 1:-1]
    gx = 0.5 * (P[:, 1:-1, 2:] - P[:, 1:-1, :-2])
    gy = 0.5 * (P[:, 2:, 1:-1] - P[:, :-2, 1:-1])
    a = jnp.sum(gx * gx, axis=(1, 2))
    b = jnp.sum(gx * gy, axis=(1, 2))
    c = jnp.sum(gy * gy, axis=(1, 2))
    det = a * c - b * b
    tr = a + c
    eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
    good_grad = eig_min / (S * S) > min_eig
    inv_det = jnp.where(jnp.abs(det) < 1e-9, 0.0, 1.0 / det)
    nrm = jnp.stack([a, b, c, inv_det], axis=-1)
    return T, gx, gy, nrm, good_grad


def _track_level(img0, img1, uv0, uv1, warp, radius: int, iters: int,
                 min_eig: float, true_hw=None, use_pallas: bool = False):
    """One pyramid level of IC-LK for all features. uv in this level's scale.

    ``warp`` (N,2,2) maps target-patch offsets to template-patch offsets
    (SVO-style affine reference-patch warp).  It is dimensionless, so the
    same matrix applies at every pyramid level.  Identity = classic LK.
    ``true_hw``: unpadded level dims for the in-bounds gate (images may be
    edge-padded for the Pallas window, see build_pyramid)."""
    T, gx, gy, nrm, good_grad = _templates(img0, uv0, warp, radius, min_eig)
    H, W = true_hw if true_hw is not None else img1.shape
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


@partial(jax.jit, static_argnames=("levels", "radius", "iters", "use_pallas",
                                   "bwd_levels"))
def track(pyr0, pyr1, uv0, uv_init, valid0, *, levels: int = 3, radius: int = 7,
          iters: int = 10, min_eig: float = 1e-3, fb_thresh: float = 0.5,
          max_err: float = 20.0, warp=None, use_pallas: bool = False,
          bwd_levels: int = 1):
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

    dims = pyramid_dims(pyr0[0].shape, levels)

    def run(pa, pb, uv_a, uv_b0, A, use_levels):
        uv = uv_b0 / (2 ** (use_levels - 1))
        ok = jnp.ones(uv_a.shape[0], bool)
        err = jnp.zeros(uv_a.shape[0], jnp.float32)
        for lvl in range(use_levels - 1, -1, -1):
            s = 2.0 ** lvl
            H_l, W_l = pb[lvl].shape
            # the Pallas window kernel needs the level image to contain one
            # full (WIN_Y, WIN_X) window; build_pyramid pads sub-levels up to
            # it, so this gate only trips for pyramids built elsewhere
            pallas_l = use_pallas and H_l >= 32 and W_l >= 256
            uv, ok_l, err = _track_level(
                pa[lvl], pb[lvl], uv_a / s, uv, A, radius, iters, min_eig,
                true_hw=dims[lvl], use_pallas=pallas_l,
            )
            ok = ok & ok_l
            if lvl > 0:
                uv = uv * 2.0
        return uv, ok, err

    uv1, ok_f, err = run(pyr0, pyr1, uv0, uv_init, warp, levels)
    # backward pass starts AT the answer (uv0), so coarse levels add nothing
    # but cost: level-0-only refinement is the standard f-b check form
    # (the 0.5 px gate below is the same as Point2DFeatureTracker.cpp:104)
    uv0_back, ok_b, _ = run(pyr1, pyr0, uv1, uv0, inv, bwd_levels)
    fb = jnp.linalg.norm(uv0_back - uv0, axis=-1)
    valid = valid0 & ok_f & ok_b & (fb < fb_thresh) & (err < max_err)
    return uv1, valid, err

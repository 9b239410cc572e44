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

# Pallas LK window dims: pyramid sub-levels are padded to this shape so the
# whole pyramid tracks on the kernel path.  Imported (not duplicated) -- the
# pairing drifted once (pyramids padded to 32 while the kernel needed 40).
from sadvio_tpu.ops.klt_kernel import WIN_X as _PWX, WIN_Y as _PWY


def build_pyramid(img, levels: int = 3):
    """List of images, level 0 = full res; 2x2 average-pool downsampling.

    Sub-levels are edge-padded up to the Pallas LK window (40, 256) so the
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
        ph, pw = max(_PWY - H, 0), max(_PWX - W, 0)
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


def _template_ws(radius: int, H: int, W: int) -> int:
    """Template window side: sized for a scale<=2 warped halo patch; warps
    beyond that are rejected upstream (track()'s det gate)."""
    rh = radius + 1
    return min(2 * (2 * rh + 2) + 2, H, W)


def template_windows(img0, uv0, radius: int):
    """Per-feature aligned windows around uv0 -- the image-extraction half
    of template building, split out so the pipeline can CACHE it per
    keyframe: uv0 (the KF feature positions) and img0 (the KF pyramid) are
    constant between keyframes, while the affine warp changes per frame.
    The per-feature dynamic_slice is the expensive part of the template
    stage on TPU (~1.2 ms at N=512), so hoisting it from frame rate to KF
    rate removes it from the tracking hot path.

    Returns (wins (N,WS,WS), base (N,2)).
    """
    H, W = img0.shape
    WS = _template_ws(radius, H, W)
    ctr = jnp.floor(jnp.nan_to_num(uv0, nan=0.0, posinf=0.0, neginf=0.0))
    base = jnp.clip(ctr - (WS // 2), 0.0,
                    jnp.asarray([W - WS, H - WS], jnp.float32))
    bi = base.astype(jnp.int32)
    # row gather (contiguous rows lower well) + one-hot column contraction
    # on the MXU -- bit-exact (each one-hot row has a single 1.0, so the
    # reduction sums one term) and ~1.4x the vmapped 2D dynamic_slice at
    # N=512 on-chip
    ridx = bi[:, 1][:, None] + jnp.arange(WS)[None, :]  # (N,WS)
    rows = img0[ridx]  # (N,WS,W)
    colW = jax.nn.one_hot(bi[:, 0][:, None] + jnp.arange(WS)[None, :], W,
                          dtype=img0.dtype)  # (N,WS,W)
    wins = jax.lax.dot_general(
        rows, colW, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=img0.dtype,
    )  # (N,WS,WS)
    return wins, base


def _templates(img0, uv0, warp, radius: int, min_eig: float, tmpl_win=None):
    """Per-feature warped template patch, gradients and 2x2 normal matrix.

    Returns T/gx/gy (N,S,S), nrm (N,4)=[a,b,c,inv_det], good_grad (N,).

    ONE bilinear gather of an (S+2)^2 halo patch per feature; gradients are
    central differences of the warped patch itself.  The warped grid has
    target-pixel spacing along its axes, so differences along patch axes ARE
    the target-coordinate derivatives IC-LK needs (dT/du = nabla I0 . A e_u)
    -- this replaces the previous 5 gather passes (T, +-x, +-y) with 1 at
    identical semantics (0.5 px central steps -> 1.0 px central steps).

    ``tmpl_win``: optional cached (wins, base) from template_windows(img0,
    uv0, radius) -- pass it to skip the per-feature window extraction.
    """
    S = 2 * radius + 1
    rh = radius + 1
    r = jnp.arange(-rh, rh + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    offs2 = jnp.stack([dx.reshape(-1), dy.reshape(-1)], axis=-1)  # ((S+2)^2,2)
    Sh = S + 2
    H, W = img0.shape
    WS = _template_ws(radius, H, W)

    # TPU-idiomatic sampling: one aligned dynamic-slice window per feature,
    # then bilinear interpolation as separable row/col one-hot weight
    # matrices contracted against the window -- instead of (S+2)^2 scattered
    # HBM gathers per feature.
    pts = uv0[:, None, :] + jnp.einsum("sj,nij->nsi", offs2, warp)
    if tmpl_win is None:
        wins, base = template_windows(img0, uv0, radius)
    else:
        wins, base = tmpl_win

    loc = pts - base[:, None, :]
    ix = jnp.floor(loc[..., 0]).astype(jnp.int32)
    iy = jnp.floor(loc[..., 1]).astype(jnp.int32)
    fx = loc[..., 0] - ix.astype(jnp.float32)
    fy = loc[..., 1] - iy.astype(jnp.float32)
    ix = jnp.clip(ix, 0, WS - 2)
    iy = jnp.clip(iy, 0, WS - 2)
    # bilinear weights factorize as w(r,c) = wy(r) * wx(c): two small
    # (N,S2,WS) one-hot operands instead of one (N,S2,WS^2).  Spelled as
    # fused broadcast-multiply-reduces, NOT einsums: batched tiny matmuls
    # (s=169, r=c~30) lower to per-batch MXU calls ~20x off roofline, while
    # the mul-reduce stays on the VPU at full width (same fix as the BA Hpl
    # term; measured 1.9 ms -> ~0.3 ms per level at N=512).
    rowW = (jax.nn.one_hot(iy, WS) * (1 - fy)[..., None]
            + jax.nn.one_hot(iy + 1, WS) * fy[..., None])
    colW = (jax.nn.one_hot(ix, WS) * (1 - fx)[..., None]
            + jax.nn.one_hot(ix + 1, WS) * fx[..., None])
    tmp = (rowW[:, :, :, None] * wins[:, None, :, :]).sum(2)  # (N,S2,WS)
    P = (tmp * colW).sum(2).reshape(-1, Sh, Sh)

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


_BWY = 32  # batched-engine window rows (patch S<=23 + drift margin)
_BWX = 32  # batched-engine window cols


def _iterate_batched(img1, uv_init, T, gx, gy, nrm, radius: int, iters: int,
                     eps: float = 0.01, conv_mask=None):
    """IC-LK iterations for ALL features at once, windows + fused sampling.

    The third engine for the LK hot loop (alongside the Pallas kernel and
    the per-feature gather path): one (N, 32, 32) window per feature is cut
    from img1 ONCE (vmapped dynamic_slice), and every iteration samples all
    N patches with separable 2-tap one-hot row/col weights contracted as
    fused broadcast-multiply-reduces.  All N features advance together, so
    the cost per iteration is one VPU-wide pass instead of N sequential
    small-vector loops -- measured ~2x faster than the Pallas
    one-window-per-feature kernel on the same chip (1.6 vs 3.2+1.9 ms/level
    at N=512), because the Pallas kernel is bound by per-feature serial
    issue, not by FLOPs.  Patch rows/cols are contiguous, so the integer
    corner and the fractional weights are shared by the whole patch (the
    same structure the Pallas kernel's roll exploits).

    Returns (uv (N,2), err (N,), inwin (N,) window-interior validity).
    """
    N, S, _ = T.shape
    H, W = img1.shape
    half = (S - 1) // 2
    dt_ = img1.dtype

    uv_c = jnp.nan_to_num(uv_init, nan=0.0, posinf=0.0, neginf=0.0)
    base = jnp.clip(
        jnp.floor(uv_c) - jnp.asarray([_BWX // 2, _BWY // 2], dt_),
        0.0,
        jnp.asarray([max(W - _BWX, 0), max(H - _BWY, 0)], dt_),
    )
    bi = base.astype(jnp.int32)
    wins = jax.vmap(
        lambda b: jax.lax.dynamic_slice(img1, (b[1], b[0]), (_BWY, _BWX))
    )(bi)

    ry = jnp.arange(_BWY, dtype=jnp.int32)
    rx = jnp.arange(_BWX, dtype=jnp.int32)
    srange = jnp.arange(S, dtype=dt_)

    def sample(uvc):
        """(N,S,S) bilinear patches at patch-corner position uvc - half."""
        loc = uvc - base - half  # (N,2) window-local corner
        px = loc[:, None, 0] + srange  # (N,S)
        py = loc[:, None, 1] + srange
        ix = jnp.floor(px)
        iy = jnp.floor(py)
        fx = (px - ix)[..., None]
        fy = (py - iy)[..., None]
        ix = jnp.clip(ix.astype(jnp.int32), 0, _BWX - 2)
        iy = jnp.clip(iy.astype(jnp.int32), 0, _BWY - 2)
        wy = ((iy[..., None] == ry) * (1.0 - fy)
              + ((iy[..., None] + 1) == ry) * fy)  # (N,S,WY)
        wx = ((ix[..., None] == rx) * (1.0 - fx)
              + ((ix[..., None] + 1) == rx) * fx)  # (N,S,WX)
        # batched dot_general, NOT broadcast-mul-reduce: at these shapes
        # ((N,S,WY)x(N,WY,WX), S=11, WY=WX=32) the batched matmul lowering
        # measured 6x faster than the fused mul-reduce on TPU (the opposite
        # tradeoff from the template stage's (S2=169, WS~30) shapes)
        rows = jax.lax.dot_general(
            wy, wins, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (N,S,WX)
        return jax.lax.dot_general(
            rows, wx, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (N,S,S)

    a, b, c, inv_det = nrm[:, 0], nrm[:, 1], nrm[:, 2], nrm[:, 3]

    # epsilon early exit (cv::TermCriteria eps=0.01 semantics): the batch
    # advances in lock-step, so the loop runs until every CONSIDERED feature
    # (conv_mask, default all) has a sub-eps step; a non-finite step counts
    # as converged so one divergent feature cannot pin the loop at the cap
    eps2 = jnp.asarray(eps * eps, jnp.float32)
    cmask = (jnp.ones(uv_c.shape[0], bool) if conv_mask is None
             else conv_mask)

    def cond(carry):
        uvc, it, moving = carry
        return (it < iters) & moving

    def body(carry):
        uvc, it, _ = carry
        e = sample(uvc) - T
        bx = (e * gx).sum((1, 2))
        by = (e * gy).sum((1, 2))
        du = (c * bx - b * by) * inv_det
        dv = (a * by - b * bx) * inv_det
        step2 = du * du + dv * dv
        moving = jnp.any(cmask & (step2 > eps2))
        return uvc - jnp.stack([du, dv], -1), it + 1, moving

    uv, _, _ = jax.lax.while_loop(
        cond, body, (uv_c, jnp.int32(0), jnp.asarray(True)))
    err = jnp.abs(sample(uv) - T).mean((1, 2))
    # reject tracks whose sampling clamped at the window edge
    loc = uv - base
    inwin = (
        (loc[:, 0] >= half) & (loc[:, 0] <= _BWX - half - 2)
        & (loc[:, 1] >= half) & (loc[:, 1] <= _BWY - half - 2)
    )
    return uv, err, inwin


def _track_level(img0, img1, uv0, uv1, warp, radius: int, iters: int,
                 min_eig: float, true_hw=None, engine: str = "batched",
                 tmpl_win=None, eps: float = 0.01, conv_mask=None):
    """One pyramid level of IC-LK for all features. uv in this level's scale.

    ``warp`` (N,2,2) maps target-patch offsets to template-patch offsets
    (SVO-style affine reference-patch warp).  It is dimensionless, so the
    same matrix applies at every pyramid level.  Identity = classic LK.
    ``true_hw``: unpadded level dims for the in-bounds gate (images may be
    edge-padded for the Pallas window, see build_pyramid).

    ``engine``: "batched" (default; all-features-at-once windowed sampling),
    "pallas" (one-window-per-feature TPU kernel), "gather" (per-feature
    bilinear gathers from the full image -- the portable baseline)."""
    T, gx, gy, nrm, good_grad = _templates(img0, uv0, warp, radius, min_eig,
                                           tmpl_win=tmpl_win)
    H, W = true_hw if true_hw is not None else img1.shape
    S = 2 * radius + 1

    if engine == "batched":
        uv, err, inwin = _iterate_batched(img1, uv1, T, gx, gy, nrm, radius,
                                          iters, eps=eps, conv_mask=conv_mask)
        good_grad = good_grad & inwin
    elif engine == "pallas":
        from sadvio_tpu.ops import klt_kernel

        out = klt_kernel.lk_iterate(img1, uv1, T, gx, gy, nrm, iters=iters,
                                    eps=eps)
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


def template_windows_pyr(pyr, uv0, levels: int, radius: int):
    """Per-level cached template windows for track(tmpl_wins=...).

    Call once per keyframe with the KF pyramid and KF feature positions;
    the result feeds every subsequent frame's forward track.
    """
    return tuple(
        template_windows(pyr[lvl], uv0 / (2.0 ** lvl), radius)
        for lvl in range(levels)
    )


@partial(jax.jit, static_argnames=("levels", "radius", "iters", "iters_coarse",
                                   "engine", "bwd_levels", "eps"))
def track(pyr0, pyr1, uv0, uv_init, valid0, *, levels: int = 3, radius: int = 7,
          iters: int = 10, iters_coarse: int = 6, min_eig: float = 1e-3,
          fb_thresh: float = 0.5, max_err: float = 20.0, warp=None,
          engine: str = "batched", bwd_levels: int = 1, tmpl_wins=None,
          eps: float = 0.01):
    """Track features uv0 from pyramid pyr0 to pyr1 with initial guess uv_init.

    Returns (uv1, valid, err).  Forward-backward consistency < fb_thresh px
    (Point2DFeatureTracker.cpp:104-106).  pyr0/pyr1: tuples from
    build_pyramid (cached per sensor like the reference's _pyramids).

    ``warp`` (N,2,2), optional: per-feature affine template warp (maps
    target-patch offsets to template-patch offsets).  Supply the
    geometry-predicted warp when the camera moves toward/away from the
    scene -- pure-translation LK otherwise picks up a radial scale bias
    that masquerades as forward translation in the pose solve.

    ``iters_coarse``: iteration CAP for pyramid levels > 0 -- coarse
    levels only localize to ~a pixel before handing down, so fewer
    iterations there cost nothing.  ``eps``: sub-``eps``-pixel update steps
    terminate the iteration early (cv::TermCriteria eps=0.01 semantics,
    Point2DFeatureTracker.cpp criteria): per feature on the pallas engine,
    batch-wide (all considered features sub-eps) on the batched engine.

    ``tmpl_wins``: optional per-level (wins, base) from
    template_windows_pyr(pyr0, uv0, ...) -- the KF-cacheable half of
    template building, hoisting the per-feature window extraction off the
    frame-rate path.  Only valid for the forward pass (pyr0/uv0-derived).
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

    def run(pa, pb, uv_a, uv_b0, A, use_levels, wins_pyr=None, is_bwd=False):
        uv = uv_b0 / (2 ** (use_levels - 1))
        ok = jnp.ones(uv_a.shape[0], bool)
        err = jnp.zeros(uv_a.shape[0], jnp.float32)
        for lvl in range(use_levels - 1, -1, -1):
            s = 2.0 ** lvl
            H_l, W_l = pb[lvl].shape
            # windowed engines need the level image to contain one full
            # window ((40,256) pallas / (32,32) batched); build_pyramid pads
            # sub-levels, so this only trips for pyramids built elsewhere
            eng = engine
            if engine == "pallas" and not (H_l >= _PWY and W_l >= _PWX):
                eng = "gather"
            if engine == "batched" and not (H_l >= _BWY and W_l >= _BWX):
                eng = "gather"
            # the backward pass starts AT the converged answer, so it only
            # polishes within the fb threshold -- coarse iteration count
            uv, ok_l, err = _track_level(
                pa[lvl], pb[lvl], uv_a / s, uv, A, radius,
                iters if (lvl == 0 and not is_bwd) else iters_coarse, min_eig,
                true_hw=dims[lvl], engine=eng,
                tmpl_win=None if wins_pyr is None else wins_pyr[lvl],
                eps=eps, conv_mask=valid0,
            )
            ok = ok & ok_l
            if lvl > 0:
                uv = uv * 2.0
        return uv, ok, err

    uv1, ok_f, err = run(pyr0, pyr1, uv0, uv_init, warp, levels,
                         wins_pyr=tmpl_wins)
    # backward pass starts AT the answer (uv0), so coarse levels add nothing
    # but cost: level-0-only refinement is the standard f-b check form
    # (the 0.5 px gate below is the same as Point2DFeatureTracker.cpp:104)
    uv0_back, ok_b, _ = run(pyr1, pyr0, uv1, uv0, inv, bwd_levels, is_bwd=True)
    fb = jnp.linalg.norm(uv0_back - uv0, axis=-1)
    valid = valid0 & ok_f & ok_b & (fb < fb_thresh) & (err < max_err)
    return uv1, valid, err

"""Batched feature detection: corner scores + grid-bucketed top-k.

TPU-native replacement for the reference's adaptive bucketed detection
(reference: cpp/src/featuredetectors/aOpenCVFeatureDetector.cpp:40-175 --
cell grid sized from n_total/n_per_cell, occupancy masking around existing
features, per-cell detect + retainBest; and the cv wrappers in
opencv_detectors/*).

Design: the whole image is scored in one fused convolutional pass (VPU), a
3x3 non-max suppression keeps local maxima, existing features suppress a
radius around themselves (occupancy), then a reshape to (gh, gw) cells +
per-cell top_k implements bucketing with *zero* data-dependent control flow.
Output is fixed-capacity slots with a validity mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _shift2d(img, dy, dx):
    """Shift with zero padding (static offsets)."""
    H, W = img.shape
    out = jnp.zeros_like(img)
    ys0, ys1 = max(dy, 0), H + min(dy, 0)
    xs0, xs1 = max(dx, 0), W + min(dx, 0)
    return out.at[ys0:ys1, xs0:xs1].set(img[ys0 - dy : ys1 - dy, xs0 - dx : xs1 - dx])


# FAST 16-pixel Bresenham circle of radius 3
_FAST_CIRCLE = (
    (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
)


def fast_score(img, thresh: float = 10.0, arc: int = 9):
    """FAST-N corner score (semantics of cv::FAST used via
    cvFASTFeatureDetector.cpp): max over arc starts of the min contiguous
    arc response, for bright and dark arcs.  img: (H,W) float.
    """
    diffs = jnp.stack([_shift2d(img, dy, dx) - img for (dx, dy) in _FAST_CIRCLE])
    # (16,H,W); arc minima via a static (16,arc) gather
    import numpy as _np

    arcs = _np.asarray([[(s + i) % 16 for i in range(arc)] for s in range(16)])
    gathered = diffs[jnp.asarray(arcs)]  # (16,arc,H,W)
    bright = jnp.min(gathered, axis=1)  # (16,H,W)
    dark = jnp.min(-gathered, axis=1)
    score = jnp.maximum(jnp.max(bright, axis=0), jnp.max(dark, axis=0))
    return jnp.where(score > thresh, score, 0.0)


def shi_tomasi_score(img, window: int = 3):
    """Min-eigenvalue corner score (GFTT/ShiTomasi wrapper semantics)."""
    gx = 0.5 * (_shift2d(img, 0, 1) - _shift2d(img, 0, -1))
    gy = 0.5 * (_shift2d(img, 1, 0) - _shift2d(img, -1, 0))
    k = jnp.ones((window, window), img.dtype) / (window * window)

    def box(x):
        return jax.lax.conv_general_dilated(
            x[None, None], k[None, None], (1, 1), "SAME",
            precision=jax.lax.Precision.DEFAULT,
        )[0, 0]

    gxx, gyy, gxy = box(gx * gx), box(gy * gy), box(gx * gy)
    tr = 0.5 * (gxx + gyy)
    det = jnp.sqrt(jnp.maximum((0.5 * (gxx - gyy)) ** 2 + gxy * gxy, 0.0))
    return jnp.maximum(tr - det, 0.0)


def _nms3(score):
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= m, score, 0.0)


def occupancy_mask(H, W, uv, valid, radius: int = 5):
    """Suppression map: 0 inside `radius` (chebyshev) of an existing feature.

    Mirrors the r=5 mask circles of aOpenCVFeatureDetector.cpp:86-95, via a
    scatter + max-pool dilation (no per-feature loops).
    """
    occ = jnp.zeros((H, W), jnp.float32)
    ui = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, H - 1)
    occ = occ.at[vi, ui].max(valid.astype(jnp.float32))
    k = 2 * radius + 1
    occ = jax.lax.reduce_window(occ, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME")
    return occ < 0.5  # True where detection allowed


@partial(jax.jit, static_argnames=("gh", "gw", "k_per_cell", "margin"))
def grid_topk(score, allow, gh: int, gw: int, k_per_cell: int, margin: int = 8):
    """Bucketed selection: top k_per_cell per (gh,gw) cell.

    Returns uv (N,2) float pixel coords, s (N,) scores, valid (N,) with
    N = gh*gw*k_per_cell.  Cells are equal-size crops (image cropped to a
    multiple of the grid); border margin is excluded.
    """
    H, W = score.shape
    ch, cw = H // gh, W // gw
    border = jnp.zeros_like(score, dtype=bool)
    border = border.at[margin : H - margin, margin : W - margin].set(True)
    s = jnp.where(allow & border, score, 0.0)
    s = s[: gh * ch, : gw * cw].reshape(gh, ch, gw, cw).transpose(0, 2, 1, 3)
    s = s.reshape(gh * gw, ch * cw)
    top, idx = jax.lax.top_k(s, k_per_cell)  # (cells, k)
    cy = idx // cw
    cx = idx % cw
    cell = jnp.arange(gh * gw)[:, None]
    gy = (cell // gw) * ch
    gx = (cell % gw) * cw
    u = (gx + cx).astype(jnp.float32).reshape(-1)
    v = (gy + cy).astype(jnp.float32).reshape(-1)
    valid = (top > 0.0).reshape(-1)
    return jnp.stack([u, v], axis=-1), top.reshape(-1), valid


def detect_features(img, existing_uv=None, existing_valid=None, *,
                    kind: str = "fast", gh: int = 8, gw: int = 12,
                    k_per_cell: int = 5, thresh: float = 10.0, radius: int = 5):
    """End-to-end detection on one image -> fixed-capacity feature slots.

    Equivalent of AOpenCVFeatureDetector::detectAndComputeGrid
    (aOpenCVFeatureDetector.cpp:40-151), fully batched.
    """
    H, W = img.shape
    score = fast_score(img, thresh) if kind == "fast" else shi_tomasi_score(img)
    score = _nms3(score)
    if existing_uv is not None:
        allow = occupancy_mask(H, W, existing_uv, existing_valid, radius)
    else:
        allow = jnp.ones((H, W), bool)
    return grid_topk(score, allow, gh, gw, k_per_cell)


# ---------------------------------------------------------------------------
# descriptors: BRIEF-style binary on a smoothed patch
# ---------------------------------------------------------------------------


def _brief_offsets(n_bits: int = 256, patch: int = 24, seed: int = 7):
    """Static random sampling-pair table (ORB-paper style, isotropic)."""
    import numpy as np

    r = np.random.default_rng(seed)
    pts = r.normal(0.0, patch / 5.0, size=(2, n_bits, 2)).clip(-patch / 2, patch / 2)
    return jnp.asarray(pts, jnp.float32)  # (2, n_bits, 2) [pair, bit, (dx,dy)]


_BRIEF = _brief_offsets()


def bilinear_sample(img, uv):
    """Bilinear interpolation. uv: (...,2) in (u=x, v=y) pixel coords."""
    H, W = img.shape
    u = jnp.clip(uv[..., 0], 0.0, W - 1.001)
    v = jnp.clip(uv[..., 1], 0.0, H - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    i00 = img[v0, u0]
    i01 = img[v0, u0 + 1]
    i10 = img[v0 + 1, u0]
    i11 = img[v0 + 1, u0 + 1]
    return (
        i00 * (1 - du) * (1 - dv) + i01 * du * (1 - dv)
        + i10 * (1 - du) * dv + i11 * du * dv
    )


def window_sample(img, centers, pts, ws: int):
    """Bilinear-sample pts (N,S,2) via one aligned (ws,ws) window per row.

    Returns (values (N,S), inwin (N,S)).  Points outside their window are
    clamp-sampled and flagged False.  The per-row window (one vmapped
    dynamic_slice) + separable one-hot weight contraction replaces N*S
    scattered image gathers -- the TPU sampling pattern shared by the KLT
    template stage, the mesh ZNCC patches, and the BRIEF descriptor pairs.
    """
    H, W = img.shape
    ws = min(ws, H, W)
    c = jnp.nan_to_num(centers, nan=0.0, posinf=0.0, neginf=0.0)
    base = jnp.clip(jnp.floor(c) - (ws // 2), 0.0,
                    jnp.asarray([W - ws, H - ws], jnp.float32))
    wins = jax.vmap(
        lambda b: jax.lax.dynamic_slice(img, (b[1], b[0]), (ws, ws))
    )(base.astype(jnp.int32))

    loc = pts - base[:, None, :]
    ix = jnp.floor(loc[..., 0]).astype(jnp.int32)
    iy = jnp.floor(loc[..., 1]).astype(jnp.int32)
    fx = loc[..., 0] - ix
    fy = loc[..., 1] - iy
    inwin = (ix >= 0) & (ix <= ws - 2) & (iy >= 0) & (iy <= ws - 2)
    ix = jnp.clip(ix, 0, ws - 2)
    iy = jnp.clip(iy, 0, ws - 2)
    rowW = (jax.nn.one_hot(iy, ws) * (1 - fy)[..., None]
            + jax.nn.one_hot(iy + 1, ws) * fy[..., None])  # (N,S,ws)
    colW = (jax.nn.one_hot(ix, ws) * (1 - fx)[..., None]
            + jax.nn.one_hot(ix + 1, ws) * fx[..., None])
    rows = jax.lax.dot_general(rowW, wins, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)  # (N,S,ws)
    vals = jnp.sum(rows * colW, axis=-1)
    return vals, inwin


def brief_describe(img_smooth, uv):
    """256-bit BRIEF descriptors packed as (N, 8) uint32.

    Replaces the reference's OpenCV ORB/BRISK descriptor computation
    (aOpenCVFeatureDetector.cpp:149-151 batch describe); rotation invariance
    is intentionally omitted (KLT is the primary tracker, matching uses
    predicted search boxes -- afeaturematcher.cpp:7-63).
    """
    # both pair endpoints sampled from ONE window per feature (the BRIEF
    # patch is 24 px wide) instead of N*512 scattered gathers
    pts = jnp.concatenate([uv[:, None, :] + _BRIEF[0][None],
                           uv[:, None, :] + _BRIEF[1][None]], axis=1)
    vals, _ = window_sample(img_smooth, uv, pts, ws=32)
    n = _BRIEF[0].shape[0]
    va, vb = vals[:, :n], vals[:, n:]
    bits = (va > vb).astype(jnp.uint32)  # (N, 256)
    bits = bits.reshape(uv.shape[0], 8, 32)
    weights = (1 << jnp.arange(32, dtype=jnp.uint32)).astype(jnp.uint32)
    return jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.uint32)


def smooth3(img):
    """3x3 binomial blur (descriptor pre-smoothing)."""
    k = jnp.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]], img.dtype) / 16.0
    return jax.lax.conv_general_dilated(
        img[None, None], k[None, None], (1, 1), "SAME",
        precision=jax.lax.Precision.DEFAULT,
    )[0, 0]

"""Pallas TPU kernel for the inverse-compositional LK iteration loop.

The KLT hot loop (SURVEY.md hot-loop #2; reference
cpp/src/featurematchers/Point2DFeatureTracker.cpp:64-87) is gather-bound:
every iteration samples an 11x11 patch per feature at a fractional position.
XLA lowers the naive formulation to per-pixel gathers from HBM.  This kernel
exploits two structural facts:

* The target patch samples a *regular grid* at a shared fractional offset,
  so one bilinear patch = 4 scalar-weighted shifted slices of a local
  window -- no gather at all.
* All iterations of one feature stay within a few pixels of the start, so a
  single (WIN_Y, WIN_X) window DMA'd HBM->VMEM once per feature serves every
  iteration (the reference's per-level cv::buildOpticalFlowPyramid cache
  plays the same role on CPU).

Grid = one program per feature; the window copy is a manual async DMA and
the iteration loop runs entirely out of VMEM.

Template patches/gradients are prepared once per frame by the caller (they
involve the per-feature affine warp -- arbitrary fractional offsets, done
with the XLA gather path where it is cheap because it runs once, not
per-iteration).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_Y = 40  # window rows (origin snapped to the 8-sublane tiling); 40 rows
#             place the feature 16-23 rows deep and leave a symmetric ±6-row
#             drift budget for the 16-row iteration slab at radius<=7 (32
#             rows clipped the slab after +2 rows of downward drift for
#             features high in their 8-row bucket -- silently wrong patches)
WIN_X = 256  # window cols (origin snapped to the 128-lane tiling; 2 tiles
#              so the patch never sits at a tile boundary)


FEATS = 8  # features per program: amortizes program startup + overlaps DMAs


def _lk_kernel(uv_ref, T_ref, gx_ref, gy_ref, nrm_ref, img_ref, out_ref,
               win, wscr, wal, sem, *, S: int, iters: int, height: int,
               width: int, eps: float):
    """FEATS features per program: pipelined window DMAs, then per-feature
    IC-LK iteration loops out of VMEM.

    One-feature-per-program spent most of its time in fixed per-program
    overhead (4096 program instances per tracked frame); batching 8 features
    starts all 8 window copies back-to-back so DMA latency overlaps the
    compute of earlier features."""
    half = (S - 1) // 2
    max_ox = (max(width - WIN_X, 0) // 128) * 128
    max_oy = (max(height - WIN_Y, 0) // 8) * 8

    def origin(f):
        # window origin: tile-aligned (DMA slices must start on the (8,128)
        # tiling), positioned so the feature keeps >=64 lanes margin and
        # sits ~16-23 rows into the window (the per-iteration 16-row slab
        # then covers the patch across a symmetric +-6-row drift budget)
        u0 = uv_ref[f, 0, 0]
        v0 = uv_ref[f, 0, 1]
        ox = jnp.clip(((jnp.floor(u0).astype(jnp.int32) - 64) // 128) * 128,
                      0, max_ox)
        oy = jnp.clip(((jnp.floor(v0).astype(jnp.int32) - 16) // 8) * 8,
                      0, max_oy)
        return pl.multiple_of(ox, 128), pl.multiple_of(oy, 8)

    def dma_f(f, ox, oy):
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(oy, WIN_Y), pl.ds(ox, WIN_X)],
            win.at[f], sem.at[f],
        )

    origins = [origin(f) for f in range(FEATS)]
    for f in range(FEATS):
        dma_f(f, *origins[f]).start()

    # rows read per iteration: patch needs S+1; round up to a sublane tile
    ROWS = 16

    for f in range(FEATS):
        u0 = uv_ref[f, 0, 0]
        v0 = uv_ref[f, 0, 1]
        ox, oy = origins[f]
        T = T_ref[f]
        gx = gx_ref[f]
        gy = gy_ref[f]
        a = nrm_ref[f, 0, 0]
        b = nrm_ref[f, 0, 1]
        c = nrm_ref[f, 0, 2]
        inv_det = nrm_ref[f, 0, 3]
        dma_f(f, ox, oy).wait()
        # lane-align ONCE with a dynamic LANE roll (exact on Mosaic) and
        # keep 128 lanes; rows stay window-aligned.  NOTE dynamic SUBLANE
        # pltpu.roll is MISCOMPILED on this platform (any nonzero dynamic
        # sublane shift returns garbage -- verified in isolation), so all
        # row addressing below uses dynamic sublane SLICES instead.
        c0x = jnp.floor(uv_ref[f, 0, 0]).astype(jnp.int32) - ox
        wscr[:, :] = pltpu.roll(win.at[f][:], -(c0x - 48), 1)[:, :128]
        base_x = ox + c0x - 48  # image x of subwindow lane 0
        base_y = oy

        def corner_frac(u, v):
            """Integer patch corner (clipped) + fractional offsets.

            Per iteration the patch is fetched as wscr[ds(iy, ROWS)] (a
            dynamic sublane slice) followed by a dynamic lane roll by ix --
            the two addressing primitives Mosaic compiles correctly; the
            four bilinear taps are static +-1 shifts of that slab.  Drift
            budget from the centered start: ~±40 lanes / +-6 rows, beyond
            LK's convergence basin (escapees die at the fb-check).
            """
            lx = u - base_x.astype(u.dtype) - half
            ly = v - base_y.astype(v.dtype) - half
            ix = jnp.floor(lx).astype(jnp.int32)
            iy = jnp.floor(ly).astype(jnp.int32)
            fx = lx - ix.astype(u.dtype)
            fy = ly - iy.astype(u.dtype)
            ix = jnp.clip(ix, 0, 128 - S - 1)
            iy = jnp.clip(iy, 0, WIN_Y - ROWS)
            return ix, iy, fx, fy

        def align(ix, iy, ixp, iyp):
            """Corner-align the iteration slab into scratch; the integer
            corner stops moving after ~2 LK iterations, so the dynamic
            slice + lane roll run predicated on an actual corner move
            (predicated STORES are fine on Mosaic; only dynamic sublane
            pltpu.roll is broken)."""

            @pl.when((ix != ixp) | (iy != iyp))
            def _():
                wal[:, :] = pltpu.roll(wscr[pl.ds(iy, ROWS), :], -ix, 1)

        def patch(fx, fy):
            """(S,S) bilinear patch from the corner-aligned scratch."""
            p00 = wal[:S, :S]
            p01 = wal[:S, 1 : S + 1]
            p10 = wal[1 : S + 1, :S]
            p11 = wal[1 : S + 1, 1 : S + 1]
            return (
                p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
                + p10 * (1 - fx) * fy + p11 * fx * fy
            )

        eps2 = jnp.asarray(eps * eps, u0.dtype)

        def cond(carry):
            u, v, ixp, iyp, it, step2 = carry
            # epsilon early exit (cv::TermCriteria eps=0.01 semantics,
            # Point2DFeatureTracker.cpp criteria); NaN step2 compares False
            # so divergent features exit instead of spinning
            return (it < iters) & (step2 > eps2)

        def body(carry):
            u, v, ixp, iyp, it, _ = carry
            ix, iy, fx, fy = corner_frac(u, v)
            align(ix, iy, ixp, iyp)
            e = patch(fx, fy) - T
            bx = jnp.sum(e * gx)
            by = jnp.sum(e * gy)
            du = (c * bx - b * by) * inv_det
            dv = (a * by - b * bx) * inv_det
            return (u - du, v - dv, ix, iy, it + 1, du * du + dv * dv)

        u, v, ixp, iyp, _, _ = jax.lax.while_loop(
            cond, body,
            (u0, v0, jnp.int32(-1000), jnp.int32(-1000), jnp.int32(0),
             jnp.asarray(jnp.inf, u0.dtype)),
        )

        # final residual for the quality gate
        ix, iy, fx, fy = corner_frac(u, v)
        align(ix, iy, ixp, iyp)
        err = jnp.mean(jnp.abs(patch(fx, fy) - T))
        out_ref[f, 0, 0] = u
        out_ref[f, 0, 1] = v
        out_ref[f, 0, 2] = err


@functools.partial(jax.jit, static_argnames=("iters", "eps", "interpret"))
def lk_iterate(img1, uv_init, T, gx, gy, nrm, *, iters: int = 10,
               eps: float = 0.01, interpret: bool = False):
    """Run the IC-LK iteration loop for all features on one pyramid level.

    img1 (H,W); uv_init (N,2); T/gx/gy (N,S,S) template patch + gradients;
    nrm (N,4) = [a, b, c, inv_det] of the 2x2 template normal matrix.
    ``iters`` caps the loop; each feature exits when its update step drops
    below ``eps`` pixels.  Returns (N,3): refined u, v, mean-abs residual.
    """
    N, S, _ = T.shape
    H, W = img1.shape
    # the 16-row iteration slab must cover an S-row patch plus one bilinear
    # tap; beyond radius 7 the slab addressing silently samples wrong rows
    assert S + 1 <= 16, f"klt pallas kernel supports radius<=7 (S={S})"
    # pad the feature axis to a FEATS multiple (padded rows iterate on
    # clipped windows and are discarded by the caller's slice)
    F = FEATS
    Np = ((N + F - 1) // F) * F
    if Np != N:
        padn = lambda x: jnp.concatenate(
            [x, jnp.zeros((Np - N, *x.shape[1:]), x.dtype)]
        )
        uv_init, T, gx, gy, nrm = map(padn, (uv_init, T, gx, gy, nrm))
    kern = functools.partial(
        _lk_kernel, S=S, iters=iters, height=H, width=W, eps=eps
    )
    # small per-feature vectors carry a singleton middle axis so their last
    # two block dims exactly match the array dims (TPU block-mapping rule)
    out = pl.pallas_call(
        kern,
        grid=(Np // F,),
        in_specs=[
            pl.BlockSpec((F, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((F, S, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, S, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, S, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 1, 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # full image, DMA'd manually
        ],
        out_specs=pl.BlockSpec((F, 1, 3), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 1, 3), img1.dtype),
        scratch_shapes=[
            pltpu.VMEM((F, WIN_Y, WIN_X), img1.dtype),
            pltpu.VMEM((WIN_Y, 128), img1.dtype),
            pltpu.VMEM((16, 128), img1.dtype),
            pltpu.SemaphoreType.DMA((F,)),
        ],
        interpret=interpret,
    )(uv_init.reshape(Np, 1, 2), T, gx, gy, nrm.reshape(Np, 1, 4), img1)
    return out.reshape(Np, 3)[:N]

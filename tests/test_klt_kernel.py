"""Pallas LK-iteration kernel vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.frontend import klt
from sadvio_tpu.ops import klt_kernel

H, W = 96, 320  # big enough for one (32,256) kernel window
R = 5
S = 2 * R + 1


@pytest.fixture(scope="module")
def textured():
    rng = np.random.default_rng(7)
    base = rng.standard_normal((H // 4, W // 4))
    img = np.kron(base, np.ones((4, 4)))  # blocky
    # smooth a little so gradients exist everywhere
    k = np.array([0.25, 0.5, 0.25])
    for ax in (0, 1):
        img = np.apply_along_axis(lambda m: np.convolve(m, k, "same"), ax, img)
    img = (img - img.min()) / (img.max() - img.min()) * 200.0
    return jnp.asarray(img, jnp.float32)


def shift_image(img, dx, dy):
    """Bilinear shift (true subpixel translation)."""
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pts = jnp.stack([xs + dx, ys + dy], -1)
    from sadvio_tpu.frontend.detect import bilinear_sample

    return bilinear_sample(img, pts)


def test_pallas_matches_xla(textured):
    img0 = textured
    dx, dy = 1.7, -1.2
    img1 = shift_image(img0, dx, dy)

    rng = np.random.default_rng(1)
    N = 24
    uv0 = jnp.asarray(np.stack([
        rng.uniform(80, 240, N), rng.uniform(40, 56, N)
    ], -1), jnp.float32)
    warp = jnp.broadcast_to(jnp.eye(2), (N, 2, 2))
    T, gx, gy, nrm, good = klt._templates(img0, uv0, warp, R, 1e-3)

    out = klt_kernel.lk_iterate(img1, uv0, T, gx, gy, nrm, iters=12,
                                interpret=True)
    uv_pal = np.asarray(out[:, :2])
    # truth: feature at uv0 in img0 appears at uv0 - (dx,dy) in img1
    expect = np.asarray(uv0) - np.array([dx, dy])
    err = np.linalg.norm(uv_pal - expect, axis=-1)
    g = np.asarray(good)
    assert g.sum() > N * 0.8
    assert np.median(err[g]) < 0.1, f"median err {np.median(err[g]):.3f}"

    # and agreement with the XLA iterate path
    uv_xla, ok_xla, _ = klt._track_level(
        img0, img1, uv0, uv0, warp, R, 12, 1e-3, engine="gather"
    )
    d = np.linalg.norm(uv_pal - np.asarray(uv_xla), axis=-1)
    assert np.median(d[g]) < 0.05, f"pallas-vs-xla median {np.median(d[g]):.3f}"


def test_batched_engine_matches_gather(textured):
    """The all-features-at-once windowed engine converges to the same optima
    as the per-feature gather baseline (same templates, same iteration)."""
    img0 = textured
    dx, dy = 1.7, -1.2
    img1 = shift_image(img0, dx, dy)

    rng = np.random.default_rng(3)
    N = 24
    uv0 = jnp.asarray(np.stack([
        rng.uniform(80, 240, N), rng.uniform(40, 56, N)
    ], -1), jnp.float32)
    warp = jnp.broadcast_to(jnp.eye(2), (N, 2, 2))

    uv_b, ok_b, _ = klt._track_level(
        img0, img1, uv0, uv0, warp, R, 12, 1e-3, engine="batched"
    )
    uv_g, ok_g, _ = klt._track_level(
        img0, img1, uv0, uv0, warp, R, 12, 1e-3, engine="gather"
    )
    expect = np.asarray(uv0) - np.array([dx, dy])
    g = np.asarray(ok_b & ok_g)
    assert g.sum() > N * 0.8
    err = np.linalg.norm(np.asarray(uv_b) - expect, axis=-1)
    assert np.median(err[g]) < 0.1, f"median err {np.median(err[g]):.3f}"
    d = np.linalg.norm(np.asarray(uv_b) - np.asarray(uv_g), axis=-1)
    assert np.median(d[g]) < 0.05, f"batched-vs-gather median {np.median(d[g]):.3f}"


def test_batched_engine_full_track(textured):
    """Full pyramidal track() with the batched engine: fb-check survives and
    recovers a multi-pixel shift from a zero initial guess."""
    img0 = textured
    dx, dy = 5.5, -3.25
    img1 = shift_image(img0, dx, dy)
    pyr0 = klt.build_pyramid(img0, 3)
    pyr1 = klt.build_pyramid(img1, 3)

    rng = np.random.default_rng(4)
    N = 24
    uv0 = jnp.asarray(np.stack([
        rng.uniform(80, 240, N), rng.uniform(40, 56, N)
    ], -1), jnp.float32)
    valid0 = jnp.ones((N,), bool)
    uv1, valid, err = klt.track(pyr0, pyr1, uv0, uv0, valid0,
                                levels=3, radius=R, engine="batched")
    v = np.asarray(valid)
    assert v.sum() > N * 0.7
    expect = np.asarray(uv0) - np.array([dx, dy])
    e = np.linalg.norm(np.asarray(uv1) - expect, axis=-1)
    assert np.median(e[v]) < 0.15, f"median err {np.median(e[v]):.3f}"

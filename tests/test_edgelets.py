"""Edgelet feature tests (reference pattern: edgelet detector/initializer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.frontend import edgelets
from sadvio_tpu.models import cameras
from sadvio_tpu.utils import geometry as geo

from tests.test_lines import render_segments

W, H = 240, 180


def test_detect_edgelets_on_segments():
    segs = [((30.0, 50.0), (200.0, 70.0)), ((120.0, 20.0), (130.0, 160.0))]
    img = jnp.asarray(render_segments(segs, thickness=1.2))
    uv, tan, s, valid = edgelets.detect_edgelets(img, gh=6, gw=8, k_per_cell=4)
    uv = np.asarray(uv)[np.asarray(valid)]
    tan = np.asarray(tan)[np.asarray(valid)]
    assert len(uv) >= 20
    # each detected edgelet must lie near one segment with matching tangent
    hits = 0
    for p, t in zip(uv, tan):
        for (a, b) in segs:
            a, b = np.asarray(a), np.asarray(b)
            d = b - a
            L = np.linalg.norm(d)
            td = d / L
            r = p - a
            s_par = r @ td
            perp = abs(-r[0] * td[1] + r[1] * td[0])
            if 0 <= s_par <= L and perp < 3.0 and abs(t @ td) > 0.9:
                hits += 1
                break
    assert hits > 0.7 * len(uv)


def test_match_edgelets(rng):
    # grid positions 40 px apart: the 15 px search box then admits only the
    # intended pairing, so the negative control is exact
    gx, gy = np.meshgrid(np.arange(5) * 40.0 + 20, np.arange(6) * 40.0 + 20)
    uv_a = jnp.asarray(np.stack([gx.reshape(-1), gy.reshape(-1)], -1), jnp.float32)
    ang = rng.uniform(0, np.pi, 30)
    dir_a = jnp.asarray(np.stack([np.cos(ang), np.sin(ang)], -1), jnp.float32)
    uv_b = uv_a + 3.0
    idx, _ = edgelets.match_edgelets(
        uv_a, dir_a, jnp.ones(30, bool), uv_b, dir_a, jnp.ones(30, bool)
    )
    assert (np.asarray(idx) == np.arange(30)).mean() > 0.9
    # rotated tangents must not match
    dir_rot = jnp.stack([-dir_a[:, 1], dir_a[:, 0]], -1)
    idx2, _ = edgelets.match_edgelets(
        uv_a, dir_a, jnp.ones(30, bool), uv_b, dir_rot, jnp.ones(30, bool)
    )
    assert (np.asarray(idx2) >= 0).mean() < 0.1


def test_triangulate_edgelet(rng):
    cam = cameras.make_pinhole(150.0, 150.0, W / 2, H / 2, W, H)
    p_true = jnp.asarray([[0.3, -0.2, 4.0], [-0.5, 0.4, 5.0]], jnp.float32)
    d_true = jnp.asarray([[0.8, 0.1, 0.59], [0.0, 0.97, 0.26]], jnp.float32)
    d_true = d_true / jnp.linalg.norm(d_true, axis=-1, keepdims=True)
    R_a, t_a = jnp.eye(3), jnp.zeros(3)
    R_b = geo.so3_exp(jnp.asarray([0.01, -0.03, 0.02], jnp.float32))
    t_b = jnp.asarray([0.25, 0.05, 0.0], jnp.float32)

    def obs(R, t):
        uv0, _ = cameras.project_world(cam, R, t, jnp.eye(3), jnp.zeros(3), p_true)
        uv1, _ = cameras.project_world(
            cam, R, t, jnp.eye(3), jnp.zeros(3), p_true + 0.05 * d_true
        )
        d2 = uv1 - uv0
        return uv0, d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)

    uv_a, dir_a = obs(R_a, t_a)
    uv_b, dir_b = obs(R_b, t_b)
    p, d, ok = edgelets.triangulate_edgelet(
        cam, cam, R_a, t_a, R_b, t_b, uv_a, dir_a, uv_b, dir_b
    )
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_true), atol=5e-3)
    cosd = np.abs(np.sum(np.asarray(d) * np.asarray(d_true), -1))
    np.testing.assert_allclose(cosd, 1.0, atol=1e-3)

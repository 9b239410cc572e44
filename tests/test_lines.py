"""Line-feature tests (reference pattern: linefeature_test.cpp -- detection
on synthetic imagery :231, matching :256, ray geometry / triangulation
:95-162).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.frontend import lines
from sadvio_tpu.models import cameras
from sadvio_tpu.utils import geometry as geo

W, H = 240, 180


def render_segments(segs, width=W, height=H, thickness=1.5, amp=200.0):
    """Rasterize bright line segments on black, with soft edges."""
    ys, xs = np.meshgrid(np.arange(height, dtype=np.float64),
                         np.arange(width, dtype=np.float64), indexing="ij")
    img = np.zeros((height, width))
    for (x0, y0), (x1, y1) in segs:
        d = np.array([x1 - x0, y1 - y0])
        L = np.hypot(*d)
        t = d / L
        rel_x = xs - x0
        rel_y = ys - y0
        s = rel_x * t[0] + rel_y * t[1]
        perp = -rel_x * t[1] + rel_y * t[0]
        on = (s > 0) & (s < L)
        img += amp * on * np.exp(-0.5 * (perp / thickness) ** 2)
    return np.clip(img, 0, 255).astype(np.float32)


SEGS = [
    ((30.0, 40.0), (200.0, 60.0)),
    ((60.0, 150.0), (210.0, 120.0)),
    ((120.0, 20.0), (140.0, 160.0)),
]


def _ends_err(e, seg):
    """Symmetric endpoint distance of detected segment e to true seg."""
    a = np.asarray(e)
    t0 = np.asarray(seg)
    d1 = np.linalg.norm(a[0] - t0[0]) + np.linalg.norm(a[1] - t0[1])
    d2 = np.linalg.norm(a[0] - t0[1]) + np.linalg.norm(a[1] - t0[0])
    return min(d1, d2) / 2


def test_detect_lines():
    img = jnp.asarray(render_segments(SEGS))
    ends, s, valid = lines.detect_lines(img, n_lines=16)
    ends = np.asarray(ends)[np.asarray(valid)]
    assert len(ends) >= 3
    # each true segment must have a detection within a few pixels
    for seg in SEGS:
        errs = [_ends_err(e, seg) for e in ends]
        assert min(errs) < 6.0, f"segment {seg} not found (best {min(errs):.1f})"


def test_match_lines():
    img_a = jnp.asarray(render_segments(SEGS))
    shift = [((x0 + 8, y0 + 3), (x1 + 8, y1 + 3)) for (x0, y0), (x1, y1) in SEGS]
    img_b = jnp.asarray(render_segments(shift))
    ea, sa, va = lines.detect_lines(img_a, n_lines=16)
    eb, sb, vb = lines.detect_lines(img_b, n_lines=16)
    idx, score = lines.match_lines(ea, va, eb, vb)
    idx = np.asarray(idx)
    va_np = np.asarray(va)
    matched = (idx >= 0) & va_np
    assert matched.sum() >= 3
    # matches must connect nearly-parallel lines with consistent midpoints
    for i in np.flatnonzero(matched):
        ma = np.asarray(ea)[i].mean(0)
        mb = np.asarray(eb)[idx[i]].mean(0)
        assert np.linalg.norm(ma - mb) < 30.0


def test_triangulate_line_and_residual(rng):
    cam = cameras.make_pinhole(150.0, 150.0, W / 2, H / 2, W, H)
    # 3D segment in front of two cameras
    p0 = jnp.asarray([-0.6, 0.2, 4.0], jnp.float32)
    p1 = jnp.asarray([0.8, -0.3, 5.0], jnp.float32)
    R_a, t_a = jnp.eye(3), jnp.zeros(3)
    R_b = geo.so3_exp(jnp.asarray([0.02, -0.04, 0.01], jnp.float32))
    t_b = jnp.asarray([0.3, 0.05, 0.0], jnp.float32)

    def project_ends(R, t):
        uv0, _ = cameras.project_world(cam, R, t, jnp.eye(3), jnp.zeros(3), p0)
        uv1, _ = cameras.project_world(cam, R, t, jnp.eye(3), jnp.zeros(3), p1)
        return jnp.stack([uv0, uv1])

    ends_a = project_ends(R_a, t_a)
    ends_b = project_ends(R_b, t_b)
    q0, q1, ok = lines.triangulate_line(
        cam, cam, R_a, t_a, R_b, t_b, ends_a, ends_b
    )
    assert bool(ok)
    # plane-intersection recovers points on the true infinite line; check
    # collinearity and perpendicular distance instead of exact endpoints
    d = np.asarray(p1 - p0)
    d = d / np.linalg.norm(d)
    for q in (np.asarray(q0), np.asarray(q1)):
        r = q - np.asarray(p0)
        perp = r - d * (r @ d)
        assert np.linalg.norm(perp) < 5e-3

    # residual is zero at the true geometry, nonzero when line moves
    r, vis = lines.line_reproj_residual(
        cam, R_b, t_b, jnp.eye(3), jnp.zeros(3), p0, p1, ends_b
    )
    assert bool(vis)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-3)
    r2, _ = lines.line_reproj_residual(
        cam, R_b, t_b, jnp.eye(3), jnp.zeros(3),
        p0 + jnp.asarray([0.0, 0.08, 0.0]), p1, ends_b,
    )
    assert np.abs(np.asarray(r2)).max() > 1.0

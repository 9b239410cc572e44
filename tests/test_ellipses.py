"""Coded-ellipse fiducial tests: render exact markers, assert recovery.

Synthetic-world pattern of the reference test suite (SURVEY.md §4): the
forward model (marker renderer) generates perfect images; the detector must
invert them — center/axes/ID/orientation, 4-marker pattern grouping, and
planar pose from the grouped corners.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.frontend import ellipses as ell
from sadvio_tpu.utils import geometry as geo

TWO_PI = 2.0 * np.pi
DPHI = TWO_PI / ell.N_RING


def _bits(payload):
    sync = list(ell.SYNC_WORD)
    pay = [(payload >> (7 - i)) & 1 for i in range(8)]
    return np.asarray(sync + pay, np.int32)


def render_marker(img, c, r, payload, *, o=0, ba=1.0, theta=0.0):
    """Draw one coded marker: dark disk radius r + code ring at 1.45r-1.9r.

    `o` rotates the code by o ring samples; `ba` squashes the minor axis
    (viewing-angle ellipse); `theta` rotates the ellipse axes.
    """
    bits = _bits(payload)
    H, W = img.shape
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    dx, dy = xs - c[0], ys - c[1]
    ct, st = np.cos(theta), np.sin(theta)
    ex = ct * dx + st * dy
    ey = (-st * dx + ct * dy) / ba
    rho = np.hypot(ex, ey)
    ang = np.mod(np.arctan2(ey, ex), TWO_PI)
    i = np.round((TWO_PI - ang) / DPHI).astype(np.int64) % ell.N_RING
    slot = ((i - o) % ell.N_RING) // (ell.N_RING // ell.N_SLOTS)
    bit = bits[slot]
    dark = (rho <= r) | ((rho > 1.45 * r) & (rho < 1.9 * r) & (bit == 1))
    img[dark] = 30.0
    return img


def _canvas(H=480, W=480):
    return np.full((H, W), 220.0, np.float64)


def _detect(img, **kw):
    det = ell.detect_coded_ellipses(jnp.asarray(img, jnp.float32), **kw)
    return {k: np.asarray(v) for k, v in det.items()}


def _one(det, want_id):
    hits = np.where(det["valid"] & (det["id"] == want_id))[0]
    assert hits.size == 1, f"marker {want_id}: {hits.size} detections"
    return hits[0]


def test_single_circle_marker():
    img = render_marker(_canvas(), (140.0, 150.0), 30.0, payload=7)
    det = _detect(img)
    k = _one(det, 6407)
    np.testing.assert_allclose(det["center"][k], [140.0, 150.0], atol=1.0)
    np.testing.assert_allclose(det["axes"][k], [30.0, 30.0], rtol=0.06)


def test_rotated_code_orientation():
    o = 24  # code rotated by 24/128 turn
    img = render_marker(_canvas(), (200.0, 230.0), 28.0, payload=3, o=o)
    det = _detect(img)
    k = _one(det, 6403)
    # circle: ellipse angle ~0 -> marker theta = -o*dphi - pi/2 (mod 2pi)
    want = -(o * DPHI) - np.pi / 2
    err = np.mod(det["theta"][k] - want + np.pi, TWO_PI) - np.pi
    assert abs(err) < 0.1


def test_ellipse_viewing_angle():
    img = render_marker(_canvas(), (240.0, 200.0), 30.0, payload=9,
                        ba=0.7, theta=np.deg2rad(30.0))
    det = _detect(img)
    k = _one(det, 6409)
    np.testing.assert_allclose(det["axes"][k], [30.0, 21.0], rtol=0.08)
    np.testing.assert_allclose(det["center"][k], [240.0, 200.0], atol=1.5)


def test_wrong_sync_rejected():
    # payload drawn with a corrupted sync word: flip the sync bits
    img = _canvas()
    bits_backup = ell.SYNC_WORD
    c, r = (150.0, 150.0), 28.0
    bits = np.asarray([1 - b for b in bits_backup] + [0] * 8, np.int32)
    H, W = img.shape
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    rho = np.hypot(xs - c[0], ys - c[1])
    ang = np.mod(np.arctan2(ys - c[1], xs - c[0]), TWO_PI)
    i = np.round((TWO_PI - ang) / DPHI).astype(np.int64) % ell.N_RING
    slot = i // (ell.N_RING // ell.N_SLOTS)
    dark = (rho <= r) | ((rho > 1.45 * r) & (rho < 1.9 * r) & (bits[slot] == 1))
    img[dark] = 30.0
    det = _detect(img)
    assert not np.any(det["valid"] & (det["id"] == 6400))


def _render_pattern(img, anchor, a, pattern_id, *, o=0):
    """4 markers in the grouper's corner geometry for marker_theta=-pi/2."""
    c = np.asarray(anchor, np.float64)
    s = 4.0 * a
    corners = {  # marker_theta = -pi/2 (o=0 render): off_y=(-s,0), off_x=(0,-s)
        1: c,
        2: c + np.asarray([-s, 0.0]),
        3: c + np.asarray([0.0, -s]),
        pattern_id: c + np.asarray([-s, -s]),
    }
    for pid, cc in corners.items():
        render_marker(img, tuple(cc), a, payload=pid, o=o)
    return img, np.stack([corners[1], corners[2], corners[3],
                          corners[pattern_id]])


def test_group_pattern_4():
    img, want_uv = _render_pattern(_canvas(520, 520), (330.0, 330.0), 25.0,
                                   pattern_id=30)
    det = ell.detect_coded_ellipses(jnp.asarray(img, jnp.float32))
    uv, pid, valid = ell.group_patterns_4(det)
    uv, pid, valid = np.asarray(uv), np.asarray(pid), np.asarray(valid)
    hits = np.where(valid)[0]
    assert hits.size == 1
    assert pid[hits[0]] == 30
    np.testing.assert_allclose(uv[hits[0]], want_uv, atol=1.5)


def test_match_patterns_by_id():
    ids_a = jnp.asarray([30, 12, 7])
    ids_b = jnp.asarray([7, 30, 99])
    va = jnp.asarray([True, False, True])
    vb = jnp.asarray([True, True, True])
    idx, ok = ell.match_patterns(ids_a, va, ids_b, vb)
    assert list(np.asarray(ok)) == [True, False, True]
    assert int(idx[0]) == 1 and int(idx[2]) == 0


def test_pattern_pose_recovery():
    K = jnp.asarray([[300.0, 0.0, 240.0], [0.0, 300.0, 240.0], [0.0, 0.0, 1.0]])
    side = 0.4
    R_true = geo.so3_exp(jnp.asarray([0.1, -0.2, 0.15]))
    t_true = jnp.asarray([0.1, -0.05, 2.0])
    xyz = jnp.concatenate(
        [jnp.asarray(ell.MODEL_CORNERS) * side,
         jnp.zeros((4, 1))], axis=-1)
    pc = (R_true @ xyz.T).T + t_true
    uv = (K @ pc.T).T
    uv = uv[:, :2] / uv[:, 2:3]
    R, t = ell.pattern_pose(K, uv, side=side)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_true), atol=1e-3)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_true), atol=1e-3)

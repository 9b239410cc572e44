"""Semantic BBox tests: project a known 3D box, match, re-triangulate.

Synthetic-world pattern (SURVEY.md §4): forward model generates perfect
2-view box detections; matching and two-view init must invert them.
"""

import jax.numpy as jnp
import numpy as np

from sadvio_tpu.frontend import bbox
from sadvio_tpu.models import cameras


def _cam():
    return cameras.Pinhole(
        fx=jnp.asarray(300.0), fy=jnp.asarray(300.0),
        cx=jnp.asarray(240.0), cy=jnp.asarray(240.0),
        width=480, height=480)


def test_iou_and_matching():
    a = jnp.asarray([[[10.0, 10.0], [50.0, 50.0]],
                     [[100.0, 100.0], [140.0, 160.0]],
                     [[0.0, 0.0], [1.0, 1.0]]])
    b = jnp.asarray([[[102.0, 104.0], [141.0, 158.0]],
                     [[12.0, 8.0], [52.0, 49.0]]])
    la = jnp.asarray([1, 2, 3])
    lb = jnp.asarray([2, 1])
    va = jnp.asarray([True, True, False])
    vb = jnp.asarray([True, True])
    idx, ok = bbox.match_bboxes(a, la, va, b, lb, vb)
    assert list(np.asarray(ok)) == [True, True, False]
    assert int(idx[0]) == 1 and int(idx[1]) == 0
    # label mismatch kills the match even at high IoU
    idx2, ok2 = bbox.match_bboxes(a, la, va, b, jnp.asarray([9, 9]), vb)
    assert not bool(ok2[0]) and not bool(ok2[1])


def test_two_view_box_init():
    cam = _cam()
    center_w = jnp.asarray([[0.3, -0.2, 5.0], [-0.5, 0.4, 7.0]])
    scale = jnp.asarray([[0.6, 0.8, 0.8], [1.0, 0.5, 0.5]])
    valid = jnp.asarray([True, True])
    eye = jnp.eye(3)
    t_a = jnp.zeros(3)
    t_b = jnp.asarray([0.8, 0.0, 0.0])

    boxes_a, ok_a = bbox.project_box(cam, eye, t_a, center_w, scale, valid)
    boxes_b, ok_b = bbox.project_box(cam, eye, t_b, center_w, scale, valid)
    assert bool(jnp.all(ok_a)) and bool(jnp.all(ok_b))

    p_w, s, ok = bbox.triangulate_bbox(
        cam, boxes_a, ok_a, eye, t_a, boxes_b, ok_b, eye, t_b)
    assert bool(jnp.all(ok))
    # 2D box center != projected 3D center for a cube (the near face projects
    # wider), so the midpoint solve carries a depth bias ~ scale_z/2 * z-slope
    np.testing.assert_allclose(np.asarray(p_w)[:, :2],
                               np.asarray(center_w)[:, :2], atol=0.05)
    np.testing.assert_allclose(np.asarray(p_w)[:, 2],
                               np.asarray(center_w)[:, 2],
                               atol=0.5 * float(jnp.max(scale[:, 2])) + 0.05)
    # width/height recovered from extents at depth (perspective smear ~ scale/depth)
    np.testing.assert_allclose(np.asarray(s)[:, :2], np.asarray(scale)[:, :2],
                               rtol=0.25)


def test_pose_from_provider():
    R = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    t = jnp.asarray([1.0, 2.0, 3.0])
    p_s = jnp.asarray([[1.0, 0.0, 0.0]])
    p_w, ok = bbox.pose_from_provider((R, t), p_s, jnp.asarray([True]))
    np.testing.assert_allclose(np.asarray(p_w)[0], [1.0, 3.0, 3.0], atol=1e-6)

"""Line-channel pipeline tests: 3D segments -> stereo views -> recovered map.

The forward model projects known 3D segments into both cameras at several
keyframe poses; the channel must detect, stereo-triangulate, track across
keyframes, and refine line landmarks near the true 3D lines (the reference's
linexd flow: detector + matcher + Line3D initializer + landmarkOptimization).
"""

import jax.numpy as jnp
import numpy as np

from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.line_channel import LineChannel

W, H = 320, 240

# deliberately non-epipolar orientations: a 3D line inside the epipolar
# plane (parallel to the stereo baseline) is degenerate for two-view
# plane-intersection triangulation -- same geometry limit as the reference's
# Line3DlandmarkInitializer
SEGS3D = np.asarray([
    [[-2.0, -1.2, 6.0], [1.2, 0.9, 6.4]],
    [[-1.2, 1.4, 7.0], [1.2, -0.6, 6.4]],
    [[0.6, -1.5, 5.5], [0.9, 1.5, 5.8]],
], np.float32)


def _project_seg(rig, c, R, t, seg):
    R_f_s = np.asarray(rig.R_f_s[c])
    t_f_s = np.asarray(rig.t_f_s[c])
    p_f = (seg - t) @ np.asarray(R)  # R^T (p - t) per row
    p_c = (p_f - t_f_s) @ R_f_s
    f = float(rig.cam.fx[c])
    cx, cy = float(rig.cam.cx[c]), float(rig.cam.cy[c])
    u = f * p_c[:, 0] / p_c[:, 2] + cx
    v = f * p_c[:, 1] / p_c[:, 2] + cy
    return np.stack([u, v], -1)


def _render(segs2d, width=W, height=H, thickness=1.5, amp=200.0):
    ys, xs = np.meshgrid(np.arange(height, dtype=np.float64),
                         np.arange(width, dtype=np.float64), indexing="ij")
    img = np.zeros((height, width))
    for (x0, y0), (x1, y1) in segs2d:
        d = np.array([x1 - x0, y1 - y0])
        L = max(np.hypot(*d), 1e-6)
        tt = d / L
        s = (xs - x0) * tt[0] + (ys - y0) * tt[1]
        perp = -(xs - x0) * tt[1] + (ys - y0) * tt[0]
        img += amp * ((s > 0) & (s < L)) * np.exp(-0.5 * (perp / thickness) ** 2)
    return np.clip(img, 0, 255).astype(np.float32)


def _point_line_dist(p, a, b):
    d = b - a
    d = d / np.linalg.norm(d)
    r = p - a
    return np.linalg.norm(r - (r @ d) * d)


def test_line_channel_recovers_3d_lines():
    # wide stereo baseline: two-view line depth conditioning is z/(f b) px^-1
    rig = synthetic.make_rig(W, H, baseline=0.5)
    chan = LineChannel(rig, n_slots=16, n_detect=12, window=4)

    poses = [
        (np.eye(3, dtype=np.float32), np.asarray([0.0, 0.0, 0.0], np.float32)),
        (np.eye(3, dtype=np.float32), np.asarray([0.25, 0.1, 0.0], np.float32)),
        (np.eye(3, dtype=np.float32), np.asarray([0.5, 0.0, 0.15], np.float32)),
        (np.eye(3, dtype=np.float32), np.asarray([0.3, -0.15, 0.1], np.float32)),
        (np.eye(3, dtype=np.float32), np.asarray([0.6, 0.1, 0.2], np.float32)),
    ]
    health = None
    for R, t in poses:
        imgs = []
        for c in range(2):
            segs2d = [_project_seg(rig, c, R, t, seg) for seg in SEGS3D]
            imgs.append(_render(segs2d))
        health = chan.on_keyframe(
            None, jnp.asarray(imgs[0]), jnp.asarray(imgs[1]),
            jnp.asarray(R), jnp.asarray(t))

    assert health["n_lines"] >= 3
    assert health["n_lines_tracked"] >= 2

    seg_map = chan.segments()
    assert len(seg_map) >= 3
    # every true 3D line must be supported by a recovered landmark whose
    # endpoints lie near the true infinite line
    for seg in SEGS3D:
        errs = [max(_point_line_dist(s[0], seg[0], seg[1]),
                    _point_line_dist(s[1], seg[0], seg[1])) for s in seg_map]
        assert min(errs) < 0.15, f"line {seg.tolist()}: best {min(errs):.3f} m"

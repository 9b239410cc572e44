"""End-to-end feature-channel tests: every `features_handled` label beyond
pointxd dispatches its typed channel inside the pipeline and recovers
geometry from the synthetic world (slamParameters.cpp:63-240 dispatch
parity; one test per channel).
"""

import dataclasses

import numpy as np
import pytest

from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, FeatureConfig, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM


def chan_config(extra_feature, **kw):
    feats = (FeatureConfig(),) + ((extra_feature,) if extra_feature else ())
    return SLAMConfig(
        slam_mode="bimono", max_kf_number=5, min_lmk_number=25,
        max_movement_parallax=1.0, min_movement_parallax=0.02,
        features=feats,
        caps=Capacities(K=6, L=160, P=24, pyr_levels=3, klt_radius=5), **kw)


def test_claim_slots_spawns_while_slots_active():
    """Regression: the slot allocator once sorted ACTIVE slots first (a
    negative sentinel under ascending argsort), so no channel could spawn a
    landmark after its first keyframe."""
    import jax.numpy as jnp

    from sadvio_tpu.pipeline.channels import claim_slots

    stale = jnp.asarray([False, False, False, True, True])
    age = jnp.asarray([0, 1, 2, 7, 9], jnp.int32)
    fresh = jnp.asarray([True, True, False, False])
    tgt, src, do = claim_slots(stale, fresh, age)
    claimed = np.asarray(tgt)[np.asarray(do)]
    assert int(np.asarray(do).sum()) == 2
    assert set(claimed.tolist()) == {3, 4}
    # oldest stale slot claimed first
    assert claimed[0] == 4


@pytest.fixture(scope="module")
def world():
    return synthetic.make_world(seed=11, n_frames=24, width=320, height=240,
                                n_points=200, imu_noise=False)


def test_edgelet_channel_in_pipeline(world):
    """edgeletxd: oriented blob-rim edges flow into the Edgelet3D map with
    depths in the synthetic wall band."""
    from sadvio_tpu.pipeline.channels import EdgeletChannel

    slam = StereoSLAM(world.rig, chan_config(FeatureConfig(label="edgeletxd")))
    out = {}
    for f in world.frames:
        o = slam.process_frame(f)
        if "n_edgelets" in o:
            out = o
    chan = [c for c in slam.channels if isinstance(c, EdgeletChannel)][0]
    p, d = chan.points()
    assert out.get("n_edgelets", 0) >= 5, out
    assert len(p) >= 5
    # depths in the wall band (z in [4,9] world, tolerance for rim offsets)
    frac = np.mean((p[:, 2] > 2.5) & (p[:, 2] < 11.0))
    assert frac > 0.6, f"only {frac:.2f} of edgelets in the depth band"
    # unit directions
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)


def _stamp_pattern(img, cam, R, t, rig, anchors_w, side, pattern_id):
    """Render a 4-marker coded pattern at the projections of its world
    corner points (bright patch + dark coded markers, the renderer of
    tests/test_ellipses.py)."""
    import jax.numpy as jnp

    from sadvio_tpu.models import cameras
    from tests.test_ellipses import render_marker

    uvs = []
    depth = None
    for pw in anchors_w:
        uv, vis = cameras.project_world(
            cam, jnp.asarray(R), jnp.asarray(t), rig.R_f_s[0], rig.t_f_s[0],
            jnp.asarray(pw, jnp.float32)[None])
        uvs.append(np.asarray(uv[0]))
        p_c = np.asarray(pw) - np.asarray(t)
        depth = (np.asarray(R).T @ p_c)[2]
    f = float(np.asarray(cam.fx).reshape(-1)[0])
    a = side * f / depth / 4.0  # marker radius = corner spacing / 4
    img = np.asarray(img, np.float64).copy()
    H, W = img.shape
    ys, xs = np.mgrid[0:H, 0:W]
    # bright patch behind all markers (markers are dark-on-bright)
    for c in uvs:
        patch = (xs - c[0]) ** 2 + (ys - c[1]) ** 2 < (2.4 * a) ** 2
        img[patch] = 220.0
    payloads = [1, 2, 3, pattern_id]  # E1,E2,E3,EN
    for c, pid in zip(uvs, payloads):
        render_marker(img, (float(c[0]), float(c[1])), float(a), payload=pid)
    return img.astype(np.float32)


def test_ellipse_channel_in_pipeline(world):
    """ellipsepatternxd: a coded 4-marker pattern fixed in the world is
    detected, grouped, ID-matched across keyframes, and its planar pose
    lands at the true world anchor."""
    from sadvio_tpu.pipeline.channels import EllipseChannel

    S = 1.0
    anchor = np.array([1.2, 0.6, 5.0])
    # corner order [E1,E2,E3,EN]; o=0 render => marker_theta=-pi/2 =>
    # E2 predicted at -u, E3 at -v (see tests/test_ellipses._render_pattern)
    corners_w = [anchor,
                 anchor + np.array([-S, 0.0, 0.0]),
                 anchor + np.array([0.0, -S, 0.0]),
                 anchor + np.array([-S, -S, 0.0])]

    cfg = chan_config(FeatureConfig(label="ellipsepatternxd", pattern_side=S))
    slam = StereoSLAM(world.rig, cfg)
    import jax

    cam0 = jax.tree.map(lambda x: x[0] if np.ndim(x) > 0 else x, world.rig.cam)
    out = {}
    for i, f in enumerate(world.frames[:16]):
        img0 = _stamp_pattern(f.images[0], cam0, world.gt_R[i], world.gt_t[i],
                              world.rig, corners_w, S, pattern_id=9)
        f2 = f._replace(images=np.stack([img0, f.images[1]]))
        o = slam.process_frame(f2)
        if "n_patterns" in o:
            out = o
    chan = [c for c in slam.channels if isinstance(c, EllipseChannel)][0]
    pid, R_w_p, t_w_p = chan.patterns()
    assert out.get("n_patterns", 0) >= 1, out
    assert 9 in pid.tolist()
    t_est = t_w_p[pid.tolist().index(9)]
    assert np.linalg.norm(t_est - anchor) < 0.5, (t_est, anchor)


def test_bbox_channel_in_pipeline(world):
    """bboxxd: provider-supplied semantic boxes (the reference's GT
    detection contract) are IoU-matched, triangulated and maintained as
    BBox3d landmarks near the true object center."""
    import jax
    import jax.numpy as jnp

    from sadvio_tpu.models import cameras
    from sadvio_tpu.pipeline.channels import BBoxChannel

    center_gt = np.array([-1.0, 0.4, 5.5])
    size = 0.8
    corners = center_gt[None] + (np.array(
        [[i, j, k] for i in (-1, 1) for j in (-1, 1) for k in (-1, 1)],
        np.float64) * size / 2)

    def boxes_for(R, t):
        out_b, out_v = [], []
        for c in range(2):
            cam_c = jax.tree.map(lambda x, c=c: x[c] if np.ndim(x) > 0 else x,
                                 world.rig.cam)
            uv, vis = cameras.project_world(
                cam_c, jnp.asarray(R), jnp.asarray(t),
                world.rig.R_f_s[c], world.rig.t_f_s[c],
                jnp.asarray(corners, jnp.float32))
            uv = np.asarray(uv)
            box = np.stack([uv.min(0), uv.max(0)])
            out_b.append(box[None])
            out_v.append(np.asarray([bool(np.asarray(vis).all())]))
        return {"boxes": np.stack(out_b), "labels": np.zeros((2, 1), np.int32),
                "valid": np.stack(out_v)}

    class BoxFrame:
        def __init__(self, f, i):
            self.ts, self.images = f.ts, f.images
            self.acc, self.gyr, self.dt = f.acc, f.gyr, f.dt
            self.bboxes = boxes_for(world.gt_R[i], world.gt_t[i])

    slam = StereoSLAM(world.rig, chan_config(FeatureConfig(label="bboxxd")))
    out = {}
    for i, f in enumerate(world.frames[:16]):
        o = slam.process_frame(BoxFrame(f, i))
        if "n_boxes" in o:
            out = o
    chan = [c for c in slam.channels if isinstance(c, BBoxChannel)][0]
    centers, scales, labels = chan.boxes()
    assert out.get("n_boxes", 0) >= 1, out
    assert len(centers) >= 1
    err = np.linalg.norm(centers - center_gt[None], axis=-1).min()
    assert err < 0.4, f"box center error {err:.2f} m"
    # metric scale from extents at depth: within 2x of the true size
    s = scales[np.argmin(np.linalg.norm(centers - center_gt[None], axis=-1))]
    assert 0.4 * size < s[0] < 2.5 * size


def test_csv_detector_in_pipeline(world, tmp_path):
    """cvCSVFeatureDetector path: precomputed per-timestamp keypoints
    substitute the detector; they flow into stereo init, KLT tracking and
    the window BA, holding the e2e ATE bar."""
    import jax
    import jax.numpy as jnp

    from sadvio_tpu.models import cameras

    cam0 = jax.tree.map(lambda x: x[0] if np.ndim(x) > 0 else x, world.rig.cam)
    desc_dim = 8
    for i, f in enumerate(world.frames):
        uv, vis = cameras.project_world(
            cam0, jnp.asarray(world.gt_R[i]), jnp.asarray(world.gt_t[i]),
            world.rig.R_f_s[0], world.rig.t_f_s[0],
            jnp.asarray(world.points, jnp.float32))
        uv, vis = np.asarray(uv), np.asarray(vis)
        rows = ["u, v, desc"]
        for (u, v), ok in zip(uv, vis):
            if ok:
                d = ", ".join("0.0" for _ in range(desc_dim))
                rows.append(f"[{u:.2f}, {v:.2f}], [{d}]")
        (tmp_path / f"{int(round(f.ts * 1e9))}.csv").write_text("\n".join(rows))

    feats = (FeatureConfig(label="pointxd", detector="csv",
                           folder=str(tmp_path)),)
    cfg = dataclasses.replace(chan_config(None), features=feats)
    slam = StereoSLAM(world.rig, cfg)
    assert slam._use_csv
    est = slam.run(world.frames)
    ate = synthetic.ate_rmse(est, world.gt_t[: len(est)])
    assert ate < 0.05, f"csv-detector ATE {ate:.4f} m"
    assert len(slam.kf_traj) >= 2

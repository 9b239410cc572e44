"""Auxiliary feature-type channels: edgelets, coded-ellipse patterns, bboxes.

The reference instantiates a detector/matcher/initializer per entry of the
`features_handled` config list and runs every type through the same per-KF
flow (reference: cpp/src/slamParameters.cpp:63-240 factory maps;
cpp/src/slamCore.cpp:207-373 dispatch; typed landmarks Edgelet3D /
ModelEllipsePattern3D / BBox3d in cpp/include/isaeslam/data/landmarks/).
Only pointxd and linexd enter the window BA cost -- like the reference,
whose residual library covers those two types
(cpp/include/isaeslam/optimizers/BundleAdjustmentCERESAnalytic.h:41-195):
points via backend.ba's Schur-eliminated blocks, lines via the LineBlock
6-dof dense blocks the linexd channel hands to ba_solve
(pipeline.line_channel, localMapBA parity at
BundleAdjustmentCERESAnalytic.cpp:273-302).  The remaining types (this
module) maintain typed landmark maps refined at fixed poses.

Each channel owns a fixed-capacity slot map updated once per keyframe via
`on_keyframe(frame, img0, img1, R_w_f, t_w_f) -> health dict`, mirroring
pipeline.line_channel.LineChannel (the linexd channel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sadvio_tpu.frontend import bbox as bbox_mod
from sadvio_tpu.frontend import edgelets as edge_mod
from sadvio_tpu.frontend import ellipses as ell_mod
from sadvio_tpu.models import cameras


def claim_slots(stale, fresh, age):
    """Assign fresh candidates to stale map slots (oldest freed first).

    Returns (tgt (M,), src (M,), do (M,)): slot index, candidate index and an
    activity mask for each potential spawn row.  The fixed-shape analog of
    the reference's push_back of new landmarks into the typed map.
    """
    M = stale.shape[0]
    N = fresh.shape[0]
    # stale slots first (oldest first), active slots pushed to the END
    # (+10**6; a negative sentinel would sort active slots FIRST and
    # permanently block spawning once any slot is live)
    slot_order = jnp.argsort(jnp.where(stale, -age, jnp.int32(10 ** 6)))
    det_order = jnp.argsort(~fresh)  # fresh first
    n_spawn = jnp.minimum(jnp.sum(stale), jnp.sum(fresh))
    take = jnp.arange(M) < jnp.minimum(n_spawn, N)
    tgt = slot_order[:M]
    src = det_order[jnp.minimum(jnp.arange(M), N - 1)]
    do = take & stale[tgt] & fresh[src]
    return tgt, src, do


class EdgeletChannel:
    """edgeletxd: oriented edge points -> Edgelet3D (point + unit direction).

    Per KF: gradient-NMS detection in both cameras, proximity+tangent stereo
    matching, two-view triangulation (point by midpoint, direction by tangent
    plane intersection), map association by projection, position/direction
    refinement by measurement blending at fixed poses (the landmark-only
    refinement role of AOptimizer::landmarkOptimization for types without a
    BA residual).
    """

    def __init__(self, rig, *, n_slots: int = 64, max_age: int = 8):
        self.rig = rig
        self.M = n_slots
        self.max_age = max_age
        M = n_slots
        self.p = jnp.zeros((M, 3))
        self.d = jnp.zeros((M, 3))
        self.mask = jnp.zeros((M,), bool)
        self.age = jnp.zeros((M,), jnp.int32)

    @partial(jax.jit, static_argnames=("self",))
    def _kf_update(self, img0, img1, R_w_f, t_w_f, p, d, mask, age):
        rig = self.rig
        cam0 = jax.tree.map(lambda x: x[0] if jnp.ndim(x) > 0 else x, rig.cam)
        cam1 = jax.tree.map(lambda x: x[1] if jnp.ndim(x) > 0 else x, rig.cam)

        uv0, dir0, s0, v0 = edge_mod.detect_edgelets(img0)
        uv1, dir1, s1, v1 = edge_mod.detect_edgelets(img1)

        R_ws0 = R_w_f @ rig.R_f_s[0]
        t_ws0 = t_w_f + R_w_f @ rig.t_f_s[0]
        R_ws1 = R_w_f @ rig.R_f_s[1]
        t_ws1 = t_w_f + R_w_f @ rig.t_f_s[1]

        # stereo pairing + triangulation
        idx01, _ = edge_mod.match_edgelets(uv0, dir0, v0, uv1, dir1, v1)
        paired = idx01 >= 0
        uv1m = uv1[jnp.maximum(idx01, 0)]
        dir1m = dir1[jnp.maximum(idx01, 0)]
        p_c, d_c, ok_c = edge_mod.triangulate_edgelet(
            cam0, cam1, R_ws0, t_ws0, R_ws1, t_ws1, uv0, dir0, uv1m, dir1m)
        depth0 = jnp.einsum("ji,nj->ni", R_ws0, p_c - t_ws0[None])[:, 2]
        cand = paired & ok_c & v0 & (depth0 > 0.3) & (depth0 < 25.0)

        # map association: project landmarks (+eps along direction for the
        # image tangent) into cam0, then the same proximity+tangent matcher
        uv_m, vis_m = cameras.project_world(
            cam0, R_w_f, t_w_f, rig.R_f_s[0], rig.t_f_s[0], p)
        uv_m2, _ = cameras.project_world(
            cam0, R_w_f, t_w_f, rig.R_f_s[0], rig.t_f_s[0], p + 0.05 * d)
        tan = uv_m2 - uv_m
        tan = tan / jnp.maximum(jnp.linalg.norm(tan, axis=-1, keepdims=True), 1e-9)
        idx_det, _ = edge_mod.match_edgelets(uv_m, tan, mask & vis_m,
                                             uv0, dir0, v0)
        tracked = idx_det >= 0
        age = jnp.where(tracked, 0, age + 1)

        # measurement blend for tracked slots whose detection triangulated
        cand_of_slot = jnp.maximum(idx_det, 0)
        upd = tracked & cand[cand_of_slot]
        a = 0.3
        p_meas = p_c[cand_of_slot]
        d_meas = d_c[cand_of_slot]
        # edge direction is 180-deg ambiguous: sign-align before blending
        sgn = jnp.sign(jnp.sum(d_meas * d, axis=-1, keepdims=True) + 1e-12)
        p = jnp.where(upd[:, None], (1 - a) * p + a * p_meas, p)
        dn = (1 - a) * d + a * sgn * d_meas
        dn = dn / jnp.maximum(jnp.linalg.norm(dn, axis=-1, keepdims=True), 1e-9)
        d = jnp.where(upd[:, None], dn, d)

        # spawn unclaimed candidates into stale slots
        det_claimed = jnp.zeros_like(v0).at[cand_of_slot].max(tracked)
        fresh = cand & ~det_claimed
        stale = (~mask) | (age > self.max_age)
        tgt, src, do = claim_slots(stale, fresh, age)
        p = p.at[tgt].set(jnp.where(do[:, None], p_c[src], p[tgt]))
        d = d.at[tgt].set(jnp.where(do[:, None], d_c[src], d[tgt]))
        mask = mask.at[tgt].set(jnp.where(do, True, mask[tgt]))
        age = age.at[tgt].set(jnp.where(do, 0, age[tgt]))
        mask = mask & (age <= self.max_age)
        return p, d, mask, age, jnp.sum(mask), jnp.sum(tracked & mask)

    def on_keyframe(self, frame, img0, img1, R_w_f, t_w_f):
        (self.p, self.d, self.mask, self.age, n, n_trk) = self._kf_update(
            img0, img1, R_w_f, t_w_f, self.p, self.d, self.mask, self.age)
        cnt = np.asarray(jnp.stack([n, n_trk]))  # one fetch
        return {"n_edgelets": int(cnt[0]), "n_edgelets_tracked": int(cnt[1])}

    def points(self):
        m = np.asarray(self.mask)
        return np.asarray(self.p)[m], np.asarray(self.d)[m]


class EllipseChannel:
    """ellipsepatternxd: coded-ellipse fiducial patterns -> Model3D pose
    landmarks (ModelEllipsePattern3D, Model3D.h:56-63).

    Per KF: marker detection + ring decode + 4-marker grouping in cam0,
    planar homography pose (pattern frame -> camera), lifted to a world-frame
    pattern pose; association across keyframes is by decoded pattern ID (the
    reference's EllipsePattern descriptor matching).
    """

    def __init__(self, rig, *, n_slots: int = 8, side: float = 1.0,
                 max_age: int = 12):
        self.rig = rig
        self.S = n_slots
        self.side = side
        self.max_age = max_age
        S = n_slots
        self.pid = jnp.full((S,), -1, jnp.int32)
        self.R_w_p = jnp.tile(jnp.eye(3)[None], (S, 1, 1))
        self.t_w_p = jnp.zeros((S, 3))
        self.mask = jnp.zeros((S,), bool)
        self.age = jnp.zeros((S,), jnp.int32)

    @partial(jax.jit, static_argnames=("self",))
    def _kf_update(self, img0, R_w_f, t_w_f, pid, R_w_p, t_w_p, mask, age):
        rig = self.rig
        cam0 = jax.tree.map(lambda x: x[0] if jnp.ndim(x) > 0 else x, rig.cam)
        det = ell_mod.detect_coded_ellipses(img0)
        uv4, det_pid, det_ok = ell_mod.group_patterns_4(det)
        Kmat = jnp.asarray([
            [jnp.reshape(cam0.fx, ()), 0.0, jnp.reshape(cam0.cx, ())],
            [0.0, jnp.reshape(cam0.fy, ()), jnp.reshape(cam0.cy, ())],
            [0.0, 0.0, 1.0],
        ])
        R_cp, t_cp = jax.vmap(lambda q: ell_mod.pattern_pose(Kmat, q, self.side))(uv4)
        # sensor -> world
        R_ws = R_w_f @ rig.R_f_s[0]
        t_ws = t_w_f + R_w_f @ rig.t_f_s[0]
        R_wp_det = jnp.einsum("ij,njk->nik", R_ws, R_cp)
        t_wp_det = jnp.einsum("ij,nj->ni", R_ws, t_cp) + t_ws

        # associate by decoded ID
        idx, hit = ell_mod.match_patterns(pid, mask, det_pid, det_ok)
        tracked = hit
        age = jnp.where(tracked, 0, age + 1)
        a = 0.4
        sel = jnp.maximum(idx, 0)
        t_w_p = jnp.where(tracked[:, None],
                          (1 - a) * t_w_p + a * t_wp_det[sel], t_w_p)
        R_w_p = jnp.where(tracked[:, None, None], R_wp_det[sel], R_w_p)

        det_claimed = jnp.zeros_like(det_ok).at[sel].max(tracked)
        fresh = det_ok & ~det_claimed
        stale = (~mask) | (age > self.max_age)
        tgt, src, do = claim_slots(stale, fresh, age)
        pid = pid.at[tgt].set(jnp.where(do, det_pid[src], pid[tgt]))
        R_w_p = R_w_p.at[tgt].set(
            jnp.where(do[:, None, None], R_wp_det[src], R_w_p[tgt]))
        t_w_p = t_w_p.at[tgt].set(jnp.where(do[:, None], t_wp_det[src], t_w_p[tgt]))
        mask = mask.at[tgt].set(jnp.where(do, True, mask[tgt]))
        age = age.at[tgt].set(jnp.where(do, 0, age[tgt]))
        mask = mask & (age <= self.max_age)
        return pid, R_w_p, t_w_p, mask, age, jnp.sum(mask), jnp.sum(tracked)

    def on_keyframe(self, frame, img0, img1, R_w_f, t_w_f):
        (self.pid, self.R_w_p, self.t_w_p, self.mask, self.age, n, n_trk
         ) = self._kf_update(img0, R_w_f, t_w_f, self.pid, self.R_w_p,
                             self.t_w_p, self.mask, self.age)
        cnt = np.asarray(jnp.stack([n, n_trk]))  # one fetch
        return {"n_patterns": int(cnt[0]), "n_patterns_tracked": int(cnt[1])}

    def patterns(self):
        m = np.asarray(self.mask)
        return (np.asarray(self.pid)[m], np.asarray(self.R_w_p)[m],
                np.asarray(self.t_w_p)[m])


class BBoxChannel:
    """bboxxd: semantic bounding boxes -> BBox3d (center + per-axis scale).

    Detections are provided externally, exactly like the reference ("GT
    detection already set in frame by provider",
    semanticBBoxFeatureDetector.cpp): either a `provider(ts)` callable or a
    `frame.bboxes` attribute, each yielding
    {"boxes": (C,N,2,2), "labels": (C,N), "valid": (C,N)}.

    Per KF: label-gated mutual-best IoU stereo matching, two-view center
    triangulation + metric scale, map association by projecting BBox3d cube
    corners back into cam0 (project_box) and IoU-matching.
    """

    def __init__(self, rig, *, n_slots: int = 16, provider=None,
                 max_age: int = 6):
        self.rig = rig
        self.M = n_slots
        self.provider = provider
        self.max_age = max_age
        M = n_slots
        self.center = jnp.zeros((M, 3))
        self.scale = jnp.zeros((M, 3))
        self.label = jnp.full((M,), -1, jnp.int32)
        self.mask = jnp.zeros((M,), bool)
        self.age = jnp.zeros((M,), jnp.int32)

    @partial(jax.jit, static_argnames=("self",))
    def _kf_update(self, boxes, labels, valid, R_w_f, t_w_f,
                   center, scale, label, mask, age):
        rig = self.rig
        cam0 = jax.tree.map(lambda x: x[0] if jnp.ndim(x) > 0 else x, rig.cam)
        R_ws0 = R_w_f @ rig.R_f_s[0]
        t_ws0 = t_w_f + R_w_f @ rig.t_f_s[0]
        R_ws1 = R_w_f @ rig.R_f_s[1]
        t_ws1 = t_w_f + R_w_f @ rig.t_f_s[1]

        idx01, ok01 = bbox_mod.match_bboxes(
            boxes[0], labels[0], valid[0], boxes[1], labels[1], valid[1])
        b1m = boxes[1][jnp.maximum(idx01, 0)]
        c_w, s_w, tri_ok = bbox_mod.triangulate_bbox(
            cam0, boxes[0], valid[0], R_ws0, t_ws0,
            b1m, ok01, R_ws1, t_ws1)
        cand = ok01 & tri_ok

        # associate with the map: project BBox3d corners into cam0
        proj, proj_ok = bbox_mod.project_box(cam0, R_ws0, t_ws0,
                                             center, scale, mask)
        idx_det, hit = bbox_mod.match_bboxes(
            proj, label, mask & proj_ok, boxes[0], labels[0], valid[0])
        tracked = hit
        age = jnp.where(tracked, 0, age + 1)
        sel = jnp.maximum(idx_det, 0)
        upd = tracked & cand[sel]
        a = 0.3
        center = jnp.where(upd[:, None], (1 - a) * center + a * c_w[sel], center)
        scale = jnp.where(upd[:, None], (1 - a) * scale + a * s_w[sel], scale)

        det_claimed = jnp.zeros_like(valid[0]).at[sel].max(tracked)
        fresh = cand & ~det_claimed
        stale = (~mask) | (age > self.max_age)
        tgt, src, do = claim_slots(stale, fresh, age)
        center = center.at[tgt].set(jnp.where(do[:, None], c_w[src], center[tgt]))
        scale = scale.at[tgt].set(jnp.where(do[:, None], s_w[src], scale[tgt]))
        label = label.at[tgt].set(jnp.where(do, labels[0][src], label[tgt]))
        mask = mask.at[tgt].set(jnp.where(do, True, mask[tgt]))
        age = age.at[tgt].set(jnp.where(do, 0, age[tgt]))
        mask = mask & (age <= self.max_age)
        return center, scale, label, mask, age, jnp.sum(mask), jnp.sum(tracked)

    def on_keyframe(self, frame, img0, img1, R_w_f, t_w_f):
        det = getattr(frame, "bboxes", None)
        if det is None and self.provider is not None:
            det = self.provider(frame.ts)
        if det is None:
            return {"n_boxes": int(jnp.sum(self.mask)), "n_boxes_tracked": 0}
        (self.center, self.scale, self.label, self.mask, self.age, n, n_trk
         ) = self._kf_update(
            jnp.asarray(det["boxes"]), jnp.asarray(det["labels"], jnp.int32),
            jnp.asarray(det["valid"]), R_w_f, t_w_f,
            self.center, self.scale, self.label, self.mask, self.age)
        cnt = np.asarray(jnp.stack([n, n_trk]))  # one fetch
        return {"n_boxes": int(cnt[0]), "n_boxes_tracked": int(cnt[1])}

    def boxes(self):
        m = np.asarray(self.mask)
        return (np.asarray(self.center)[m], np.asarray(self.scale)[m],
                np.asarray(self.label)[m])

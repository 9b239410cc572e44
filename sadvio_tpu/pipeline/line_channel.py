"""Line-feature channel: the second `features_handled` type in the pipeline.

The reference runs every configured feature type through the same per-KF
flow — detect, match/track, init landmark — and linexd additionally enters
the window BA with pose-constraining 4-dim reprojection residuals
(reference: slamParameters.cpp:63-240 builds per-label detector/matcher/
initializer maps; slamCore.cpp:207-373 dispatches over them;
BundleAdjustmentCERESAnalytic.h:104-195 linexd residuals added to localMapBA
at BundleAdjustmentCERESAnalytic.cpp:273-302; Line3D lifecycle in
data/landmarks/Line3D.h).

This channel does the same for "linexd" with fixed-shape slot arrays:
  detect (Hough, frontend/lines.py) in both cameras -> stereo triangulation
  (plane intersection) for new 3D segments -> map association by projecting
  map lines into each camera and running the midpoint/angle/overlap matcher.

Two refinement modes:
  * in_ba=True (the pipeline default): observations are stored in
    window-slot-aligned buffers and handed to the window BA as a
    data.window.LineBlock — line landmarks become 6-dof blocks whose
    residuals constrain POSES, exactly like the reference's localMapBA.
  * in_ba=False (standalone): a short fixed-pose Gauss-Newton on each
    line's endpoints over a ring buffer of its last W keyframe
    observations (the landmarkOptimization analog, AOptimizer.cpp:98-150).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sadvio_tpu.data.window import LineBlock
from sadvio_tpu.frontend import lines as lines_mod
from sadvio_tpu.models import cameras


class LineChannel:
    """Fixed-capacity line-landmark map + per-KF update."""

    def __init__(self, rig, *, n_slots: int = 32, n_detect: int = 24,
                 window: int = 4, gn_iters: int = 8, in_ba: bool = False,
                 k_window: int | None = None):
        self.rig = rig
        self.M = n_slots
        self.n_detect = n_detect
        self.in_ba = in_ba
        # in BA mode the obs buffer is window-slot aligned (W = K slots and
        # row index = KF slot); standalone it is a W-deep ring buffer
        self.W = int(k_window) if in_ba else window
        self.gn_iters = gn_iters
        M, W = n_slots, self.W
        self.p0 = jnp.zeros((M, 3))
        self.p1 = jnp.zeros((M, 3))
        self.mask = jnp.zeros((M,), bool)
        self.age = jnp.zeros((M,), jnp.int32)
        # observation buffer (both cameras' pixels + KF pose per row):
        # every row adds the stereo baseline to the refinement geometry
        self.obs_ends = jnp.zeros((W, 2, M, 2, 2))
        self.obs_mask = jnp.zeros((W, 2, M), bool)
        self.obs_R = jnp.tile(jnp.eye(3)[None], (W, 1, 1))
        self.obs_t = jnp.zeros((W, 3))
        self._head = 0

    # -- jitted core ------------------------------------------------------

    @partial(jax.jit, static_argnames=("self", "refine"))
    def _kf_update(self, img0, img1, R_w_f, t_w_f, p0, p1, mask, age,
                   obs_ends, obs_mask, obs_R, obs_t, row, refine=True):
        rig = self.rig
        cam0 = jax.tree.map(lambda x: x[0] if jnp.ndim(x) > 0 else x, rig.cam)
        cam1 = jax.tree.map(lambda x: x[1] if jnp.ndim(x) > 0 else x, rig.cam)

        ends0, s0, v0 = lines_mod.detect_lines(img0, n_lines=self.n_detect)
        ends1, s1, v1 = lines_mod.detect_lines(img1, n_lines=self.n_detect)
        v0 = lines_mod.dedup_lines(ends0, v0, s0)
        v1 = lines_mod.dedup_lines(ends1, v1, s1)

        # sensor-to-world for both cameras (R_w_s = R_w_f R_f_s)
        R_ws0 = R_w_f @ rig.R_f_s[0]
        t_ws0 = t_w_f + R_w_f @ rig.t_f_s[0]
        R_ws1 = R_w_f @ rig.R_f_s[1]
        t_ws1 = t_w_f + R_w_f @ rig.t_f_s[1]

        # stereo association + triangulation for candidate 3D segments
        idx01, _ = lines_mod.match_lines(ends0, v0, ends1, v1)
        paired = idx01 >= 0
        ends1m = ends1[jnp.maximum(idx01, 0)]
        c0, c1, tri_ok = lines_mod.triangulate_line(
            cam0, cam1, R_ws0, t_ws0, R_ws1, t_ws1, ends0, ends1m)
        # birth sanity gate (ALandmark::sanityCheck semantics,
        # ALandmark.cpp:130-160): the candidate must reproject onto both
        # observed segments with small perpendicular error
        r_a, vis_a = lines_mod.line_reproj_residual(
            cam0, R_w_f, t_w_f, rig.R_f_s[0], rig.t_f_s[0], c0, c1, ends0)
        r_b, vis_b = lines_mod.line_reproj_residual(
            cam1, R_w_f, t_w_f, rig.R_f_s[1], rig.t_f_s[1], c0, c1, ends1m)
        perp_err = jnp.maximum(
            jnp.max(jnp.abs(r_a[..., :2]), axis=-1),
            jnp.max(jnp.abs(r_b[..., :2]), axis=-1))
        # scale sanity: far/huge candidates are triangulation blow-ups along
        # weak-baseline directions (same role as the reference's landmark
        # depth gate); they would enter the BA as wild pose constraints
        d0 = jnp.linalg.norm(0.5 * (c0 + c1) - t_ws0, axis=-1)
        seg_len = jnp.linalg.norm(c1 - c0, axis=-1)
        scale_ok = (d0 > 0.5) & (d0 < 60.0) & (seg_len < 20.0)
        cand_ok = (paired & tri_ok & v0 & vis_a & vis_b & (perp_err < 1.5)
                   & scale_ok)

        # associate detections with the map: project map lines into each
        # camera, CLIP to the image (a partially visible line must still
        # match its detection, else it re-spawns as a duplicate every KF),
        # and record that camera's matched detection in the buffer
        trk = []
        for c, (cam_c, ends_c, v_c) in enumerate(
                [(cam0, ends0, v0), (cam1, ends1, v1)]):
            uv_a, _ = cameras.project_world(
                cam_c, R_w_f, t_w_f, rig.R_f_s[c], rig.t_f_s[c], p0)
            uv_b, _ = cameras.project_world(
                cam_c, R_w_f, t_w_f, rig.R_f_s[c], rig.t_f_s[c], p1)
            z_a = cameras.world_to_cam(
                R_w_f, t_w_f, rig.R_f_s[c], rig.t_f_s[c], p0)[..., 2]
            z_b = cameras.world_to_cam(
                R_w_f, t_w_f, rig.R_f_s[c], rig.t_f_s[c], p1)[..., 2]
            ca, cb, in_img = lines_mod.clip_segment_to_image(
                uv_a, uv_b, float(cam_c.width), float(cam_c.height))
            proj_ends = jnp.stack([ca, cb], axis=1)  # (M,2,2)
            clip_len = jnp.linalg.norm(cb - ca, axis=-1)
            proj_ok = (mask & (z_a > 0.1) & (z_b > 0.1) & in_img
                       & (clip_len > 12.0))
            # tighter gates than detection-to-detection matching: the map
            # projection is a prediction, and a wrong association becomes a
            # pose constraint in the BA
            idx_c, _ = lines_mod.match_lines(
                proj_ends, proj_ok, ends_c, v_c,
                max_midpoint_px=25.0, max_angle_deg=6.0, min_overlap=0.5)
            trk_c = idx_c >= 0  # (M,) map slot -> detection in cam c
            det_for_slot = ends_c[jnp.maximum(idx_c, 0)]
            # precision gate: the matched detection's midpoint must lie ON
            # the predicted infinite line.  A wrong-DEPTH landmark projects
            # plausibly in one camera but sits several px off-perpendicular
            # in the other (its stereo disparity is wrong), so this gate
            # starves bad-geometry lines of associations before they can
            # constrain poses in the BA.
            p_dir = cb - ca
            p_dir = p_dir / jnp.maximum(
                jnp.linalg.norm(p_dir, axis=-1, keepdims=True), 1e-6)
            p_n = jnp.stack([-p_dir[:, 1], p_dir[:, 0]], -1)
            det_mid = det_for_slot.mean(axis=1)
            perp_c = jnp.abs(jnp.sum((det_mid - ca) * p_n, axis=-1))
            trk_c = trk_c & (perp_c < 3.0)
            obs_ends = obs_ends.at[row, c].set(
                jnp.where(trk_c[:, None, None], det_for_slot, 0.0))
            obs_mask = obs_mask.at[row, c].set(trk_c)
            trk.append((idx_c, trk_c))
        idx_map, tracked0 = trk[0]
        tracked = tracked0 | trk[1][1]
        obs_R = obs_R.at[row].set(R_w_f)
        obs_t = obs_t.at[row].set(t_w_f)
        age = jnp.where(tracked, 0, age + 1)

        # spawn: unmatched, well-triangulated detections claim stale slots
        # (shared fixed-shape slot allocator, pipeline.channels.claim_slots)
        from sadvio_tpu.pipeline.channels import claim_slots

        det_claimed = jnp.zeros((self.n_detect,), bool)
        det_claimed = det_claimed.at[jnp.maximum(idx_map, 0)].max(tracked0)
        fresh = cand_ok & ~det_claimed
        stale = (~mask) | (age > self.W)
        tgt, src, do = claim_slots(stale, fresh, age)
        p0 = p0.at[tgt].set(jnp.where(do[:, None], c0[src], p0[tgt]))
        p1 = p1.at[tgt].set(jnp.where(do[:, None], c1[src], p1[tgt]))
        mask = mask.at[tgt].set(jnp.where(do, True, mask[tgt]))
        age = age.at[tgt].set(jnp.where(do, 0, age[tgt]))
        # spawned slots start their obs buffer at this KF (both cameras)
        for c, ends_c in enumerate([ends0, ends1m]):
            new_obs = ends_c[src]
            obs_ends = obs_ends.at[row, c, tgt].set(
                jnp.where(do[:, None, None], new_obs, obs_ends[row, c, tgt]))
            obs_mask = obs_mask.at[row, c, tgt].set(do | obs_mask[row, c, tgt])
        # drop old rows for re-spawned slots (new landmark identity)
        keep_rows = ~(jnp.ones((self.W, 1, 1), bool) & do[None, None, :])
        keep_rows = keep_rows.at[row].set(True)
        obs_mask = obs_mask & keep_rows

        if refine:
            # fixed-pose endpoint refinement over the ring buffer (GN) --
            # standalone mode only; in BA mode the window BA owns refinement
            p0, p1 = self._refine(p0, p1, mask, obs_ends, obs_mask, obs_R,
                                  obs_t)
        # map-level 3D dedup: two slots converged on the same physical line
        # (e.g. spawned from fragments before association could merge them);
        # the weaker-supported one is retired so the BA does not double-count
        # correlated measurements of one structure
        mid = 0.5 * (p0 + p1)
        dvec = p1 - p0
        dnorm = jnp.maximum(jnp.linalg.norm(dvec, axis=-1, keepdims=True), 1e-9)
        that = dvec / dnorm
        cosang = jnp.abs(jnp.einsum("mi,ni->mn", that, that))
        rel = mid[None, :, :] - mid[:, None, :]  # (i,j): mid_j - mid_i
        along = jnp.einsum("ijk,ik->ij", rel, that)
        perp = jnp.linalg.norm(rel - along[..., None] * that[:, None, :],
                               axis=-1)
        support = jnp.sum(obs_mask, axis=(0, 1))  # (M,)
        eye_m = jnp.eye(self.M, dtype=bool)
        same3d = ((cosang > jnp.cos(jnp.deg2rad(5.0))) & (perp < 0.25)
                  & mask[:, None] & mask[None, :] & ~eye_m)
        stronger = (support[:, None] > support[None, :]) | (
            (support[:, None] == support[None, :])
            & (jnp.arange(self.M)[:, None] < jnp.arange(self.M)[None, :]))
        killed = jnp.any(same3d & stronger, axis=0)  # j killed by some i
        mask = mask & ~killed
        # retire lines that left the map window
        mask = mask & (age <= 2 * self.W)
        return (p0, p1, mask, age, obs_ends, obs_mask, obs_R, obs_t,
                jnp.sum(mask), jnp.sum(tracked))

    def _refine(self, p0, p1, mask, obs_ends, obs_mask, obs_R, obs_t):
        rig = self.rig
        cams = [jax.tree.map(lambda x, c=c: x[c] if jnp.ndim(x) > 0 else x,
                             rig.cam) for c in range(2)]

        def residual(x, ends_m, om):
            # ends_m: (W,2,2,2) both cameras' observations; om: (W,2)
            a, b = x[:3], x[3:]
            rs = []
            for c in range(2):
                r, vis = jax.vmap(
                    lambda Rw, tw, e, c=c: lines_mod.line_reproj_residual(
                        cams[c], Rw, tw, rig.R_f_s[c], rig.t_f_s[c], a, b, e)
                )(obs_R, obs_t, ends_m[:, c])
                w = (om[:, c] & vis).astype(x.dtype)
                rs.append(r * w[:, None])
            return jnp.concatenate(rs, axis=0).reshape(-1)

        def gn_one(a, b, ends_m, om, m):
            x0 = jnp.concatenate([a, b])

            def cost(x):
                r = residual(x, ends_m, om)
                return jnp.sum(r * r)

            def it(carry, _):
                x, lam = carry
                r = residual(x, ends_m, om)
                J = jax.jacfwd(residual)(x, ends_m, om)
                H = J.T @ J
                H = H + lam * jnp.diag(jnp.clip(jnp.diagonal(H), 1e-6, None))
                dx = jnp.linalg.solve(H, -(J.T @ r))
                # trust region: a line landmark should not jump metres/iter
                nrm = jnp.linalg.norm(dx)
                dx = dx * jnp.minimum(1.0, 0.5 / jnp.maximum(nrm, 1e-9))
                n_obs = jnp.sum(om)
                better = cost(x + dx) < cost(x)
                ok = (n_obs >= 2) & jnp.all(jnp.isfinite(dx)) & m & better
                x = jnp.where(ok, x + dx, x)
                lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 4.0), 1e-4, 1e3)
                return (x, lam), None

            (x, _), _ = jax.lax.scan(it, (x0, jnp.asarray(1e-2, x0.dtype)),
                                     None, length=self.gn_iters)
            return x[:3], x[3:]

        # vmap over line slots; each slot sees its (W,C,...) obs column
        return jax.vmap(gn_one, in_axes=(0, 0, 2, 2, 0))(
            p0, p1, obs_ends, obs_mask, mask)

    @partial(jax.jit, static_argnames=("self",))
    def _roll(self, obs_ends, obs_mask, obs_R, obs_t):
        r = lambda x: jnp.roll(x, -1, axis=0)
        return (r(obs_ends).at[-1].set(0.0),
                r(obs_mask).at[-1].set(False),
                r(obs_R).at[-1].set(jnp.eye(3)),
                r(obs_t).at[-1].set(0.0))

    # -- host-side wrappers -------------------------------------------------

    def on_keyframe(self, frame, img0, img1, R_w_f, t_w_f):
        """Standalone update (fixed-pose GN refinement); returns health dict.
        (frame is unused here; part of the shared channel signature.)"""
        return self._update(img0, img1, R_w_f, t_w_f,
                            jnp.int32(self._head % self.W), refine=True)

    def on_keyframe_pre_ba(self, img0, img1, R_w_f, t_w_f, slot):
        """BA-mode update before the window BA: detect/associate/spawn and
        write this keyframe's observation row at its window slot; the BA
        refines endpoints (and poses) afterwards via ba_block()/apply_ba."""
        return self._update(img0, img1, R_w_f, t_w_f, slot, refine=False)

    def _update(self, img0, img1, R_w_f, t_w_f, row, refine):
        (self.p0, self.p1, self.mask, self.age, self.obs_ends, self.obs_mask,
         self.obs_R, self.obs_t, n_lines, n_tracked) = self._kf_update(
            img0, img1, jnp.asarray(R_w_f), jnp.asarray(t_w_f),
            self.p0, self.p1, self.mask, self.age,
            self.obs_ends, self.obs_mask, self.obs_R, self.obs_t,
            row, refine=refine,
        )
        self._head += 1
        cnt = np.asarray(jnp.stack([n_lines, n_tracked]))  # one fetch
        return {"n_lines": int(cnt[0]), "n_lines_tracked": int(cnt[1])}

    @partial(jax.jit, static_argnames=("self",))
    def _ba_block(self, p0, p1, mask, obs_ends, obs_mask):
        # only lines observed at >= 2 window keyframes constrain poses: a
        # single-row line is fully explained by its own 6 dof and a later
        # wrong re-association would inject a wild constraint
        support = jnp.sum(jnp.any(obs_mask, axis=1), axis=0)  # (M,)
        return LineBlock(
            ends=jnp.stack([p0, p1], axis=1),
            mask=mask & (support >= 2),
            obs=obs_ends, obs_mask=obs_mask,
            probation=support < 3,
        )

    def ba_block(self) -> LineBlock:
        """Current line map as a window-BA LineBlock (in_ba mode)."""
        return self._ba_block(self.p0, self.p1, self.mask, self.obs_ends,
                              self.obs_mask)

    def apply_ba(self, ends, obs_mask=None):
        """Write back BA-optimized endpoints (M,2,3) + pruned obs mask."""
        # masked-out lines (insufficient support) were frozen by the solver's
        # free mask, so the returned endpoints are safe to take wholesale
        self.p0 = ends[:, 0]
        self.p1 = ends[:, 1]
        if obs_mask is not None:
            self.obs_mask = obs_mask

    def on_roll(self):
        """Shift the slot-aligned obs buffers left with the sliding window."""
        (self.obs_ends, self.obs_mask, self.obs_R, self.obs_t) = self._roll(
            self.obs_ends, self.obs_mask, self.obs_R, self.obs_t)

    def gauge_transform(self, R_align, scale, anchor=None):
        """Move line endpoints through a map gauge change (VIInit alignment:
        p -> anchor + s R (p - anchor))."""
        if anchor is None:
            anchor = jnp.zeros(3)
        tr = lambda p: anchor + scale * jnp.einsum(
            "ij,...j->...i", jnp.asarray(R_align), p - anchor)
        self.p0 = tr(self.p0)
        self.p1 = tr(self.p1)

    def clear(self):
        """Drop the whole line map + obs buffers (pipeline reset)."""
        M, W = self.M, self.W
        self.p0 = jnp.zeros((M, 3))
        self.p1 = jnp.zeros((M, 3))
        self.mask = jnp.zeros((M,), bool)
        self.age = jnp.zeros((M,), jnp.int32)
        self.obs_ends = jnp.zeros((W, 2, M, 2, 2))
        self.obs_mask = jnp.zeros((W, 2, M), bool)
        self.obs_R = jnp.tile(jnp.eye(3)[None], (W, 1, 1))
        self.obs_t = jnp.zeros((W, 3))
        self._head = 0

    def segments(self):
        """(n,2,3) world endpoints of live line landmarks (host export)."""
        import numpy as np

        m = np.asarray(self.mask)
        seg = np.stack([np.asarray(self.p0), np.asarray(self.p1)], axis=1)
        return seg[m]

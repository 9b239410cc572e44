"""Line-feature channel: the second `features_handled` type in the pipeline.

The reference runs every configured feature type through the same per-KF
flow — detect, match/track, init landmark, landmark-only optimization
(reference: slamParameters.cpp:63-240 builds per-label detector/matcher/
initializer maps; slamCore.cpp:207-373 dispatches over them;
AOptimizer::landmarkOptimization refines landmarks with poses fixed,
AOptimizer.cpp:98-150; Line3D lifecycle in data/landmarks/Line3D.h).

This channel does the same for "linexd" with fixed-shape slot arrays:
  detect (Hough, frontend/lines.py) in both cameras -> stereo triangulation
  (plane intersection) for new 3D segments -> map association by projecting
  map lines into cam0 and running the midpoint/angle/overlap matcher ->
  a short fixed-pose Gauss-Newton on each line's endpoints over a ring
  buffer of its last W keyframe observations (the landmarkOptimization
  analog; poses stay owned by the point-based window BA, exactly like the
  reference where line landmarks are optimized with poses constant).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sadvio_tpu.frontend import lines as lines_mod
from sadvio_tpu.models import cameras


class LineChannel:
    """Fixed-capacity line-landmark map + per-KF update."""

    def __init__(self, rig, *, n_slots: int = 32, n_detect: int = 24,
                 window: int = 4, gn_iters: int = 8):
        self.rig = rig
        self.M = n_slots
        self.n_detect = n_detect
        self.W = window
        self.gn_iters = gn_iters
        M, W = n_slots, window
        self.p0 = jnp.zeros((M, 3))
        self.p1 = jnp.zeros((M, 3))
        self.mask = jnp.zeros((M,), bool)
        self.age = jnp.zeros((M,), jnp.int32)
        # observation ring buffer (both cameras' pixels + KF pose per row):
        # every row adds the stereo baseline to the refinement geometry
        self.obs_ends = jnp.zeros((W, 2, M, 2, 2))
        self.obs_mask = jnp.zeros((W, 2, M), bool)
        self.obs_R = jnp.tile(jnp.eye(3)[None], (W, 1, 1))
        self.obs_t = jnp.zeros((W, 3))
        self._head = 0

    # -- jitted core ------------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _kf_update(self, img0, img1, R_w_f, t_w_f, p0, p1, mask, age,
                   obs_ends, obs_mask, obs_R, obs_t, head):
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
        cand_ok = paired & tri_ok & v0 & vis_a & vis_b & (perp_err < 1.5)

        # associate detections with the map: project map lines into each
        # camera and record that camera's matched detection in the buffer
        row = head % self.W
        trk = []
        for c, (cam_c, ends_c, v_c) in enumerate(
                [(cam0, ends0, v0), (cam1, ends1, v1)]):
            uv_a, vis_a0 = cameras.project_world(
                cam_c, R_w_f, t_w_f, rig.R_f_s[c], rig.t_f_s[c], p0)
            uv_b, vis_b0 = cameras.project_world(
                cam_c, R_w_f, t_w_f, rig.R_f_s[c], rig.t_f_s[c], p1)
            proj_ends = jnp.stack([uv_a, uv_b], axis=1)  # (M,2,2)
            proj_ok = mask & vis_a0 & vis_b0
            idx_c, _ = lines_mod.match_lines(proj_ends, proj_ok, ends_c, v_c)
            trk_c = idx_c >= 0  # (M,) map slot -> detection in cam c
            det_for_slot = ends_c[jnp.maximum(idx_c, 0)]
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
        # spawned slots start their ring buffer at this KF (both cameras)
        for c, ends_c in enumerate([ends0, ends1m]):
            new_obs = ends_c[src]
            obs_ends = obs_ends.at[row, c, tgt].set(
                jnp.where(do[:, None, None], new_obs, obs_ends[row, c, tgt]))
            obs_mask = obs_mask.at[row, c, tgt].set(do | obs_mask[row, c, tgt])
        # drop old rows for re-spawned slots
        keep_rows = ~(jnp.ones((self.W, 1, 1), bool) & do[None, None, :])
        keep_rows = keep_rows.at[row].set(True)
        obs_mask = obs_mask & keep_rows

        # fixed-pose endpoint refinement over the ring buffer (GN)
        p0, p1 = self._refine(p0, p1, mask, obs_ends, obs_mask, obs_R, obs_t)
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

    # -- host-side wrapper --------------------------------------------------

    def on_keyframe(self, frame, img0, img1, R_w_f, t_w_f):
        """Update the line map with one keyframe; returns health dict.
        (frame is unused here; part of the shared channel signature.)"""
        (self.p0, self.p1, self.mask, self.age, self.obs_ends, self.obs_mask,
         self.obs_R, self.obs_t, n_lines, n_tracked) = self._kf_update(
            img0, img1, R_w_f, t_w_f, self.p0, self.p1, self.mask, self.age,
            self.obs_ends, self.obs_mask, self.obs_R, self.obs_t,
            jnp.int32(self._head),
        )
        self._head += 1
        return {"n_lines": int(n_lines), "n_lines_tracked": int(n_tracked)}

    def segments(self):
        """(n,2,3) world endpoints of live line landmarks (host export)."""
        import numpy as np

        m = np.asarray(self.mask)
        seg = np.stack([np.asarray(self.p0), np.asarray(self.p1)], axis=1)
        return seg[m]

"""Non-overlapping-FoV bi-monocular SLAM mode.

TPU-native re-design of the reference mode
(reference: cpp/src/slamNonOverlappingFov.cpp -- init:18, per-camera
tracking, scaleEstimationRANSAC:423, isDegenerativeMotion:634, dual-camera
outlierRemoval:355; scale-aware landmark optimization,
AngularAdjustmentCERESAnalytic.cpp:488+).

Two cameras look in opposite directions.  Camera 0 runs the monocular
front end (KLT + essential/PnP); camera 1 maintains an independent set of
chained KLT tracks whose epipolar geometry, coupled through the rigid
extrinsics, resolves the metric scale (frontend.nofov.scale_ransac).

Scale maintenance is continuous (the reference re-estimates at every KF and
folds the result into scale-aware landmark optimization): at each keyframe
the 1-point RANSAC runs over the LONGEST available window baseline --
oldest window KF to the new KF, using camera-1 tracks chained KF-to-KF --
because the lever-arm signal |(R-I) t_s1| grows with accumulated rotation
and the estimator suffers errors-in-variables attenuation on short
baselines.  The first valid estimate rescales map+history to metric; later
estimates apply damped window-anchored corrections (the scalePrior pull),
with the marginalization prior's positional linearization rescaled in the
same gauge, and the window BA re-converges landmarks around it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sadvio_tpu.frontend import detect, klt, nofov, triangulate
from sadvio_tpu.models import cameras
from sadvio_tpu.pipeline.mono import MonoSLAM
from sadvio_tpu.pipeline.slam import TrackState, _cam, _cam0
from sadvio_tpu.utils import geometry as geo


class NoFovSLAM(MonoSLAM):
    """Bi-monocular VO with disjoint fields of view ("nofov")."""

    SCALE_DAMP = 0.35  # log-space gain of each maintenance step
    SCALE_STEP_CLIP = (0.8, 1.25)  # max per-step multiplicative change
    SCALE_DEADBAND = 0.02  # ignore ratios within 2% of unity (noise)
    MIN_LEVER = 0.015  # m of rotation-induced lever displacement to trust
    RATIO_RANGE = (0.05, 20.0)  # searched map-scale correction range

    def __init__(self, rig, config, imu_params=None, seed=0,
                 boot_parallax_deg: float = 1.5):
        super().__init__(rig, config, imu_params=imu_params, seed=seed,
                         boot_parallax_deg=boot_parallax_deg)
        # landmark pool split: [0, L/2) cam0, [L/2, L) cam1 -- camera 1's
        # landmarks enter the SAME window BA through the rigid extrinsics,
        # so the joint bundle observes metric scale continuously (the
        # reference's scale-aware landmark optimization); the RANSAC below
        # provides the initial gauge + a damped external measurement
        self._cam0_slot_limit = self.caps.L // 2
        self.scale_state = {"applied": False, "s": 1.0, "n_est": 0}
        L, K = self.caps.L, self.caps.K
        # chained cam-1 tracks: positions at the last KF + per-KF history
        # rows aligned with window slots (rolled with the window)
        self.uv1_last = np.zeros((L, 2), np.float32)
        self.v1_last = np.zeros((L,), bool)
        self.uv1_hist = np.zeros((K, L, 2), np.float32)
        self.hist_mask = np.zeros((K, L), bool)
        # cam-1 pyramid per window slot: long-baseline estimates re-track
        # against the ORIGIN template (chained positions only seed the init),
        # so chained-KLT drift does not compound into the scale measurement
        self.pyr1_hist = [None] * K

    # -- camera-1 independent KLT track (kf -> current) ------------------

    @partial(jax.jit, static_argnames=("self",))
    def _track_cam1(self, pyr_kf, pyr_new, uv_kf, valid):
        uv1, ok, _ = klt.track(
            pyr_kf[1], pyr_new[1], uv_kf, uv_kf, valid,
            levels=self.caps.pyr_levels, radius=self.caps.klt_radius,
            engine=self.klt_engine,
        )
        return uv1, ok

    @partial(jax.jit, static_argnames=("self",))
    def _track_cam1_refine(self, pyr1_a, pyr1_b, uv_a, init, valid, R_1):
        """Re-track origin-KF templates directly into the current frame,
        seeded by the chained positions (drift-free long-baseline match).

        R_1: camera-1 relative rotation (cur -> origin coords).  Long
        baselines accumulate enough rotation that unwarped LK converges with
        a systematic sub-pixel bias larger than the lever-arm scale signal;
        the rotation-homography affine warp H = K R_1 K^-1 removes it."""
        cam1 = _cam(self.rig, 1)
        fx = jnp.reshape(cam1.fx, ())
        fy = jnp.reshape(cam1.fy, ())
        cx = jnp.reshape(cam1.cx, ())
        cy = jnp.reshape(cam1.cy, ())
        one = jnp.ones(())
        Km = jnp.stack([
            jnp.stack([fx, 0 * one, cx]), jnp.stack([0 * one, fy, cy]),
            jnp.stack([0 * one, 0 * one, one]),
        ])
        Kinv = jnp.stack([
            jnp.stack([1 / fx, 0 * one, -cx / fx]),
            jnp.stack([0 * one, 1 / fy, -cy / fy]),
            jnp.stack([0 * one, 0 * one, one]),
        ])
        Hm = Km @ R_1 @ Kinv  # maps current pixels -> origin pixels
        N = init.shape[0]
        x = jnp.concatenate([init, jnp.ones((N, 1), init.dtype)], axis=1)
        y = x @ Hm.T  # (N,3)
        # Jacobian of dehom(Hm x) wrt the current pixel: target->template
        A = (Hm[:2, :2][None] * y[:, 2, None, None]
             - y[:, :2, None] * Hm[2, :2][None, None, :]) / (
            y[:, 2, None, None] ** 2)
        uv, ok, _ = klt.track(
            pyr1_a, pyr1_b, uv_a, init, valid, warp=A,
            levels=self.caps.pyr_levels, radius=self.caps.klt_radius,
            engine=self.klt_engine,
        )
        return uv, ok

    @partial(jax.jit, static_argnames=("self",))
    def _detect_cam1(self, img1, uv_exist, v_exist):
        return detect.detect_features(
            img1, existing_uv=uv_exist, existing_valid=v_exist,
            gh=8, gw=10, k_per_cell=max(1, self.cfg.features[0].n_per_cell),
        )

    @partial(jax.jit, static_argnames=("self",))
    def _cam1_kf_update(self, window, obs, uv1, v1, slot):
        """Write camera-1 observation row at the new KF and triangulate
        upper-half landmark slots from their window observations
        (initFromFeatures over cam1; the dual-camera half of the
        reference's per-camera typed maps)."""
        L, K = self.caps.L, self.caps.K
        upper = jnp.arange(L) >= L // 2
        v1u = v1 & upper
        obs = obs.replace(
            uv=obs.uv.at[slot, 1].set(uv1),
            mask=obs.mask.at[slot, 1].set(v1u),
        )
        cam1 = _cam(self.rig, 1)
        R_ws = jnp.einsum("kij,jl->kil", window.R, self.rig.R_f_s[1])
        t_ws = window.t + jnp.einsum("kij,j->ki", window.R, self.rig.t_f_s[1])
        rays_c = cam1.backproject(obs.uv[:, 1])  # (K,L,3)
        rays_w = jnp.einsum("kij,klj->kli", R_ws, rays_c)
        origins = jnp.broadcast_to(t_ws[:, None, :], rays_w.shape)
        m_obs = obs.mask[:, 1] & window.kf_mask[:, None]
        p_tri, tri_ok = triangulate.midpoint_triangulate(
            jnp.moveaxis(origins, 0, -2), jnp.moveaxis(rays_w, 0, -2),
            jnp.moveaxis(m_obs, 0, -1), det_eps=1e-5,
        )
        need3d = upper & ~window.lmk_mask & (jnp.sum(m_obs, axis=0) >= 2)
        add3d = need3d & tri_ok
        window = window.replace(
            lmk=jnp.where(add3d[:, None], p_tri, window.lmk),
            lmk_mask=window.lmk_mask | add3d,
        )
        return window, obs

    # -- scale estimation over the longest window baseline ---------------

    @partial(jax.jit, static_argnames=("self",))
    def _scale_baseline(self, pyr_o, pyr_k, R_o, t_o, R_k, t_k,
                        uv_o, uv_k, common):
        """One baseline's full scale estimate, packed into a 4-vector
        [tn, degenerate, s, ok] -- ONE device->host fetch per baseline
        instead of ~6 blocking scalar round trips (each ~29 ms on the
        tunneled chip)."""
        cam1 = _cam(self.rig, 1)
        Ri, ti = geo.pose_inverse(R_o, t_o)
        R_b, t_b = geo.pose_compose(Ri, ti, R_k, t_k)
        tn = jnp.linalg.norm(t_b)
        d = t_b / jnp.maximum(tn, 1e-12)
        deg = nofov.is_degenerate_motion(
            R_b, d, self.rig.R_f_s[1], self.rig.t_f_s[1],
            min_lever=self.MIN_LEVER)
        R_1 = self.rig.R_f_s[1].T @ R_b @ self.rig.R_f_s[1]
        uv_ref, ok_ref = self._track_cam1_refine(
            pyr_o, pyr_k, uv_o, uv_k, common, R_1)
        common2 = common & ok_ref
        rays_o = cam1.backproject(uv_o)
        rays_k = cam1.backproject(uv_ref)
        lo, hi = self.RATIO_RANGE
        s, inl, ok_s = nofov.scale_grid(
            R_b, d, self.rig.R_f_s[1], self.rig.t_f_s[1],
            rays_o, rays_k, common2,
            jnp.float32(lo) * tn, jnp.float32(hi) * tn,
        )
        ok = ok_s & (jnp.sum(common2) >= 12) & (tn > 1e-5) & ~deg & (s > 0)
        return jnp.stack([tn, deg.astype(tn.dtype), s, ok.astype(tn.dtype)])

    def _estimate_scale_window(self, k):
        """Robust scale over every usable window baseline (o -> k).

        Each baseline with enough common tracks and lever-arm signal yields
        one grid-M-estimate of the map-scale correction s_metric/|t_map|;
        the median over baselines suppresses the per-estimate noise (the
        signal sits near the sub-pixel correspondence noise floor).  Returns
        the median correction or None.
        """
        ratios = []
        for o in range(0, k):
            common = self.hist_mask[o] & self.hist_mask[k]
            if int(common.sum()) < 12:  # host-side masks: free
                continue
            if self.pyr1_hist[o] is None or self.pyr1_hist[k] is None:
                continue
            vals = np.asarray(self._scale_baseline(
                self.pyr1_hist[o], self.pyr1_hist[k],
                self.window.R[o], self.window.t[o],
                self.window.R[k], self.window.t[k],
                jnp.asarray(self.uv1_hist[o]), jnp.asarray(self.uv1_hist[k]),
                jnp.asarray(common)))
            tn, deg, s, ok = vals
            if ok > 0.5:
                ratios.append(float(s) / float(tn))
        if not ratios:
            return None
        return float(np.median(ratios))

    # -- gauge utilities --------------------------------------------------

    def _apply_scale_window(self, s):
        """Rescale the sliding window about its oldest keyframe position
        (the gauge anchor): poses, landmarks, the current estimate, the
        constant-velocity model and the prior's positional linearization
        move together; archived history does not."""
        t0 = self.window.t[0]
        self.window = self.window.replace(
            t=t0 + (self.window.t - t0) * s,
            lmk=t0 + (self.window.lmk - t0) * s,
        )
        self.t_cur = t0 + (self.t_cur - t0) * s
        self.dT = (self.dT[0], self.dT[1] * s)
        # full gauge transform (values AND sqrt-infos: position covariance
        # scales as s^2, sqrt-info as 1/s) so repeated damped corrections do
        # not accumulate a prior miscalibration
        from sadvio_tpu.backend import marginalization as marg

        self.priors = marg.gauge_transform_priors(
            self.priors, jnp.eye(3), s, anchor=t0)

    def _apply_scale_global(self, s):
        """Bootstrap: move the whole map AND the recorded history to metric
        scale in one shot (the reference's initial scale application)."""
        self.window = self.window.replace(
            t=self.window.t * s, lmk=self.window.lmk * s,
        )
        self.t_cur = self.t_cur * s
        self.dT = (self.dT[0], self.dT[1] * s)
        self.traj = [(ts, R, t * s) for ts, R, t in self.traj]
        self.kf_traj = [(ts, R, t * s) for ts, R, t in self.kf_traj]

    # -- frame hook --------------------------------------------------------

    def process_frame(self, frame, images_dev=None, prefetch_frame=None) -> dict:
        pyr_prev_kf = self.kf_pyr
        n_arch0 = len(self.archived_kf)
        n_resets0 = self.n_resets
        out = super().process_frame(frame, images_dev=images_dev,
                                    prefetch_frame=prefetch_frame)
        if not self.initialized or self.n_resets != n_resets0:
            self.v1_last[:] = False
            self.hist_mask[:] = False
            return out
        if not out.get("is_kf"):
            return out

        # window rolled inside the base class: shift the history rows
        if len(self.archived_kf) > n_arch0:
            self.uv1_hist = np.roll(self.uv1_hist, -1, axis=0)
            self.hist_mask = np.roll(self.hist_mask, -1, axis=0)
            self.hist_mask[-1] = False
            self.pyr1_hist = self.pyr1_hist[1:] + [None]

        k = self.n_kf - 1
        # chain cam-1 tracks from the previous KF to this one
        if pyr_prev_kf is not None and self.v1_last.any():
            uv_new, ok = self._track_cam1(
                pyr_prev_kf, self._last_pyr,
                jnp.asarray(self.uv1_last), jnp.asarray(self.v1_last))
            self.uv1_last = np.array(uv_new)  # writable host copy
            self.v1_last = np.array(ok) & self.v1_last

        # reseed dead cam-1 slots BEFORE writing the observation row, so
        # fresh tracks start accumulating window observations at this KF
        L = self.caps.L
        img1 = self._last_pyr[1][0]
        uv_det, s_det, v_det = self._detect_cam1(
            img1, jnp.asarray(self.uv1_last), jnp.asarray(self.v1_last))
        uv_det, v_det = np.asarray(uv_det), np.asarray(v_det)
        claimable = (~self.v1_last) & (np.arange(L) >= L // 2) \
            & ~np.asarray(self.window.lmk_mask)
        free = np.where(claimable)[0]
        src = np.where(v_det)[0][: len(free)]
        tgt = free[: len(src)]
        self.uv1_last[tgt] = uv_det[src]
        self.v1_last[tgt] = True
        if len(tgt):
            # a reseeded slot is a NEW landmark identity: clear the dead
            # track's observation rows and history (otherwise triangulation
            # and the scale estimator mix two physical features)
            cleared = jnp.zeros((L,), bool).at[jnp.asarray(tgt)].set(True)
            self.obs = self.obs.replace(
                mask=self.obs.mask & ~cleared[None, None, :])
            self.hist_mask[:, tgt] = False

        self.uv1_hist[k] = self.uv1_last
        self.hist_mask[k] = self.v1_last
        self.pyr1_hist[k] = tuple(self._last_pyr[1])

        # dual-camera window update: cam1 observation row + triangulation,
        # then re-run the joint BA (continuous metric-scale coupling)
        self.window, self.obs = self._cam1_kf_update(
            self.window, self.obs, jnp.asarray(self.uv1_last),
            jnp.asarray(self.v1_last), k)
        fixed_n = 1 if not self._have_priors else 0
        fixed_n = max(fixed_n, self.cfg.fixed_frame_number if self.n_kf > 1 else 1)
        self.window, self.obs, _ = self._backend(
            self.window, self.obs,
            self.imu.replace(mask=jnp.zeros_like(self.imu.mask)),
            self.priors, fixed_n)
        self.R_cur = self.window.R[k]
        self.t_cur = self.window.t[k]
        self.tracks = self.tracks.replace(has3d=self.window.lmk_mask)

        # estimate + apply the scale correction
        ratio = self._estimate_scale_window(k)
        if ratio is not None and np.isfinite(ratio) and 0.05 < ratio < 20.0:
            self.scale_state["n_est"] += 1
            out["scale_ratio"] = ratio
            if not self.scale_state["applied"]:
                self._apply_scale_global(ratio)
                self.scale_state["applied"] = True
                self.scale_state["s"] = ratio
                out["scale_applied"] = ratio
            elif abs(ratio - 1.0) > self.SCALE_DEADBAND:
                lo, hi = self.SCALE_STEP_CLIP
                s = float(np.clip(ratio ** self.SCALE_DAMP, lo, hi))
                self._apply_scale_window(s)
                self.scale_state["s"] *= s
                out["scale_step"] = s
        return out

"""Non-overlapping-FoV bi-monocular SLAM mode.

TPU-native re-design of the reference mode
(reference: cpp/src/slamNonOverlappingFov.cpp -- init:18, per-camera
tracking, scaleEstimationRANSAC:423, isDegenerativeMotion:634, dual-camera
outlierRemoval:355; scale-aware landmark optimization).

Two cameras look in opposite directions.  Camera 0 runs the monocular
front end (KLT + essential/PnP); camera 1 is tracked independently and its
epipolar geometry, coupled through the rigid extrinsics, resolves the
metric scale (frontend.nofov.scale_ransac).  The landmark pool is split by
slot range: slots [0, L/2) belong to camera 0, [L/2, L) to camera 1, so the
shared window/BA machinery works unchanged (each observation row masks the
other camera's slots).
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

    def __init__(self, rig, config, imu_params=None, seed=0,
                 boot_parallax_deg: float = 1.5):
        super().__init__(rig, config, imu_params=imu_params, seed=seed,
                         boot_parallax_deg=boot_parallax_deg)
        self.scale_state = {"applied": False, "s": 1.0, "n_est": 0}
        self.kf_uv1 = None  # cam1 track positions at last KF (for scale)

    # -- camera-1 independent KLT track (kf -> current) ------------------

    @partial(jax.jit, static_argnames=("self",))
    def _track_cam1(self, pyr_kf, pyr_new, uv_kf, valid):
        uv1, ok, _ = klt.track(
            pyr_kf[1], pyr_new[1], uv_kf, uv_kf, valid,
            levels=self.caps.pyr_levels, radius=self.caps.klt_radius,
            engine=self.klt_engine,
        )
        return uv1, ok

    def _estimate_scale(self, pyr_new, R_new, t_new):
        """1-point RANSAC scale from cam1 tracks at the current frame."""
        if self.kf_uv1 is None:
            return None
        uv_kf, valid = self.kf_uv1
        if int(jnp.sum(valid)) < 12:
            return None
        uv1, ok = self._track_cam1(self.kf_pyr, pyr_new, uv_kf, valid)
        cam1 = _cam(self.rig, 1)
        k_last = self.n_kf - 1
        R_kf = self.window.R[k_last]
        t_kf = self.window.t[k_last]
        # body motion kf->cur in the kf body frame
        Ri, ti = geo.pose_inverse(R_kf, t_kf)
        R_b, t_b = geo.pose_compose(Ri, ti, R_new, t_new)
        tn = float(jnp.linalg.norm(t_b))
        if tn < 1e-5:
            return None
        d = t_b / tn
        if bool(nofov.is_degenerate_motion(R_b, d, self.rig.R_f_s[1],
                                           self.rig.t_f_s[1])):
            return None
        rays_kf = cam1.backproject(uv_kf)
        rays_cur = cam1.backproject(uv1)
        s, inl, ok_s = nofov.scale_ransac(
            R_b, d, self.rig.R_f_s[1], self.rig.t_f_s[1],
            rays_kf, rays_cur, ok,
        )
        if not bool(ok_s):
            return None
        # s is the metric length of the body translation; current map length
        # is tn -> multiplicative map-scale correction
        return float(s) / tn

    def process_frame(self, frame, images_dev=None, prefetch_frame=None) -> dict:
        out = super().process_frame(frame, images_dev=images_dev,
                                    prefetch_frame=prefetch_frame)
        if not self.initialized:
            return out
        if out.get("is_kf"):
            # refresh cam1 template tracks at each keyframe
            pyr = self.kf_pyr
            L = self.caps.L
            uv_det, s_det, v_det = detect.detect_features(
                pyr[1][0], existing_uv=jnp.zeros((L, 2)),
                existing_valid=jnp.zeros((L,), bool),
                gh=8, gw=10, k_per_cell=max(1, self.cfg.features[0].n_per_cell),
            )
            n = min(uv_det.shape[0], L)
            uv_kf = jnp.zeros((L, 2)).at[:n].set(uv_det[:n])
            val = jnp.zeros((L,), bool).at[:n].set(v_det[:n])
            self.kf_uv1 = (uv_kf, val)
        elif out.get("pnp_ok") and self.n_kf >= 2 and not self.scale_state["applied"]:
            pyr_new = self._pyramids(self._upload_images(frame))
            ratio = self._estimate_scale(pyr_new, self.R_cur, self.t_cur)
            if ratio is not None and np.isfinite(ratio) and 0.05 < ratio < 20.0:
                # rescale the whole map once (the reference keeps refining
                # scale inside landmarkOptimizationNoFov; one-shot here)
                self.window = self.window.replace(
                    t=self.window.t * ratio, lmk=self.window.lmk * ratio,
                )
                self.t_cur = self.t_cur * ratio
                self.dT = (self.dT[0], self.dT[1] * ratio)
                # the recorded history must move to the new gauge too, or the
                # output trajectory mixes two scales
                self.traj = [(ts, R, t * ratio) for ts, R, t in self.traj]
                self.kf_traj = [(ts, R, t * ratio) for ts, R, t in self.kf_traj]
                self.scale_state = {"applied": True, "s": ratio, "n_est": 1}
                out["scale_applied"] = ratio
        return out

"""SLAM pipeline orchestration: stereo VO / stereo VIO.

TPU-native re-design of the reference pipeline cores
(reference: cpp/src/slamCore.cpp -- detectFeatures:207, trackFeatures:339,
epipolarFiltering:224, shouldInsertKeyframe:375, predict:432,
outlierRemoval:42, initLandmarks:95; cpp/src/slamBiMono.cpp;
cpp/src/slamBiMonoVIO.cpp -- init:6, frontEndStep:319, backEndStep:561).

Architecture: all estimator state lives in fixed-shape device pytrees; the
host loop only reads back a handful of scalars per frame (keyframe vote,
health counters) and selects between a small set of pre-compiled stage
kernels:

  frontend_step : pyramids + KLT + PnP predict + epipolar gate + KF vote
  insert_kf     : detect (occupancy-masked) + stereo KLT + triangulate
                  + write observation row
  backend_step  : windowed Schur-LM VI-BA (+ outlier removal)
  marg_and_roll : marginalize slot 0 (sparsified prior) + window shift

Feature identity: track slot == landmark slot (the reference's
Feature<->Landmark weak_ptr pairing becomes index identity).
The front-end/back-end thread split of the reference (slamCore.cpp:587-608)
becomes JAX async dispatch: backend kernels are enqueued without blocking
the frame loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from sadvio_tpu.backend import ba, marginalization as marg, viinit
from sadvio_tpu.data.window import (
    LMK_RESURRECTED, ImuChain, Observations, PriorSet, Rig, WindowState,
)
from sadvio_tpu.frontend import (
    detect, epipolar, eskf as eskf_mod, klt, match as match_mod, pnp, triangulate,
)
from sadvio_tpu.models import cameras, imu as imu_mod
from sadvio_tpu.pipeline.config import SLAMConfig
from sadvio_tpu.utils import geometry as geo


@struct.dataclass
class TrackState:
    """Per-camera feature tracks; slot index == landmark slot index."""

    uv: jnp.ndarray  # (C,L,2)
    valid: jnp.ndarray  # (C,L)
    uv_kf: jnp.ndarray  # (C,L,2) positions at the last keyframe
    has3d: jnp.ndarray  # (L,) landmark triangulated


def _cam0(rig: Rig):
    return jax.tree.map(lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x, rig.cam)


def _cam(rig: Rig, c: int):
    return jax.tree.map(lambda x: x[c] if hasattr(x, "shape") and x.ndim > 0 else x, rig.cam)


class StereoSLAM:
    """Stereo VO ("bimono") / stereo VIO ("bimonovio") pipeline."""

    def __init__(self, rig: Rig, config: SLAMConfig, imu_params=None, seed=0):
        self.rig = rig
        self.cfg = config
        self.caps = config.caps
        self.vio = config.slam_mode.endswith("vio")
        self.imu_params = imu_params or imu_mod.ImuParams.euroc()
        # LK engine: the Pallas one-window-per-feature kernel wins on real
        # TPU hardware (predicated-roll iteration out of VMEM); "batched"
        # (all-features-at-once windowed sampling, pure XLA) is the fastest
        # portable path and ~200x the per-feature gather baseline.
        # "axon" is this machine's tunneled-TPU plugin (mosaic-capable).
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        self.klt_engine = "pallas" if on_tpu else "batched"
        K, L, P = self.caps.K, self.caps.L, self.caps.P
        C = rig.C
        self.C = C
        self.window = WindowState.create(K, L)
        self.obs = Observations.create(K, C, L)
        self.priors = PriorSet.create(K, P)
        self.imu = ImuChain.create(K)
        self.tracks = TrackState(
            uv=jnp.zeros((C, L, 2)), valid=jnp.zeros((C, L), bool),
            uv_kf=jnp.zeros((C, L, 2)), has3d=jnp.zeros((L,), bool),
        )
        # cached identity preintegration: re-creating it is ~10 eager array
        # constructions per keyframe (immutable pytree -- safe to share)
        self._pre_id = imu_mod.Preintegration.identity()
        self.pre_cur = self._pre_id
        self._imu_n = 0  # host-side count of samples in pre_cur
        # current-frame estimate
        self.R_cur = jnp.eye(3)
        self.t_cur = jnp.zeros(3)
        self.v_cur = jnp.zeros(3)
        self.dT = (jnp.eye(3), jnp.zeros(3))  # constant-velocity model
        self.kf_pyr = None  # pyramid of the last keyframe (tracking template)
        self._last_pyr = None  # pyramids of the most recent frame
        self.kf_tmpl = None  # cached per-level template windows (KF rate)
        self.n_kf = 0
        self.key = jax.random.PRNGKey(seed)
        self.initialized = False
        # VI bootstrap (slamBiMonoVIO.cpp:94-100): run vision-only window BA
        # for vio_init_kfs keyframes, then solve gravity/velocity/shared-bias
        # with VIInit; only afterwards do IMU factors enter the window BA and
        # the ESKF frame-rate fusion switch on.
        self.vi_initialized = not self.vio
        self.vio_init_kfs = min(10, self.caps.K - 1)  # ref: 10-KF bootstrap
        self._vi_opt_scale = False  # monocular subclass solves scale too
        self.successive_fails = 0
        self._lc_diag = (0, 0, False)  # (candidates, inliers, pnp_ok)
        self.n_resets = 0  # re-initialization count (failure recovery)
        self.traj = []  # (ts, R, t) at frame rate
        self.kf_traj = []
        # frame-rate VIO state log rows (ts, t, v, ba, bg) -- the
        # vio_poses.csv layout (slamBiMonoVIO.cpp:616-642); ba/bg are the
        # KF-rate host mirrors (refreshed by the _pack_state fetch)
        self.vio_log = []
        self._ba_h = np.zeros(3)
        self._bg_h = np.zeros(3)
        self.kf_ts = []  # host mirror of active window-slot timestamps
        # frame-rate ESKF pose covariance (the reference's _dT_cov,
        # ESKFEstimator.cpp:178): host mirror + per-KF record used to weight
        # NFR pose-graph edges
        self._cov_h = np.zeros((6, 6))
        self.kf_cov = []
        self._have_priors = False  # host mirror of any(priors.sp_mask)
        # keep-set overflow + degenerate-marginal flag of the latest
        # marginalization (device scalars; fetched via the KF-rate
        # _pack_state pack, never a blocking RPC)
        self._ovf_dev = jnp.zeros((), jnp.int32)
        self._degen_dev = jnp.zeros((), bool)
        # async health pipeline: the pending (ts, device health) fetch, the
        # most recently ingested health, the template-changed flag that
        # forces one blocking fetch right after a keyframe, and the
        # previous parallax (one-step vote extrapolation under lag)
        self._health_pend = None
        self._health_stale = False
        self._last_health = None
        self._par_prev = None
        self._prefetched = None  # next frame's device images (run() pipeline)
        self._imu_pref = []  # next frame's uploaded IMU batches
        self._imu_pref_ts = None  # timestamp keying _imu_pref
        # global archive of marginalized KFs (GlobalMap::addFrame role,
        # globalmap.cpp:5) + optional NFR pose-graph edges (marginalizeRelative)
        self.archived_kf = []  # (ts, R, t) host-side append-only log
        self.pose_graph_edges = []  # (ts0, ts1, dx (6,), inf (6,6))
        # descriptor global map (config global_map): archived landmark
        # positions + BRIEF descriptors for long-range resurrection
        self.global_map_state = None
        self.lmk_desc = None
        if config.global_map:
            from sadvio_tpu.data.globalmap import GlobalMap

            self.global_map_state = GlobalMap.create(config.archive_capacity)
            self.lmk_desc = jnp.zeros((L, 8), jnp.uint32)
        # PP: route the KF-rate backend through a second device (reference
        # front/back-end thread split -> BackendExecutor async dispatch);
        # degenerates to same-device async dispatch with one chip
        self.backend_exec = None
        if config.multithreading:
            from sadvio_tpu.parallel.pipeline_parallel import BackendExecutor

            self.backend_exec = BackendExecutor()
        self.mesher = None
        if config.mesh3d and C >= 2:
            from sadvio_tpu.mesh.mesh import MeshConfig, Mesher

            self.mesher = Mesher(rig, MeshConfig(
                zncc_tsh=config.zncc_tsh,
                max_edge_len=config.max_length_tsh,
                # ray-cast depth window follows the landmark depth gate
                # (the reference's fixed 0.25-5 m is a UGV ground prior)
                max_ray_depth=MeshConfig().max_lmk_depth,
            ))
        # extra feature types (features_handled dispatch, the reference's
        # per-label detector/matcher/initializer factory maps,
        # slamParameters.cpp:63-240): each label beyond pointxd instantiates
        # its typed channel, updated at KF rate
        self.channels = []
        self._line_ch = None  # the in-BA linexd channel, if configured
        self._use_csv = False  # csv detector replaces point detection
        for f in config.features:
            label = f.label.lower()
            if label == "linexd" and C >= 2:
                from sadvio_tpu.pipeline.line_channel import LineChannel

                # in_ba: line observations enter the window BA as
                # pose-constraining residuals (localMapBA linexd parity,
                # BundleAdjustmentCERESAnalytic.cpp:273-302)
                self._line_ch = LineChannel(rig, in_ba=True, k_window=K)
                self.channels.append(self._line_ch)
            elif label == "edgeletxd" and C >= 2:
                from sadvio_tpu.pipeline.channels import EdgeletChannel

                self.channels.append(EdgeletChannel(rig))
            elif label == "ellipsepatternxd":
                from sadvio_tpu.pipeline.channels import EllipseChannel

                self.channels.append(EllipseChannel(
                    rig, side=getattr(f, "pattern_side", 1.0) or 1.0))
            elif label == "bboxxd" and C >= 2:
                from sadvio_tpu.pipeline.channels import BBoxChannel

                self.channels.append(BBoxChannel(rig))
            elif label == "pointxd" and f.detector.lower() in ("csv", "cvcsv"):
                # cvCSVFeatureDetector: precomputed keypoints from
                # "<folder>/<ts>.csv" substitute the point detector
                # (csvKeypointDetector.cpp)
                self._use_csv = True
                self._csv_folder = f.folder
        self._ba_opts = ba.BAOptions(
            iters=config.ba_iterations, sigma_px=jnp.float32(1.0),
            acc_walk=self.imu_params.acc_walk, gyr_walk=self.imu_params.gyr_walk,
            # optimizer dispatch (slamParameters.cpp:263-281): "angular" =
            # bearing-vector error BA (AngularAdjustmentCERESAnalytic), the
            # right residual for fisheye/omni rigs
            angular=config.optimizer.lower().startswith("angular"),
        )

    # ------------------------------------------------------------------
    # jitted stages (bound methods are cached by id(self) -- acceptable for
    # a per-run pipeline object; stages take/return pytrees only)
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _pyramids(self, images):
        # images arrive uint8 (4x less tunnel H2D than f32, ~23 ms/frame on
        # the tunneled chip); all pyramid math is f32 on device
        images = images.astype(jnp.float32)
        return tuple(
            tuple(klt.build_pyramid(images[c], self.caps.pyr_levels))
            for c in range(self.C)
        )

    @partial(jax.jit, static_argnames=("self",))
    def _template_cache(self, pyr_new, uv_kf0):
        """KF-rate half of template building: per-level aligned windows
        around the new KF's cam0 features (template_windows_pyr).  Hoists
        the per-feature dynamic_slice extraction off the frame-rate path."""
        return klt.template_windows_pyr(
            pyr_new[0], uv_kf0, self.caps.pyr_levels, self.caps.klt_radius
        )

    @partial(jax.jit, static_argnames=("self",))
    def _pack_pose(self, R, t):
        """12-float pose pack: ONE device->host fetch instead of two."""
        return jnp.concatenate([R.reshape(-1), t])

    @partial(jax.jit, static_argnames=("self", "vio"))
    def _roll_pack(self, window, obs, imu, vio):
        """55-float roll-time pack: the leaving KF's pose (12) + the NFR
        relative edge dx(6) + info(36) + shared-count(1).  ONE fetch per
        window roll instead of three (pose, n_sh gate, edge arrays) -- each
        separate fetch is a full RPC round trip on a tunneled device."""
        from sadvio_tpu.backend import marginalization as marg_mod

        dx_e, inf_e, n_sh = marg_mod.marginalize_relative(
            window, obs, self.rig, imu, self._ba_opts, vio=vio)
        return jnp.concatenate([
            window.R[0].reshape(-1), window.t[0], dx_e, inf_e.reshape(-1),
            n_sh.astype(jnp.float32)[None],
        ])

    @partial(jax.jit, static_argnames=("self",))
    def _pack_state(self, window, slot, ovf, degen, ba_cost, gm_counts=None):
        """23/25-float KF state pack (R,t,v,ba,bg + keep-overflow count +
        BA cost [+ global-map resurrection counts]): ONE fetch refreshes
        every host mirror at keyframe rate -- the riders are what let the
        marg/backend/global-map stages surface their scalars without a
        blocking fetch each (a separate int()/float() costs a full RPC
        round trip on a tunneled device)."""
        parts = [
            window.R[slot].reshape(-1), window.t[slot], window.v[slot],
            window.ba[slot], window.bg[slot],
            ovf.astype(jnp.float32)[None],
            jnp.reshape(degen, (1,)).astype(jnp.float32),
            jnp.reshape(ba_cost, (1,)).astype(jnp.float32),
        ]
        if gm_counts is not None:
            parts.append(gm_counts.astype(jnp.float32).reshape(-1))
        return jnp.concatenate(parts)

    def _upload_images(self, frame):
        """Host->device image transfer in the provider's dtype.

        Tunnel H2D is a per-frame bottleneck (~24 MB/s measured), so
        real-image providers should emit uint8 (4x less wire than f32;
        camera data is 8-bit anyway).  Float renders are shipped exactly:
        re-quantizing a smooth synthetic image erases the sub-intensity
        gradients the mono-bootstrap essential matrix needs.  run()'s
        prefetch overlaps the transfer with the previous frame's compute
        either way."""
        return jnp.asarray(frame.images)

    @partial(jax.jit, static_argnames=("self",))
    def _frontend(self, pyr_kf, pyr_new, tracks: TrackState, window, R_pred,
                  t_pred, key, kf_tmpl=None, eskf_on=False, pre_cov=None,
                  v_pred=None, R_cur=None, t_cur=None):
        """Track cam0 from the last-KF template, PnP-predict, epipolar-gate.

        Tracking is always keyframe->current (slamCore.cpp:339 trackFeatures
        lastKF.cam0 -> frame.cam0): per-frame KLT drift does not compound.

        VIO: when eskf_on, the PnP pose is replaced by the ESKF fusion of the
        IMU-predicted pose prior (covariance from the preintegration, pre_cov)
        with the gated landmark reprojections -- the reference's frame-rate
        ESKF update (slamBiMonoVIO.cpp:409-419, ESKFEstimator.cpp:66-178).

        Host-RPC discipline: the PRNG key splits INSIDE the kernel (key_next
        is returned -- an eager jax.random.split costs ~80 ms per frame on
        the tunneled device), and the constant-velocity dT update
        (pose_inverse/compose of R_cur -> R_new) is fused here instead of
        running as eager Lie ops in the frame loop.
        """
        cam0 = _cam0(self.rig)
        key, key_next = jax.random.split(key)
        if v_pred is None:
            v_pred = jnp.zeros(3)
        # KLT init: project landmarks with the predicted pose (predictFeature,
        # slamCore.cpp:264); fall back to the last tracked position
        uv_proj, vis = cameras.project_world(
            cam0, R_pred, t_pred, self.rig.R_f_s[0], self.rig.t_f_s[0], window.lmk
        )
        init = jnp.where((tracks.has3d & vis)[:, None], uv_proj, tracks.uv[0])

        # SVO-style affine template warp from the predicted geometry: without
        # it, pure-translation LK under scale change (camera approaching the
        # scene) has a radial bias field == spurious forward translation,
        # which PnP then amplifies into exponential drift.
        k_last = jnp.sum(window.kf_mask) - 1
        R_kf = window.R[jnp.maximum(k_last, 0)]
        t_kf = window.t[jnp.maximum(k_last, 0)]
        p_c_cur = cameras.world_to_cam(
            R_pred, t_pred, self.rig.R_f_s[0], self.rig.t_f_s[0], window.lmk
        )
        z_cur = p_c_cur[:, 2]
        R_w_c = R_pred @ self.rig.R_f_s[0]
        step = (z_cur / cam0.focal)[:, None]
        proj_kf = lambda p: cameras.project_world(
            cam0, R_kf, t_kf, self.rig.R_f_s[0], self.rig.t_f_s[0], p
        )[0]
        uv_c0 = proj_kf(window.lmk)
        col_u = proj_kf(window.lmk + R_w_c[:, 0][None] * step) - uv_c0
        col_v = proj_kf(window.lmk + R_w_c[:, 1][None] * step) - uv_c0
        A = jnp.stack([col_u, col_v], axis=-1)  # (L,2,2)
        warp_ok = tracks.has3d & window.lmk_mask & vis & (z_cur > 0.1)
        A = jnp.where(warp_ok[:, None, None], A, jnp.eye(2))

        if self.cfg.tracker == "matcher":
            # descriptor-matcher tracking (reference "tracker: matcher"
            # config; afeaturematcher.cpp predicted-search-box semantics):
            # detect candidates in the new frame, BRIEF-match the last-KF
            # templates against them inside a box around the prediction
            sm_new = detect.smooth3(pyr_new[0][0])
            sm_kf = detect.smooth3(pyr_kf[0][0])
            uv_c, s_c, v_c = detect.detect_features(
                pyr_new[0][0],
                existing_uv=jnp.zeros((self.caps.L, 2)),
                existing_valid=jnp.zeros((self.caps.L,), bool),
                gh=8, gw=10,
                k_per_cell=max(2, self.cfg.features[0].n_per_cell),
            )
            desc_c = detect.brief_describe(sm_new, uv_c)
            desc_t = detect.brief_describe(sm_kf, tracks.uv_kf[0])
            idx, dist = match_mod.match(
                desc_t, init, tracks.valid[0], desc_c, uv_c, v_c,
                search_radius=30.0,
            )
            uv_m = jnp.where((idx >= 0)[:, None], uv_c[jnp.maximum(idx, 0)], init)
            ok_m = tracks.valid[0] & (idx >= 0)
            # sub-pixel polish: matched detections are integer-pixel; a
            # level-0 LK refinement from the KF template closes the gap to
            # the reference's re-describe+refine (afeaturematcher re-match)
            uv1, ok_r, err = klt.track(
                pyr_kf[0], pyr_new[0], tracks.uv_kf[0], uv_m, ok_m,
                levels=1, radius=self.caps.klt_radius, warp=A,
                engine=self.klt_engine,
            )
            # keep the raw match when the polish diverges (fb-check fail)
            uv1 = jnp.where(ok_r[:, None], uv1, uv_m)
            ok = ok_m
        else:
            uv1, ok, err = klt.track(
                pyr_kf[0], pyr_new[0], tracks.uv_kf[0], init, tracks.valid[0],
                levels=self.caps.pyr_levels, radius=self.caps.klt_radius,
                warp=A, engine=self.klt_engine, tmpl_wins=kf_tmpl,
            )

        # interframe pose estimator dispatch (createPoseEstimator,
        # slamParameters.cpp:242-260 + predict, slamCore.cpp:432-466)
        pe_mode = self.cfg.pose_estimator.lower()
        if pe_mode.startswith("epipolar"):
            # EpipolarPoseEstimator: essential-RANSAC over the KF->frame ray
            # matches acts as the success check + inlier gate, but the pose
            # update stays the motion prediction -- the reference only takes
            # the estimated transform for pnp ("Update the pose only for
            # pnp", slamCore.cpp:448-450)
            rays_kf_e = cam0.backproject(tracks.uv_kf[0])
            rays_cur_e = cam0.backproject(uv1)
            _, _, inliers, pnp_ok = epipolar.essential_ransac(
                rays_kf_e, rays_cur_e, ok, key)
            R_new, t_new = R_pred, t_pred
            ok = ok & (~pnp_ok | inliers)
        else:
            # "pnp" (default; the reference's "imu" estimator is a TODO stub,
            # slamParameters.cpp:248-250 -- IMU prediction already feeds
            # R_pred/t_pred in VIO): PnP on tracks with triangulated landmarks
            lmk_ok = ok & tracks.has3d & window.lmk_mask
            R_new, t_new, inliers, pnp_ok, cov = pnp.pnp_ransac(
                cam0, self.rig.R_f_s[0], self.rig.t_f_s[0], window.lmk, uv1,
                lmk_ok, R_pred, t_pred, key,
            )
            # constant-velocity sanity at 1000% (slamCore.cpp:453-460): a PnP
            # solution 10x away from the predicted translation forces the
            # prediction and reports failure (dead-reckon + KF-force path)
            k_prev = jnp.maximum(jnp.sum(window.kf_mask) - 1, 0)
            R_kf0 = window.R[k_prev]
            t_kf0 = window.t[k_prev]
            t_rel_est = R_kf0.T @ (t_new - t_kf0)
            t_rel_prd = R_kf0.T @ (t_pred - t_kf0)
            n_est = jnp.linalg.norm(t_rel_est)
            dev = jnp.linalg.norm(t_rel_est - t_rel_prd) / jnp.maximum(n_est, 1e-9)
            cv_fail = (n_est > 0.01) & (jnp.linalg.norm(t_rel_prd) > 0.01) & (
                dev > 10.0)
            pnp_ok = pnp_ok & ~cv_fail
            R_new = jnp.where(pnp_ok, R_new, R_pred)
            t_new = jnp.where(pnp_ok, t_new, t_pred)
            # apply the inlier gate only when the solve succeeded: on PnP
            # failure the tracks must stay alive for dead reckoning + forced
            # KF (slamBiMonoVIO.cpp:429-443), not be mass-invalidated
            ok = ok & (~lmk_ok | inliers | ~pnp_ok)

        # epipolar gate vs last KF (slamCore.cpp:224-251, 0.5 deg angular)
        R_ws_kf, t_ws_kf = geo.pose_compose(R_kf, t_kf, self.rig.R_f_s[0], self.rig.t_f_s[0])
        R_ws_new, t_ws_new = geo.pose_compose(R_new, t_new, self.rig.R_f_s[0], self.rig.t_f_s[0])
        R_ab, t_ab = geo.pose_compose(*geo.pose_inverse(R_ws_kf, t_ws_kf), R_ws_new, t_ws_new)
        rays_kf_c = cam0.backproject(tracks.uv_kf[0])
        rays_new_c = cam0.backproject(uv1)
        ok = epipolar.epipolar_filter(R_ab, t_ab, rays_kf_c, rays_new_c, ok)

        P_frame = jnp.zeros((6, 6))  # frame pose covariance ([omega, nu])
        if self.vio:
            # ESKF frame update after the filters (reference order:
            # predict -> epipolarFiltering -> outlierRemoval -> ESKF,
            # slamBiMonoVIO.cpp:388-419); the IMU prediction is the prior
            P_prior = eskf_mod.imu_prior_covariance(pre_cov)
            lmk_ok2 = ok & tracks.has3d & window.lmk_mask
            R_e, t_e, P_post, n_used = eskf_mod.eskf_update(
                cam0, self.rig.R_f_s[0], self.rig.t_f_s[0], R_pred, t_pred,
                P_prior, window.lmk, uv1, lmk_ok2, sigma_px=1.0,
            )
            use = eskf_on & pnp_ok & (n_used >= 8)
            R_new = jnp.where(use, R_e, R_new)
            t_new = jnp.where(use, t_e, t_new)
            # frame covariance record (the reference's _dT_cov role,
            # ESKFEstimator.cpp:178): filter posterior when fused, else the
            # raw IMU-prediction prior
            P_frame = jnp.where(use, P_post, P_prior)

        tracks = tracks.replace(
            uv=tracks.uv.at[0].set(uv1), valid=tracks.valid.at[0].set(ok)
        )
        r0 = cameras.bearing_world(
            cam0, R_kf, jnp.zeros(3), self.rig.R_f_s[0], self.rig.t_f_s[0],
            tracks.uv_kf[0],
        )
        r1 = cameras.bearing_world(
            cam0, R_new, jnp.zeros(3), self.rig.R_f_s[0], self.rig.t_f_s[0], uv1
        )
        # atan2 form: arccos(dot) near 1 rectifies f32 noise into a large
        # positive bias; the cross-product form is exact for small angles
        cr = jnp.cross(r0, r1)
        par = jnp.rad2deg(jnp.arctan2(jnp.linalg.norm(cr, axis=-1), jnp.sum(r0 * r1, -1)))
        n_trk = jnp.sum(ok)
        parallax = jnp.sum(jnp.where(ok, par, 0.0)) / jnp.maximum(n_trk, 1)
        n_lmk_trk = jnp.sum(ok & tracks.has3d & window.lmk_mask)
        # health scalars + the new pose (+ predicted velocity, for the
        # frame-rate VIO state log) packed into one array: the host fetches
        # everything this frame needs with a single device->host transfer
        # (each separate bool()/float()/np.asarray costs a full ~29 ms RPC
        # round trip on tunneled devices)
        health = jnp.concatenate([
            jnp.stack([
                pnp_ok.astype(jnp.float32), parallax,
                n_trk.astype(jnp.float32), n_lmk_trk.astype(jnp.float32),
            ]),
            R_new.reshape(-1), t_new, v_pred,
            P_frame.reshape(-1),  # 36 floats; rides the same single fetch
        ])
        # fused constant-velocity model update (dT = T_cur^-1 T_new)
        if R_cur is None:
            dR, dt_ = jnp.eye(3), jnp.zeros(3)
        else:
            Ri, ti = geo.pose_inverse(R_cur, t_cur)
            dR, dt_ = geo.pose_compose(Ri, ti, R_new, t_new)
        return tracks, R_new, t_new, health, dR, dt_, key_next

    @partial(jax.jit, static_argnames=("self",))
    def _insert_kf(self, pyr_new, tracks: TrackState, window, obs, imu_chain,
                   pre_cur, R_kf, t_kf, v_kf, ts, key, slot, ext_det=None,
                   gm=None, lmk_desc=None, imu_gap_ok=True):
        """Insert keyframe at (dynamic) slot: detect, stereo-track,
        triangulate, write observation rows (slamBiMonoVIO.cpp:481-538).

        slot is a traced scalar: a static slot re-traced this kernel for
        every window position during fill (~13 s compile each on the
        tunneled TPU).

        ext_det: optional (uv (M,2), valid (M,)) precomputed keypoints
        replacing the detector (the reference's cvCSVFeatureDetector path,
        csvKeypointDetector.cpp).

        imu_gap_ok: traced bool -- False masks out this keyframe's IMU
        factor (>1 s inter-KF gap, AOptimizer.cpp:68-70).  Computed on the
        HOST in float64: epoch-scale timestamps (~1.4e9 s on EuRoC/ROS)
        quantize to 128 s steps in the device's float32 ts chain, so a
        device-side subtraction cannot resolve a 1 s threshold.

        Returns (..., key_next): the PRNG key advances in-kernel (eager
        splits cost ~80 ms on the tunneled device)."""
        cam0 = _cam0(self.rig)
        key, key_next = jax.random.split(key)
        cam1 = _cam(self.rig, 1)
        L = self.caps.L
        img0 = pyr_new[0][0]

        # 1. detect in free slots with occupancy mask
        if self._use_csv and ext_det is not None:
            uv_det, v_det = ext_det
            # same occupancy rule as the detector: drop candidates within
            # r=5 px of live tracks (aOpenCVFeatureDetector mask circles)
            d2ex = jnp.sum((uv_det[:, None] - tracks.uv[0][None]) ** 2, -1)
            occ = jnp.any((d2ex < 25.0) & tracks.valid[0][None, :], axis=1)
            v_det = v_det & ~occ
        else:
            uv_det, s_det, v_det = detect.detect_features(
                img0, existing_uv=tracks.uv[0], existing_valid=tracks.valid[0],
                gh=8, gw=10, k_per_cell=max(1, self.cfg.features[0].n_per_cell),
            )
        # 1b. landmark resurrection (recoverFeatureFromMapLandmarks
        # slamCore.cpp:253; ldmk_match 5x5 search box, afeaturematcher.cpp):
        # in-map landmarks whose track died are projected with the new KF
        # pose and re-associated to the mutual-nearest fresh detection inside
        # a tight box.  ≠ descriptor gate -> the window BA's 3 px
        # reprojection gate is the verifier (a false match within the box of
        # an already-triangulated landmark is geometrically consistent or
        # gets culled as an outlier next backend step).
        dead = window.lmk_mask & ~tracks.valid[0]
        uv_prj, vis_p = cameras.project_world(
            cam0, R_kf, t_kf, self.rig.R_f_s[0], self.rig.t_f_s[0], window.lmk
        )
        M = uv_det.shape[0]
        d2 = jnp.sum((uv_prj[:, None] - uv_det[None, :]) ** 2, -1)  # (L,M)
        gate = (dead & vis_p)[:, None] & v_det[None, :] & (d2 < 25.0)
        d2g = jnp.where(gate, d2, jnp.inf)
        bestd = jnp.argmin(d2g, axis=1)  # best detection per landmark
        bestl = jnp.argmin(d2g, axis=0)  # best landmark per detection
        hit = (jnp.min(d2g, axis=1) < jnp.inf) & (bestl[bestd] == jnp.arange(L))
        uv0_base = jnp.where(hit[:, None], uv_det[bestd], tracks.uv[0])
        v0_base = tracks.valid[0] | hit
        # consume matched detections so they don't also fill free slots
        v_det = v_det & ~jnp.zeros_like(v_det).at[
            jnp.where(hit, bestd, M)
        ].set(True, mode="drop")
        window = window.replace(
            lmk_flags=jnp.where(hit, window.lmk_flags | LMK_RESURRECTED,
                                window.lmk_flags)
        )

        free = ~(v0_base | window.lmk_mask)  # (L,)
        det_rank = jnp.cumsum(v_det) - 1
        n_free = jnp.sum(free)
        # assign detection d -> the (det_rank[d])-th free slot
        free_slots = jnp.nonzero(free, size=L, fill_value=L - 1)[0]
        take = v_det & (det_rank < n_free)
        slot_of_det = jnp.where(take, free_slots[jnp.clip(det_rank, 0, L - 1)], L)
        new_uv0 = uv0_base.at[slot_of_det].set(uv_det, mode="drop")
        new_v0 = v0_base.at[slot_of_det].set(True, mode="drop")
        # a claimed slot is a NEW landmark identity: clear any stale
        # observation rows left by the slot's previous occupant (otherwise
        # the BA mixes the dead landmark's history into the new one)
        claimed = jnp.zeros((L,), bool).at[slot_of_det].set(take, mode="drop")
        obs = obs.replace(mask=obs.mask & ~claimed[None, None, :])

        # 1c. long-range resurrection from the descriptor global map
        # (globalmap.cpp archive + recoverFeatureFromMapLandmarks beyond the
        # sliding window): fresh detections matching an archived landmark by
        # projection + BRIEF descriptor adopt its archived position, so the
        # map re-uses old structure when the camera revisits it.
        n_gm_res = jnp.zeros((2,), jnp.int32)  # [claimed, pack hits]
        gm_pack = None
        if self.cfg.global_map and gm is not None:
            from sadvio_tpu.data import globalmap as gmap

            sm0 = detect.smooth3(img0)
            det_desc = detect.brief_describe(sm0, uv_det)
            lmk_arch, hit_a, src_a = gmap.resurrect(
                gm, cam0, R_kf, t_kf, self.rig.R_f_s[0], self.rig.t_f_s[0],
                uv_det, det_desc, v_det,
            )
            upd = hit_a & take  # only detections that claimed a slot
            upd_slot = jnp.where(upd, slot_of_det, L)
            window = window.replace(
                lmk=window.lmk.at[upd_slot].set(lmk_arch, mode="drop"),
                lmk_mask=window.lmk_mask.at[upd_slot].set(True, mode="drop"),
                lmk_flags=window.lmk_flags.at[upd_slot].set(
                    LMK_RESURRECTED, mode="drop"),
            )
            n_gm_res = jnp.sum(upd)
            # loop-closure material: EVERY confident 2D-3D re-association
            # (not only slot-claiming ones) packed as one host fetch --
            # [uv(2), archived lmk(3), src KF idx(1), hit(1)] per detection.
            # The pack-hit count rides the counts vector so the host can
            # gate the pack fetch without a blocking round trip per KF.
            gm_pack = jnp.concatenate([
                uv_det, lmk_arch, src_a[:, None].astype(jnp.float32),
                hit_a[:, None].astype(jnp.float32),
            ], axis=-1)
            n_gm_res = jnp.stack([n_gm_res, jnp.sum(hit_a)])

        # 2. stereo track cam0 -> cam1 (trackFeatures cam0->cam1)
        uv1, ok1, _ = klt.track(
            pyr_new[0], pyr_new[1], new_uv0, new_uv0, new_v0,
            levels=self.caps.pyr_levels, radius=self.caps.klt_radius,
            engine=self.klt_engine,
        )
        # epipolar gate between the two cameras (static extrinsics)
        R_01, t_01 = geo.pose_compose(
            *geo.pose_inverse(self.rig.R_f_s[0], self.rig.t_f_s[0]),
            self.rig.R_f_s[1], self.rig.t_f_s[1],
        )
        r0 = cam0.backproject(new_uv0)
        r1 = cam1.backproject(uv1)
        ok1 = epipolar.epipolar_filter(R_01, t_01, r0, r1, ok1)

        # 3. triangulate slots without a landmark yet
        R_w_s0, t_w_s0 = geo.pose_compose(R_kf, t_kf, self.rig.R_f_s[0], self.rig.t_f_s[0])
        R_w_s1, t_w_s1 = geo.pose_compose(R_kf, t_kf, self.rig.R_f_s[1], self.rig.t_f_s[1])
        rays_w = jnp.stack([
            jnp.einsum("ij,nj->ni", R_w_s0, r0),
            jnp.einsum("ij,nj->ni", R_w_s1, r1),
        ])
        origins = jnp.stack([t_w_s0, t_w_s1])
        valid2 = jnp.stack([new_v0, ok1 & new_v0])
        p_tri, tri_ok = triangulate.stereo_triangulate(origins, rays_w, valid2)
        need3d = new_v0 & ~window.lmk_mask
        add3d = need3d & tri_ok
        lmk = jnp.where(add3d[:, None], p_tri, window.lmk)
        lmk_mask = window.lmk_mask | add3d
        new_v0 = new_v0 & (window.lmk_mask | add3d)  # drop untriangulated fresh
        ok1 = ok1 & new_v0

        # 4. write window slot
        window = window.replace(
            R=window.R.at[slot].set(R_kf), t=window.t.at[slot].set(t_kf),
            v=window.v.at[slot].set(v_kf),
            ba=window.ba.at[slot].set(window.ba[jnp.maximum(slot - 1, 0)]),
            bg=window.bg.at[slot].set(window.bg[jnp.maximum(slot - 1, 0)]),
            kf_mask=window.kf_mask.at[slot].set(True),
            ts=window.ts.at[slot].set(ts),
            lmk=lmk, lmk_mask=lmk_mask,
        )
        obs = obs.replace(
            uv=obs.uv.at[slot, 0].set(new_uv0).at[slot, 1].set(uv1),
            mask=obs.mask.at[slot, 0].set(new_v0).at[slot, 1].set(ok1),
        )
        idx = jnp.maximum(slot - 1, 0)
        write = slot > 0
        # >1 s inter-KF gaps drop the IMU factor (AOptimizer.cpp:68-70: the
        # preintegrated noise over such a stretch is useless as a constraint;
        # the dt>1 s forced keyframe bounds FUTURE intervals, and like the
        # reference the overlong factor itself is skipped).  Host-computed
        # float64 gap verdict -- see the docstring for why.
        gap_ok = jnp.asarray(imu_gap_ok)
        imu_chain = imu_chain.replace(
            pre=jax.tree.map(
                lambda a, b: a.at[idx].set(jnp.where(write, b, a[idx])),
                imu_chain.pre, pre_cur,
            ),
            mask=imu_chain.mask.at[idx].set(
                jnp.where(write, (pre_cur.dt > 1e-6) & gap_ok,
                          imu_chain.mask[idx])
            ),
        )
        tracks = TrackState(
            uv=jnp.stack([new_uv0, uv1]),
            valid=jnp.stack([new_v0, ok1]),
            uv_kf=jnp.stack([new_uv0, uv1]),
            has3d=lmk_mask,
        )
        if self.cfg.global_map and lmk_desc is not None:
            # refresh slot descriptors at this KF (archived on marginalize)
            sm0 = detect.smooth3(img0)
            desc_new = detect.brief_describe(sm0, new_uv0)
            lmk_desc = jnp.where(new_v0[:, None], desc_new, lmk_desc)
            return (tracks, window, obs, imu_chain, lmk_desc, n_gm_res,
                    gm_pack, key_next)
        return tracks, window, obs, imu_chain, key_next

    @partial(jax.jit, static_argnames=("self",))
    def _backend(self, window, obs, imu_chain, priors, fixed_n, lines=None):
        """Window BA + outlier removal (backEndStep semantics).
        fixed_n is traced (its value flips 1->0 once priors exist).
        lines: optional LineBlock -- linexd observations as pose-constraining
        residuals (localMapBA parity); optimized endpoints come back in
        stats["line_ends"]."""
        fixed = jnp.arange(self.caps.K) < fixed_n
        problem = ba.BAProblem(
            window, obs, self.rig, imu_chain, priors, fixed,
            jnp.asarray(False), lines,
        )
        new_window, stats = ba.ba_solve(problem, self._ba_opts)
        # outlier removal (slamCore.cpp:42-83): mean reprojection error gate
        r, _, _, m, _ = ba._reproj_terms(new_window, obs, self.rig, self._ba_opts)
        rn = jnp.linalg.norm(r, axis=-1)
        bad_obs = m.astype(bool) & (rn > 3.0)
        obs = obs.replace(mask=obs.mask & ~bad_obs)
        n_obs = jnp.sum(obs.mask, axis=(0, 1))
        starved = new_window.lmk_mask & (n_obs < 2)
        new_window = new_window.replace(lmk_mask=new_window.lmk_mask & ~starved)
        if lines is not None:
            # line outlier removal under the same 3 px gate: drop segment
            # observations whose perpendicular error stays large at the
            # solution (wrong re-associations otherwise become wild
            # pose constraints at the next solve)
            from sadvio_tpu.frontend import lines as lines_mod

            ends_s = stats["line_ends"]

            def perp_cam(c):
                cam_c = _cam(self.rig, c)
                r_l, vis = lines_mod.line_reproj_residual(
                    cam_c, new_window.R[:, None], new_window.t[:, None],
                    self.rig.R_f_s[c], self.rig.t_f_s[c],
                    ends_s[None, :, 0], ends_s[None, :, 1], lines.obs[:, c],
                )
                return jnp.max(jnp.abs(r_l[..., :2]), axis=-1), vis

            perr = jnp.stack([perp_cam(c)[0] for c in range(2)], axis=1)
            stats["line_obs_mask"] = lines.obs_mask & ~(
                lines.mask[None, None, :] & (perr > 3.0))
        return new_window, obs, stats

    @partial(jax.jit, static_argnames=("self", "vio"))
    def _marg_roll(self, window, obs, imu_chain, priors, tracks, vio: bool,
                   gm=None, lmk_desc=None, arch_idx=None):
        """Marginalize slot 0, shift window left (backEndStep marg branch).
        With global_map, landmarks leaving the map are archived (position +
        BRIEF descriptor) for long-range resurrection (globalmap.cpp)."""
        if self.cfg.marginalization:
            new_priors, info = marg.marginalize(
                window, obs, self.rig, imu_chain, priors, self._ba_opts, vio=vio,
                sparsify=self.cfg.sparsification, f64=self.cfg.marg_f64,
            )
            marg_lmk = info["marg_lmk"]
            n_overflow = info["n_keep_overflow"]
            degen = info["degenerate"]
        else:
            new_priors = PriorSet.create(self.caps.K, self.caps.P)
            seen0 = jnp.any(obs.mask[0], axis=0)
            elsewhere = jnp.any(obs.mask[1:], axis=(0, 1))
            marg_lmk = window.lmk_mask & seen0 & ~elsewhere
            n_overflow = jnp.zeros((), jnp.int32)
            degen = jnp.zeros((), bool)
        new_priors = marg.shift_priors(new_priors)
        if self.cfg.global_map and gm is not None:
            from sadvio_tpu.data import globalmap as gmap

            gm = gmap.archive(gm, window.lmk, lmk_desc, marg_lmk,
                              src_idx=arch_idx)

        roll = lambda x: jnp.roll(x, -1, axis=0)
        window = window.replace(
            R=roll(window.R), t=roll(window.t), v=roll(window.v),
            ba=roll(window.ba), bg=roll(window.bg), ts=roll(window.ts),
            kf_mask=roll(window.kf_mask).at[-1].set(False),
            lmk_mask=window.lmk_mask & ~marg_lmk,
        )
        obs = obs.replace(
            uv=roll(obs.uv),
            mask=(roll(obs.mask) & ~marg_lmk[None, None, :]).at[-1].set(False),
        )
        imu_chain = imu_chain.replace(
            pre=jax.tree.map(roll, imu_chain.pre),
            mask=roll(imu_chain.mask).at[-1].set(False),
        )
        tracks = tracks.replace(
            valid=tracks.valid & ~marg_lmk[None, :],
            has3d=tracks.has3d & ~marg_lmk,
        )
        if self.cfg.global_map and gm is not None:
            return (window, obs, imu_chain, new_priors, tracks, gm,
                    n_overflow, degen)
        return window, obs, imu_chain, new_priors, tracks, n_overflow, degen

    # ------------------------------------------------------------------
    # host-side frame loop
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _predict_imu(self, pre, window, k_last):
        R_i = window.R[k_last]
        t_i = window.t[k_last]
        v_i = window.v[k_last]
        return imu_mod.predict(pre, R_i, t_i, v_i,
                               ba=window.ba[k_last], bg=window.bg[k_last])

    @partial(jax.jit, static_argnames=("self",))
    def _predict_cv(self, R_cur, t_cur, dR, dt_):
        return geo.pose_compose(R_cur, t_cur, dR, dt_)

    def _predict_pose(self, frame):
        """Motion prediction: IMU if VIO (IMU.cpp estimateTransform), else
        constant velocity (slamCore.cpp:432-466).  Both branches are jitted
        (eager Lie ops are one RPC each on a tunneled device), and the
        branch condition is the host-side sample counter, not a device
        fetch."""
        if self.vio and self._imu_n > 0:
            return self._predict_imu(self.pre_cur, self.window, self.n_kf - 1)
        dR, dt_ = self.dT
        R_p, t_p = self._predict_cv(self.R_cur, self.t_cur, dR, dt_)
        return R_p, t_p, self.v_cur

    _IMU_CAP = 32  # padded per-frame sample capacity (one compiled shape)

    @partial(jax.jit, static_argnames=("self",))
    def _preint(self, batch, pre):
        acc, gyr, dt = batch[:, 0:3], batch[:, 3:6], batch[:, 6]
        return imu_mod.preintegrate(
            acc, gyr, dt, pre.ba_lin, pre.bg_lin, self.imu_params, init=pre)

    def _pack_imu(self, frame):
        """Pack + upload a frame's IMU samples as _IMU_CAP-padded device
        batches (dt==0 rows are exact no-ops in the scan).  Called at
        prefetch time so the H2D transfer (a full RPC round trip on a
        tunneled device, ~30 ms measured) rides the tunnel during the
        previous frame's compute instead of blocking this frame."""
        n = len(frame.dt)
        if n == 0:
            return []
        cap = self._IMU_CAP
        out = []
        for k0 in range(0, n, cap):
            sl = slice(k0, min(k0 + cap, n))
            m = sl.stop - sl.start
            # one packed (cap,7) upload per batch instead of three transfers
            # (each host->device copy queues separately on the tunnel)
            batch = np.zeros((cap, 7), np.float32)
            batch[:m, 0:3] = frame.acc[sl]
            batch[:m, 3:6] = frame.gyr[sl]
            batch[:m, 6] = frame.dt[sl]
            out.append((jnp.asarray(batch), m))
        return out

    def _accumulate_imu(self, frame):
        """Jitted, fixed-shape preintegration of the frame's IMU batch.

        Eager preintegration dispatches ~15 small ops per sample; on a
        tunneled device that is one RPC each (~700 ms/frame measured).
        Uses the ts-keyed prefetched upload when process_frame enqueued one
        for this frame (run()'s pipeline), else packs + uploads now.
        """
        if self._imu_pref_ts == frame.ts:
            batches = self._imu_pref
        else:
            batches = self._pack_imu(frame)
        for batch, m in batches:
            self.pre_cur = self._preint(batch, self.pre_cur)
            self._imu_n += m

    def _csv_det(self, frame):
        """Load precomputed keypoints for this frame's timestamp (csv
        detector path); filenames are EuRoC-style nanosecond stamps.

        float64 seconds cannot round-trip EuRoC-magnitude ns stamps (ULP
        ~3e2 ns at 1.4e9 s), so the folder's stamps are indexed once and the
        nearest one within 1 ms is used instead of an exact reconstruction."""
        if not self._use_csv:
            return None
        import os

        from sadvio_tpu.frontend import csv_keypoints

        if not hasattr(self, "_csv_stamps"):
            stamps = []
            try:
                for fn in os.listdir(self._csv_folder):
                    if fn.endswith(".csv"):
                        try:
                            stamps.append(int(fn[:-4]))
                        except ValueError:
                            pass
            except OSError:
                pass
            self._csv_stamps = np.sort(np.asarray(stamps, np.int64))
        ts_ns = int(round(frame.ts * 1e9))
        if len(self._csv_stamps):
            i = int(np.searchsorted(self._csv_stamps, ts_ns))
            cands = [j for j in (i - 1, i) if 0 <= j < len(self._csv_stamps)]
            best = min(cands, key=lambda j: abs(int(self._csv_stamps[j]) - ts_ns))
            if abs(int(self._csv_stamps[best]) - ts_ns) < int(1e6):  # 1 ms
                ts_ns = int(self._csv_stamps[best])
        # desc_dim=0: the KLT tracker path needs positions only (descriptors
        # in the file, of any width, are ignored)
        uv, _, v = csv_keypoints.load_csv_keypoints(
            self._csv_folder, ts_ns, capacity=256, desc_dim=0)
        return (uv, v)

    def _ingest_health(self, ts, health_h):
        """Parse one frame's packed health fetch into the host mirrors:
        failure counter, trajectory/VIO-log rows, frame covariance.  Called
        with the CURRENT frame's health in blocking mode, or the PREVIOUS
        frame's in the async steady-state loop."""
        pnp_ok_h = bool(health_h[0] > 0.5)
        R_h = health_h[4:13].reshape(3, 3).copy()
        t_h = health_h[13:16].copy()
        self._cov_h = health_h[19:55].reshape(6, 6).copy()
        if not pnp_ok_h:
            self.successive_fails += 1
        else:
            self.successive_fails = 0
        self.traj.append((ts, R_h, t_h))
        if self.vio:
            v_h = health_h[16:19].copy()
            self.vio_log.append((ts, *t_h, *v_h, *self._ba_h, *self._bg_h))
        self._last_health = (ts, health_h, R_h, t_h)

    def _health_to_out(self, out):
        """Populate the per-frame out dict from the last ingested health
        (ONE place owns the packed-health -> out schema)."""
        ts_h, health_h, R_h, t_h = self._last_health
        out["pose"] = (R_h, t_h)
        out["pose_ts"] = ts_h  # == frame ts unless async-lagged by one
        out["pnp_ok"] = bool(health_h[0] > 0.5)
        out["n_tracked"] = int(health_h[2])
        out["n_lmk_tracked"] = int(health_h[3])
        out["parallax_deg"] = float(health_h[1])
        return ts_h, health_h, R_h, t_h

    def _flush_health(self):
        """Harvest a still-pending async health fetch (the final frame's
        trajectory/log rows) -- called at run end, before log writes, and
        before a reset wipes the estimator."""
        if getattr(self, "_health_pend", None) is not None:
            ts, h = self._health_pend
            self._health_pend = None
            self._ingest_health(ts, np.asarray(h))

    def _gravity_align_init(self, frame):
        """First-pose gravity alignment from averaged accelerometer samples
        (slamBiMonoVIO.cpp:24-47 Rodrigues alignment)."""
        if len(frame.acc) < 5:
            return jnp.eye(3)
        a = np.asarray(frame.acc).mean(0)
        a = a / np.linalg.norm(a)
        z = np.array([0.0, 0.0, 1.0])  # gravity up in world = -g direction
        v = np.cross(a, z)
        s = np.linalg.norm(v)
        c = float(np.dot(a, z))
        if s < 1e-8:
            return jnp.eye(3)
        w = v / s * np.arctan2(s, c)
        # R_w_f maps body accel direction onto +z
        return geo.so3_exp(jnp.asarray(w, jnp.float32)).T

    def process_frame(self, frame, images_dev=None, prefetch_frame=None) -> dict:
        """One camera frame (+ the IMU batch since the previous frame).

        images_dev: optional pre-uploaded device copy of frame.images.
        prefetch_frame: the NEXT frame; its image upload is enqueued right
        after this frame's small uploads, so the big transfer rides the
        tunnel during this frame's compute instead of ahead of the next
        frame's IMU batch.  The device copy is stored in self._prefetched."""
        # per-stage profiling (slamCore.cpp:468-507 running averages): only
        # active when run(profile=...) installed self._prof.  Stage tocs
        # BLOCK on the stage output, which serializes the async pipeline --
        # attribution mode, not the steady-state loop.
        prof = getattr(self, "_prof", None)
        if self.vio:
            if prof:
                prof.tic()
            self._accumulate_imu(frame)
            if prof:
                prof.toc("imu_preint", block=self.pre_cur.dp)
        if images_dev is None:
            images_dev = self._upload_images(frame)
        if prefetch_frame is not None:
            self._prefetched = self._upload_images(prefetch_frame)
            if self.vio:
                self._imu_pref = self._pack_imu(prefetch_frame)
                self._imu_pref_ts = prefetch_frame.ts
        else:
            self._prefetched = None
        if prof:
            prof.tic()
        pyr_new = self._pyramids(images_dev)
        if prof:
            prof.toc("pyramids", block=pyr_new[0][0])
        self._last_pyr = pyr_new  # device refs for subclass post-processing

        out = {"ts": frame.ts, "is_kf": False, "ok": True}
        if not self.initialized:
            R0 = self._gravity_align_init(frame) if self.vio else jnp.eye(3)
            t0 = jnp.zeros(3)
            # relocalization after a tracking failure (beyond reference:
            # the reference's reset restarts the gauge at the origin even
            # when the archived map could re-anchor it).  reset() keeps the
            # global map and the last pose estimate; if enough archived
            # landmarks re-associate around that pose, the bootstrap
            # keyframe continues the ORIGINAL gauge instead of re-zeroing.
            if (self.cfg.global_map and self.n_resets > 0
                    and self.global_map_state is not None):
                rl = self._try_relocalize(pyr_new[0][0])
                if rl is not None:
                    R0, t0 = rl
                    out["relocalized"] = True
            self.R_cur, self.t_cur = R0, t0
            ins = self._insert_kf(
                pyr_new, self.tracks, self.window, self.obs, self.imu,
                self.pre_cur, R0, t0, jnp.zeros(3),
                float(frame.ts), self.key, 0,
                ext_det=self._csv_det(frame),
                gm=self.global_map_state, lmk_desc=self.lmk_desc,
            )
            self.key = ins[-1]
            if self.global_map_state is not None:
                (self.tracks, self.window, self.obs, self.imu,
                 self.lmk_desc, gm_counts, gm_pack, _) = ins
                counts_h = np.asarray(gm_counts)
                out["gm_resurrected"] = int(counts_h[0])
                # the relocalized bootstrap KF is the strongest closure
                # opportunity of the whole recovery -- its detections were
                # just re-associated against the archive around the kept
                # pose, so emit the loop edge to the archived anchor now
                if (out.get("relocalized") and self.cfg.pose_graph
                        and self.archived_kf
                        and int(counts_h[1]) >= self.cfg.lc_min_hits):
                    lc = self._try_loop_closure(gm_pack, frame.ts, R0, t0)
                    if lc is not None:
                        out["loop_closure"] = lc
            else:
                self.tracks, self.window, self.obs, self.imu, _ = ins
            self.n_kf = 1
            self.pre_cur = self._pre_id
            self._imu_n = 0
            self.kf_pyr = pyr_new
            self.kf_tmpl = self._template_cache(pyr_new, self.tracks.uv_kf[0])
            self.initialized = True
            self.kf_ts.append(frame.ts)
            self.kf_cov.append(np.zeros((6, 6)))
            self.kf_traj.append((frame.ts, np.asarray(R0), np.asarray(t0)))
            self.traj.append((frame.ts, np.asarray(R0), np.asarray(t0)))
            out["is_kf"] = True
            if self._line_ch is not None:
                out.update(self._line_ch.on_keyframe_pre_ba(
                    pyr_new[0][0], pyr_new[1][0], R0, t0, 0))
            return out

        R_pred, t_pred, v_pred = self._predict_pose(frame)
        if prof:
            prof.tic()
        (self.tracks, R_new, t_new, health, dR_cv, dt_cv,
         key_next) = self._frontend(
            self.kf_pyr, pyr_new, self.tracks, self.window,
            R_pred, t_pred, self.key, kf_tmpl=self.kf_tmpl,
            eskf_on=bool(self.vi_initialized and self._imu_n > 0),
            pre_cov=self.pre_cur.cov if self.vio else None,
            v_pred=v_pred, R_cur=self.R_cur, t_cur=self.t_cur,
        )
        self.key = key_next
        # health fetch: the single mandatory device->host readback of the
        # frame loop.  In the steady state it is harvested ASYNCHRONOUSLY --
        # the D2H copy starts now and is consumed next frame, so no frame
        # pays a blocking RPC round trip (~29 ms on a tunneled chip).  The
        # KF vote then runs on frame k-1's health; the reference's FE/BE
        # thread split already tolerates one frame of lag
        # (slamCore.cpp:587-608), and the device pose is exact either way
        # because dead-reckoning happens inside the kernel (R_new falls
        # back to the prediction on PnP failure).  Profiling mode blocks
        # every frame (attribution, not the steady-state loop).
        use_async = self.cfg.async_health and prof is None
        if use_async:
            health.copy_to_host_async()
            pend = self._health_pend
            self._health_pend = (frame.ts, health)
            if pend is not None:
                self._ingest_health(pend[0], np.asarray(pend[1]))
            if self._health_stale or self._last_health is None:
                # no usable vote data: first tracked frame ever, or the
                # tracking template just changed at a keyframe (its
                # parallax was measured against the OLD template and would
                # immediately re-trigger the vote) -- block on this frame's
                # own health.  _health_pend is cleared because this frame's
                # row is ingested NOW (the next frame must not re-ingest
                # it); the next frame votes on _last_health (this frame's
                # values) without any blocking fetch -- the steady state.
                self._ingest_health(frame.ts, np.asarray(health))
                self._health_pend = None
                self._health_stale = False
        else:
            self._ingest_health(frame.ts, np.asarray(health))
            self._health_pend = None
        if prof:
            # the fused track+predict+filter+ESKF kernel; the health fetch
            # above already forced it
            prof.toc("track_predict_filter")
        # constant-velocity update (computed inside _frontend; device refs)
        self.dT = (dR_cv, dt_cv)
        self.R_cur, self.t_cur, self.v_cur = R_new, t_new, v_pred
        ts_h, health_h, R_h, t_h = self._health_to_out(out)
        pnp_ok_h = bool(health_h[0] > 0.5)

        # failure recovery (slamBiMonoVIO.cpp:545-553): checked at frame rate
        if self.successive_fails > 5:
            self.reset()
            return out

        # keyframe vote (shouldInsertKeyframe, slamCore.cpp:375-430)
        # forced KF when >1 s elapsed since the last KF, "to prevent the IMU
        # to drift" (slamBiMonoVIO.cpp:445-447): a feature-poor stretch must
        # not let the preintegration interval grow unbounded
        dt_kf = frame.ts - self.kf_ts[-1] if self.kf_ts else 0.0
        force_time = self.vio and dt_kf > 1.0
        # map bootstrap: the first min_kf_number keyframes are inserted
        # unconditionally ("keyframes added by default when the map starts",
        # localmap.cpp:6-7 / localmap.h:29)
        force_boot = self.n_kf < self.cfg.min_kf_number

        def kf_vote(pnp_ok_v, parallax_v, n_lmk_v):
            # PnP failure bypasses the min-parallax gate entirely (the
            # reference's dead-reckon + forced-KF path,
            # slamBiMonoVIO.cpp:429-443); landmark-starvation forcing keeps
            # the gate so a stationary starved camera does not insert
            # zero-baseline KFs at frame rate
            force_kf = (not pnp_ok_v) or n_lmk_v < self.cfg.min_lmk_number
            vote_kf = parallax_v > self.cfg.max_movement_parallax
            return (not pnp_ok_v) or force_time or force_boot or (
                (force_kf or vote_kf)
                and parallax_v >= self.cfg.min_movement_parallax)

        parallax_h = float(health_h[1])
        n_lmk_h = int(health_h[3])
        if ts_h != frame.ts:
            # async lag: the health is frame k-1's.  The stale vote is only
            # a CANDIDATE GATE -- parallax is extrapolated one step EAGERLY
            # (1.5x the last delta) so threshold crossings surface on time,
            # and any candidate is then CONFIRMED against this frame's own
            # health (blocking fetch at candidate rate only).  Keyframe
            # decisions therefore use fresh data exactly like blocking
            # mode, while steady-state tracking frames never block -- a
            # raw lag-1 vote measurably destabilized fast-rotation worlds
            # (KF bursts, cadence-shifted VIInit landing in the
            # gravity-tilt degeneracy valley).
            par_stale = parallax_h
            if self._par_prev is not None:
                parallax_h += 1.5 * max(parallax_h - self._par_prev, 0.0)
            self._par_prev = par_stale
            candidate = kf_vote(pnp_ok_h, parallax_h, n_lmk_h)
            if candidate:
                self._ingest_health(frame.ts, np.asarray(health))
                self._health_pend = None
                self._par_prev = None
                ts_h, health_h, R_h, t_h = self._health_to_out(out)
                pnp_ok_h = bool(health_h[0] > 0.5)
                parallax_h = float(health_h[1])
                n_lmk_h = int(health_h[3])
                is_kf = kf_vote(pnp_ok_h, parallax_h, n_lmk_h)
            else:
                is_kf = False
        else:
            self._par_prev = None
            is_kf = kf_vote(pnp_ok_h, parallax_h, n_lmk_h)
        if not is_kf:
            return out

        out["is_kf"] = True
        # the tracking template changes below: frame k's in-flight health
        # (measured against the OLD template) must not drive the next vote,
        # and the parallax series restarts
        self._health_stale = True
        self._par_prev = None
        did_marg = False
        K = self.caps.K
        if self.n_kf >= K:
            # archive the leaving KF (GlobalMap::addFrame role); optionally
            # condense its links to the next KF into an NFR pose-graph edge.
            # Timestamps come from the host-side mirror (a device ts fetch is
            # a full RPC round trip); pose + edge ride ONE packed fetch.
            if self.cfg.pose_graph:
                if prof:
                    prof.tic()
                pk0 = np.asarray(self._roll_pack(
                    self.window, self.obs, self.imu,
                    self.vio and self.vi_initialized))
                self.archived_kf.append(
                    (self.kf_ts[0], pk0[:9].reshape(3, 3), pk0[9:12].copy()))
                if pk0[54] > 0:  # shared-landmark count: edge informative
                    from sadvio_tpu.backend import posegraph as pg

                    # weight the edge by the endpoints' frame-rate ESKF
                    # covariance (the reference's _dT_cov role): a
                    # high-uncertainty keyframe yields a weaker edge
                    inf_np = pg.inflate_edge_info(
                        pk0[18:54].reshape(6, 6), self.kf_cov[0],
                        self.kf_cov[1])
                    self.pose_graph_edges.append((
                        self.kf_ts[0], self.kf_ts[1],
                        pk0[12:18].copy(), inf_np,
                    ))
                if prof:
                    prof.toc("nfr_edge")
            else:
                pk0 = np.asarray(self._pack_pose(
                    self.window.R[0], self.window.t[0]))
                self.archived_kf.append(
                    (self.kf_ts[0], pk0[:9].reshape(3, 3), pk0[9:]))
            if prof:
                prof.tic()
            mr = self._marg_roll(
                self.window, self.obs, self.imu, self.priors, self.tracks,
                self.vio and self.vi_initialized,
                gm=self.global_map_state, lmk_desc=self.lmk_desc,
                # the KF being rolled out was just appended to archived_kf
                arch_idx=len(self.archived_kf) - 1,
            )
            if self.global_map_state is not None:
                (self.window, self.obs, self.imu, self.priors, self.tracks,
                 self.global_map_state, n_ovf, degen) = mr
            else:
                (self.window, self.obs, self.imu, self.priors, self.tracks,
                 n_ovf, degen) = mr
            if prof:
                prof.toc("marginalization", block=self.window.R)
            # keep-set capacity overflow (landmarks demoted to lonely,
            # losing prior correlation): a busy scene must not degrade the
            # prior silently.  The count rides this keyframe's _pack_state
            # fetch -- surfaced unconditionally, no extra RPC.
            self._ovf_dev = n_ovf
            self._degen_dev = degen
            did_marg = True
            if self.cfg.marginalization:
                self._have_priors = True
            if self._line_ch is not None:
                self._line_ch.on_roll()  # slot-aligned line obs shift too
            self.kf_ts.pop(0)
            self.kf_cov.pop(0)
            self.n_kf = K - 1
            self._maybe_compact_archive()
        slot = self.n_kf
        if prof:
            prof.tic()
        # host-side float64 IMU gap verdict (see _insert_kf docstring)
        gap_ok = (not self.kf_ts) or (frame.ts - self.kf_ts[-1]) <= 1.0
        ins = self._insert_kf(
            pyr_new, self.tracks, self.window, self.obs, self.imu,
            self.pre_cur, R_new, t_new, v_pred, float(frame.ts),
            self.key, slot, ext_det=self._csv_det(frame),
            gm=self.global_map_state, lmk_desc=self.lmk_desc,
            imu_gap_ok=bool(gap_ok),
        )
        self.key = ins[-1]
        if self.global_map_state is not None:
            (self.tracks, self.window, self.obs, self.imu, self.lmk_desc,
             gm_counts, gm_pack, _) = ins
            # resurrection counts ride the post-BA _pack_state fetch; the
            # loop-closure gate is evaluated there (one RPC per KF less)
        else:
            self.tracks, self.window, self.obs, self.imu, _ = ins
            gm_counts = gm_pack = None
        self.n_kf += 1
        self.kf_ts.append(frame.ts)
        self.kf_cov.append(self._cov_h)
        self.kf_pyr = pyr_new
        self.kf_tmpl = self._template_cache(pyr_new, self.tracks.uv_kf[0])
        self.pre_cur = self._pre_id.replace(
            ba_lin=self.window.ba[slot], bg_lin=self.window.bg[slot]
        )
        self._imu_n = 0
        if prof:
            # detect + stereo track + triangulate + template cache
            prof.toc("detect_lmk_init", block=self.tracks.uv)

        # typed-channel pre-BA update: the linexd channel detects/associates
        # at the new KF and contributes its LineBlock to the window BA so
        # line observations constrain poses (localMapBA linexd residuals,
        # BundleAdjustmentCERESAnalytic.cpp:273-302)
        ba_lines = None
        if self._line_ch is not None:
            if prof:
                prof.tic()
            out.update(self._line_ch.on_keyframe_pre_ba(
                pyr_new[0][0], pyr_new[1][0], R_new, t_new, slot))
            ba_lines = self._line_ch.ba_block()
            if prof:
                prof.toc("line_channel", block=ba_lines.ends)

        # back end (KF rate).  _have_priors is the host mirror of
        # any(priors.sp_mask) -- checking the device mask here would cost a
        # blocking RPC round trip every keyframe
        fixed_n = 1 if not self._have_priors else 0
        fixed_n = max(fixed_n, self.cfg.fixed_frame_number if self.n_kf > 1 else 1)
        # vision-only bootstrap window BA until VIInit has run
        # (step_init, slamBiMonoVIO.cpp:122-317): the IMU factors are masked
        # out while velocities/biases are still at their zero defaults
        imu_for_ba = (self.imu if self.vi_initialized else
                      self.imu.replace(mask=jnp.zeros_like(self.imu.mask)))
        if prof:
            prof.tic()
        if self.backend_exec is not None:
            # full backend step (BA + outlier removal) on the executor
            # device; collect() returns async futures, so tracking on the
            # primary device overlaps the solve exactly like the reference's
            # back-end thread
            self.backend_exec.submit_fn(
                self._backend, self.window, self.obs, imu_for_ba,
                self.priors, fixed_n, ba_lines)
            self.window, self.obs, stats = self.backend_exec.collect(
                to_device=jax.devices()[0])
            # the stats dict stays on the executor device; the BA cost now
            # rides the KF state pack, so move just that scalar across
            stats = dict(stats)
            stats["cost"] = jax.device_put(stats["cost"], jax.devices()[0])
        else:
            self.window, self.obs, stats = self._backend(
                self.window, self.obs, imu_for_ba, self.priors, fixed_n,
                ba_lines,
            )
        if ba_lines is not None:
            self._line_ch.apply_ba(stats["line_ends"],
                                   stats.get("line_obs_mask"))
        if prof:
            prof.toc("window_opt", block=self.window.R)
        # sync current pose/velocity to the optimized keyframe
        self.R_cur = self.window.R[slot]
        self.t_cur = self.window.t[slot]
        self.v_cur = self.window.v[slot]
        self.tracks = self.tracks.replace(has3d=self.window.lmk_mask)
        if self.vio and not self.vi_initialized and self.n_kf >= self.vio_init_kfs:
            self._run_vi_init()
        pk = np.asarray(self._pack_state(self.window, slot, self._ovf_dev,
                                         self._degen_dev, stats["cost"],
                                         gm_counts))
        self.kf_traj.append((frame.ts, pk[:9].reshape(3, 3), pk[9:12]))
        self._ba_h = pk[15:18].copy()
        self._bg_h = pk[18:21].copy()
        # prior-degradation surface (keep-set overflow of this KF's marg; 0
        # when no marginalization ran)
        out["keep_overflow"] = int(pk[21])
        if prof and did_marg:
            prof.sums["keep_overflow_lmk"] += int(pk[21])
            prof.counts["keep_overflow_lmk"] += 1
        self._ovf_dev = jnp.zeros((), jnp.int32)
        # numerically-degenerate marginal detected this roll (OBSERVATIONAL
        # -- the square-root path keeps the marginal PSD so the factors
        # remain usable; the flag marks the regime where the f32 chain ran
        # on cancellation noise.  See marginalization.py's health metric.)
        out["marg_degenerate"] = bool(pk[22] > 0.5)
        self._degen_dev = jnp.zeros((), bool)
        out["ba_cost"] = float(pk[23])
        if gm_counts is not None:
            out["gm_resurrected"] = int(pk[24])
            # loop closure: a burst of descriptor resurrections is a revisit
            # signal -- solve PnP of this KF against the archived positions
            # and emit a pose-graph edge to the archiving keyframe, so
            # optimize_archive can actually close accumulated drift (the
            # natural consumer of the globalmap+posegraph pair; the
            # reference archives but never closes).  The pack-hit count
            # (riding this fetch) gates the blocking gm_pack fetch so
            # non-revisit keyframes never pay it; the PnP warm-starts at
            # the post-BA keyframe pose.
            if (self.cfg.pose_graph and self.archived_kf
                    and int(pk[25]) >= self.cfg.lc_min_hits):
                lc = self._try_loop_closure(
                    gm_pack, frame.ts, pk[:9].reshape(3, 3), pk[9:12])
                out["lc_diag"] = self._lc_diag
                if lc is not None:
                    out["loop_closure"] = lc
        out["vi_initialized"] = self.vi_initialized

        # densification at KF rate (mesher->addNewKF, slamBiMonoVIO.cpp:601-603;
        # the detached Mesher thread becomes an async per-KF update)
        if self.mesher is not None:
            if prof:
                prof.tic()
            imgs = jnp.stack([pyr_new[c][0] for c in range(2)])
            self.mesher.update(imgs, self.window, self.R_cur, self.t_cur)
            out["mesh_triangles"] = int(jnp.sum(self.mesher.tri_mask))
            if prof:
                prof.toc("mesh", block=self.mesher.tri_mask)
        img1 = pyr_new[1][0] if self.C > 1 else pyr_new[0][0]
        for ch in self.channels:
            if ch is self._line_ch:
                continue  # already updated pre-BA
            out.update(ch.on_keyframe(
                frame, pyr_new[0][0], img1, self.R_cur, self.t_cur))
        return out

    def _run_vi_init(self):
        """VI bootstrap solve over the current window (VIInit,
        AOptimizer.cpp:448-581; invoked after the vision-only bootstrap,
        slamBiMonoVIO.cpp:94-100 / slamMonoVIO with optim_scale).

        Solves gravity direction + per-KF velocities + one shared delta-bias
        (+ log-scale for monocular), rotates/rescales the whole window
        gravity-down, then runs a full VI window BA at the metric state
        (localMapVIOptimization)."""
        res = viinit.vi_init(
            self.window.R, self.window.t, self.window.kf_mask, self.imu,
            optimize_scale=self._vi_opt_scale, iters=20,
        )
        ok_pack = np.asarray(jnp.concatenate([
            jnp.reshape(res["converged"], (1,)).astype(jnp.float32),
            res["ba"]]))
        if not bool(ok_pack[0] > 0.5):
            return  # retried at the next keyframe
        if np.linalg.norm(ok_pack[1:4]) > 1.0:
            # accel-bias plausibility gate: |ba| ~ g*sin(tilt) -- a
            # several-m/s^2 "bias" means the solve sat down in the
            # gravity-tilt degeneracy valley (weak rotational excitation in
            # THIS window's interval structure; measured |ba|=2.7 = 16 deg
            # tilt on a lag-shifted keyframe cadence).  MEMS biases are
            # <0.5 m/s^2; reject and retry at the next keyframe, where the
            # longer baseline breaks the degeneracy.
            return
        self.window = viinit.apply_alignment(
            self.window, res["R_align"], res["scale"]
        )
        self.window = self.window.replace(
            v=res["v"],
            ba=jnp.broadcast_to(res["ba"], (self.caps.K, 3)),
            bg=jnp.broadcast_to(res["bg"], (self.caps.K, 3)),
        )
        R_align = res["R_align"]
        s = res["scale"]
        self.R_cur = R_align @ self.R_cur
        self.t_cur = s * (R_align @ self.t_cur)
        if self._have_priors:
            # VIInit converged only after the window rolled (weak excitation
            # retries): the marginalization priors were created in the
            # pre-alignment gauge and must move with the map, or the first
            # VI window BA is pulled back toward the old gauge
            self.priors = marg.gauge_transform_priors(self.priors, R_align, s)
        if self._line_ch is not None:
            self._line_ch.gauge_transform(R_align, s)
        self.vi_initialized = True
        # full VI window BA at the aligned, metric state
        self.window, self.obs, _ = self._backend(
            self.window, self.obs, self.imu, self.priors, 1
        )
        k = self.n_kf - 1
        self.R_cur = self.window.R[k]
        self.t_cur = self.window.t[k]
        self.v_cur = self.window.v[k]
        # the running preintegration was reset with the pre-init (zero)
        # biases; re-anchor its linearization point (no samples in it yet)
        self.pre_cur = self.pre_cur.replace(
            ba_lin=self.window.ba[k], bg_lin=self.window.bg[k]
        )

    @partial(jax.jit, static_argnames=("self",))
    def _reloc_probe(self, img0, gm, R_seed, t_seed):
        """Detect fresh features and re-associate them against the archive
        around the seed pose (wide search box: the pose drifted during the
        failure).  Returns (M,6) pack [uv(2), archived lmk(3), hit(1)].

        NOTE: intentionally parallels _insert_kf step 1c (detect -> smooth
        -> describe -> resurrect -> pack) but differs in occupancy input
        (no live tracks exist here), search box and pack layout (no src
        column) -- keep the two in sync when changing either."""
        from sadvio_tpu.data import globalmap as gmap

        cam0 = _cam0(self.rig)
        L = self.caps.L
        uv_det, s_det, v_det = detect.detect_features(
            img0, existing_uv=jnp.zeros((L, 2)),
            existing_valid=jnp.zeros((L,), bool),
            gh=8, gw=10, k_per_cell=max(1, self.cfg.features[0].n_per_cell),
        )
        sm0 = detect.smooth3(img0)
        det_desc = detect.brief_describe(sm0, uv_det)
        lmk_arch, hit, _src = gmap.resurrect(
            gm, cam0, R_seed, t_seed, self.rig.R_f_s[0], self.rig.t_f_s[0],
            uv_det, det_desc, v_det,
            search_px=self.cfg.reloc_search_px,
        )
        return jnp.concatenate([
            uv_det, lmk_arch, hit[:, None].astype(jnp.float32)], axis=-1)

    def _try_relocalize(self, img0):
        """Re-anchor the post-reset bootstrap pose against the archived map.

        Local relocalization: the last pose estimate (kept across reset())
        seeds both the archive projection search and the PnP warm start --
        the recovery scenario is tracking loss from occlusion/blur with the
        camera still near its last estimate, not the kidnapped-robot
        problem.  Returns (R0, t0) in the ORIGINAL gauge, or None."""
        pk = np.asarray(self._reloc_probe(
            img0, self.global_map_state, self.R_cur, self.t_cur))
        hit = pk[:, 5] > 0.5
        if hit.sum() < self.cfg.lc_min_hits:
            return None
        R_p, t_p, inl, ok, cov = pnp.pnp_ransac(
            _cam0(self.rig), self.rig.R_f_s[0], self.rig.t_f_s[0],
            jnp.asarray(pk[:, 2:5], jnp.float32),
            jnp.asarray(pk[:, 0:2], jnp.float32), jnp.asarray(hit),
            self.R_cur, self.t_cur, self._next_key(),
            min_inliers=self.cfg.lc_min_hits, inlier_px=3.0,
        )
        n_inl = int(jnp.sum(inl))
        if not bool(ok) or n_inl < max(self.cfg.lc_min_hits,
                                       int(self.cfg.reloc_consensus
                                           * hit.sum())):
            return None
        return jnp.asarray(np.asarray(R_p)), jnp.asarray(np.asarray(t_p))

    def _try_loop_closure(self, gm_pack, ts_cur, R_cur, t_cur):
        """Emit a loop-closure pose-graph edge from a resurrection burst.

        gm_pack (M,7): per-detection [uv, archived lmk, src KF idx, hit]
        from _insert_kf.  Solves PnP of the current keyframe against ALL
        re-associated archived landmark positions -- the archive shares one
        world gauge, so hits from several archived keyframes jointly
        constrain the revisit (each archiving KF only contributes a handful
        of landmarks; a per-source gate would never trigger).  The PnP-vs-
        archive pose IS the edge measurement: it expresses the current
        keyframe directly in the archive gauge, whereas the post-BA pose
        still carries the window's accumulated drift (measured on the
        excursion world: post-BA-measured edges correct 0.075->0.072,
        PnP-measured 0.075->0.054).  Closure accuracy is bounded by the
        resurrection search box (only archive matches whose projection
        error fits the box are candidates -- a selection bias toward the
        drifted pose).  The edge anchors at the DOMINANT source keyframe
        and is weighted by the PnP covariance inflated with the frame-rate
        ESKF covariance.  Returns (ts_archived, ts_cur) or None."""
        pk = np.asarray(gm_pack)
        hit = pk[:, 6] > 0.5
        src = pk[:, 5].astype(np.int64)
        cand = hit & (src >= 0) & (src < len(self.archived_kf))
        if cand.sum() < self.cfg.lc_min_hits:
            # refresh the diagnostic even on the early exit, or out["lc_diag"]
            # reports a stale tuple from an earlier keyframe's attempt
            self._lc_diag = (int(cand.sum()), 0, False)
            return None
        vals, counts = np.unique(src[cand], return_counts=True)
        dom = int(vals[np.argmax(counts)])
        mask = jnp.asarray(cand)
        # closures are rare (bursts) and their pose IS the edge measurement:
        # spend extra hypotheses + refinement relative to the frame-rate PnP
        R_p, t_p, inl, ok, cov = pnp.pnp_ransac(
            _cam0(self.rig), self.rig.R_f_s[0], self.rig.t_f_s[0],
            jnp.asarray(pk[:, 2:5], jnp.float32),
            jnp.asarray(pk[:, 0:2], jnp.float32), mask,
            jnp.asarray(np.asarray(R_cur), jnp.float32),
            jnp.asarray(np.asarray(t_cur), jnp.float32), self._next_key(),
            min_inliers=self.cfg.lc_min_hits, n_hyp=128, refine_iters=12,
        )
        n_inl = int(jnp.sum(inl))
        n_cand = int(cand.sum())
        self._lc_diag = (n_cand, n_inl, bool(ok))
        # descriptor re-association on weak texture admits false matches
        # inside the search box; a closure is only trusted when the PnP
        # consensus covers a solid majority of the candidates
        if not bool(ok) or n_inl < max(self.cfg.lc_min_hits,
                                       int(self.cfg.lc_consensus * n_cand)):
            return None
        from sadvio_tpu.backend import posegraph as pg

        ts_a, R_a, t_a = self.archived_kf[dom]
        R_p = np.asarray(R_p)
        t_p = np.asarray(t_p)
        # measured retraction a->current on the SO3xR3 chart
        # (factors.relative_pose_residual convention)
        R_rel = R_a.T @ R_p
        dx = np.concatenate([
            np.asarray(geo.so3_log(jnp.asarray(R_rel, jnp.float32))),
            R_a.T @ (t_p - t_a),
        ])
        # weight with the CURRENT frame's ESKF covariance (_cov_h): the edge
        # attaches to the keyframe being inserted now, whose covariance is
        # appended to kf_cov only after this call returns
        inf = pg.inflate_edge_info(
            np.linalg.inv(np.asarray(cov) + 1e-9 * np.eye(6)),
            np.asarray(self._cov_h),
            np.zeros((6, 6)),
        )
        self.pose_graph_edges.append((ts_a, ts_cur, dx, inf))
        return (float(ts_a), float(ts_cur))

    @partial(jax.jit, static_argnames=("self",))
    def _remap_src(self, src, remap):
        """Apply an archive-index remap to device provenance (gm.src)."""
        safe = jnp.clip(src, 0, remap.shape[0] - 1)
        return jnp.where(src >= 0, remap[safe], -1)

    def _maybe_compact_archive(self):
        """Bound host-side archive growth (the soak regime): when the
        archived node count exceeds archive_max_nodes, remove the oldest
        chain-interior nodes by NFR edge composition
        (posegraph.compact_archive) and remap the global map's
        archiving-KF provenance accordingly.  Loop-closure endpoints are
        never removed, so the cap is soft under many closures."""
        cap = self.cfg.archive_max_nodes
        if not cap or len(self.archived_kf) <= cap:
            return
        from sadvio_tpu.backend import posegraph as pg

        nodes, edges, remap = pg.compact_archive(
            self.archived_kf, self.pose_graph_edges, cap)
        if len(nodes) == len(self.archived_kf):
            return
        self.archived_kf = nodes
        self.pose_graph_edges = edges
        if self.global_map_state is not None:
            self.global_map_state = self.global_map_state._replace(
                src=self._remap_src(self.global_map_state.src,
                                    jnp.asarray(remap)))

    def optimize_archive(self, max_nodes=None):
        """Pose-graph optimization over the archived keyframes + the current
        window (consumes the NFR edges emitted by marginalizeRelative; the
        reference produces the factors but never ships their consumer --
        BundleAdjustmentCERESAnalytic.cpp:665-809).

        max_nodes (default archive_max_nodes): nodes older than the newest
        max_nodes are held fixed (anchors), windowing the correction;
        together with _maybe_compact_archive this keeps the solve bounded
        over arbitrarily long runs.

        Besides the persisted NFR + loop-closure edges, odometric
        continuity edges between consecutive LIVE-WINDOW nodes are
        synthesized from the current estimates at call time: without them a
        loop edge is the newest nodes' only constraint and teleports them to
        the raw (noisy) PnP pose; with them, multiple loop measurements fuse
        with odometry and average their errors down (measured on the
        excursion world: end-of-loop drift 0.080 -> 0.032 m).

        Returns the corrected trajectory [(ts, R, t)] over archive + window
        nodes; with no edges, returns the nodes unchanged."""
        nodes = list(self.archived_kf)
        win_poses = []
        for j, ts in enumerate(self.kf_ts):
            pk = np.asarray(self._pack_pose(self.window.R[j], self.window.t[j]))
            R_j, t_j = pk[:9].reshape(3, 3), pk[9:]
            nodes.append((ts, R_j, t_j))
            win_poses.append((ts, R_j, t_j))
        if len(nodes) < 2 or not self.pose_graph_edges:
            return nodes
        from sadvio_tpu.backend import posegraph as pg

        win_edges = []
        for j in range(len(win_poses) - 1):
            ts_a, R_a, t_a = win_poses[j]
            ts_b, R_b, t_b = win_poses[j + 1]
            dx_w = np.concatenate([
                np.asarray(geo.so3_log(jnp.asarray(R_a.T @ R_b, jnp.float32))),
                R_a.T @ (t_b - t_a),
            ])
            inf_w = pg.inflate_edge_info(
                np.eye(6) * 1e7, self.kf_cov[j], self.kf_cov[j + 1])
            win_edges.append((ts_a, ts_b, dx_w, inf_w))

        ts_list = [n[0] for n in nodes]
        ea, eb, dx, W, emask = pg.edges_from_archive(
            self.pose_graph_edges + win_edges, ts_list)
        if ea.shape[0] == 0:
            return nodes
        R = jnp.asarray(np.stack([n[1] for n in nodes]))
        t = jnp.asarray(np.stack([np.asarray(n[2]) for n in nodes]))
        cap = (self.cfg.archive_max_nodes if max_nodes is None else max_nodes)
        mask_np = np.ones((len(nodes),), bool)
        if cap and len(nodes) > cap:
            mask_np[: len(nodes) - cap] = False  # old nodes: fixed anchors
        node_mask = jnp.asarray(mask_np)
        Rn, tn, _ = pg.optimize_pose_graph(R, t, node_mask, ea, eb, dx, W,
                                           emask)
        Rn, tn = np.asarray(Rn), np.asarray(tn)
        return [(ts_list[i], Rn[i], tn[i]) for i in range(len(nodes))]

    def reset(self):
        # complete the trajectory log before wiping (a pending async health
        # fetch still holds the final pre-reset frame's row)
        self._flush_health()
        # push the live local map into the global archive before wiping:
        # the freshest good landmarks are exactly what a post-failure
        # relocalization needs (globalmap addFrame role at failure time).
        # The window keyframes join the archived trajectory so the pose
        # graph keeps their nodes, and the archived landmarks anchor at the
        # last of them for loop-closure provenance.
        if (self.cfg.global_map and self.global_map_state is not None
                and self.n_kf > 0):
            from sadvio_tpu.backend import posegraph as pg
            from sadvio_tpu.data import globalmap as gmap

            poses = []
            for j, ts in enumerate(self.kf_ts):
                pk = np.asarray(
                    self._pack_pose(self.window.R[j], self.window.t[j]))
                R_j, t_j = pk[:9].reshape(3, 3), pk[9:]
                self.archived_kf.append((ts, R_j, t_j))
                poses.append((ts, R_j, t_j))
            # odometric edges among the newly archived nodes: NFR edges are
            # only emitted at roll time, so without these the reset-archived
            # chain (including the landmark anchor below) would float free
            # and a later loop closure to it would correct nothing
            if self.cfg.pose_graph:
                for j in range(len(poses) - 1):
                    ts_a, R_a, t_a = poses[j]
                    ts_b, R_b, t_b = poses[j + 1]
                    dx_w = np.concatenate([
                        np.asarray(geo.so3_log(
                            jnp.asarray(R_a.T @ R_b, jnp.float32))),
                        R_a.T @ (t_b - t_a),
                    ])
                    inf_w = pg.inflate_edge_info(
                        np.eye(6) * 1e7, self.kf_cov[j], self.kf_cov[j + 1])
                    self.pose_graph_edges.append((ts_a, ts_b, dx_w, inf_w))
            self.global_map_state = gmap.archive(
                self.global_map_state, self.window.lmk, self.lmk_desc,
                self.window.lmk_mask,
                src_idx=jnp.int32(len(self.archived_kf) - 1))
            self._maybe_compact_archive()
        K, L, P = self.caps.K, self.caps.L, self.caps.P
        C = self.rig.C
        self.window = WindowState.create(K, L)
        self.obs = Observations.create(K, C, L)
        self.priors = PriorSet.create(K, P)
        self.imu = ImuChain.create(K)
        self.tracks = TrackState(
            uv=jnp.zeros((C, L, 2)), valid=jnp.zeros((C, L), bool),
            uv_kf=jnp.zeros((C, L, 2)), has3d=jnp.zeros((L,), bool),
        )
        self.pre_cur = self._pre_id
        self._imu_n = 0
        self.n_kf = 0
        self.kf_ts = []
        self.kf_cov = []
        self._cov_h = np.zeros((6, 6))
        self._have_priors = False
        self._ovf_dev = jnp.zeros((), jnp.int32)
        self._degen_dev = jnp.zeros((), bool)
        self._health_pend = None
        self._health_stale = False
        self._last_health = None  # pre-reset health must not drive votes
        self._par_prev = None
        self.initialized = False
        self.vi_initialized = not self.vio
        self._ba_h = np.zeros(3)
        self._bg_h = np.zeros(3)
        self.successive_fails = 0
        self.n_resets += 1
        if self._line_ch is not None:
            self._line_ch.clear()

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def run(self, frames, log_dir=None, profile=False):
        """Process a frame list; returns trajectory array (T,3).

        log_dir: write results.csv (KF trajectory, slamCore.cpp:509-519
        layout), vio_poses.csv (frame-rate state, slamBiMonoVIO.cpp:616-642)
        and slam_profiler.txt (stage averages, slamCore.cpp:554-584).
        """
        prof = None
        if profile or log_dir:
            from sadvio_tpu.utils.profiler import Profiler

            prof = Profiler()
            self._prof = prof
        import time as _time

        # prefetch pipeline: the next frame's image upload rides the tunnel
        # while the current frame computes (device_put is async); the enqueue
        # happens inside process_frame AFTER its small IMU upload so the big
        # transfer never queues ahead of the next frame's critical path
        pending = self._upload_images(frames[0]) if frames else None
        for i, f in enumerate(frames):
            if prof:
                t0 = _time.perf_counter()
            nxt_f = frames[i + 1] if i + 1 < len(frames) else None
            out = self.process_frame(f, images_dev=pending, prefetch_frame=nxt_f)
            pending = self._prefetched
            if prof:
                jax.block_until_ready(self.t_cur)
                dt = _time.perf_counter() - t0
                prof.sums["frame_total"] += dt
                prof.counts["frame_total"] += 1
                name = "kf_step" if out.get("is_kf") else "track_step"
                prof.sums[name] += dt
                prof.counts[name] += 1
        self._flush_health()
        if log_dir:
            self.write_logs(log_dir, n_frames=len(frames))
        return np.asarray([t for _, _, t in self.traj])

    def write_logs(self, log_dir, n_frames=None):
        """Write the log_slam/ output set (results.csv KF trajectory,
        slamCore.cpp:509-519 layout; vio_poses.csv frame-rate state,
        slamBiMonoVIO.cpp:616-642; slam_profiler.txt when profiling;
        results_posegraph.csv when pose_graph).  Explicit flush entry --
        callable from any driver loop, not just run()."""
        import os

        self._flush_health()

        from sadvio_tpu.pipeline.euroc import write_results_csv, write_vio_csv

        os.makedirs(log_dir, exist_ok=True)
        write_results_csv(os.path.join(log_dir, "results.csv"), self.kf_traj)
        if self.cfg.pose_graph:
            # end-of-run pose-graph correction over the archive
            write_results_csv(
                os.path.join(log_dir, "results_posegraph.csv"),
                self.optimize_archive())
        # frame-rate VIO state (pose, velocity, biases) when available,
        # else position-only rows
        rows = self.vio_log if self.vio_log else [
            (ts, *np.asarray(t).tolist()) for ts, _, t in self.traj
        ]
        write_vio_csv(os.path.join(log_dir, "vio_poses.csv"), rows)
        prof = getattr(self, "_prof", None)
        if prof is not None:
            prof.dump_slam(
                os.path.join(log_dir, "slam_profiler.txt"),
                n_frames=n_frames if n_frames is not None else len(self.traj),
                n_keyframes=len(self.kf_traj),
                pose_estimator=self.cfg.pose_estimator,
                mesh_on=self.mesher is not None,
            )

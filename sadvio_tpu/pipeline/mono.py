"""Monocular VO / VIO pipeline modes.

TPU-native re-design of the reference mono modes
(reference: cpp/src/slamMono.cpp -- essential-matrix init with arbitrary
0.1 m scale, parallax-gated:28-86; cpp/src/slamMonoVIO.cpp -- same but scale
recovered by VIInit(optim_scale=true)).

Shares the batched frontend/backend kernels of StereoSLAM; what changes:
* bootstrap: two-view essential RANSAC between KF0 and the first frame with
  enough parallax, translation normalized to 0.1 m (slamMono.cpp:60-78),
  landmarks from two-view midpoint triangulation;
* keyframe insertion: no stereo pair -- fresh detections stay 2D until a
  later keyframe provides baseline, then they are triangulated from their
  window observations (ALandmarkInitializer::initFromFeatures semantics,
  alandmarkinitializer.cpp:56-129);
* monovio: after `vio_init_kfs` keyframes, VIInit solves gravity/velocity/
  bias/scale and rescales the map (slamMonoVIO.cpp + AOptimizer VIInit).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sadvio_tpu.data.window import LMK_RESURRECTED, ImuChain, Observations, PriorSet
from sadvio_tpu.frontend import detect, epipolar, klt, triangulate
from sadvio_tpu.models import cameras, imu as imu_mod
from sadvio_tpu.pipeline.slam import StereoSLAM, TrackState, _cam0
from sadvio_tpu.utils import geometry as geo

BOOTSTRAP_SCALE = 0.1  # slamMono.cpp arbitrary metric scale


class MonoSLAM(StereoSLAM):
    """Monocular VO ("mono") / monocular VIO ("monovio")."""

    def __init__(self, rig, config, imu_params=None, seed=0,
                 boot_parallax_deg: float = 1.0, vio_init_kfs: int = 6):
        super().__init__(rig, config, imu_params=imu_params, seed=seed)
        self.boot_parallax_deg = boot_parallax_deg
        self.vio_init_kfs = vio_init_kfs
        self._vi_opt_scale = True  # monocular: VIInit(optim_scale=true)
        self._cam0_slot_limit = self.caps.L  # nofov restricts to L/2
        # the descriptor global map is a stereo-pipeline feature (mono's
        # _insert_kf has no gm path); disable rather than crash on unpack
        self.global_map_state = None
        self.lmk_desc = None
        self._boot = None  # (pyr0, tracks uv at KF0)

    # ------------------------------------------------------------------
    # bootstrap: detect at frame0, track until parallax, essential init
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _boot_detect(self, pyr):
        L = self.caps.L
        uv, s, v = detect.detect_features(
            pyr[0][0],
            existing_uv=jnp.zeros((L, 2)), existing_valid=jnp.zeros((L,), bool),
            gh=8, gw=10, k_per_cell=max(1, self.cfg.features[0].n_per_cell),
        )
        # compact valid detections to the front: essential_ransac samples
        # slot indices uniformly, so scattered validity starves its 8-point
        # hypotheses (worst in nofov, where cam0 owns only L/2 slots)
        order = jnp.argsort(~v, stable=True)
        uv = uv[order]
        v = v[order]
        n = min(uv.shape[0], L)
        uv0 = jnp.zeros((L, 2)).at[:n].set(uv[:n])
        v0 = jnp.zeros((L,), bool).at[:n].set(v[:n])
        v0 = v0 & (jnp.arange(L) < self._cam0_slot_limit)
        return uv0, v0

    @partial(jax.jit, static_argnames=("self",))
    def _boot_track(self, pyr0, pyr_new, uv0, uv_prev, valid, key):
        cam0 = _cam0(self.rig)
        uv1, ok, _ = klt.track(
            pyr0[0], pyr_new[0], uv0, uv_prev, valid,
            levels=self.caps.pyr_levels, radius=self.caps.klt_radius,
            engine=self.klt_engine,
        )
        r0 = cam0.backproject(uv0)
        r1 = cam0.backproject(uv1)
        R_ab, t_ab, inl, ess_ok = epipolar.essential_ransac(r0, r1, ok, key)
        # parallax must be *rotation-compensated* (angle between r0 and
        # R_ab r1): raw flow is dominated by rotation, which carries zero
        # triangulation baseline -- gating on it bootstraps with useless
        # near-parallel rays (det(A) = 2 sin^2(angle) ~ 0)
        r1_w = jnp.einsum("ij,nj->ni", R_ab, r1)
        cr = jnp.cross(r0, r1_w)
        par = jnp.rad2deg(jnp.arctan2(
            jnp.linalg.norm(cr, axis=-1), jnp.sum(r0 * r1_w, -1)
        ))
        n = jnp.maximum(jnp.sum(ok & inl), 1)
        parallax = jnp.sum(jnp.where(ok & inl, par, 0.0)) / n
        parallax = jnp.where(ess_ok, parallax, 0.0)
        return uv1, ok, parallax, R_ab, t_ab, inl, ess_ok

    def _try_bootstrap(self, frame, pyr_new):
        if self._boot is None:
            uv0, v0 = self._boot_detect(pyr_new)
            self._boot = {
                "pyr0": pyr_new, "uv0": uv0, "uv": uv0, "valid": v0,
                "ts0": frame.ts,
            }
            return False
        b = self._boot
        uv1, ok, parallax, R_ab, t_ab, inl, ess_ok = self._boot_track(
            b["pyr0"], pyr_new, b["uv0"], b["uv"], b["valid"], self._next_key()
        )
        b["uv"], b["valid"] = uv1, ok
        if float(parallax) < self.boot_parallax_deg or not bool(ess_ok):
            return False

        # T_ab: pose of current camera in KF0 camera frame, |t| = 1.
        # world := KF0 body frame; fix scale at BOOTSTRAP_SCALE.
        cam0 = _cam0(self.rig)
        R_ws0, t_ws0 = geo.pose_compose(
            jnp.eye(3), jnp.zeros(3), self.rig.R_f_s[0], self.rig.t_f_s[0]
        )
        t_ab = t_ab * BOOTSTRAP_SCALE
        R_ws1, t_ws1 = geo.pose_compose(R_ws0, t_ws0, R_ab, t_ab)
        # body pose of frame 1: T_w_f1 = T_w_s1 * T_f_s^-1
        Rs_inv, ts_inv = geo.pose_inverse(self.rig.R_f_s[0], self.rig.t_f_s[0])
        R1, t1 = geo.pose_compose(R_ws1, t_ws1, Rs_inv, ts_inv)

        # two-view triangulation of surviving tracks
        rays0_c = cam0.backproject(b["uv0"])
        rays1_c = cam0.backproject(uv1)
        rays_w = jnp.stack([
            jnp.einsum("ij,nj->ni", R_ws0, rays0_c),
            jnp.einsum("ij,nj->ni", R_ws1, rays1_c),
        ])
        origins = jnp.stack([t_ws0, t_ws1])
        val2 = jnp.stack([inl, inl])
        # det_eps 1e-6 ~ 0.04 deg minimum ray angle: the bootstrap baseline
        # is small by construction, the window BA refines depths right after
        p_tri, tri_ok = triangulate.stereo_triangulate(
            origins, rays_w, val2, det_eps=1e-6, max_depth=100.0
        )
        good = inl & tri_ok

        K, L = self.caps.K, self.caps.L
        self.window = self.window.replace(
            R=self.window.R.at[0].set(jnp.eye(3)).at[1].set(R1),
            t=self.window.t.at[0].set(jnp.zeros(3)).at[1].set(t1),
            kf_mask=self.window.kf_mask.at[0].set(True).at[1].set(True),
            ts=self.window.ts.at[0].set(jnp.float32(b["ts0"])).at[1].set(
                jnp.float32(frame.ts)
            ),
            lmk=jnp.where(good[:, None], p_tri, 0.0),
            lmk_mask=good,
        )
        self.obs = self.obs.replace(
            uv=self.obs.uv.at[0, 0].set(b["uv0"]).at[1, 0].set(uv1),
            mask=self.obs.mask.at[0, 0].set(good).at[1, 0].set(good),
        )
        if self.vio:
            self.imu = self.imu.replace(
                pre=jax.tree.map(
                    lambda a, x: a.at[0].set(x), self.imu.pre, self.pre_cur
                ),
                mask=self.imu.mask.at[0].set(self.pre_cur.dt > 1e-6),
            )
        self.tracks = TrackState(
            uv=uv1[None], valid=good[None], uv_kf=uv1[None], has3d=good,
        )
        self.pre_cur = self._pre_id
        self.kf_pyr = pyr_new
        self.n_kf = 2
        self.R_cur, self.t_cur = R1, t1
        self.initialized = True
        self.kf_ts = [b["ts0"], frame.ts]
        self.kf_traj.append((b["ts0"], np.eye(3), np.zeros(3)))
        self.kf_traj.append((frame.ts, np.asarray(R1), np.asarray(t1)))
        # window BA to polish the two-view map
        self.window, self.obs, _ = self._backend(
            self.window, self.obs, self.imu, self.priors, 1
        )
        self._boot = None
        return True

    # ------------------------------------------------------------------
    # keyframe insertion: detect only; triangulate from window observations
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _insert_kf(self, pyr_new, tracks, window, obs, imu_chain, pre_cur,
                   R_kf, t_kf, v_kf, ts, key, slot, ext_det=None,
                   gm=None, lmk_desc=None, imu_gap_ok=True):
        # ext_det (csv) and gm/lmk_desc (descriptor global map) are
        # stereo-pipeline features; accepted but unused here
        cam0 = _cam0(self.rig)
        key, key_next = jax.random.split(key)
        L = self.caps.L
        img0 = pyr_new[0][0]

        uv_det, s_det, v_det = detect.detect_features(
            img0, existing_uv=tracks.uv[0], existing_valid=tracks.valid[0],
            gh=8, gw=10, k_per_cell=max(1, self.cfg.features[0].n_per_cell),
        )
        # landmark resurrection (recoverFeatureFromMapLandmarks
        # slamCore.cpp:253; same scheme as StereoSLAM._insert_kf)
        dead = window.lmk_mask & ~tracks.valid[0]
        uv_prj, vis_p = cameras.project_world(
            cam0, R_kf, t_kf, self.rig.R_f_s[0], self.rig.t_f_s[0], window.lmk
        )
        M = uv_det.shape[0]
        d2 = jnp.sum((uv_prj[:, None] - uv_det[None, :]) ** 2, -1)
        gate = (dead & vis_p)[:, None] & v_det[None, :] & (d2 < 25.0)
        d2g = jnp.where(gate, d2, jnp.inf)
        bestd = jnp.argmin(d2g, axis=1)
        bestl = jnp.argmin(d2g, axis=0)
        hit = (jnp.min(d2g, axis=1) < jnp.inf) & (bestl[bestd] == jnp.arange(L))
        uv0_base = jnp.where(hit[:, None], uv_det[bestd], tracks.uv[0])
        v0_base = tracks.valid[0] | hit
        v_det = v_det & ~jnp.zeros_like(v_det).at[
            jnp.where(hit, bestd, M)
        ].set(True, mode="drop")
        window = window.replace(
            lmk_flags=jnp.where(hit, window.lmk_flags | LMK_RESURRECTED,
                                window.lmk_flags)
        )

        # cam0 claims only its slot range (nofov splits the pool:
        # [0, L/2) cam0, [L/2, L) cam1; plain mono uses the whole pool)
        free = ~(v0_base | window.lmk_mask) \
            & (jnp.arange(L) < self._cam0_slot_limit)
        det_rank = jnp.cumsum(v_det) - 1
        n_free = jnp.sum(free)
        free_slots = jnp.nonzero(free, size=L, fill_value=L - 1)[0]
        take = v_det & (det_rank < n_free)
        slot_of_det = jnp.where(take, free_slots[jnp.clip(det_rank, 0, L - 1)], L)
        new_uv0 = uv0_base.at[slot_of_det].set(uv_det, mode="drop")
        new_v0 = v0_base.at[slot_of_det].set(True, mode="drop")
        # a claimed slot is a NEW landmark identity: clear stale observation
        # rows left by the slot's previous occupant
        claimed = jnp.zeros((L,), bool).at[slot_of_det].set(take, mode="drop")
        obs = obs.replace(mask=obs.mask & ~claimed[None, None, :])

        # write window slot + mono observation row
        window = window.replace(
            R=window.R.at[slot].set(R_kf), t=window.t.at[slot].set(t_kf),
            v=window.v.at[slot].set(v_kf),
            ba=window.ba.at[slot].set(window.ba[jnp.maximum(slot - 1, 0)]),
            bg=window.bg.at[slot].set(window.bg[jnp.maximum(slot - 1, 0)]),
            kf_mask=window.kf_mask.at[slot].set(True),
            ts=window.ts.at[slot].set(ts),
        )
        obs = obs.replace(
            uv=obs.uv.at[slot, 0].set(new_uv0),
            mask=obs.mask.at[slot, 0].set(new_v0),
        )
        idx = jnp.maximum(slot - 1, 0)
        write = slot > 0
        imu_chain = imu_chain.replace(
            pre=jax.tree.map(
                lambda a, b: a.at[idx].set(jnp.where(write, b, a[idx])),
                imu_chain.pre, pre_cur,
            ),
            mask=imu_chain.mask.at[idx].set(
                jnp.where(write,
                          (pre_cur.dt > 1e-6) & jnp.asarray(imu_gap_ok),
                          imu_chain.mask[idx])
            ),
        )

        # triangulate slots with >=2 window observations and no landmark yet
        # (initFromFeatures: use every observation in the window)
        K = self.caps.K
        R_ws = jnp.zeros((K, 3, 3))
        t_ws = jnp.zeros((K, 3))
        for k in range(K):
            Rk, tk = geo.pose_compose(
                window.R[k], window.t[k], self.rig.R_f_s[0], self.rig.t_f_s[0]
            )
            R_ws = R_ws.at[k].set(Rk)
            t_ws = t_ws.at[k].set(tk)
        rays_c = cam0.backproject(obs.uv[:, 0])  # (K,L,3)
        rays_w = jnp.einsum("kij,klj->kli", R_ws, rays_c)
        origins = jnp.broadcast_to(t_ws[:, None, :], rays_w.shape)
        m_obs = obs.mask[:, 0] & window.kf_mask[:, None]
        p_tri, tri_ok = triangulate.midpoint_triangulate(
            jnp.moveaxis(origins, 0, -2), jnp.moveaxis(rays_w, 0, -2),
            jnp.moveaxis(m_obs, 0, -1), det_eps=1e-5,
        )
        need3d = ~window.lmk_mask & (jnp.sum(m_obs, axis=0) >= 2)
        add3d = need3d & tri_ok
        window = window.replace(
            lmk=jnp.where(add3d[:, None], p_tri, window.lmk),
            lmk_mask=window.lmk_mask | add3d,
        )

        tracks = TrackState(
            uv=new_uv0[None], valid=new_v0[None], uv_kf=new_uv0[None],
            has3d=window.lmk_mask,
        )
        return tracks, window, obs, imu_chain, key_next

    # ------------------------------------------------------------------
    # frame loop: mono bootstrap + optional VIInit
    # ------------------------------------------------------------------

    def process_frame(self, frame, images_dev=None, prefetch_frame=None) -> dict:
        if not self.initialized:
            # bootstrap branch handles its own IMU accumulation; once
            # initialized, super().process_frame accumulates (accumulating in
            # both would preintegrate every sample twice)
            if self.vio:
                self._accumulate_imu(frame)
            out = {"ts": frame.ts, "is_kf": False, "ok": True}
            if images_dev is None:
                images_dev = self._upload_images(frame)
            if prefetch_frame is not None:
                self._prefetched = self._upload_images(prefetch_frame)
                if self.vio:
                    self._imu_pref = self._pack_imu(prefetch_frame)
                    self._imu_pref_ts = prefetch_frame.ts
            else:
                self._prefetched = None
            pyr_new = self._pyramids(images_dev)
            self._last_pyr = pyr_new
            out["is_kf"] = self._try_bootstrap(frame, pyr_new)
            pk = np.asarray(self._pack_pose(self.R_cur, self.t_cur))
            self.traj.append((frame.ts, pk[:9].reshape(3, 3), pk[9:]))
            return out
        # VIInit trigger + vision-only bootstrap BA live in the base class
        # (shared with the stereo-VIO flagship)
        return super().process_frame(frame, images_dev=images_dev,
                                     prefetch_frame=prefetch_frame)

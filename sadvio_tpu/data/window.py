"""Sliding-window state as fixed-shape masked pytrees.

TPU-native replacement for the reference's pointer graph of
Frame/Feature/Landmark shared_ptrs with per-object mutexes
(reference: cpp/include/isaeslam/data/frame.h, data/landmarks/ALandmark.h,
data/maps/localmap.h).  Identity = slot index; lifecycle flags = bitmask
arrays; "the sliding window" = leading axis of every array.

Capacities are static (compile-time): K keyframe slots, C cameras, L landmark
slots, P prior-retained landmark slots, N IMU samples per KF interval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from sadvio_tpu.models.imu import Preintegration
from sadvio_tpu.utils import geometry as geo

# landmark lifecycle bitfield (replaces ALandmark flags, ALandmark.h:118-124)
LMK_INITIALIZED = 1
LMK_IN_MAP = 2
LMK_OUTLIER = 4
LMK_MARGINALIZED = 8
LMK_RESURRECTED = 16
LMK_HAS_PRIOR = 32


@struct.dataclass
class WindowState:
    """Estimator state over the sliding window.

    Poses are world-from-body T_w_f (see utils.geometry conventions).
    """

    R: jnp.ndarray  # (K,3,3)
    t: jnp.ndarray  # (K,3)
    v: jnp.ndarray  # (K,3) velocity (world)
    ba: jnp.ndarray  # (K,3) accel bias
    bg: jnp.ndarray  # (K,3) gyro bias
    kf_mask: jnp.ndarray  # (K,) bool active keyframe slots
    ts: jnp.ndarray  # (K,) float64-as-float32 keyframe timestamps (s)
    lmk: jnp.ndarray  # (L,3) landmark positions (world)
    lmk_mask: jnp.ndarray  # (L,) bool active landmarks
    lmk_flags: jnp.ndarray  # (L,) int32 lifecycle bitfield

    @classmethod
    def create(cls, K: int, L: int, dtype=jnp.float32):
        return cls(
            R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (K, 3, 3)),
            t=jnp.zeros((K, 3), dtype),
            v=jnp.zeros((K, 3), dtype),
            ba=jnp.zeros((K, 3), dtype),
            bg=jnp.zeros((K, 3), dtype),
            kf_mask=jnp.zeros((K,), bool),
            ts=jnp.zeros((K,), dtype),
            lmk=jnp.zeros((L, 3), dtype),
            lmk_mask=jnp.zeros((L,), bool),
            lmk_flags=jnp.zeros((L,), jnp.int32),
        )

    @property
    def K(self):
        return self.R.shape[0]

    @property
    def L(self):
        return self.lmk.shape[0]


@struct.dataclass
class Observations:
    """Dense observation table: landmark l seen by camera c at keyframe k."""

    uv: jnp.ndarray  # (K,C,L,2) pixel measurements
    mask: jnp.ndarray  # (K,C,L) bool

    @classmethod
    def create(cls, K: int, C: int, L: int, dtype=jnp.float32):
        return cls(uv=jnp.zeros((K, C, L, 2), dtype), mask=jnp.zeros((K, C, L), bool))


@struct.dataclass
class LineBlock:
    """Line landmarks + their per-keyframe segment observations for the
    window BA.

    The reference adds 4-dim linexd reprojection residuals over
    (pose, line endpoints) to localMapBA
    (BundleAdjustmentCERESAnalytic.h:104-195, used at .cpp:273-302), so line
    observations constrain *poses*.  Here each line is a 6-dof landmark
    block (two world endpoints) appended to the BA dense system; obs rows
    are aligned to window KF slots and roll with the window.
    """

    ends: jnp.ndarray  # (M,2,3) world endpoints
    mask: jnp.ndarray  # (M,) bool live line landmarks
    obs: jnp.ndarray  # (K,C,M,2,2) observed 2D segment endpoints (px)
    obs_mask: jnp.ndarray  # (K,C,M) bool
    # probation: freshly promoted lines (2 observation rows) refine their own
    # geometry in the BA but do NOT constrain poses until a 3rd view confirms
    # them (pose Jacobians cut via stop_gradient) -- a mis-paired stereo
    # birth is self-consistent by construction, so consistency can only be
    # tested against additional views
    probation: jnp.ndarray  # (M,) bool

    @classmethod
    def create(cls, K: int, C: int, M: int, dtype=jnp.float32):
        return cls(
            ends=jnp.zeros((M, 2, 3), dtype),
            mask=jnp.zeros((M,), bool),
            obs=jnp.zeros((K, C, M, 2, 2), dtype),
            obs_mask=jnp.zeros((K, C, M), bool),
            probation=jnp.zeros((M,), bool),
        )

    @property
    def M(self):
        return self.ends.shape[0]


@struct.dataclass
class Rig:
    """Multi-camera rig: per-camera model parameters + extrinsics T_f_s.

    The camera model class is shared across the rig (params batched over C);
    heterogeneous rigs use per-camera pytrees stacked by the caller.
    """

    cam: object  # camera model pytree with leading (C,) param dims
    R_f_s: jnp.ndarray  # (C,3,3)
    t_f_s: jnp.ndarray  # (C,3)

    @property
    def C(self):
        return self.t_f_s.shape[0]


@struct.dataclass
class ImuChain:
    """Preintegrated IMU between consecutive KF slots (k -> k+1).

    pre: Preintegration with leading (K-1,) batch dim; mask marks pairs where
    both endpoints are active and IMU data exists.
    """

    pre: Preintegration  # batched (K-1, ...)
    mask: jnp.ndarray  # (K-1,) bool

    @classmethod
    def create(cls, K: int, dtype=jnp.float32):
        one = Preintegration.identity(dtype)
        pre = jax.tree.map(lambda x: jnp.broadcast_to(x, (K - 1, *x.shape)), one)
        return cls(pre=pre, mask=jnp.zeros((K - 1,), bool))


@struct.dataclass
class PriorSet:
    """Marginalization prior as a set of sparsified factors.

    This is the TPU-native home of the reference's post-sparsification prior
    (marginalization.cpp:362-514): instead of a dense MarginalizationFactor,
    the prior is a fixed-capacity set of small factors over the oldest KF and
    the P retained landmarks:

    * state_prior: 15-dof prior on one KF slot (pose+v+ba+bg), sqrt-info
      whitened (sparsifyVIO's absolute IMU-frame factor).
    * lmk_prior: absolute 3D landmark priors (sparsifyVO entropy-min unary).
    * plmk_prior: landmark priors in the coordinates of a kept frame
      (sparsifyVIO relative landmark factors, PoseToLandmarkFactor).
    * ll_chain: landmark-to-landmark relative factors along the Chow-Liu
      chain (sparsifyVO, LandmarkToLandmarkFactor).

    Retained landmarks live in dense-state slots: prior_slots maps slot
    p -> landmark index l.
    """

    # 15-dof state prior per KF slot
    sp_R: jnp.ndarray  # (K,3,3) prior pose rotation
    sp_t: jnp.ndarray  # (K,3)
    sp_v: jnp.ndarray  # (K,3)
    sp_ba: jnp.ndarray  # (K,3)
    sp_bg: jnp.ndarray  # (K,3)
    sp_sqrt_info: jnp.ndarray  # (K,15,15)
    sp_mask: jnp.ndarray  # (K,) bool

    # retained landmark bookkeeping
    prior_slots: jnp.ndarray  # (P,) int32 landmark index per retained slot
    prior_slot_mask: jnp.ndarray  # (P,) bool

    # absolute landmark priors per retained slot
    lp_val: jnp.ndarray  # (P,3)
    lp_sqrt_info: jnp.ndarray  # (P,3,3)
    lp_mask: jnp.ndarray  # (P,) bool

    # pose-to-landmark priors (value expressed in frame coords of KF slot)
    plp_val: jnp.ndarray  # (P,3)
    plp_frame: jnp.ndarray  # (P,) int32 KF slot
    plp_sqrt_info: jnp.ndarray  # (P,3,3)
    plp_mask: jnp.ndarray  # (P,) bool

    # landmark-landmark chain factors between retained slots (a,b)
    ll_a: jnp.ndarray  # (P,) int32 retained slot index
    ll_b: jnp.ndarray  # (P,) int32
    ll_val: jnp.ndarray  # (P,3) measured p_a - p_b
    ll_sqrt_info: jnp.ndarray  # (P,3,3)
    ll_mask: jnp.ndarray  # (P,) bool

    # dense (non-sparsified) marginalization prior: one (15+3P)-dim linear
    # factor replayed at its stored linearization point (the reference's
    # MarginalizationFactor, marginalization.hpp:88-218 /
    # BundleAdjustmentCERESAnalytic.cpp:316-429 "sparsification: 0" path).
    # r(dx) = dn_J dx + dn_r with dx the retraction of [frame dn_frame state,
    # retained landmarks (prior_slots order)] from the stored lin state.
    dn_J: jnp.ndarray  # (15+3P, 15+3P) sqrt-info Jacobian (Lam^1/2 U^T)
    dn_r: jnp.ndarray  # (15+3P,) residual at the linearization point
    dn_R: jnp.ndarray  # (3,3) lin pose of the kept frame
    dn_t: jnp.ndarray  # (3,)
    dn_v: jnp.ndarray  # (3,)
    dn_ba: jnp.ndarray  # (3,)
    dn_bg: jnp.ndarray  # (3,)
    dn_lmk: jnp.ndarray  # (P,3) lin positions of retained landmarks
    dn_frame: jnp.ndarray  # () int32 KF slot the prior anchors to
    dn_mask: jnp.ndarray  # () bool

    @classmethod
    def create(cls, K: int, P: int, dtype=jnp.float32):
        z3 = jnp.zeros((P, 3), dtype)
        zi = jnp.zeros((P, 3, 3), dtype)
        zm = jnp.zeros((P,), bool)
        Dd = 15 + 3 * P
        return cls(
            sp_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (K, 3, 3)),
            sp_t=jnp.zeros((K, 3), dtype), sp_v=jnp.zeros((K, 3), dtype),
            sp_ba=jnp.zeros((K, 3), dtype), sp_bg=jnp.zeros((K, 3), dtype),
            sp_sqrt_info=jnp.zeros((K, 15, 15), dtype), sp_mask=jnp.zeros((K,), bool),
            prior_slots=jnp.zeros((P,), jnp.int32), prior_slot_mask=zm,
            lp_val=z3, lp_sqrt_info=zi, lp_mask=zm,
            plp_val=z3, plp_frame=jnp.zeros((P,), jnp.int32), plp_sqrt_info=zi, plp_mask=zm,
            ll_a=jnp.zeros((P,), jnp.int32), ll_b=jnp.zeros((P,), jnp.int32),
            ll_val=z3, ll_sqrt_info=zi, ll_mask=zm,
            dn_J=jnp.zeros((Dd, Dd), dtype), dn_r=jnp.zeros((Dd,), dtype),
            dn_R=jnp.eye(3, dtype=dtype), dn_t=jnp.zeros((3,), dtype),
            dn_v=jnp.zeros((3,), dtype), dn_ba=jnp.zeros((3,), dtype),
            dn_bg=jnp.zeros((3,), dtype), dn_lmk=z3,
            dn_frame=jnp.zeros((), jnp.int32), dn_mask=jnp.zeros((), bool),
        )

    @property
    def P(self):
        return self.prior_slots.shape[0]

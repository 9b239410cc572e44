"""Sliding-window visual-inertial bundle adjustment: batched Schur-LM.

This module replaces the entire Ceres stack of the reference
(reference: cpp/src/optimizers/AOptimizer.cpp:98-446 -- landmarkOptimization,
singleFrameOptimization, singleFrameVIOptimization, localMapBA,
localMapVIOptimization) with one jit-compiled Levenberg-Marquardt solver
built around an explicit Schur complement:

* Every landmark *not* retained by the marginalization prior is eliminated
  with an independent 3x3 block (batched over the L axis -- the TPU analog of
  Ceres' Schur ordering groups, BundleAdjustmentCERESAnalytic.cpp:216-246).
* The dense (reduced) system holds the K keyframe 15-dof states plus the P
  prior-retained landmarks, so sparsified landmark-coupling factors
  (Chow-Liu chains) stay exact.  Solved with Cholesky.
* Reprojection Jacobians are hand-derived (hot path); all small factors (IMU,
  bias walk, priors, chains) are linearized with one jacfwd over the dense
  delta -- exact, no hand chain rule.

VO and VIO share the solver: with no IMU factors, velocity/bias dims are held
by the LM damping and stay at zero.  Fixed frames (gauge) are handled by
masking their columns out of the normal equations, like the reference's
SetParameterBlockConstant (AOptimizer.cpp:321-333).

Solving convention: residuals r(x), minimize ||r||^2.  Normal equations
H dx = b with H = J^T W J, b = -J^T W r; landmarks eliminated by
  dl = Hll^-1 (bl - Hpl^T dp).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from sadvio_tpu.backend import factors
from sadvio_tpu.data.window import ImuChain, Observations, PriorSet, Rig, WindowState
from sadvio_tpu.models import imu as imu_mod
from sadvio_tpu.utils import geometry as geo

D = 15  # per-keyframe state dof: [omega(3), nu(3), dv(3), dba(3), dbg(3)]


@struct.dataclass
class BAOptions:
    sigma_px: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    huber: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.345))
    iters: int = struct.field(pytree_node=False, default=10)
    lam_init: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1e-4))
    lam_up: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(10.0))
    lam_down: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.5))
    jitter: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1e-5))
    acc_walk: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(3.0e-3))
    gyr_walk: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(2.0e-5))
    # angular (bearing-vector) reprojection error instead of pixel error:
    # the AngularAdjustment optimizer variant for fisheye/omni rigs
    # (AngularAdjustmentCERESAnalytic).  sigma is then sigma_px / focal.
    angular: bool = struct.field(pytree_node=False, default=False)
    # finite-difference reprojection Jacobians instead of the hand chain
    # rule: the reference's numeric-diff fallback optimizer
    # (BundleAdjustmentCERESNumeric).  Correctness baseline, not a hot path.
    numeric: bool = struct.field(pytree_node=False, default=False)
    # line (linexd) residual weighting: Hough+TLS line detections carry more
    # noise than corner detections (texture interference shifts the TLS
    # centroid), so line rows are whitened at sigma_line and the along-line
    # endpoint-matching terms (clipped by occlusion/detection extent) are
    # strongly down-weighted
    sigma_line: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    w_along: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.3))
    # optional NamedSharding for the dense-factor tangent sweep: shards the
    # (K*D + P*3 + M*6)-wide jacfwd basis over the mesh so the SMALL-factor
    # linearization -- the dominant replicated term of the landmark-sharded
    # BA (SCALING.md t_red) -- divides across chips instead of replicating.
    # None = unsharded (single device / GSPMD chooses).
    dense_shard: object = struct.field(pytree_node=False, default=None)


class BAProblem(NamedTuple):
    state: WindowState
    obs: Observations
    rig: Rig
    imu: ImuChain
    priors: PriorSet
    fixed_mask: jnp.ndarray  # (K,) bool: pose frozen (gauge)
    opt_lmk_only: jnp.ndarray  # () bool: freeze all KF states (landmarkOptimization)
    # optional line landmarks (data.window.LineBlock): 6-dof blocks appended
    # to the dense system so linexd observations constrain poses, matching
    # the reference's localMapBA linexd residuals
    # (BundleAdjustmentCERESAnalytic.h:104-195 / .cpp:273-302)
    lines: object = None


def make_problem(state, obs, rig, imu=None, priors=None, fixed_mask=None, lmk_only=False):
    K = state.K
    if imu is None:
        imu = ImuChain.create(K)
    if priors is None:
        priors = PriorSet.create(K, 8)
    if fixed_mask is None:
        fixed_mask = jnp.zeros((K,), bool).at[0].set(True)
    return BAProblem(state, obs, rig, imu, priors, fixed_mask, jnp.asarray(lmk_only))


# ---------------------------------------------------------------------------
# slot bookkeeping
# ---------------------------------------------------------------------------


def slot_of_lmk(priors: PriorSet, L: int):
    """(L,) int32: retained-slot index of each landmark, P if eliminated."""
    P = priors.P
    out_ext = jnp.full((L + 1,), P, jnp.int32)
    idx = jnp.where(priors.prior_slot_mask, priors.prior_slots, L)  # L = dump row
    out_ext = out_ext.at[idx].set(jnp.arange(P, dtype=jnp.int32))
    return out_ext[:L]


# ---------------------------------------------------------------------------
# reprojection linearization (hand-derived hot path)
# ---------------------------------------------------------------------------


def _reproj_terms(state: WindowState, obs: Observations, rig: Rig, opts: BAOptions):
    """Linearize all (K,C,L) reprojection residuals at the current state.

    Returns r (K,C,L,2), J_pose (K,C,L,2,6), J_lmk (K,C,L,2,3),
    m (K,C,L) base mask (obs & valid & alive), w (K,C,L) = m * Huber weight.
    """

    def per_cam(cam_c, Rfs_c, tfs_c, uv_c, m_c):
        Rb = state.R[:, None]
        tb = state.t[:, None]
        p = state.lmk[None, :]
        if opts.angular:
            ray = cam_c.backproject(uv_c)
            r, Jp, Jl, valid = factors.angular_residual_jac(
                Rb, tb, Rfs_c, tfs_c, p, ray, opts.sigma_px / cam_c.focal
            )
        elif opts.numeric:
            r, Jp, Jl, valid = factors.reprojection_residual_numeric(
                cam_c, Rb, tb, Rfs_c, tfs_c, p, uv_c, opts.sigma_px
            )
        else:
            r, Jp, Jl, valid = factors.reprojection_residual(
                cam_c, Rb, tb, Rfs_c, tfs_c, p, uv_c, opts.sigma_px
            )
        m = (m_c & valid & state.lmk_mask[None, :] & state.kf_mask[:, None]).astype(r.dtype)
        rn = jnp.linalg.norm(r, axis=-1)
        w = m * factors.huber_weight(rn, opts.huber)
        return r, Jp, Jl, m, w

    cam_axes = jax.tree.map(lambda _: 0, rig.cam)
    r, Jp, Jl, m, w = jax.vmap(per_cam, in_axes=(cam_axes, 0, 0, 1, 1), out_axes=1)(
        rig.cam, rig.R_f_s, rig.t_f_s, obs.uv, obs.mask
    )
    return r, Jp, Jl, m, w


# ---------------------------------------------------------------------------
# line reprojection rows (linexd in the window BA)
# ---------------------------------------------------------------------------


def _line_residual_rows(Rk, tk, kf_mask, ends, lines, rig: Rig, opts: BAOptions):
    """Whitened, IRLS-Huber-weighted 4-dim line reprojection rows, flat.

    The reference's localMapBA adds linexd residuals <4,6,6> over
    (pose, line) (BundleAdjustmentCERESAnalytic.h:104-195, .cpp:273-302);
    here the same cost enters the dense system via one jacfwd sweep: each
    line is a 6-dof landmark block (two world endpoints), residual =
    perpendicular distances of both projected endpoints to the observed
    infinite line + down-weighted along-line endpoint matching
    (frontend.lines.line_reproj_residual).  Robustified IRLS-style: the
    Huber weight is computed from the perpendicular error norm at the
    evaluation point and frozen (stop_gradient) so it does not leak into
    the Jacobian.
    """
    from sadvio_tpu.frontend import lines as lines_mod

    def per_cam(cam_c, Rfs_c, tfs_c, obs_c, om_c):
        # broadcast: poses (K,1,...) x lines (1,M,...).  Probation lines
        # (2 obs rows: a mis-paired stereo birth is self-consistent, only a
        # 3rd view can refute it) see stop_gradient poses: their residuals
        # refine the LINE but contribute zero pose Jacobian.
        prob4 = lines.probation[None, :, None, None]  # (1,M,1,1)
        prob3 = lines.probation[None, :, None]  # (1,M,1)
        Rb = jnp.where(prob4, jax.lax.stop_gradient(Rk[:, None]), Rk[:, None])
        tb = jnp.where(prob3, jax.lax.stop_gradient(tk[:, None]), tk[:, None])
        p0 = ends[None, :, 0]
        p1 = ends[None, :, 1]
        r, vis = lines_mod.line_reproj_residual(
            cam_c, Rb, tb, Rfs_c, tfs_c, p0, p1, obs_c,
            sigma_px=opts.sigma_line, w_along=opts.w_along,
        )  # (K,M,4)
        m = om_c & vis & lines.mask[None, :] & kf_mask[:, None]
        rn = jnp.linalg.norm(jax.lax.stop_gradient(r[..., :2]), axis=-1)
        # redescending (Cauchy) weight instead of Huber: a wrong line
        # re-association produces a large, CONSISTENT residual that Huber
        # still weights linearly -- enough to drag poses on line-dominant
        # problems.  Cauchy drives its influence to zero.
        w = jnp.sqrt(1.0 / (1.0 + (rn / (2.0 * opts.huber)) ** 2))
        return jnp.where(m[..., None], r * w[..., None], 0.0)

    cam_axes = jax.tree.map(lambda _: 0, rig.cam)
    rows = jax.vmap(per_cam, in_axes=(cam_axes, 0, 0, 1, 1), out_axes=1)(
        rig.cam, rig.R_f_s, rig.t_f_s, lines.obs, lines.obs_mask
    )  # (K,C,M,4)
    return rows.reshape(-1)


# ---------------------------------------------------------------------------
# dense-factor residuals (IMU, bias, priors, chains) -- autodiff linearized
# ---------------------------------------------------------------------------


def _apply_dense_delta(state: WindowState, priors: PriorSet, dxd):
    """Retract the dense delta [K*D + P*3] onto the window state."""
    K = state.K
    dk = dxd[: K * D].reshape(K, D)
    R, t = geo.pose_retract(state.R, state.t, dk[:, :6])
    v = state.v + dk[:, 6:9]
    ba = state.ba + dk[:, 9:12]
    bg = state.bg + dk[:, 12:15]
    dl = dxd[K * D : K * D + priors.P * 3].reshape(-1, 3)
    upd = jnp.where(priors.prior_slot_mask[:, None], dl, 0.0)
    idx = jnp.where(priors.prior_slot_mask, priors.prior_slots, state.L)
    lmk = jnp.concatenate([state.lmk, jnp.zeros((1, 3), state.lmk.dtype)])
    lmk = lmk.at[idx].add(upd)[: state.L]
    return state.replace(R=R, t=t, v=v, ba=ba, bg=bg, lmk=lmk)


def _retained_lmk(state: WindowState, priors: PriorSet):
    """(P,3) positions of the prior-retained landmarks (zeros for empty slots)."""
    lmk_ext = jnp.concatenate([state.lmk, jnp.zeros((1, 3), state.lmk.dtype)])
    idx = jnp.where(priors.prior_slot_mask, priors.prior_slots, state.L)
    return lmk_ext[idx]


def _dense_residuals(state: WindowState, imu: ImuChain, priors: PriorSet, opts: BAOptions):
    """All whitened non-reprojection residuals, masked, as one flat vector."""
    pl = _retained_lmk(state, priors)
    return _dense_residuals_pl(
        state.R, state.t, state.v, state.ba, state.bg, pl, imu, priors, opts
    )


def _dense_residuals_pl(Rk, tk, vk, bak, bgk, pl, imu: ImuChain, priors: PriorSet,
                        opts: BAOptions):
    """Dense-factor residuals parameterized by per-KF states + retained
    landmarks directly -- the jacfwd in the solver differentiates through this
    (P,3) surface instead of a scatter/gather round trip over the full (L,3)
    landmark array (which would drag an L-sized tangent through every factor).
    """
    K = Rk.shape[0]

    # IMU preintegration factors between consecutive slots (k, k+1)
    def imu_r(pre, m, k):
        W = imu_mod.sqrt_info(pre)
        r = factors.imu_factor_residual(
            pre, W,
            Rk[k], tk[k], vk[k], bak[k], bgk[k],
            Rk[k + 1], tk[k + 1], vk[k + 1],
        )
        rb = factors.bias_rw_residual(
            bak[k], bgk[k], bak[k + 1], bgk[k + 1],
            pre.dt, opts.acc_walk, opts.gyr_walk,
        )
        return jnp.where(m, r, 0.0), jnp.where(m, rb, 0.0)

    ks = jnp.arange(K - 1)
    r_imu, r_bias = jax.vmap(imu_r)(imu.pre, imu.mask, ks)

    # 15-dof state priors per KF
    def sp_r(k):
        r = factors.state_prior_residual(
            Rk[k], tk[k], vk[k], bak[k], bgk[k],
            priors.sp_R[k], priors.sp_t[k], priors.sp_v[k], priors.sp_ba[k],
            priors.sp_bg[k], priors.sp_sqrt_info[k],
        )
        return jnp.where(priors.sp_mask[k], r, 0.0)

    r_sp = jax.vmap(sp_r)(jnp.arange(K))

    r_lp = jnp.einsum("pab,pb->pa", priors.lp_sqrt_info, pl - priors.lp_val)
    r_lp = jnp.where(priors.lp_mask[:, None], r_lp, 0.0)

    Rf = Rk[priors.plp_frame]
    tf = tk[priors.plp_frame]
    p_f = jnp.einsum("pji,pj->pi", Rf, pl - tf)
    r_plp = jnp.einsum("pab,pb->pa", priors.plp_sqrt_info, p_f - priors.plp_val)
    r_plp = jnp.where(priors.plp_mask[:, None], r_plp, 0.0)

    pa = pl[priors.ll_a]
    pb = pl[priors.ll_b]
    r_ll = jnp.einsum("pab,pb->pa", priors.ll_sqrt_info, (pa - pb) - priors.ll_val)
    r_ll = jnp.where(priors.ll_mask[:, None], r_ll, 0.0)

    # dense marginalization prior: linear factor replayed at its stored
    # linearization point (MarginalizationFactor, marginalization.hpp:88-218)
    f = priors.dn_frame
    dx_pose = geo.pose_local(priors.dn_R, priors.dn_t, Rk[f], tk[f])
    dx_dn = jnp.concatenate([
        dx_pose, vk[f] - priors.dn_v, bak[f] - priors.dn_ba,
        bgk[f] - priors.dn_bg,
        jnp.where(priors.prior_slot_mask[:, None], pl - priors.dn_lmk, 0.0
                  ).reshape(-1),
    ])
    r_dn = priors.dn_J @ dx_dn + priors.dn_r
    r_dn = jnp.where(priors.dn_mask, r_dn, 0.0)

    return jnp.concatenate(
        [r_imu.reshape(-1), r_bias.reshape(-1), r_sp.reshape(-1),
         r_lp.reshape(-1), r_plp.reshape(-1), r_ll.reshape(-1), r_dn]
    )


# ---------------------------------------------------------------------------
# normal equations assembly + Schur + solve (one LM iteration)
# ---------------------------------------------------------------------------


class _Lin(NamedTuple):
    """Everything the damped solve needs, cached at one linearization point.

    Deferred-acceptance LM: each iteration linearizes ONCE (at the trial
    point) and that linearization doubles as the acceptance cost AND, if the
    step is accepted, as the next iteration's normal equations -- the
    reference evaluates cost and Jacobians separately per Ceres iteration.
    Only the LM damping (lam) is applied per-solve; everything lam-independent
    lives here.
    """

    Hll: jnp.ndarray      # (L,3,3) per-landmark normal blocks
    bl: jnp.ndarray       # (L,3)
    Hpl: jnp.ndarray      # (K,L,6,3) pose-landmark coupling
    Hpp: jnp.ndarray      # (K,6,6)
    bp: jnp.ndarray       # (K,6)
    H: jnp.ndarray        # (Dd,Dd) dense base: small factors + retained scatter
    b: jnp.ndarray        # (Dd,)
    cost: jnp.ndarray     # () true-Huber robust cost at this point


def _linearize(problem: BAProblem, opts: BAOptions) -> _Lin:
    """Linearize every factor at the problem state; assemble the
    lam-independent normal equations and the robust cost."""
    state, obs, rig, imu, priors = (
        problem.state, problem.obs, problem.rig, problem.imu, problem.priors,
    )
    K, C, L = obs.mask.shape
    P = priors.P
    lines = problem.lines
    M = 0 if lines is None else lines.M
    Dd = K * D + P * 3 + M * 6
    off_p = K * D  # retained-landmark block offset
    off_l = K * D + P * 3  # line block offset
    dt_ = state.lmk.dtype

    r, Jp, Jl, m, w = _reproj_terms(state, obs, rig, opts)

    slot = slot_of_lmk(priors, L)

    # per-landmark accumulations (sum over K,C)
    wJl = w[..., None, None] * Jl
    Hll = jnp.einsum("kclai,kclaj->lij", wJl, Jl)
    bl = -jnp.einsum("kclai,kcla->li", wJl, r)
    wJp = w[..., None, None] * Jp
    # (K,L,6,3): written as a fused broadcast-multiply-reduce -- the einsum
    # spelling lowers ~20x off roofline on TPU when two large non-contracted
    # axes (K,L) remain (measured 3.9 ms vs 0.17 ms at K=65,L=4096)
    Hpl = (wJp[..., :, None] * Jl[..., None, :]).sum((1, 3))  # (K,L,6,3)
    Hpp = jnp.einsum("kclai,kclaj->kij", wJp, Jp)  # (K,6,6)
    bp = -jnp.einsum("kclai,kcla->ki", wJp, r)  # (K,6)

    # retained-slot scatter (one-hot over P)
    S = ((slot[:, None] == jnp.arange(P)[None, :]) & state.lmk_mask[:, None]).astype(dt_)
    Hll_ret = jnp.einsum("lp,lij->pij", S, Hll)
    bl_ret = jnp.einsum("lp,li->pi", S, bl)
    Hx = jnp.einsum("lp,klij->kpij", S, Hpl)  # (K,P,6,3)

    # dense normal equations from small factors, differentiated over the
    # (K*D + P*3) delta with the retained landmarks addressed directly (no
    # L-sized scatter in the tangent path).  NOTE a per-factor compact-chart
    # linearization (30-wide IMU blocks etc.) was tried and measured SLOWER
    # on TPU than this one wide jacfwd -- XLA fuses the 309-tangent sweep
    # through the small factor graph into a handful of kernels, while
    # per-factor assembly fragments into many tiny ones.
    pl0 = _retained_lmk(state, priors)

    def rfun(dxd):
        dk = dxd[: K * D].reshape(K, D)
        Rk, tk = geo.pose_retract(state.R, state.t, dk[:, :6])
        vk = state.v + dk[:, 6:9]
        bak = state.ba + dk[:, 9:12]
        bgk = state.bg + dk[:, 12:15]
        dl = dxd[off_p:off_l].reshape(P, 3)
        pl = pl0 + jnp.where(priors.prior_slot_mask[:, None], dl, 0.0)
        r_small = _dense_residuals_pl(Rk, tk, vk, bak, bgk, pl, imu, priors, opts)
        if lines is None:
            return r_small
        de = dxd[off_l:].reshape(M, 2, 3)
        ends = lines.ends + jnp.where(lines.mask[:, None, None], de, 0.0)
        r_line = _line_residual_rows(
            Rk, tk, state.kf_mask, ends, lines, rig, opts)
        return jnp.concatenate([r_small, r_line])

    dx0 = jnp.zeros((Dd,), dt_)
    r_dense = rfun(dx0)
    J_dense = jax.jacfwd(rfun)(dx0)
    if opts.dense_shard is not None:
        # row-sharded dense linearization: constraining J's residual-row
        # axis onto the mesh makes each device linearize only the factor
        # rows it owns (for every tangent), dividing the replicated t_red
        # term across chips; the normal-equation contraction then
        # all-reduces ONE (Dd,Dd) block (~1.5 MB at K=32/P=48) instead of
        # gathering the (Dd,R) Jacobian slab (a tangent-axis-sharded
        # variant was measured at 11 MB/iter of collectives -- worse)
        J_dense = jax.lax.with_sharding_constraint(J_dense, opts.dense_shard)
    H = J_dense.T @ J_dense
    b = -J_dense.T @ r_dense
    dense_sq = jnp.sum(r_dense * r_dense)

    # scatter the lam-independent reprojection blocks into the dense system
    H4 = H[: K * D, : K * D].reshape(K, D, K, D)
    Hpp_diag = Hpp[:, None] * jnp.eye(K, dtype=dt_)[:, :, None, None]
    H4 = H4.at[:, :6, :, :6].add(jnp.swapaxes(Hpp_diag, 1, 2))
    H = H.at[: K * D, : K * D].set(H4.reshape(K * D, K * D))
    b = b.at[: K * D].add(
        jnp.concatenate([bp, jnp.zeros((K, D - 6), dt_)], axis=1).reshape(-1)
    )

    Hd = H[off_p:off_l, off_p:off_l].reshape(P, 3, P, 3)
    Hd = Hd + Hll_ret[:, :, None, :] * jnp.eye(P, dtype=dt_)[:, None, :, None]
    H = H.at[off_p:off_l, off_p:off_l].set(Hd.reshape(P * 3, P * 3))
    b = b.at[off_p:off_l].add(bl_ret.reshape(-1))

    Hc = H[: K * D, off_p:off_l].reshape(K, D, P, 3)
    Hc = Hc.at[:, :6].add(jnp.swapaxes(Hx, 1, 2))  # (K,P,6,3) -> (K,6,P,3)
    Hc2 = Hc.reshape(K * D, P * 3)
    H = H.at[: K * D, off_p:off_l].set(Hc2)
    H = H.at[off_p:off_l, : K * D].set(Hc2.T)

    # true-Huber robust cost at this linearization point
    rn = jnp.linalg.norm(r, axis=-1)
    d = opts.huber
    rho = jnp.where(rn <= d, rn * rn, 2.0 * d * rn - d * d)
    cost = jnp.sum(m * rho) + dense_sq

    return _Lin(Hll, bl, Hpl, Hpp, bp, H, b, cost)


def _solve_from_lin(lin: _Lin, problem: BAProblem, opts: BAOptions, free, lam):
    """Damp + Schur-eliminate + Cholesky-solve the cached normal equations."""
    state, priors = problem.state, problem.priors
    K, L, P = state.K, state.L, priors.P
    Dd = lin.H.shape[0]  # K*D + P*3 (+ M*6 line dims when lines are present)
    dt_ = state.lmk.dtype

    slot = slot_of_lmk(priors, L)
    elim = state.lmk_mask & ~(slot < P)

    # eliminated blocks, LM-damped before inversion
    em = elim.astype(dt_)
    Hll_e = lin.Hll * em[:, None, None]
    bl_e = lin.bl * em[:, None]
    Hpl_e = lin.Hpl * em[None, :, None, None]
    dll = jnp.abs(jnp.diagonal(Hll_e, axis1=-2, axis2=-1))  # (L,3)
    damp = lam * dll + opts.jitter + (1.0 - em[:, None])
    Hll_d = Hll_e + jax.vmap(jnp.diag)(damp)
    Hll_inv = geo.inv3x3(Hll_d) * em[:, None, None]
    W_kl = jnp.einsum("klij,ljm->klim", Hpl_e, Hll_inv)
    Hred_corr = -jnp.einsum("klab,qlcb->kqac", W_kl, Hpl_e)  # (K,K,6,6)
    bred_corr = -jnp.einsum("klab,lb->ka", W_kl, bl_e)

    H4 = lin.H[: K * D, : K * D].reshape(K, D, K, D)
    H4 = H4.at[:, :6, :, :6].add(jnp.swapaxes(Hred_corr, 1, 2))
    H = lin.H.at[: K * D, : K * D].set(H4.reshape(K * D, K * D))
    b = lin.b.at[: K * D].add(
        jnp.concatenate([bred_corr, jnp.zeros((K, D - 6), dt_)], axis=1).reshape(-1)
    )

    # freeze masked dims, Jacobi-equilibrate (the dense system mixes IMU info
    # ~1e8 with reprojection info ~1e2 -- f32 Cholesky needs unit diagonal),
    # and apply multiplicative LM damping on the scaled diagonal.
    eye = jnp.eye(Dd, dtype=dt_)
    Hm = H * free[:, None] * free[None, :] + eye * (1.0 - free)
    bm = b * free
    s = 1.0 / jnp.sqrt(jnp.clip(jnp.diagonal(Hm), 1e-10, None))
    Hs = Hm * s[:, None] * s[None, :] + eye * (lam + opts.jitter)
    Lc = jnp.linalg.cholesky(Hs)
    ok = jnp.all(jnp.isfinite(Lc))
    y = jax.scipy.linalg.cho_solve((jnp.where(ok, Lc, eye), True), bm * s)
    dxd = jnp.where(ok, y * s, 0.0) * free

    # back-substitute eliminated landmarks
    dpose = dxd[: K * D].reshape(K, D)[:, :6]
    rhs = bl_e - jnp.einsum("klij,ki->lj", Hpl_e, dpose)
    dl = jnp.einsum("lij,lj->li", Hll_inv, rhs)
    dl = jnp.where(elim[:, None], dl, 0.0)
    return dxd, dl, ok


def _lm_step(problem: BAProblem, opts: BAOptions, free, lam):
    """Linearize at the problem state, solve the damped system, return deltas."""
    lin = _linearize(problem, opts)
    return _solve_from_lin(lin, problem, opts, free, lam)


def _free_mask(problem: BAProblem):
    """(Dd,) 1.0 where the dim is free, 0.0 where frozen."""
    pose_free = (problem.state.kf_mask & ~problem.fixed_mask).astype(jnp.float32)
    kf_free = problem.state.kf_mask.astype(jnp.float32)
    m_k = jnp.concatenate(
        [jnp.repeat(pose_free[:, None], 6, 1), jnp.repeat(kf_free[:, None], 9, 1)],
        axis=1,
    )
    m_k = m_k * jnp.where(problem.opt_lmk_only, 0.0, 1.0)
    m_p = jnp.repeat(problem.priors.prior_slot_mask.astype(jnp.float32)[:, None], 3, 1)
    parts = [m_k.reshape(-1), m_p.reshape(-1)]
    if problem.lines is not None:
        # line landmark blocks stay free under opt_lmk_only (they ARE
        # landmarks: landmarkOptimization refines them at fixed poses)
        m_l = jnp.repeat(problem.lines.mask.astype(jnp.float32)[:, None], 6, 1)
        parts.append(m_l.reshape(-1))
    return jnp.concatenate(parts)


def robust_cost(problem: BAProblem, opts: BAOptions):
    """Total robust cost (true Huber, not its IRLS approximation)."""
    state = problem.state
    r, _, _, m, _ = _reproj_terms(state, problem.obs, problem.rig, opts)
    rn = jnp.linalg.norm(r, axis=-1)
    d = opts.huber
    rho = jnp.where(rn <= d, rn * rn, 2.0 * d * rn - d * d)
    c_reproj = jnp.sum(m * rho)
    rd = _dense_residuals(state, problem.imu, problem.priors, opts)
    cost = c_reproj + jnp.sum(rd * rd)
    if problem.lines is not None:
        rl = _line_residual_rows(
            state.R, state.t, state.kf_mask, problem.lines.ends,
            problem.lines, problem.rig, opts)
        cost = cost + jnp.sum(rl * rl)
    return cost


@partial(jax.jit, static_argnames=("n_iters",))
def _ba_solve_impl(problem: BAProblem, opts: BAOptions, n_iters: int):
    free = _free_mask(problem)
    has_lines = problem.lines is not None
    off_l = problem.state.K * D + problem.priors.P * 3

    def with_lines(state, ends):
        prob = problem._replace(state=state)
        if has_lines:
            prob = prob._replace(lines=prob.lines.replace(ends=ends))
        return prob

    def iteration(carry, _):
        state, ends, lin, lam, cost = carry
        dxd, dl, ok = _solve_from_lin(lin, with_lines(state, ends), opts, free, lam)
        trial = _apply_dense_delta(state, problem.priors, dxd)
        trial = trial.replace(lmk=trial.lmk + dl)
        ends_t = ends
        if has_lines:
            de = dxd[off_l:].reshape(ends.shape)
            ends_t = ends + jnp.where(problem.lines.mask[:, None, None], de, 0.0)
        # ONE linearization per iteration: it yields the acceptance cost now
        # and, if accepted, the next iteration's normal equations.
        lin_t = _linearize(with_lines(trial, ends_t), opts)
        new_cost = lin_t.cost
        accept = ok & jnp.isfinite(new_cost) & (new_cost < cost)
        state = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), trial, state)
        ends = jnp.where(accept, ends_t, ends)
        lin = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), lin_t, lin)
        lam = jnp.clip(
            jnp.where(accept, lam * opts.lam_down, lam * opts.lam_up), 1e-9, 1e6
        )
        cost = jnp.where(accept, new_cost, cost)
        return (state, ends, lin, lam, cost), (cost, accept)

    lin0 = _linearize(problem, opts)
    cost0 = lin0.cost
    ends0 = (problem.lines.ends if has_lines
             else jnp.zeros((0, 2, 3), problem.state.lmk.dtype))
    (state, ends, lin, lam, cost), (costs, accepts) = jax.lax.scan(
        iteration, (problem.state, ends0, lin0, opts.lam_init, cost0),
        None, length=n_iters,
    )
    stats = {"cost0": cost0, "cost": cost, "costs": costs, "accepted": accepts}
    if has_lines:
        stats["line_ends"] = ends
    return state, stats


def ba_solve(problem: BAProblem, opts: BAOptions):
    """Run LM on the window problem; returns (new_state, stats).

    One compiled kernel per (K,C,L,P,iters) signature -- reused across all
    keyframes of a run (fixed shapes), unlike the reference which re-builds a
    Ceres problem per call (AOptimizer.cpp:299-350).

    With problem.lines set (data.window.LineBlock), line landmarks enter the
    cost as pose-constraining 6-dof blocks and stats["line_ends"] carries the
    optimized endpoints for the caller to write back.
    """
    return _ba_solve_impl(problem, opts, opts.iters)

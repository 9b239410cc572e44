"""Marginalization + sparsification tests.

Mirrors the reference's toy-factor-graph acceptance test
(marginalization_test.cpp: blanket partition sizes, Schur symmetry,
post-marg consistency), adapted to the masked-array design: we check that
the sparsified prior (a) vanishes at the linearization point, (b) partitions
the blanket correctly, and (c) actually constrains the window -- a BA run
with KF0 removed drifts less with the prior than without.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.backend import ba, marginalization as marg
from sadvio_tpu.data.window import ImuChain, Observations, PriorSet, WindowState
from sadvio_tpu.utils import geometry as geo
from tests.test_ba import K, C, L, make_rig, make_world, perturb_state, pose_err

P = 32  # keep capacity large enough for all shared landmarks in this world


def lonely_shared_world(rng):
    """World where landmarks 0..9 are seen ONLY by KF0 (lonely)."""
    gt, obs, rig = make_world(rng)
    mask = np.asarray(obs.mask).copy()
    mask[1:, :, :10] = False  # first 10 lmks only at KF0
    mask[0, :, 10:20] = False  # lmks 10..19 not seen at KF0 (not in blanket)
    obs = obs.replace(mask=jnp.asarray(mask))
    return gt, obs, rig


def test_blanket_partition(rng):
    gt, obs, rig = lonely_shared_world(rng)
    priors = PriorSet.create(K, P)
    b = marg.partition_blanket(gt, obs, priors, P)
    lonely = np.asarray(b.lonely)
    assert lonely[:10].all()
    assert not lonely[10:].any()
    keep_idx = np.asarray(b.keep_idx)[np.asarray(b.keep_mask)]
    assert set(keep_idx) == set(range(20, 20 + len(keep_idx)))
    assert (keep_idx >= 20).all()


def test_sparsify_vo_prior_zero_at_linearization(rng):
    gt, obs, rig = lonely_shared_world(rng)
    priors = PriorSet.create(K, P)
    opts = ba.BAOptions()
    new_priors, info = marg.marginalize(
        gt, obs, rig, ImuChain.create(K), priors, opts, vio=False
    )
    # residuals of the new prior factors at the linearization state ~ 0
    r = ba._dense_residuals(gt, ImuChain.create(K), new_priors, opts)
    assert np.abs(np.asarray(r)).max() < 1e-3
    # chain structure: a root prior + >=1 chain links among kept slots
    assert int(new_priors.lp_mask.sum()) == 1
    assert int(new_priors.ll_mask.sum()) >= 1
    Ak = np.asarray(info["Ak"])
    np.testing.assert_allclose(Ak, Ak.T, atol=1e-3)


def test_sparsify_vio_prior_zero_at_linearization(rng):
    gt, obs, rig = lonely_shared_world(rng)
    priors = PriorSet.create(K, P)
    opts = ba.BAOptions()
    new_priors, info = marg.marginalize(
        gt, obs, rig, ImuChain.create(K), priors, opts, vio=True
    )
    r = ba._dense_residuals(gt, ImuChain.create(K), new_priors, opts)
    assert np.abs(np.asarray(r)).max() < 1e-3
    assert bool(new_priors.sp_mask[1])
    assert int(new_priors.plp_mask.sum()) > 0
    assert int(new_priors.plp_mask.sum()) == int(new_priors.prior_slot_mask.sum())


def test_prior_constrains_window(rng):
    """Functional KLD check: with the sparsified prior, the shifted window
    stays near the full-MAP solution; without it, the gauge drifts."""
    gt, obs, rig = lonely_shared_world(rng)
    opts = ba.BAOptions(iters=8)
    new_priors, info = marg.marginalize(
        gt, obs, rig, ImuChain.create(K), PriorSet.create(K, P), opts, vio=False
    )

    # drop KF0 observations (frame leaves the window); free all poses
    mask2 = np.asarray(obs.mask).copy()
    mask2[0] = False
    obs2 = obs.replace(mask=jnp.asarray(mask2))
    noisy = perturb_state(rng, gt, pose_sig=0.02, lmk_sig=0.03, skip_first=False)
    fixed = jnp.zeros((K,), bool)  # nothing fixed: only the prior holds gauge

    prob_with = ba.BAProblem(noisy, obs2, rig, ImuChain.create(K),
                             new_priors, fixed, jnp.asarray(False))
    sol_with, _ = ba.ba_solve(prob_with, opts)

    err_with = pose_err(sol_with, gt, gt.kf_mask)
    # the prior should pull the solution back to the linearization gauge
    assert err_with < 0.05, err_with


def test_dense_prior_zero_at_linearization(rng):
    """sparsify=False: the dense replay factor (MarginalizationFactor
    parity) vanishes at the linearization point of a converged problem."""
    gt, obs, rig = lonely_shared_world(rng)
    opts = ba.BAOptions()
    new_priors, info = marg.marginalize(
        gt, obs, rig, ImuChain.create(K), PriorSet.create(K, P), opts,
        vio=False, sparsify=False,
    )
    assert bool(new_priors.dn_mask)
    # no sparsified factors in dense mode
    assert int(new_priors.lp_mask.sum()) == 0
    assert int(new_priors.ll_mask.sum()) == 0
    assert not bool(new_priors.sp_mask.any())
    r = ba._dense_residuals(gt, ImuChain.create(K), new_priors, opts)
    assert np.abs(np.asarray(r)).max() < 1e-2
    # J^T J must reproduce the Schur marginal Ak on its kept subspace
    A = np.asarray(new_priors.dn_J.T @ new_priors.dn_J, np.float64)
    Ak = np.asarray(info["Ak"], np.float64)
    scale = max(np.abs(Ak).max(), 1e-9)
    np.testing.assert_allclose(A / scale, Ak / scale, atol=5e-3)


def test_dense_prior_constrains_window(rng):
    """Dense prior holds the gauge exactly like the sparsified one."""
    gt, obs, rig = lonely_shared_world(rng)
    opts = ba.BAOptions(iters=8)
    new_priors, _ = marg.marginalize(
        gt, obs, rig, ImuChain.create(K), PriorSet.create(K, P), opts,
        vio=False, sparsify=False,
    )
    mask2 = np.asarray(obs.mask).copy()
    mask2[0] = False
    obs2 = obs.replace(mask=jnp.asarray(mask2))
    noisy = perturb_state(rng, gt, pose_sig=0.02, lmk_sig=0.03, skip_first=False)
    fixed = jnp.zeros((K,), bool)
    prob = ba.BAProblem(noisy, obs2, rig, ImuChain.create(K),
                        new_priors, fixed, jnp.asarray(False))
    sol, _ = ba.ba_solve(prob, opts)
    assert pose_err(sol, gt, gt.kf_mask) < 0.05


def _prior_info_on_kept(gt, priors, opts, P):
    """Information of a prior factor set over [x1(15), kept lmk (3P)]."""
    p_keep0 = marg._gather_lmk(gt, priors.prior_slots, priors.prior_slot_mask)
    chain = ImuChain.create(K)

    def rfun(dx):
        d1 = dx[:15]
        dl = dx[15:].reshape(P, 3)
        R1, t1 = geo.pose_retract(gt.R[1], gt.t[1], d1[:6])
        Rk = gt.R.at[1].set(R1)
        tk = gt.t.at[1].set(t1)
        vk = gt.v.at[1].add(d1[6:9])
        bak = gt.ba.at[1].add(d1[9:12])
        bgk = gt.bg.at[1].add(d1[12:15])
        pl = p_keep0 + jnp.where(priors.prior_slot_mask[:, None], dl, 0.0)
        return ba._dense_residuals_pl(Rk, tk, vk, bak, bgk, pl, chain,
                                      priors, opts)

    J = jax.jacfwd(rfun)(jnp.zeros((15 + 3 * P,), jnp.float32))
    return np.asarray(J.T @ J, np.float64)


def test_sparsified_vs_dense_kld(rng):
    """Quantitative sparsification-quality check (the reference's computeKLD
    role, marginalization.cpp:344): the sparsified prior's information stays
    within a bounded per-dim KLD of the exact dense marginal on the same
    blanket.  The residual KLD is the cross-landmark correlation information
    the Chow-Liu chain deliberately drops (~1.7 nats/dim measured here)."""
    gt, obs, rig = lonely_shared_world(rng)
    opts = ba.BAOptions()
    dense, _ = marg.marginalize(
        gt, obs, rig, ImuChain.create(K), PriorSet.create(K, P), opts,
        vio=False, sparsify=False,
    )
    sparse, _ = marg.marginalize(
        gt, obs, rig, ImuChain.create(K), PriorSet.create(K, P), opts,
        vio=False, sparsify=True,
    )
    # identical blanket bookkeeping
    np.testing.assert_array_equal(np.asarray(dense.prior_slots),
                                  np.asarray(sparse.prior_slots))
    A_d = _prior_info_on_kept(gt, dense, opts, P)
    A_s = _prior_info_on_kept(gt, sparse, opts, P)
    # restrict to the dense prior's observable subspace
    lam_d, U_d = np.linalg.eigh(A_d)
    keep = lam_d > 1e-6 * lam_d.max()
    Ud = U_d[:, keep]
    Ad_r = Ud.T @ A_d @ Ud
    As_r = Ud.T @ A_s @ Ud
    kld = float(marg.kld_gaussian_info(jnp.asarray(Ad_r), jnp.asarray(As_r)))
    assert np.isfinite(kld)
    assert kld < 2.5 * Ad_r.shape[0], f"KLD {kld} vs dim {Ad_r.shape[0]}"


def test_marginalize_rank_failure(rng):
    """No observations + no IMU: the marginal carries no information -- both
    prior modes must come back disabled with finite values (the reference's
    margFailTest returns false and clears the prior,
    marginalization_test.cpp:321-335)."""
    gt, obs, rig = lonely_shared_world(rng)
    empty_obs = obs.replace(mask=jnp.zeros_like(obs.mask))
    for sparsify in (True, False):
        new_priors, _ = marg.marginalize(
            gt, empty_obs, rig, ImuChain.create(K), PriorSet.create(K, P),
            ba.BAOptions(), vio=True, sparsify=sparsify,
        )
        flat, _ = jax.tree_util.tree_flatten(new_priors)
        for leaf in flat:
            assert np.isfinite(np.asarray(leaf)).all()
        assert not bool(new_priors.dn_mask)
        assert not bool(new_priors.sp_mask.any())
        assert not bool(new_priors.plp_mask.any())
        assert not bool(new_priors.prior_slot_mask.any())


def test_shift_priors():
    priors = PriorSet.create(K, P)
    priors = priors.replace(
        sp_mask=priors.sp_mask.at[1].set(True),
        plp_frame=jnp.ones((P,), jnp.int32),
        sp_t=priors.sp_t.at[1].set(jnp.array([1.0, 2.0, 3.0])),
    )
    shifted = marg.shift_priors(priors)
    assert bool(shifted.sp_mask[0])
    assert not bool(shifted.sp_mask[1])
    np.testing.assert_allclose(np.asarray(shifted.sp_t[0]), [1.0, 2.0, 3.0])
    assert (np.asarray(shifted.plp_frame) == 0).all()


def test_keep_overflow_surfaced(rng):
    """Keep-set landmarks beyond the P prior slots are demoted to lonely --
    and the count is REPORTED (info["n_keep_overflow"]), not silently
    dropped (round-3 advisor: silent capacity cap)."""
    gt, obs, rig = make_world(rng)
    small_p = 8  # this world keeps far more than 8 shared landmarks
    priors = PriorSet.create(K, small_p)
    b = marg.partition_blanket(gt, obs, priors, small_p)
    assert int(b.n_overflow) > 0
    _, info = marg.marginalize(gt, obs, rig, ImuChain.create(K), priors,
                               ba.BAOptions(), vio=True)
    assert int(info["n_keep_overflow"]) == int(b.n_overflow)


@pytest.mark.parametrize("mode", ["vio", "vo", "dense"])
def test_gauge_transform_priors_invariance(rng, mode):
    """Rotating/rescaling the map AND its priors through
    gauge_transform_priors leaves every whitened prior residual invariant
    (the VIInit-after-roll / NoFov continuous-scale gauge move)."""
    gt, obs, rig = make_world(rng)
    opts = ba.BAOptions()
    priors, _ = marg.marginalize(
        gt, obs, rig, ImuChain.create(K), PriorSet.create(K, P), opts,
        vio=(mode == "vio"), sparsify=(mode != "dense"),
    )
    state = perturb_state(rng, gt, skip_first=False)
    state = state.replace(
        v=jnp.asarray(rng.standard_normal((K, 3)) * 0.2, jnp.float32))
    imu0 = ImuChain.create(K)  # IMU factors are metric -- excluded here
    r1 = ba._dense_residuals(state, imu0, priors, opts)

    R_A = geo.so3_exp(jnp.asarray([0.2, -0.3, 0.5], jnp.float32))
    s = jnp.float32(1.7)
    anchor = jnp.asarray([0.4, -0.2, 1.0], jnp.float32)
    world = lambda p: anchor + s * jnp.einsum("ij,...j->...i", R_A, p - anchor)
    state2 = state.replace(
        R=jnp.einsum("ij,kjl->kil", R_A, state.R),
        t=world(state.t), lmk=world(state.lmk),
        v=s * jnp.einsum("ij,kj->ki", R_A, state.v),
    )
    priors2 = marg.gauge_transform_priors(priors, R_A, s, anchor=anchor)
    r2 = ba._dense_residuals(state2, imu0, priors2, opts)
    scale = max(float(jnp.max(jnp.abs(r1))), 1.0)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1),
                               atol=2e-3 * scale, rtol=2e-3)


# ---------------------------------------------------------------------------
# marginalizeRelative (NFR pose-graph edge) + Motion2D factor
# ---------------------------------------------------------------------------


def _shared_two_frame_world(rng):
    """World where a subset of landmarks is co-observed by KF0 and KF1 only."""
    gt, obs, rig = make_world(rng)
    mask = np.asarray(obs.mask).copy()
    mask[2:] = False          # only the first two KFs participate
    mask[:, :, 24:] = False   # 24 shared landmarks
    obs = obs.replace(mask=jnp.asarray(mask))
    return gt, obs, rig


def test_marginalize_relative_matches_dense_gauge_fixed(rng):
    """NFR information == covariance of the relative pose in an independently
    built gauge-fixed dense MLE problem (frame0 clamped, autodiff end-to-end).
    """
    gt, obs, rig = _shared_two_frame_world(rng)
    opts = ba.BAOptions()
    dx_meas, inf, n_shared = marg.marginalize_relative(
        gt, obs, rig, ImuChain.create(K), opts, vio=False
    )
    assert int(n_shared) == 24
    np.testing.assert_allclose(
        np.asarray(dx_meas),
        np.asarray(geo.pose_local(gt.R[0], gt.t[0], gt.R[1], gt.t[1])),
        atol=1e-6,
    )

    # dense reference: variables [dx1(6), dp_l (3 per shared lmk)], frame0 fixed
    shared = np.where(np.asarray(jnp.any(obs.mask[0], 0) & jnp.any(obs.mask[1], 0)))[0]
    nL = len(shared)

    from sadvio_tpu.models import cameras as cam_mod

    def residuals(z):
        d1 = z[:6]
        dp = z[6:].reshape(nL, 3)
        R1, t1 = geo.pose_retract(gt.R[1], gt.t[1], d1)
        Rk = jnp.stack([gt.R[0], R1])
        tk = jnp.stack([gt.t[0], t1])
        p = gt.lmk[jnp.asarray(shared)] + dp
        out = []
        for k in range(2):
            for c in range(C):
                cam_c = jax.tree.map(lambda x: x[c], rig.cam)
                uv, _ = cam_mod.project_world(
                    cam_c, Rk[k], tk[k], rig.R_f_s[c], rig.t_f_s[c], p
                )
                r = (obs.uv[k, c, jnp.asarray(shared)] - uv) / opts.sigma_px
                m = obs.mask[k, c, jnp.asarray(shared)]
                out.append(jnp.where(m[:, None], r, 0.0).reshape(-1))
        return jnp.concatenate(out)

    z0 = jnp.zeros((6 + 3 * nL,), jnp.float32)
    J = jax.jacfwd(residuals)(z0)
    H = np.asarray(J.T @ J).astype(np.float64)
    Sigma11 = np.linalg.inv(H)[:6, :6]

    # map through the relative-pose residual Jacobian wrt dx1 (dx0 fixed)
    def rel(d1):
        R1, t1 = geo.pose_retract(gt.R[1], gt.t[1], d1)
        from sadvio_tpu.backend import factors as F
        return F.relative_pose_residual(gt.R[0], gt.t[0], R1, t1, dx_meas, jnp.eye(6))

    J1 = np.asarray(jax.jacfwd(rel)(jnp.zeros((6,), jnp.float32))).astype(np.float64)
    inf_ref = np.linalg.inv(J1 @ Sigma11 @ J1.T)

    inf = np.asarray(inf)
    scale = np.abs(inf_ref).max()
    np.testing.assert_allclose(inf / scale, inf_ref / scale, atol=3e-2)


def test_marginalize_relative_vio_smoke(rng):
    """VIO variant: adding the IMU factor only adds information (PSD gain)."""
    gt, obs, rig = _shared_two_frame_world(rng)
    opts = ba.BAOptions()
    imu_chain = ImuChain.create(K)
    imu_chain = imu_chain.replace(mask=imu_chain.mask.at[0].set(True))
    _, inf_vo, _ = marg.marginalize_relative(gt, obs, rig, ImuChain.create(K), opts, vio=False)
    _, inf_vio, _ = marg.marginalize_relative(gt, obs, rig, imu_chain, opts, vio=True)
    inf_vo, inf_vio = np.asarray(inf_vo, np.float64), np.asarray(inf_vio, np.float64)
    np.testing.assert_allclose(inf_vio, inf_vio.T, atol=1e-2 * np.abs(inf_vio).max())
    assert np.linalg.eigvalsh(inf_vio).min() > -1e-3 * np.abs(inf_vio).max()


def test_motion2d_factor(rng):
    """Motion2DFactor semantics: zero at exact planar motion, sensitive to
    deviation, full-rank Jacobian (residuals.hpp:10-69)."""
    from sadvio_tpu.backend import factors as F

    v, wz, dt = 1.3, 0.4, 0.5
    R_i = geo.so3_exp(jnp.asarray([0.0, 0.0, 0.7]))
    t_i = jnp.asarray([2.0, -1.0, 0.0])
    dth = wz * dt
    Rd = geo.so3_exp(jnp.asarray([0.0, 0.0, dth]))
    td = jnp.asarray([v * dt, 0.0, 0.0])
    R_j, t_j = geo.pose_compose(R_i, t_i, Rd, td)

    m2d = jnp.asarray([v, wz])
    W = jnp.eye(6)
    r = F.motion2d_residual(R_i, t_i, R_j, t_j, m2d, dt, W)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)

    R_j2, t_j2 = geo.pose_retract(R_j, t_j, jnp.asarray([0.0, 0.01, 0.0, 0.0, 0.0, 0.02]))
    r2 = F.motion2d_residual(R_i, t_i, R_j2, t_j2, m2d, dt, W)
    assert np.linalg.norm(np.asarray(r2)) > 1e-3

    def rfun(dx):
        Ra, ta = geo.pose_retract(R_i, t_i, dx[:6])
        Rb, tb = geo.pose_retract(R_j, t_j, dx[6:])
        return F.motion2d_residual(Ra, ta, Rb, tb, m2d, dt, W)

    J = np.asarray(jax.jacfwd(rfun)(jnp.zeros((12,))))
    assert np.linalg.matrix_rank(J) == 6

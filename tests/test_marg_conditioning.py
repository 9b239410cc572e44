"""Marginalization numerics under ill-conditioning (VERDICT r4 item 4).

The reference runs its whole Schur / eigendecomposition chain in Eigen
doubles with a 1e-12 rank threshold (marginalization.cpp:318-342, Ceres
solves f64); SURVEY §7 "hard parts" #3 flags the f32 port of that chain as
the numerical risk.  These tests build the risky regime explicitly -- a
near-rank-deficient system with ~1e8 information spread (IMU/prior rows vs
vision rows) -- and show:

  * naive f32 eigh-pinv BREAKS there (the small-eigenvalue subspace is
    below f32 resolution of the large entries),
  * the default Jacobi-equilibrated f32 path holds,
  * the opt-in host-f64 island (marg_f64 / marginalize(f64=True)) matches
    the numpy float64 reference computation,
  * end to end, the f32-equilibrated and f64-island priors agree under a
    KLD gate on the stressed blanket.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.backend import ba, marginalization as marg
from sadvio_tpu.data.window import ImuChain, PriorSet
from tests.test_ba import K, C, L, make_world

P = 32


def _stressed_matrix(rng, n=24, spread=1e8, deficiency=1e-4):
    """SPD matrix A = D^1/2 C D^1/2: well-conditioned core C with one
    near-zero eigenvalue (true near-deficiency), diagonal scale spread
    `spread` (the IMU-vs-vision information structure)."""
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam_c = np.linspace(1.0, 2.0, n)
    lam_c[0] = deficiency  # near-deficient direction
    C_core = (Q * lam_c) @ Q.T
    d = np.logspace(0, np.log10(spread), n)
    rng.shuffle(d)
    S = np.sqrt(d)
    A = S[:, None] * C_core * S[None, :]
    return 0.5 * (A + A.T)


def _pinv_err(X, A32):
    """Relative error vs the numpy f64 pseudo-inverse of the SAME f32-cast
    matrix (isolates algorithmic precision from representation error)."""
    ref = np.linalg.pinv(np.asarray(A32, np.float64), rcond=1e-12,
                         hermitian=True)
    return np.linalg.norm(np.asarray(X, np.float64) - ref) / np.linalg.norm(ref)


def test_f32_breaks_equilibration_and_f64_hold(rng):
    A64 = _stressed_matrix(rng)
    A32 = jnp.asarray(A64, jnp.float32)

    naive, _, _, _ = marg.rank_revealing_pinv(A32)
    eq = marg.rank_revealing_pinv_eq(A32)
    island, _, _, _ = jax.jit(marg.rr_pinv64)(A32)

    err_naive = _pinv_err(naive, A32)
    err_eq = _pinv_err(eq, A32)
    err_island = _pinv_err(island, A32)

    # the demonstration: naive f32 loses the small-eigenvalue subspace
    # entirely (measured ~1.0 relative error at this spread)
    assert err_naive > 0.5, err_naive
    # the equilibrated f32 guard holds to f32 working precision
    assert err_eq < 1e-2, err_eq
    # the island IS the f64 reference computation (measured ~3e-8)
    assert err_island < 1e-5, err_island


def test_pinv_sqrt64_matches_numpy(rng):
    A64 = _stressed_matrix(rng, n=15, spread=1e6)
    cov = np.linalg.pinv(A64, rcond=1e-12, hermitian=True)
    W = np.asarray(jax.jit(marg.pinv_sqrt64)(jnp.asarray(cov, jnp.float32)),
                   np.float64)
    # W^T W must reproduce the information matrix on its range
    I_rec = W.T @ W
    scale = np.linalg.norm(A64)
    assert np.linalg.norm(I_rec - A64) / scale < 5e-3


def _stressed_blanket(rng):
    """Window world whose marginalization blanket mixes ~1e8-information
    state-prior rows with ~1-information vision rows."""
    gt, obs, rig = make_world(rng)
    # starve the blanket: few shared landmarks -> weakly constrained Schur
    mask = np.asarray(obs.mask).copy()
    mask[1:, :, :30] = False  # 30 lonely landmarks at KF0
    obs = obs.replace(mask=jnp.asarray(mask))
    priors = PriorSet.create(K, P)
    # a crushing old 15-dof prior on slot 0: sqrt-info 1e4 -> info 1e8
    priors = priors.replace(
        sp_R=priors.sp_R.at[0].set(gt.R[0]),
        sp_t=priors.sp_t.at[0].set(gt.t[0]),
        sp_v=priors.sp_v.at[0].set(gt.v[0]),
        sp_ba=priors.sp_ba.at[0].set(gt.ba[0]),
        sp_bg=priors.sp_bg.at[0].set(gt.bg[0]),
        sp_sqrt_info=priors.sp_sqrt_info.at[0].set(jnp.eye(15) * 1e4),
        sp_mask=priors.sp_mask.at[0].set(True),
    )
    return gt, obs, rig, priors


@pytest.mark.parametrize("vio", [False, True])
def test_stressed_blanket_f32_matches_f64_island(rng, vio):
    """KLD gate: on the 1e8-spread near-deficient blanket, the guarded f32
    prior and the reference-parity f64 island produce the same Gaussian."""
    gt, obs, rig, priors = _stressed_blanket(rng)
    opts = ba.BAOptions()
    imu = ImuChain.create(K)
    p32, info32 = marg.marginalize(gt, obs, rig, imu, priors, opts,
                                   vio=vio, f64=False)
    p64, info64 = marg.marginalize(gt, obs, rig, imu, priors, opts,
                                   vio=vio, f64=True)

    # both priors vanish at the linearization point
    for p in (p32, p64):
        r = ba._dense_residuals(gt, imu, p, opts)
        assert np.isfinite(np.asarray(r)).all()
        assert np.abs(np.asarray(r)).max() < 2e-2

    if vio:
        # compare the kept-frame 15-dof priors as Gaussians (info = W^T W)
        W32 = np.asarray(p32.sp_sqrt_info[1], np.float64)
        W64 = np.asarray(p64.sp_sqrt_info[1], np.float64)
        I32, I64 = W32.T @ W32, W64.T @ W64
        kld = float(marg.kld_gaussian_info(jnp.asarray(I64, jnp.float32),
                                           jnp.asarray(I32, jnp.float32)))
        assert np.isfinite(kld) and abs(kld) < 0.5, kld
        # per-landmark relative priors agree too (median over kept slots)
        m = np.asarray(p32.plp_mask) & np.asarray(p64.plp_mask)
        if m.any():
            d = (np.asarray(p32.plp_sqrt_info)[m]
                 - np.asarray(p64.plp_sqrt_info)[m])
            rel = np.linalg.norm(d, axis=(1, 2)) / (
                np.linalg.norm(np.asarray(p64.plp_sqrt_info)[m],
                               axis=(1, 2)) + 1e-9)
            assert np.median(rel) < 0.2, np.median(rel)
    else:
        m = np.asarray(p32.ll_mask) & np.asarray(p64.ll_mask)
        assert m.sum() >= 1
        d = np.asarray(p32.ll_sqrt_info)[m] - np.asarray(p64.ll_sqrt_info)[m]
        rel = np.linalg.norm(d, axis=(1, 2)) / (
            np.linalg.norm(np.asarray(p64.ll_sqrt_info)[m], axis=(1, 2))
            + 1e-9)
        assert np.median(rel) < 0.2, np.median(rel)


@pytest.mark.parametrize("vio", [False, True])
def test_sqrt_marginal_is_psd(rng, vio):
    """The f32 square-root path's marginal Ak = R22^T R22 must be PSD even
    on the 1e8-spread stressed blanket -- the H-space Schur chain measured
    INDEFINITE here (equilibrated eigenvalues to -0.9x max), which was the
    root cause of the backend-dependent phantom priors (TPU soak 156 mm vs
    CPU 25 mm).  Regression pin for the QR route."""
    gt, obs, rig, priors = _stressed_blanket(rng)
    opts = ba.BAOptions()
    imu = ImuChain.create(K)
    new, info = marg.marginalize(gt, obs, rig, imu, priors, opts,
                                 vio=vio, f64=False)
    Ak = np.asarray(info["Ak"], np.float64)
    s, act = marg._eq_scales(jnp.asarray(Ak, jnp.float32))
    s, act = np.asarray(s, np.float64), np.asarray(act)
    As = 0.5 * (Ak + Ak.T) * s[:, None] * s[None, :] \
        * act[:, None] * act[None, :]
    lam = np.linalg.eigvalsh(As)
    assert lam.min() > -1e-4 * max(lam.max(), 1e-20), (
        f"sqrt marginal went indefinite: {lam.min():.3e} vs {lam.max():.3e}")
    assert not bool(info["degenerate"])


def test_marg_f64_in_pipeline_smoke():
    """marg_f64 wires through SLAMConfig into the jitted roll path."""
    from sadvio_tpu.pipeline import synthetic
    from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
    from sadvio_tpu.pipeline.slam import StereoSLAM

    world = synthetic.make_world(seed=4, n_frames=18, width=320, height=240,
                                 n_points=200, imu_noise=False)
    cfg = SLAMConfig(
        slam_mode="bimono", max_kf_number=5, min_lmk_number=25,
        max_movement_parallax=0.05, min_movement_parallax=0.01,
        marg_f64=True,
        caps=Capacities(K=6, L=160, P=24, pyr_levels=3, klt_radius=5))
    slam = StereoSLAM(world.rig, cfg)
    for f in world.frames:
        slam.process_frame(f)
    assert slam._have_priors  # marginalization (f64 island) actually ran
    est = np.asarray([t for _, _, t in slam.traj])
    ate = synthetic.ate_rmse(est, world.gt_t[: len(est)])
    assert ate < 0.05, ate

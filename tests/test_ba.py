"""Window BA tests on a synthetic stereo world.

Reference pattern: construct exact frames/landmarks, project to generate
perfect measurements, perturb, solve, assert recovery
(marginalization_test.cpp fixture style, residual_test.cpp solve-to-
convergence style).  Small capacities keep CPU compile time low.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.backend import ba
from sadvio_tpu.data.window import ImuChain, Observations, PriorSet, Rig, WindowState
from sadvio_tpu.models import cameras, imu as imu_mod
from sadvio_tpu.utils import geometry as geo

K, C, L, P = 4, 2, 48, 8


def make_rig():
    model = cameras.Pinhole(
        fx=jnp.full((C,), 458.0), fy=jnp.full((C,), 457.0),
        cx=jnp.full((C,), 367.0), cy=jnp.full((C,), 248.0),
    )
    R_f_s = jnp.broadcast_to(jnp.eye(3), (C, 3, 3))
    t_f_s = jnp.array([[0.0, 0.0, 0.0], [0.11, 0.0, 0.0]])  # EuRoC-ish baseline
    return Rig(cam=model, R_f_s=R_f_s, t_f_s=t_f_s)


def make_world(rng, n_kf=K, noise_px=0.0, rig=None):
    """Forward-simulate a trajectory looking at a landmark wall at z~5."""
    rig = rig if rig is not None else make_rig()
    lmk = np.zeros((L, 3), np.float32)
    lmk[:, 0] = rng.uniform(-3, 3, L)
    lmk[:, 1] = rng.uniform(-2, 2, L)
    lmk[:, 2] = rng.uniform(4, 8, L)

    Rs, ts = [], []
    for k in range(n_kf):
        w = rng.standard_normal(3) * 0.03
        Rs.append(np.asarray(geo.so3_exp(jnp.asarray(w, jnp.float32))))
        ts.append(np.array([0.3 * k, 0.05 * rng.standard_normal(), 0.0], np.float32))
    R = jnp.asarray(np.stack(Rs))
    t = jnp.asarray(np.stack(ts))

    state = WindowState.create(K, L)
    state = state.replace(
        R=R, t=t,
        kf_mask=jnp.arange(K) < n_kf,
        lmk=jnp.asarray(lmk),
        lmk_mask=jnp.ones((L,), bool),
    )

    obs = Observations.create(K, C, L)
    uv_list, m_list = [], []
    for c in range(C):
        cam_c = jax.tree.map(lambda x: x[c] if hasattr(x, "shape") and x.shape[:1] == (C,) else x, rig.cam)
        uv, valid = cameras.project_world(
            cam_c, R[:, None], t[:, None], rig.R_f_s[c], rig.t_f_s[c], state.lmk[None]
        )
        uv_list.append(uv)
        m_list.append(valid)
    uv = jnp.stack(uv_list, 1)
    mask = jnp.stack(m_list, 1) & state.kf_mask[:, None, None]
    if noise_px > 0:
        uv = uv + jnp.asarray(rng.standard_normal(uv.shape) * noise_px, jnp.float32)
    obs = obs.replace(uv=uv, mask=mask)
    return state, obs, rig


def perturb_state(rng, state, pose_sig=0.03, lmk_sig=0.05, skip_first=True):
    dp = jnp.asarray(rng.standard_normal((K, 6)) * pose_sig, jnp.float32)
    if skip_first:
        dp = dp.at[0].set(0.0)
    R2, t2 = geo.pose_retract(state.R, state.t, dp)
    lmk2 = state.lmk + jnp.asarray(rng.standard_normal((L, 3)) * lmk_sig, jnp.float32)
    return state.replace(R=R2, t=t2, lmk=lmk2)


def pose_err(sa, sb, mask):
    d = np.asarray(geo.pose_local(sa.R, sa.t, sb.R, sb.t))
    return np.abs(d[np.asarray(mask)]).max()


def test_ba_recovers_perturbation(rng):
    gt, obs, rig = make_world(rng)
    noisy = perturb_state(rng, gt)
    problem = ba.make_problem(noisy, obs, rig)
    opts = ba.BAOptions(iters=8)
    sol, stats = ba.ba_solve(problem, opts)
    assert float(stats["cost"]) < float(stats["cost0"]) * 1e-3
    assert pose_err(sol, gt, gt.kf_mask) < 1e-3
    lerr = np.abs(np.asarray(sol.lmk - gt.lmk)).max()
    assert lerr < 5e-3


def test_numeric_jacobians_match_analytic(rng):
    """Finite-difference linearization (BundleAdjustmentCERESNumeric analog)
    agrees with the hand chain rule on valid observations."""
    from sadvio_tpu.backend import factors

    gt, obs, rig = make_world(rng)
    cam0 = jax.tree.map(
        lambda x: x[0] if hasattr(x, "shape") and x.shape[:1] == (C,) else x,
        rig.cam,
    )
    args = (cam0, gt.R[:, None], gt.t[:, None], rig.R_f_s[0], rig.t_f_s[0],
            gt.lmk[None], obs.uv[:, 0], jnp.float32(1.0))
    r_a, Jp_a, Jl_a, v_a = factors.reprojection_residual(*args)
    r_n, Jp_n, Jl_n, v_n = factors.reprojection_residual_numeric(*args)
    m = np.asarray(v_a & v_n & obs.mask[:, 0])
    np.testing.assert_allclose(np.asarray(r_n)[m], np.asarray(r_a)[m], atol=1e-4)
    # f32 central differences carry cancellation noise proportional to the
    # Jacobian's overall scale -- compare against it, not element-wise rtol
    for Jn, Ja in ((Jp_n, Jp_a), (Jl_n, Jl_a)):
        Jn, Ja = np.asarray(Jn)[m], np.asarray(Ja)[m]
        assert np.max(np.abs(Jn - Ja)) < 2e-2 * (1.0 + np.max(np.abs(Ja)))


def test_ba_numeric_mode_converges(rng):
    """The numeric-diff optimizer variant solves the same window problem."""
    gt, obs, rig = make_world(rng)
    noisy = perturb_state(rng, gt)
    problem = ba.make_problem(noisy, obs, rig)
    sol, stats = ba.ba_solve(problem, ba.BAOptions(iters=8, numeric=True))
    assert float(stats["cost"]) < float(stats["cost0"]) * 1e-3
    assert pose_err(sol, gt, gt.kf_mask) < 2e-3


def test_ba_landmark_only(rng):
    """landmarkOptimization semantics: poses frozen, landmarks recovered."""
    gt, obs, rig = make_world(rng)
    noisy = gt.replace(lmk=gt.lmk + jnp.asarray(rng.standard_normal((L, 3)) * 0.1, jnp.float32))
    problem = ba.make_problem(noisy, obs, rig, lmk_only=True)
    sol, stats = ba.ba_solve(problem, ba.BAOptions(iters=6))
    np.testing.assert_allclose(np.asarray(sol.R), np.asarray(noisy.R), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol.t), np.asarray(noisy.t), atol=1e-7)
    assert np.abs(np.asarray(sol.lmk - gt.lmk)).max() < 5e-3


def test_ba_robust_to_outliers(rng):
    gt, obs, rig = make_world(rng, noise_px=0.3)
    # corrupt 10% of observations grossly
    m = np.asarray(obs.mask)
    uv = np.asarray(obs.uv).copy()
    n_bad = 0
    for (k, c, l) in zip(*np.where(m)):
        if rng.uniform() < 0.1:
            uv[k, c, l] += rng.uniform(30, 80, 2)
            n_bad += 1
    assert n_bad > 5
    obs = obs.replace(uv=jnp.asarray(uv))
    noisy = perturb_state(rng, gt, pose_sig=0.02, lmk_sig=0.03)
    problem = ba.make_problem(noisy, obs, rig)
    sol, stats = ba.ba_solve(problem, ba.BAOptions(iters=10))
    assert pose_err(sol, gt, gt.kf_mask) < 0.02


def test_ba_vio_with_imu_factors(rng):
    """IMU factors between KFs pin velocity/gravity direction.

    The world must be dynamically consistent: constant world acceleration and
    constant body rate, with poses/velocities sampled from the analytic
    trajectory (otherwise ground truth is not the MAP optimum).
    """
    dt_kf = 0.5
    params = imu_mod.ImuParams.euroc()
    g = np.array([0.0, 0.0, -imu_mod.GRAVITY])
    a_w = np.array([0.05, 0.02, 0.0])  # constant world acceleration
    w_b = np.array([0.0, 0.0, 0.2])  # constant body rate
    v0 = np.array([0.3, 0.0, 0.0])
    n = 100
    h = dt_kf / n

    # dense trajectory at IMU rate
    n_tot = (K - 1) * n + 1
    ts = np.arange(n_tot) * h
    p_d = v0 * ts[:, None] + 0.5 * a_w * ts[:, None] ** 2
    v_d = v0 + a_w * ts[:, None]
    R_d = [np.eye(3)]
    for _ in range(n_tot - 1):
        R_d.append(R_d[-1] @ np.asarray(geo.so3_exp(jnp.asarray(w_b * h, jnp.float32))))
    R_d = np.stack(R_d)

    kf_idx = np.arange(K) * n
    gt0, obs_dummy, rig = make_world(rng)  # reuse landmark wall + rig
    gt = gt0.replace(
        R=jnp.asarray(R_d[kf_idx], jnp.float32),
        t=jnp.asarray(p_d[kf_idx], jnp.float32),
        v=jnp.asarray(v_d[kf_idx], jnp.float32),
    )
    # re-render observations at the new poses
    import jax as _jax
    from sadvio_tpu.models import cameras as _cam
    uvs, ms = [], []
    for c in range(C):
        cam_c = _jax.tree.map(
            lambda x: x[c] if hasattr(x, "shape") and x.shape[:1] == (C,) else x,
            rig.cam,
        )
        uv, valid = _cam.project_world(
            cam_c, gt.R[:, None], gt.t[:, None], rig.R_f_s[c], rig.t_f_s[c],
            gt.lmk[None],
        )
        uvs.append(uv)
        ms.append(valid)
    obs = obs_dummy.replace(
        uv=jnp.stack(uvs, 1), mask=jnp.stack(ms, 1) & gt.kf_mask[:, None, None]
    )

    pres = []
    for k in range(K - 1):
        sl = slice(k * n, (k + 1) * n)
        accs = np.einsum("nij,j->ni", R_d[sl].transpose(0, 2, 1), a_w - g)
        gyrs = np.tile(w_b, (n, 1))
        pre = imu_mod.preintegrate(
            jnp.asarray(accs, jnp.float32), jnp.asarray(gyrs, jnp.float32),
            jnp.full((n,), h, jnp.float32), jnp.zeros(3), jnp.zeros(3), params,
        )
        pres.append(pre)
    pre_b = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
    imu_chain = ImuChain(pre=pre_b, mask=jnp.ones((K - 1,), bool))
    gt_vio = gt

    noisy = perturb_state(rng, gt_vio, pose_sig=0.02, lmk_sig=0.03)
    noisy = noisy.replace(v=gt_vio.v + jnp.asarray(rng.standard_normal((K, 3)) * 0.1, jnp.float32))
    problem = ba.make_problem(noisy, obs, rig, imu=imu_chain)
    sol, stats = ba.ba_solve(problem, ba.BAOptions(iters=10))
    assert float(stats["cost"]) < float(stats["cost0"])
    assert pose_err(sol, gt_vio, gt.kf_mask) < 5e-3
    verr = np.abs(np.asarray(sol.v - gt_vio.v))[np.asarray(gt.kf_mask)].max()
    assert verr < 0.05


def test_ba_retained_landmark_priors(rng):
    """Retained landmarks + chain factors participate in the dense system."""
    gt, obs, rig = make_world(rng)
    priors = PriorSet.create(K, P)
    # retain landmarks 0..3, give them absolute priors at ground truth
    slots = jnp.arange(P, dtype=jnp.int32)
    slot_mask = jnp.arange(P) < 4
    sq = jnp.broadcast_to(jnp.eye(3) * 10.0, (P, 3, 3))
    priors = priors.replace(
        prior_slots=slots, prior_slot_mask=slot_mask,
        lp_val=gt.lmk[:P], lp_sqrt_info=sq, lp_mask=slot_mask,
        # chain 0-1, 1-2 with true relative displacements
        ll_a=jnp.array([0, 1] + [0] * (P - 2), jnp.int32),
        ll_b=jnp.array([1, 2] + [0] * (P - 2), jnp.int32),
        ll_val=jnp.concatenate([
            (gt.lmk[0] - gt.lmk[1])[None], (gt.lmk[1] - gt.lmk[2])[None],
            jnp.zeros((P - 2, 3))]),
        ll_sqrt_info=sq,
        ll_mask=jnp.array([True, True] + [False] * (P - 2)),
    )
    noisy = perturb_state(rng, gt)
    problem = ba.make_problem(noisy, obs, rig, priors=priors)
    sol, stats = ba.ba_solve(problem, ba.BAOptions(iters=8))
    assert float(stats["cost"]) < float(stats["cost0"])
    assert pose_err(sol, gt, gt.kf_mask) < 2e-3
    assert np.abs(np.asarray(sol.lmk - gt.lmk)).max() < 1e-2


def test_angular_jacobian_fd(rng):
    """Finite-difference check of the angular residual Jacobians."""
    from sadvio_tpu.backend import factors

    R = geo.so3_exp(jnp.asarray(rng.standard_normal(3) * 0.2, jnp.float32))
    t = jnp.asarray(rng.standard_normal(3), jnp.float32)
    Rfs = geo.so3_exp(jnp.asarray([0.01, -0.02, 0.015], jnp.float32))
    tfs = jnp.asarray([0.1, 0.0, -0.05], jnp.float32)
    p = jnp.asarray([0.4, -0.3, 5.0], jnp.float32)
    ray = cameras.world_to_cam(R, t, Rfs, tfs, p + jnp.asarray([0.02, 0.01, -0.03]))
    ray = ray / jnp.linalg.norm(ray)
    sig = jnp.float32(1.0 / 200.0)

    r0, Jp, Jl, valid = factors.angular_residual_jac(R, t, Rfs, tfs, p, ray, sig)
    assert bool(valid)

    eps = 1e-3
    for i in range(6):
        dx = jnp.zeros(6).at[i].set(eps)
        Rp, tp = geo.pose_retract(R, t, dx)
        rp, *_ = factors.angular_residual_jac(Rp, tp, Rfs, tfs, p, ray, sig)
        Rm, tm = geo.pose_retract(R, t, -dx)
        rm, *_ = factors.angular_residual_jac(Rm, tm, Rfs, tfs, p, ray, sig)
        fd = np.asarray(rp - rm) / (2 * eps)
        np.testing.assert_allclose(np.asarray(Jp[:, i]), fd, atol=2e-2, rtol=2e-2)
    for i in range(3):
        dp = jnp.zeros(3).at[i].set(eps)
        rp, *_ = factors.angular_residual_jac(R, t, Rfs, tfs, p + dp, ray, sig)
        rm, *_ = factors.angular_residual_jac(R, t, Rfs, tfs, p - dp, ray, sig)
        fd = np.asarray(rp - rm) / (2 * eps)
        np.testing.assert_allclose(np.asarray(Jl[:, i]), fd, atol=2e-2, rtol=2e-2)


def test_ba_angular_mode(rng):
    """Window BA converges with the bearing-vector error (fisheye path)."""
    gt, obs, rig = make_world(rng)
    noisy = perturb_state(rng, gt)
    problem = ba.make_problem(noisy, obs, rig)
    sol, stats = ba.ba_solve(problem, ba.BAOptions(iters=8, angular=True))
    assert float(stats["cost"]) < float(stats["cost0"]) * 1e-3
    assert pose_err(sol, gt, gt.kf_mask) < 2e-3


def test_ba_fisheye_rig(rng):
    """Window BA on an equidistant-fisheye stereo rig: the exotic-model
    Jacobians (jacfwd, cameras.py:286) must drive the angular solver to the
    same recovery the pinhole rig reaches (AngularAdjustmentCERESAnalytic's
    use case for wide-angle lenses)."""
    fe = cameras.Fisheye(
        fx=jnp.full((C,), 240.0), fy=jnp.full((C,), 240.0),
        cx=jnp.full((C,), 320.0), cy=jnp.full((C,), 240.0),
        k1=jnp.full((C,), -0.01), k2=jnp.full((C,), 0.005),
        k3=jnp.full((C,), -0.002), k4=jnp.full((C,), 0.0005),
        width=640, height=480,
    )
    rig = Rig(
        cam=fe,
        R_f_s=jnp.broadcast_to(jnp.eye(3), (C, 3, 3)),
        t_f_s=jnp.array([[0.0, 0.0, 0.0], [0.12, 0.0, 0.0]]),
    )
    gt, obs, rig = make_world(rng, rig=rig)
    noisy = perturb_state(rng, gt)
    problem = ba.make_problem(noisy, obs, rig)
    sol, stats = ba.ba_solve(problem, ba.BAOptions(iters=10, angular=True))
    assert float(stats["cost"]) < float(stats["cost0"]) * 1e-2
    assert pose_err(sol, gt, gt.kf_mask) < 5e-3

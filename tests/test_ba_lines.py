"""Line landmarks in the window BA: linexd observations constrain POSES.

Reference parity target: localMapBA adds 4-dim linexd reprojection residuals
over (pose, line endpoints) (BundleAdjustmentCERESAnalytic.h:104-195, used at
BundleAdjustmentCERESAnalytic.cpp:273-302).  These tests build exact
line-segment observations, perturb the window, and assert that the BA pulls
poses back (a) from lines alone and (b) better than point-only on a
point-starved problem.
"""

import jax.numpy as jnp
import numpy as np

from sadvio_tpu.backend import ba
from sadvio_tpu.data.window import LineBlock, Observations
from sadvio_tpu.models import cameras
from sadvio_tpu.utils import geometry as geo
from tests.test_ba import C, K, L, make_rig, make_world, perturb_state, pose_err


def _make_lines(rng, gt, rig, M=16):
    """M random 3D segments in the landmark volume + exact projections."""
    mid = np.stack([
        rng.uniform(-2.5, 2.5, M), rng.uniform(-1.5, 1.5, M),
        rng.uniform(4.5, 7.5, M),
    ], -1)
    d = rng.standard_normal((M, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    half = rng.uniform(0.5, 1.0, (M, 1))
    ends = np.stack([mid - d * half, mid + d * half], axis=1).astype(np.float32)

    obs = np.zeros((K, C, M, 2, 2), np.float32)
    obs_mask = np.zeros((K, C, M), bool)
    for k in range(K):
        for c in range(C):
            cam = cameras.Pinhole(
                fx=rig.cam.fx[c], fy=rig.cam.fy[c],
                cx=rig.cam.cx[c], cy=rig.cam.cy[c],
            )
            vis_all = np.ones((M,), bool)
            for e in range(2):
                uv, vis = cameras.project_world(
                    cam, gt.R[k], gt.t[k], rig.R_f_s[c], rig.t_f_s[c],
                    jnp.asarray(ends[:, e]))
                obs[k, c, :, e] = np.asarray(uv)
                vis_all &= np.asarray(vis)
            obs_mask[k, c] = vis_all
    lines = LineBlock(
        ends=jnp.asarray(ends), mask=jnp.ones((M,), bool),
        obs=jnp.asarray(obs), obs_mask=jnp.asarray(obs_mask),
        probation=jnp.zeros((M,), bool),
    )
    return lines


def test_lines_alone_recover_poses(rng):
    """Pure line BA: no point observations at all; perturbed poses + line
    endpoints are pulled back by the linexd residuals (lines constrain
    poses, the round-3 verdict's top parity gap)."""
    gt, _, rig = make_world(rng)
    lines = _make_lines(rng, gt, rig, M=16)
    empty_obs = Observations.create(K, C, L)
    state0 = gt.replace(lmk_mask=jnp.zeros((L,), bool))

    noisy = perturb_state(rng, state0, pose_sig=0.02, lmk_sig=0.0)
    ends_n = lines.ends + jnp.asarray(
        rng.standard_normal(lines.ends.shape) * 0.03, jnp.float32)
    problem = ba.make_problem(noisy, empty_obs, rig)._replace(
        lines=lines.replace(ends=ends_n))
    opts = ba.BAOptions(iters=10)
    sol, stats = ba.ba_solve(problem, opts)

    assert float(stats["cost"]) < float(stats["cost0"]) * 1e-3, stats
    err0 = pose_err(state0, noisy, state0.kf_mask)
    err1 = pose_err(state0, sol, state0.kf_mask)
    assert err1 < err0 * 0.05, (err0, err1)
    # optimized endpoints returned and near the true infinite lines
    ends_s = np.asarray(stats["line_ends"])
    d = np.array(lines.ends[:, 1] - lines.ends[:, 0])
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    r0 = ends_s - np.asarray(lines.ends[:, 0])[:, None]
    perp = r0 - (r0 * d[:, None]).sum(-1, keepdims=True) * d[:, None]
    assert float(np.abs(perp).max()) < 0.02, float(np.abs(perp).max())


def test_lines_help_point_starved_ba(rng):
    """With only a handful of NOISY point observations, adding line
    observations reduces the recovered pose error (linexd beats point-only
    when points are starved -- with exact measurements both solves hit
    machine precision, so the comparison needs realistic pixel noise)."""
    gt, obs, rig = make_world(rng)
    # starve the point set: keep 10 landmarks, with 0.8 px observation noise
    keep = np.zeros((L,), bool)
    keep[:10] = True
    obs = obs.replace(
        mask=obs.mask & jnp.asarray(keep)[None, None, :],
        uv=obs.uv + jnp.asarray(
            rng.standard_normal(obs.uv.shape) * 0.8, jnp.float32),
    )
    gt_st = gt.replace(lmk_mask=gt.lmk_mask & jnp.asarray(keep))
    lines = _make_lines(rng, gt_st, rig, M=20)
    # milder noise on line endpoints (sub-px perpendicular accuracy of the
    # TLS line fit)
    lines = lines.replace(obs=lines.obs + jnp.asarray(
        rng.standard_normal(lines.obs.shape) * 0.3, jnp.float32))

    noisy = perturb_state(rng, gt_st, pose_sig=0.03, lmk_sig=0.02)
    opts = ba.BAOptions(iters=10)

    sol_pts, _ = ba.ba_solve(ba.make_problem(noisy, obs, rig), opts)
    sol_mix, _ = ba.ba_solve(
        ba.make_problem(noisy, obs, rig)._replace(lines=lines), opts)

    err_pts = pose_err(gt_st, sol_pts, gt_st.kf_mask)
    err_mix = pose_err(gt_st, sol_mix, gt_st.kf_mask)
    assert err_mix < err_pts * 0.8, (err_pts, err_mix)

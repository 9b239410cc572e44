"""Distributed BA: sharded solve must match the single-device solve.

Runs on the virtual 8-device CPU mesh from conftest.  The landmark axis is
partitioned; GSPMD inserts the psum over the reduced camera system -- the
result must be numerically identical (same program, different partitioning)
up to f32 reduction-order noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.backend import ba
from sadvio_tpu.parallel import sharding


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_ba_matches_single_device():
    import __graft_entry__ as g

    problem = g._tiny_problem(K=4, C=2, L=128, P=8)
    opts = ba.BAOptions(iters=4)

    ref_state, ref_stats = ba.ba_solve(problem, opts)
    mesh = sharding.make_mesh(8)
    sh_state, sh_stats = sharding.ba_solve_sharded(problem, opts, mesh)

    np.testing.assert_allclose(
        np.asarray(sh_state.t), np.asarray(ref_state.t), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.R), np.asarray(ref_state.R), atol=1e-4
    )
    lm = np.asarray(ref_state.lmk_mask)
    np.testing.assert_allclose(
        np.asarray(sh_state.lmk)[lm], np.asarray(ref_state.lmk)[lm], atol=1e-3
    )
    np.testing.assert_allclose(
        float(sh_stats["cost"]), float(ref_stats["cost"]), rtol=1e-3
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_placement():
    import __graft_entry__ as g

    problem = g._tiny_problem(K=4, C=2, L=128, P=8)
    mesh = sharding.make_mesh(8)
    sh = sharding.shard_problem(problem, mesh)
    # landmark-axis arrays are split over 8 devices, poses replicated
    assert len(sh.state.lmk.sharding.device_set) == 8
    assert not sh.state.lmk.sharding.is_fully_replicated
    assert sh.state.R.sharding.is_fully_replicated


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_ba_2d_mesh_matches_single_device():
    """(kf, lmk) 2-D mesh: observation table sharded on both axes."""
    import __graft_entry__ as g

    problem = g._tiny_problem(K=4, C=2, L=128, P=8)
    opts = ba.BAOptions(iters=4)

    ref_state, ref_stats = ba.ba_solve(problem, opts)
    mesh = sharding.make_mesh2d(2, 4)
    sh = sharding.shard_problem(problem, mesh)
    assert not sh.obs.uv.sharding.is_fully_replicated
    sh_state, sh_stats = ba.ba_solve(sh, opts)

    np.testing.assert_allclose(
        np.asarray(sh_state.t), np.asarray(ref_state.t), atol=1e-4
    )
    np.testing.assert_allclose(
        float(sh_stats["cost"]), float(ref_stats["cost"]), rtol=1e-3
    )

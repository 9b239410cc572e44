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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multiseq_batch_matches_individual():
    """DP axis: B independent window problems solved in one sharded batch
    must match per-problem solves."""
    import __graft_entry__ as g
    from sadvio_tpu.parallel import multiseq

    B = 8
    problems = [g._tiny_problem(K=4, C=2, L=64, P=8, seed=s) for s in range(B)]
    opts = ba.BAOptions(iters=3)

    batched = multiseq.stack_problems(problems)
    mesh = multiseq.make_seq_mesh(8)
    bstate, bstats = multiseq.ba_solve_batch(batched, opts, mesh)
    states = multiseq.unstack_states(bstate, B)

    for i in (0, 3, 7):
        ref, _ = ba.ba_solve(problems[i], opts)
        np.testing.assert_allclose(np.asarray(states[i].t), np.asarray(ref.t),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(states[i].R), np.asarray(ref.R),
                                   atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_composite_dp_lmk_mesh_matches_individual():
    """Composite (seq, lmk) mesh: DP over sequences with landmark sharding
    inside each -- the fixed-window-size scaling configuration.  Results
    must match per-problem single-device solves."""
    import __graft_entry__ as g
    from sadvio_tpu.parallel import multiseq

    B = 4
    problems = [g._tiny_problem(K=4, C=2, L=64, P=8, seed=s) for s in range(B)]
    opts = ba.BAOptions(iters=3)

    batched = multiseq.stack_problems(problems)
    mesh = multiseq.make_composite_mesh(4, 2)
    bstate, bstats = multiseq.ba_solve_batch(batched, opts, mesh)
    states = multiseq.unstack_states(bstate, B)

    for i in (0, 2, 3):
        ref, _ = ba.ba_solve(problems[i], opts)
        np.testing.assert_allclose(np.asarray(states[i].t), np.asarray(ref.t),
                                   atol=1e-4)
        lm = np.asarray(ref.lmk_mask)
        np.testing.assert_allclose(np.asarray(states[i].lmk)[lm],
                                   np.asarray(ref.lmk)[lm], atol=1e-3)


def test_pipeline_parallel_executor():
    """PP axis: the backend executor solves on its device and returns the
    same state as an inline solve; submit is non-blocking by construction."""
    import __graft_entry__ as g
    from sadvio_tpu.parallel.pipeline_parallel import BackendExecutor

    problem = g._tiny_problem(K=4, C=2, L=64, P=8)
    opts = ba.BAOptions(iters=3)
    ref, _ = ba.ba_solve(problem, opts)

    ex = BackendExecutor(device=jax.devices()[-1], opts=opts)
    ex.submit(problem)
    assert ex.busy
    with pytest.raises(RuntimeError):
        ex.submit(problem)
    state, stats = ex.collect(to_device=jax.devices()[0])
    assert not ex.busy
    np.testing.assert_allclose(np.asarray(state.t), np.asarray(ref.t), atol=1e-4)
    assert state.t.devices() == {jax.devices()[0]}
    with pytest.raises(RuntimeError):
        ex.collect()

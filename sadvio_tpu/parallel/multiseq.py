"""Data-parallel multi-sequence bundle adjustment.

The DP axis of SURVEY.md 2.7's parallelism mapping: B independent window
problems (separate trajectories / map partitions / serving requests) solved
simultaneously, one batch row per device slot.  The reference processes one
sequence per process (cpp/main.cpp) and has no equivalent; on TPU the same
jitted LM solver vmaps over the batch and the mesh shards it -- zero
collectives on the critical path (the problems are independent), so scaling
efficiency is bounded only by load balance.

Use cases: multi-robot mapping backends, dataset-scale offline BA (one window
per row), throughput serving of VIO sessions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sadvio_tpu.backend import ba


def make_seq_mesh(n_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), ("seq",))


def stack_problems(problems):
    """Stack B same-shape BAProblems into one batched problem pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *problems)


def unstack_states(state, B):
    return [jax.tree.map(lambda x: x[i], state) for i in range(B)]


def ba_solve_batch(batched_problem, opts: ba.BAOptions, mesh: Mesh | None = None):
    """Solve B window problems at once; batch axis sharded over ``mesh``.

    Returns (batched_state, batched_stats).  With a mesh, every leaf's
    leading axis is placed on the "seq" axis; XLA runs each device's rows
    locally and no cross-device traffic occurs.
    """
    if mesh is not None:
        shard = NamedSharding(mesh, P("seq"))
        batched_problem = jax.tree.map(
            lambda x: jax.device_put(x, shard) if hasattr(x, "shape") and x.ndim >= 1
            else x,
            batched_problem,
        )
    solve = jax.vmap(lambda p: ba._ba_solve_impl(p, opts, opts.iters))
    return solve(batched_problem)

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


def make_composite_mesh(n_seq, n_lmk, devices=None):
    """2-D (seq, lmk) mesh: DP over sequences x landmark sharding inside
    each sequence's window BA.

    The fixed-window-size answer to the scaling bar (SCALING.md): the seq
    axis is embarrassingly parallel (zero collectives), so the composite
    efficiency at dp*nl chips equals the lmk-only efficiency at nl chips --
    e.g. 4x2 runs 8 chips at E(2)=0.88 instead of lmk-only E(8)=0.52.
    """
    devices = devices if devices is not None else jax.devices()
    n = n_seq * n_lmk
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(n_seq, n_lmk), ("seq", "lmk"))


def stack_problems(problems):
    """Stack B same-shape BAProblems into one batched problem pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *problems)


def unstack_states(state, B):
    return [jax.tree.map(lambda x: x[i], state) for i in range(B)]


def ba_solve_batch(batched_problem, opts: ba.BAOptions, mesh: Mesh | None = None):
    """Solve B window problems at once; batch axis sharded over ``mesh``.

    Returns (batched_state, batched_stats).  With a 1-D ("seq",) mesh,
    every leaf's leading axis is placed on the seq axis; XLA runs each
    device's rows locally and no cross-device traffic occurs.  With a 2-D
    ("seq", "lmk") composite mesh (make_composite_mesh), the landmark axes
    additionally shard inside each sequence -- DP x TP at fixed window
    size; the only collectives are each sub-BA's lmk psums, confined to
    its lmk sub-axis.
    """
    if mesh is not None:
        shard = NamedSharding(mesh, P("seq"))
        batched_problem = jax.tree.map(
            lambda x: jax.device_put(x, shard) if hasattr(x, "shape") and x.ndim >= 1
            else x,
            batched_problem,
        )
        if "lmk" in mesh.axis_names:
            from sadvio_tpu.data.window import Observations

            on = lambda *spec: NamedSharding(mesh, P(*spec))
            st = batched_problem.state
            st = st.replace(
                lmk=jax.device_put(st.lmk, on("seq", "lmk", None)),
                lmk_mask=jax.device_put(st.lmk_mask, on("seq", "lmk")),
                lmk_flags=jax.device_put(st.lmk_flags, on("seq", "lmk")),
            )
            obs = Observations(
                uv=jax.device_put(
                    batched_problem.obs.uv, on("seq", None, None, "lmk", None)),
                mask=jax.device_put(
                    batched_problem.obs.mask, on("seq", None, None, "lmk")),
            )
            batched_problem = batched_problem._replace(state=st, obs=obs)
    solve = jax.vmap(lambda p: ba._ba_solve_impl(p, opts, opts.iters))
    return solve(batched_problem)

"""Multi-device sharding of the sliding-window BA.

The reference has no distributed backend (SURVEY.md 2.7): its parallelism is
POSIX threads.  Here the factor graph is partitioned over a
`jax.sharding.Mesh`:

* `lmk` axis -- landmarks (and their observation columns) are sharded across
  devices: per-landmark Schur elimination is embarrassingly parallel, exactly
  mirroring the reference's per-landmark block structure
  (marginalization.cpp:234-248).  The reduced camera system (K*15 + P*3 dims)
  is produced by einsum contractions over the sharded axis, which GSPMD
  lowers to local partial sums + one psum over ICI -- the only collective on
  the critical path.
* `cam` axis (optional) -- camera/observation rows for multi-camera rigs.

Multi-host: the same code runs under jax.distributed with a global mesh; the
reduced system stays replicated, so cross-host traffic is O((K*D)^2) per
iteration regardless of landmark count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sadvio_tpu.backend import ba
from sadvio_tpu.data.window import ImuChain, Observations, PriorSet, Rig, WindowState


def make_mesh(n_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), ("lmk",))


def make_mesh2d(n_kf, n_lmk, devices=None):
    """2-D mesh (kf, lmk): keyframe axis x landmark axis.

    For windows big enough that the observation table (K,C,L,2) dwarfs one
    device, both table axes shard; the reduced camera system psums over the
    lmk axis and the (K,K,6,6) Schur correction contracts across the kf
    axis.  Keep n_kf small (the reduced solve replicates over it).
    """
    devices = devices if devices is not None else jax.devices()
    n = n_kf * n_lmk
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(n_kf, n_lmk), ("kf", "lmk"))


def shard_problem(problem: ba.BAProblem, mesh: Mesh) -> ba.BAProblem:
    """Place the problem's arrays on the mesh.

    Landmark-sized axes always shard on the mesh's ``lmk`` axis.  On a 2-D
    (kf, lmk) mesh the observation table additionally shards its keyframe
    axis, so each device holds a (K/nk, C, L/nl) tile; GSPMD then reduces
    the per-tile normal-equation contributions over both axes.  Keyframe
    state itself stays replicated (K*15 floats -- smaller than one
    collective's latency is worth).
    """
    two_d = "kf" in mesh.axis_names
    kf_ax = "kf" if two_d else None
    rep = NamedSharding(mesh, P())
    on_l = lambda *spec: NamedSharding(mesh, P(*spec))

    state = problem.state
    state = state.replace(
        R=jax.device_put(state.R, rep), t=jax.device_put(state.t, rep),
        v=jax.device_put(state.v, rep), ba=jax.device_put(state.ba, rep),
        bg=jax.device_put(state.bg, rep),
        kf_mask=jax.device_put(state.kf_mask, rep),
        ts=jax.device_put(state.ts, rep),
        lmk=jax.device_put(state.lmk, on_l("lmk")),
        lmk_mask=jax.device_put(state.lmk_mask, on_l("lmk")),
        lmk_flags=jax.device_put(state.lmk_flags, on_l("lmk")),
    )
    obs = Observations(
        uv=jax.device_put(problem.obs.uv, on_l(kf_ax, None, "lmk")),
        mask=jax.device_put(problem.obs.mask, on_l(kf_ax, None, "lmk")),
    )
    rig = jax.tree.map(lambda x: jax.device_put(x, rep), problem.rig)
    imu = jax.tree.map(lambda x: jax.device_put(x, rep), problem.imu)
    priors = jax.tree.map(lambda x: jax.device_put(x, rep), problem.priors)
    # line landmarks stay replicated: M is small (tens) and their residual
    # rows enter the dense (replicated) system, not the sharded Schur path
    lines = (None if problem.lines is None else
             jax.tree.map(lambda x: jax.device_put(x, rep), problem.lines))
    return ba.BAProblem(
        state, obs, rig, imu, priors,
        jax.device_put(problem.fixed_mask, rep),
        jax.device_put(problem.opt_lmk_only, rep),
        lines=lines,
    )


def ba_solve_sharded(problem: ba.BAProblem, opts: ba.BAOptions, mesh: Mesh,
                     shard_dense: bool = False):
    """Distributed window BA: same solver, GSPMD-partitioned over the mesh.

    jit infers the partitioning from the argument shardings; no explicit
    collectives are written -- XLA inserts the psum over the lmk axis when the
    reduced system contracts over L.

    shard_dense=True additionally shards the dense small-factor Jacobian's
    residual-row axis over the mesh (BAOptions.dense_shard), dividing the
    replicated t_red term -- but the GSPMD-partitioned factor graph pays
    ~5 MB/iter of resharding collectives for it (measured, SCALING.md), a
    wash at the benchmark window size.  For fixed-window scaling use the
    composite DP x lmk mesh (parallel.multiseq.make_composite_mesh)
    instead; shard_dense is kept for large-K windows where t_dense grows
    quadratically and the trade flips.
    """
    if shard_dense:
        opts = opts.replace(dense_shard=NamedSharding(mesh, P("lmk", None)))
    return ba.ba_solve(shard_problem(problem, mesh), opts)

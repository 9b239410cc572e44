"""Sequence-parallel IMU preintegration: shard the 200 Hz sample stream
along TIME across a device mesh.

This is the SP/CP axis of SURVEY.md §2.7: the reference compresses the IMU
stream with a strictly sequential per-sample loop (one mutex-guarded
accumulation per sample, reference: cpp/src/data/sensors/IMU.cpp:5-91).
Here preintegration is a monoid: each device reduces its local chunk of
samples to a `ChunkSummary` (log-depth associative scans, MXU-batched 3x3 /
9x9 / 15x15 matmuls), then the D per-chunk summaries — a few hundred bytes
each — are all-gathered over ICI and folded with the composition law
`imu.combine_summary`.  Communication is O(D) tiny states per keyframe
interval, independent of sample count; compute scales as N/D per device.

The same `ChunkSummary` algebra also powers incremental host-side use: a
running summary can be extended sample-by-sample or chunk-by-chunk and
converted to a `Preintegration` at keyframe boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sadvio_tpu.models import imu as imu_mod


def make_time_mesh(n_devices=None, devices=None) -> Mesh:
    """1-D mesh whose single axis ``t`` shards the IMU sample stream."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), ("t",))


def preintegrate_time_sharded(acc, gyr, dt, ba, bg, params: imu_mod.ImuParams,
                              mesh: Mesh) -> imu_mod.Preintegration:
    """Distributed equivalent of `imu.preintegrate` over a time-sharded mesh.

    acc/gyr: (N,3), dt: (N,) with N divisible by the mesh size; padding
    samples (dt == 0) are exact no-ops so any interval fits one compiled
    shape.  Output is replicated (identical on every device).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = acc.shape[0]
    if n % n_dev:
        raise ValueError(f"sample count {n} not divisible by mesh size {n_dev}")

    def local(acc_l, gyr_l, dt_l, ba_r, bg_r, params_r):
        s = imu_mod.chunk_summary(acc_l, gyr_l, dt_l, ba_r, bg_r, params_r)
        # (D, ...) per-chunk summaries, tiny — one all_gather over ICI
        gathered = jax.lax.all_gather(s, axis)
        first = jax.tree.map(lambda l: l[0], gathered)
        rest = jax.tree.map(lambda l: l[1:], gathered)
        total, _ = jax.lax.scan(
            lambda c, x: (imu_mod.combine_summary(c, x), jnp.zeros(())),
            first, rest)
        return total

    # check_vma=False: the fold over the all_gathered summaries is identical
    # on every device (truly replicated), which the varying-axis checker
    # cannot infer through lax.scan.
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    ))
    summary = fn(acc, gyr, dt, ba, bg, params)
    return imu_mod.summary_to_preintegration(summary, ba, bg)

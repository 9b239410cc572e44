"""Batched Gauss-Newton pose-graph optimization over NFR relative edges.

Consumer of the edges `marginalize_relative` archives (reference:
BundleAdjustmentCERESAnalytic.cpp:665-809 produces Relative6DPose factors;
the reference repo never ships an optimizer over them -- this completes the
story so the archived global map can be corrected by loop closures).

Design: fixed edge/node capacities with masks; residuals are the whitened
relative-pose retraction errors (backend.factors.relative_pose_residual);
the normal system is assembled with one jacfwd over the stacked node deltas
and solved densely (M nodes -> 6M x 6M; archives of a few hundred KFs are
small dense problems the MXU eats).  Node 0 is gauge-fixed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sadvio_tpu.backend import factors as F
from sadvio_tpu.utils import geometry as geo


def inflate_edge_info(inf, P_a, P_b, eps=1e-12):
    """Weight an NFR edge by its endpoints' frame-rate pose covariance.

    The reference propagates the ESKF posterior `_dT_cov` into the frame
    covariance chain (ESKFEstimator.cpp:178, localmap.cpp:93-135); here the
    same signal reaches the pose graph: edge covariance = NFR covariance +
    P_a + P_b on the shared [omega, nu] chart, so a high-uncertainty
    keyframe yields a weaker edge.  numpy (host, per-KF-rate)."""
    import numpy as np

    inf = np.asarray(inf, np.float64)
    cov = np.linalg.pinv(0.5 * (inf + inf.T))
    cov = cov + np.asarray(P_a, np.float64) + np.asarray(P_b, np.float64)
    out = np.linalg.pinv(0.5 * (cov + cov.T) + eps * np.eye(6))
    return (0.5 * (out + out.T)).astype(np.float64)


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(R, t, node_mask, ea, eb, dx, sqrt_inf, edge_mask,
                        iters: int = 10, damping: float = 1e-6):
    """Gauss-Newton over SE(3) nodes with relative-pose edges.

    R (M,3,3), t (M,3): initial node poses (world-from-body).
    ea/eb (E,) int32: edge endpoints; dx (E,6): measured retraction a->b;
    sqrt_inf (E,6,6): whitening (e.g. cholesky/eigh sqrt of the NFR info).
    Node 0 is held fixed (gauge).  Returns (R, t, final_cost).
    """
    M = R.shape[0]
    # nodes no live edge touches cannot be corrected; leaving them "free"
    # puts damping-scale (1e-6) diagonal blocks next to edge-information
    # blocks (often 1e6+) in one H -- a 1e12 condition number that NaNs the
    # f32 solve.  Clamp them to identity rows like the gauge node.
    touched = jnp.zeros((M,), bool)
    touched = touched.at[jnp.where(edge_mask, ea, M)].set(True, mode="drop")
    touched = touched.at[jnp.where(edge_mask, eb, M)].set(True, mode="drop")
    free = node_mask & (jnp.arange(M) > 0) & touched

    def residuals(dz, Rc, tc):
        d = dz.reshape(M, 6) * free[:, None]
        Rn, tn = geo.pose_retract(Rc, tc, d)
        r = jax.vmap(F.relative_pose_residual)(
            Rn[ea], tn[ea], Rn[eb], tn[eb], dx, sqrt_inf
        )
        return jnp.where(edge_mask[:, None], r, 0.0).reshape(-1)

    def step(carry, _):
        Rc, tc = carry
        z0 = jnp.zeros((M * 6,), t.dtype)
        J = jax.jacfwd(residuals)(z0, Rc, tc)
        r = residuals(z0, Rc, tc)
        H = J.T @ J + damping * jnp.eye(M * 6, dtype=t.dtype)
        # clamp fixed/inactive node blocks to identity rows
        fixed = ~jnp.repeat(free, 6)
        H = jnp.where(fixed[:, None] | fixed[None, :],
                      jnp.eye(M * 6, dtype=t.dtype), H)
        g = jnp.where(fixed, 0.0, J.T @ r)
        dz = -jnp.linalg.solve(H, g)
        d = dz.reshape(M, 6) * free[:, None]
        Rn, tn = geo.pose_retract(Rc, tc, d)
        return (Rn, tn), jnp.sum(r * r)

    (Rf, tf), costs = jax.lax.scan(step, (R, t), None, length=iters)
    return Rf, tf, costs[-1]


def edges_from_archive(pose_graph_edges, kf_ts, dtype=jnp.float32):
    """Pack StereoSLAM.pose_graph_edges into optimize_pose_graph inputs.

    pose_graph_edges: list of (ts0, ts1, dx (6,), inf (6,6)) as archived by
    the pipeline; kf_ts: the node timestamps (archive order).  Timestamps
    absent from kf_ts are dropped.  Returns (ea, eb, dx, sqrt_inf, mask).
    """
    import numpy as np

    from sadvio_tpu.backend.marginalization import sqrt_psd

    # prefer the FIRST occurrence of a timestamp: when a keyframe appears
    # both as an archived node and (still) in the live window, loop-closure
    # edges must anchor to the archived (drift-free-at-archive-time) copy
    idx = {}
    for i, ts in enumerate(kf_ts):
        idx.setdefault(float(ts), i)
    ea, eb, dxs, infs = [], [], [], []
    for ts0, ts1, d, inf in pose_graph_edges:
        if float(ts0) in idx and float(ts1) in idx:
            ea.append(idx[float(ts0)])
            eb.append(idx[float(ts1)])
            dxs.append(np.asarray(d, np.float32))
            infs.append(np.asarray(inf, np.float32))
    if not ea:
        z = jnp.zeros((0,), jnp.int32)
        return z, z, jnp.zeros((0, 6), dtype), jnp.zeros((0, 6, 6), dtype), jnp.zeros((0,), bool)
    W = jax.vmap(sqrt_psd)(jnp.asarray(np.stack(infs), dtype))
    return (
        jnp.asarray(ea, jnp.int32), jnp.asarray(eb, jnp.int32),
        jnp.asarray(np.stack(dxs), dtype), W,
        jnp.ones((len(ea),), bool),
    )

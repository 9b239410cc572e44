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


def _np_so3_exp(w):
    import numpy as np

    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def _np_so3_log(R):
    import numpy as np

    c = np.clip((np.trace(R) - 1) / 2, -1.0, 1.0)
    th = np.arccos(c)
    if th < 1e-9:
        return np.zeros(3)
    if th > np.pi - 1e-3:
        # near-pi branch: the antisymmetric extraction divides by sin(th)~0;
        # recover the axis from the symmetric part instead ((R+I)/2 -> aa^T
        # at th=pi), signs from the largest column
        A = (R + np.eye(3)) / 2
        i = int(np.argmax(np.diag(A)))
        a = A[:, i] / max(np.sqrt(max(A[i, i], 0.0)), 1e-12)
        a = a / max(np.linalg.norm(a), 1e-12)
        return th * a
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return th / (2 * np.sin(th)) * w


def compose_edge(dx_ab, inf_ab, dx_bc, inf_bc):
    """Compose consecutive relative-pose edges a->b, b->c into one a->c.

    Measurement: T_ac = T_ab T_bc on the (omega, nu) chart used by the NFR
    edges (dx = [log(Ra^T Rb), Ra^T (tb - ta)]).  Information: first-order
    covariance composition cov_ac = cov_ab + Ad_ab cov_bc Ad_ab^T with the
    SE(3) adjoint -- the standard chain rule for node removal in pose-graph
    sparsification (conservative: correlations between the two edges are
    dropped).  numpy, host-side (compaction runs at most once per KF)."""
    import numpy as np

    dx_ab = np.asarray(dx_ab, np.float64)
    dx_bc = np.asarray(dx_bc, np.float64)
    R_ab = _np_so3_exp(dx_ab[:3])
    R_bc = _np_so3_exp(dx_bc[:3])
    t_ab, t_bc = dx_ab[3:], dx_bc[3:]
    w_ac = _np_so3_log(R_ab @ R_bc)
    t_ac = t_ab + R_ab @ t_bc
    dx_ac = np.concatenate([w_ac, t_ac])

    def cov_of(inf):
        inf = np.asarray(inf, np.float64)
        return np.linalg.pinv(0.5 * (inf + inf.T))

    tx = np.array([
        [0, -t_ab[2], t_ab[1]], [t_ab[2], 0, -t_ab[0]],
        [-t_ab[1], t_ab[0], 0]])
    Ad = np.zeros((6, 6))
    Ad[:3, :3] = R_ab
    Ad[3:, 3:] = R_ab
    Ad[3:, :3] = tx @ R_ab
    cov = cov_of(inf_ab) + Ad @ cov_of(inf_bc) @ Ad.T
    inf = np.linalg.pinv(0.5 * (cov + cov.T) + 1e-12 * np.eye(6))
    return dx_ac, 0.5 * (inf + inf.T)


def compact_archive(nodes, edges, keep_last):
    """Bound the archived pose graph: remove the oldest chain-interior
    nodes until len(nodes) <= keep_last, composing each removed node's two
    incident chain edges into one (compose_edge).

    Protected (never removed): node 0 (gauge anchor), the newest node, and
    any endpoint of a non-chain (loop-closure / cross-gap) edge -- removing
    those would discard exactly the constraints worth keeping.  The cap is
    therefore soft when many closures exist.

    Returns (nodes, edges, remap) where remap (old_len,) int32 maps old
    archive indices to new ones (removed nodes map to their surviving left
    neighbor) -- apply it to any stored provenance (e.g. GlobalMap.src).
    """
    import numpy as np

    n_old = len(nodes)
    if n_old <= keep_last:
        return nodes, edges, np.arange(n_old, dtype=np.int32)
    pos = {}
    for i, (ts, _, _) in enumerate(nodes):
        pos.setdefault(float(ts), i)
    chain = {}  # left-node ts -> edge spanning (pos p, pos p+1)
    other = []  # loop edges + edges naming unknown/duplicate nodes
    protected = set()
    for e in edges:
        i, j = pos.get(float(e[0])), pos.get(float(e[1]))
        if i is not None and j == i + 1 and float(e[0]) not in chain:
            chain[float(e[0])] = e
        else:
            other.append(e)
            protected |= {float(e[0]), float(e[1])}
    order = [float(ts) for ts, _, _ in nodes]
    keep = [True] * n_old
    removed = 0
    k = 1
    while removed < n_old - keep_last and k < n_old - 1:
        ts_b = order[k]
        if ts_b in protected:
            k += 1
            continue
        a = k - 1
        while a > 0 and not keep[a]:
            a -= 1
        ts_a, ts_c = order[a], order[k + 1]
        e_ab = chain.pop(ts_a, None)
        e_bc = chain.pop(ts_b, None)
        if e_ab is not None and e_bc is not None:
            dx, inf = compose_edge(e_ab[2], e_ab[3], e_bc[2], e_bc[3])
            chain[ts_a] = (e_ab[0], e_bc[1], dx, inf)
        elif e_ab is not None:
            # dangling half-chain (the b->c edge never existed, e.g. an
            # uninformative marginalization): re-keying keeps a->b's info
            # addressable if c is removed later, but the edge now dangles --
            # drop it with its node
            pass
        keep[k] = False
        removed += 1
        k += 1
    new_nodes = [nodes[i] for i in range(n_old) if keep[i]]
    new_edges = list(chain.values()) + other
    remap = np.zeros((n_old,), np.int32)
    new_i = 0
    prev_surv = 0
    for i in range(n_old):
        if keep[i]:
            remap[i] = new_i
            prev_surv = new_i
            new_i += 1
        else:
            remap[i] = prev_surv
    return new_nodes, new_edges, remap


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

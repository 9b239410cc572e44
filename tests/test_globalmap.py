"""Global map archive + resurrection tests (globalmap.cpp +
recoverFeatureFromMapLandmarks semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.data import globalmap as gmod
from sadvio_tpu.models import cameras


def test_archive_ring(rng):
    gm = gmod.GlobalMap.create(capacity=8)
    pos = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)
    desc = jnp.asarray(rng.integers(0, 2**31, (5, 8)), jnp.uint32)
    alive = jnp.asarray([True, False, True, True, True])
    gm = gmod.archive(gm, pos, desc, alive)
    assert int(gm.mask.sum()) == 4
    assert int(gm.head) == 4
    # wrap-around
    gm = gmod.archive(gm, pos, desc, jnp.ones(5, bool))
    assert int(gm.head) == (4 + 5) % 8
    assert int(gm.mask.sum()) == 8


def test_resurrection(rng):
    cam = cameras.make_pinhole(200.0, 200.0, 160.0, 120.0, 320, 240)
    L = 30
    pts = jnp.asarray(np.stack([
        rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L), rng.uniform(4, 8, L)
    ], -1), jnp.float32)
    desc = jnp.asarray(rng.integers(0, 2**31, (L, 8)), jnp.uint32)
    gm = gmod.GlobalMap.create(capacity=64)
    gm = gmod.archive(gm, pts, desc, jnp.ones(L, bool), src_idx=jnp.int32(3))

    # current view at identity; detections = true projections of first 10
    uv, vis = cameras.project_world(
        cam, jnp.eye(3), jnp.zeros(3), jnp.eye(3), jnp.zeros(3), pts
    )
    det_uv = uv[:10] + 1.0  # detector jitter within the search box
    det_desc = desc[:10]
    lmk, hit, src = gmod.resurrect(
        gm, cam, jnp.eye(3), jnp.zeros(3), jnp.eye(3), jnp.zeros(3),
        det_uv, det_desc, jnp.ones(10, bool),
    )
    h = np.asarray(hit)
    assert h.sum() >= 8
    np.testing.assert_allclose(
        np.asarray(lmk)[h], np.asarray(pts[:10])[h], atol=1e-6
    )
    # provenance: every hit carries the archiving-KF index
    assert (np.asarray(src)[h] == 3).all()

    # detections with unknown descriptors must not resurrect
    bad_desc = jnp.asarray(rng.integers(0, 2**31, (10, 8)), jnp.uint32)
    _, hit2, _ = gmod.resurrect(
        gm, cam, jnp.eye(3), jnp.zeros(3), jnp.eye(3), jnp.zeros(3),
        det_uv, bad_desc, jnp.ones(10, bool),
    )
    assert np.asarray(hit2).sum() <= 2

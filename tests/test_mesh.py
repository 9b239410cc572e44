"""Densification tests (reference pattern: mesh_test.cpp synthetic fixtures).

A textured fronto-parallel plane is rendered into both cameras of a stereo
rig; the mesh over its landmarks must survive all filters and the ray-cast
cloud must lie on the plane.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.data.window import Rig, WindowState
from sadvio_tpu.mesh import mesh as mesh_mod
from sadvio_tpu.models import cameras

W, H = 160, 120


@pytest.fixture(scope="module")
def plane_world():
    rng = np.random.default_rng(11)
    model = cameras.Pinhole(
        fx=jnp.full((2,), 120.0), fy=jnp.full((2,), 120.0),
        cx=jnp.full((2,), W / 2), cy=jnp.full((2,), H / 2),
        width=W, height=H,
    )
    rig = Rig(
        cam=model,
        R_f_s=jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        t_f_s=jnp.asarray([[0.0, 0.0, 0.0], [0.11, 0.0, 0.0]], jnp.float32),
    )
    # landmarks on the z=3 plane, jittered grid
    gx, gy = np.meshgrid(np.linspace(-1.5, 1.5, 6), np.linspace(-1.1, 1.1, 5))
    pts = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)
    pts += rng.uniform(-0.05, 0.05, pts.shape)
    lmk = np.concatenate([pts, np.full((len(pts), 1), 3.0)], -1).astype(np.float32)

    # textured images: dense random splat field on the same plane
    tex = np.stack([
        rng.uniform(-1.8, 1.8, 4000), rng.uniform(-1.4, 1.4, 4000),
        np.full(4000, 3.0),
    ], -1).astype(np.float32)
    inten = rng.uniform(1.5, 8.0, 4000).astype(np.float32)  # low amp: 4000 overlapping halos must not clip to 255 (constant patches kill ZNCC)

    from sadvio_tpu.pipeline.synthetic import render_view

    imgs = jnp.stack([
        render_view(
            jnp.float32(120.0), jnp.asarray([W / 2, H / 2], jnp.float32),
            jnp.eye(3), jnp.zeros(3), rig.R_f_s[c], rig.t_f_s[c],
            jnp.asarray(tex), jnp.asarray(inten), W, H,
        )
        for c in range(2)
    ])

    L = len(lmk)
    state = WindowState.create(2, L).replace(
        lmk=jnp.asarray(lmk), lmk_mask=jnp.ones((L,), bool),
        kf_mask=jnp.asarray([True, False]),
    )
    return rig, state, imgs


def test_delaunay_topology(plane_world):
    rig, state, imgs = plane_world
    cam0 = jax.tree.map(lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x, rig.cam)
    uv, vis = cameras.project_world(
        cam0, jnp.eye(3), jnp.zeros(3), rig.R_f_s[0], rig.t_f_s[0], state.lmk
    )
    tri, mask = mesh_mod.delaunay_triangles(np.asarray(uv), np.asarray(vis), 128)
    assert mask.sum() >= 30  # ~2*(n-2) triangles for 30 grid points
    assert tri[mask].max() < state.L


def test_filters_keep_plane_mesh(plane_world):
    rig, state, imgs = plane_world
    cam0 = jax.tree.map(lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x, rig.cam)
    uv, vis = cameras.project_world(
        cam0, jnp.eye(3), jnp.zeros(3), rig.R_f_s[0], rig.t_f_s[0], state.lmk
    )
    tri_np, mask_np = mesh_mod.delaunay_triangles(np.asarray(uv), np.asarray(vis), 128)
    tri = jnp.asarray(tri_np)
    mask = jnp.asarray(mask_np)
    cfg = mesh_mod.MeshConfig(max_edge_len=1.5)
    m2 = mesh_mod.filter_triangles(
        state.lmk, state.lmk_mask, tri, mask, cam0,
        jnp.eye(3), jnp.zeros(3), rig.R_f_s[0], rig.t_f_s[0], cfg,
    )
    # grid triangles are well-shaped; most must survive
    assert int(jnp.sum(m2)) > 0.5 * int(mask.sum())
    # fronto-parallel plane: normals point at the camera
    m3 = mesh_mod.normal_consistency(state.lmk, tri, m2, jnp.zeros(3), 0.2)
    np.testing.assert_array_equal(np.asarray(m3), np.asarray(m2))


def test_zncc_and_raycast(plane_world):
    rig, state, imgs = plane_world
    cam0 = jax.tree.map(lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x, rig.cam)
    cam1 = jax.tree.map(lambda x: x[1] if hasattr(x, "shape") and x.ndim > 0 else x, rig.cam)
    uv, vis = cameras.project_world(
        cam0, jnp.eye(3), jnp.zeros(3), rig.R_f_s[0], rig.t_f_s[0], state.lmk
    )
    tri_np, mask_np = mesh_mod.delaunay_triangles(np.asarray(uv), np.asarray(vis), 128)
    tri = jnp.asarray(tri_np)
    mask = jnp.asarray(mask_np)
    cfg = mesh_mod.MeshConfig(max_edge_len=1.5, max_ray_depth=5.0)
    mask = mesh_mod.filter_triangles(
        state.lmk, state.lmk_mask, tri, mask, cam0,
        jnp.eye(3), jnp.zeros(3), rig.R_f_s[0], rig.t_f_s[0], cfg,
    )
    m_z = mesh_mod.zncc_validate(
        imgs[0], imgs[1], state.lmk, tri, mask, cam0, cam1,
        jnp.eye(3), jnp.zeros(3), rig.R_f_s[0], rig.t_f_s[0],
        rig.R_f_s[1], rig.t_f_s[1], 0.5, 5,
    )
    # correct-depth plane: the homography warp must correlate
    assert int(jnp.sum(m_z)) > 0.6 * int(jnp.sum(mask))

    # wrong geometry must fail ZNCC.  The shift must produce misregistration
    # larger than the texture autocorrelation length (the halo blobs have
    # sigma 5 px): z 3 -> 1.2 m gives ~7.7 px of warp error.
    bad_lmk = state.lmk.at[:, 2].add(-1.8)
    m_bad = mesh_mod.zncc_validate(
        imgs[0], imgs[1], bad_lmk, tri, mask, cam0, cam1,
        jnp.eye(3), jnp.zeros(3), rig.R_f_s[0], rig.t_f_s[0],
        rig.R_f_s[1], rig.t_f_s[1], 0.5, 5,
    )
    assert int(jnp.sum(m_bad)) < 0.5 * int(jnp.sum(m_z)) + 1

    pts, valid = mesh_mod.raycast_pointcloud(
        state.lmk, tri, m_z, cam0, jnp.eye(3), jnp.zeros(3),
        rig.R_f_s[0], rig.t_f_s[0], stride=6, height=H, width=W,
        min_depth=0.25, max_depth=5.0,
    )
    assert int(jnp.sum(valid)) > 50
    z = np.asarray(pts)[np.asarray(valid)][:, 2]
    np.testing.assert_allclose(z, 3.0, atol=0.02)


def test_mesher_end_to_end(plane_world):
    rig, state, imgs = plane_world
    mesher = mesh_mod.Mesher(rig, mesh_mod.MeshConfig(max_edge_len=1.5), tri_cap=128)
    tri, mask = mesher.update(imgs, state, jnp.eye(3), jnp.zeros(3))
    assert int(jnp.sum(mask)) > 10
    cloud = mesher.dense_points()
    assert len(cloud) > 50
    np.testing.assert_allclose(cloud[:, 2], 3.0, atol=0.05)

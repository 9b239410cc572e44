"""Mesh-based densification: Delaunay mesh over landmarks -> dense cloud.

TPU-native re-design of the reference Mesher/Mesh3D pair
(reference: cpp/src/data/mesh/mesher.cpp -- own detached thread consuming a
KF queue:47-97, createMesh2D cv::Subdiv2D Delaunay over in-map landmarks
<= 10 m:134-165; cpp/src/data/mesh/mesh.cpp -- triangle geometry gates
(angles 20-160 deg, max edge length):188-221, photometric ZNCC validation by
plane-induced homography patch warp:256-430, normal-consistency filter
:100-138, projectMesh:223, generatePointCloud every-6th-pixel ray cast on 4
threads:539-700).

Division of labor (TPU-first):
* Host: Delaunay *topology only* (scipy.spatial.Delaunay on the projected
  2D landmark positions) -> fixed-capacity triangle index array.  This is
  the only data-dependent, pointer-ish step; everything downstream is
  fixed-shape device math.
* Device: every filter and the dense ray cast are batched kernels --
  triangles are rows of a (T,3) slot-index array, pixels of the sample grid
  are a dense (Hs,Ws) lattice, and the per-pixel "nearest covering
  triangle" search is one masked reduction over T (replacing the
  reference's 4-thread column-chunk loop, mesh.cpp:609-620).

The reference's Mesher thread + queue becomes: call mesh_keyframe() after
each KF; JAX async dispatch overlaps it with the next frame's tracking
exactly like the detached thread overlapped the front end.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sadvio_tpu.frontend.detect import bilinear_sample, window_sample
from sadvio_tpu.models import cameras
from sadvio_tpu.utils import geometry as geo


class MeshConfig(NamedTuple):
    max_lmk_depth: float = 10.0  # mesher.cpp:141 (<= 10 m landmarks)
    min_angle_deg: float = 20.0  # mesh.cpp:188-221 triangle angle gates
    max_angle_deg: float = 160.0
    max_edge_len: float = 0.5  # config max_length_tsh
    zncc_tsh: float = 0.8  # config ZNCC_tsh
    patch_half: int = 7  # 15x15 barycenter patch (mesh.cpp:347-430)
    normal_cos_tsh: float = 0.2  # normal-consistency filter (mesh.cpp:100-138)
    ray_stride: int = 6  # every-6th-pixel cast (mesh.cpp:556)
    min_ray_depth: float = 0.25  # valid depth window (mesh.cpp:539-700)
    max_ray_depth: float = 5.0


# ---------------------------------------------------------------------------
# host: Delaunay topology
# ---------------------------------------------------------------------------


def delaunay_triangles(uv: np.ndarray, valid: np.ndarray, cap: int):
    """2D Delaunay over valid projected landmarks -> (cap,3) slot indices.

    Host-side topology; semantics of Mesher::createMesh2D
    (mesher.cpp:134-165).  The triangulation itself runs in the native C++
    runtime (native/delaunay.cpp, the cv::Subdiv2D counterpart) when built,
    falling back to scipy.spatial.Delaunay.  Returns (tri (cap,3) int32
    landmark-slot indices, mask (cap,) bool).
    """
    idx = np.flatnonzero(np.asarray(valid))
    tri_out = np.zeros((cap, 3), np.int32)
    mask_out = np.zeros((cap,), bool)
    if idx.size < 3:
        return tri_out, mask_out
    pts = np.asarray(uv)[idx]

    from sadvio_tpu.pipeline.native_io import native_delaunay

    tris = native_delaunay(pts)
    if tris is None:
        from scipy.spatial import Delaunay, QhullError

        try:
            tris = Delaunay(pts).simplices
        except (QhullError, ValueError):
            return tri_out, mask_out
    simplices = idx[tris]  # back to landmark-slot space
    n = min(len(simplices), cap)
    tri_out[:n] = simplices[:n]
    mask_out[:n] = True
    return tri_out, mask_out


# ---------------------------------------------------------------------------
# device: triangle filters
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def filter_triangles(lmk_w, lmk_mask, tri, tri_mask, cam, R_w_f, t_w_f,
                     R_f_s, t_f_s, cfg: MeshConfig = MeshConfig()):
    """Geometric gates on mesh triangles (mesh.cpp:188-221 semantics).

    Gates: all three vertices alive and within depth range; triangle angles
    within [min,max]; edges below max_edge_len (in meters).
    Returns updated tri_mask.
    """
    p = lmk_w[tri]  # (T,3,3)
    alive = jnp.all(lmk_mask[tri], axis=-1) & tri_mask

    p_c = cameras.world_to_cam(
        R_w_f, t_w_f, R_f_s, t_f_s, p.reshape(-1, 3)
    ).reshape(p.shape)
    z = p_c[..., 2]
    depth_ok = jnp.all((z > 0.0) & (z < cfg.max_lmk_depth), axis=-1)

    e0 = p[:, 1] - p[:, 0]
    e1 = p[:, 2] - p[:, 1]
    e2 = p[:, 0] - p[:, 2]
    l0 = jnp.linalg.norm(e0, axis=-1)
    l1 = jnp.linalg.norm(e1, axis=-1)
    l2 = jnp.linalg.norm(e2, axis=-1)
    len_ok = jnp.maximum(jnp.maximum(l0, l1), l2) < cfg.max_edge_len

    def angle(u, v):
        c = jnp.sum(u * v, -1) / jnp.maximum(
            jnp.linalg.norm(u, axis=-1) * jnp.linalg.norm(v, axis=-1), 1e-12
        )
        return jnp.rad2deg(jnp.arccos(jnp.clip(c, -1.0, 1.0)))

    a0 = angle(-e2, e0)
    a1 = angle(-e0, e1)
    a2 = angle(-e1, e2)
    amin = jnp.minimum(jnp.minimum(a0, a1), a2)
    amax = jnp.maximum(jnp.maximum(a0, a1), a2)
    ang_ok = (amin > cfg.min_angle_deg) & (amax < cfg.max_angle_deg)

    return alive & depth_ok & len_ok & ang_ok


def triangle_normals(lmk_w, tri):
    """Unit normals of mesh triangles (world frame)."""
    p = lmk_w[tri]
    n = jnp.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnames=())
def normal_consistency(lmk_w, tri, tri_mask, cam_center_w, min_cos=0.2):
    """Drop triangles nearly parallel to the viewing ray
    (Mesh3D normal filter, mesh.cpp:100-138)."""
    n = triangle_normals(lmk_w, tri)
    c = jnp.mean(lmk_w[tri], axis=1)  # barycenter
    view = cam_center_w[None, :] - c
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-12)
    cosv = jnp.abs(jnp.sum(n * view, axis=-1))
    return tri_mask & (cosv > min_cos)


# ---------------------------------------------------------------------------
# device: photometric ZNCC validation (plane-induced homography patch warp)
# ---------------------------------------------------------------------------


def _zncc(a, b, axis=-1, eps=1e-6):
    am = a - jnp.mean(a, axis=axis, keepdims=True)
    bm = b - jnp.mean(b, axis=axis, keepdims=True)
    num = jnp.sum(am * bm, axis=axis)
    den = jnp.sqrt(jnp.sum(am * am, axis=axis) * jnp.sum(bm * bm, axis=axis))
    return num / jnp.maximum(den, eps)


# shared batched window sampler (one dynamic_slice window per row +
# separable one-hot contraction) -- lives in frontend/detect.py, used here
# for the per-triangle ZNCC patches
_window_sample = window_sample


@partial(jax.jit, static_argnames=("patch_half",))
def zncc_validate(img0, img1, lmk_w, tri, tri_mask,
                  cam0, cam1, R_w_f, t_w_f, R_f_s0, t_f_s0, R_f_s1, t_f_s1,
                  zncc_tsh=0.8, patch_half: int = 7):
    """Photometric triangle validation (mesh.cpp:347-430 barycenter variant).

    A (2h+1)^2 patch at each triangle's barycenter projection in cam0 is
    mapped through the triangle's plane-induced homography into cam1 and
    scored with ZNCC; triangles below threshold are dropped.  All triangles
    in parallel: the warp is evaluated by back-projecting each patch pixel's
    ray onto the triangle plane (exact, no H matrix needed).
    """
    T = tri.shape[0]
    p = lmk_w[tri]  # (T,3,3)
    bc_w = jnp.mean(p, axis=1)  # (T,3)
    n_w = triangle_normals(lmk_w, tri)  # (T,3)

    # cam0 pose in world
    R_ws0, t_ws0 = geo.pose_compose(R_w_f, t_w_f, R_f_s0, t_f_s0)
    R_ws1, t_ws1 = geo.pose_compose(R_w_f, t_w_f, R_f_s1, t_f_s1)

    uv0_c, vis0 = cameras.project_world(cam0, R_w_f, t_w_f, R_f_s0, t_f_s0, bc_w)

    r = jnp.arange(-patch_half, patch_half + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    offs = jnp.stack([dx.reshape(-1), dy.reshape(-1)], -1)  # (S,2)
    S = offs.shape[0]

    pix0 = uv0_c[:, None, :] + offs[None]  # (T,S,2)
    # ray of each patch pixel in world
    rays_c = cam0.backproject(pix0.reshape(-1, 2)).reshape(T, S, 3)
    rays_w = jnp.einsum("ij,tsj->tsi", R_ws0, rays_c)
    # intersect with triangle plane: (o + d*s - bc) . n = 0
    denom = jnp.sum(rays_w * n_w[:, None, :], axis=-1)
    num = jnp.sum((bc_w[:, None, :] - t_ws0[None, None, :]) * n_w[:, None, :], -1)
    s = num / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    pts_w = t_ws0[None, None, :] + rays_w * s[..., None]  # (T,S,3)
    ok_plane = s > 0.05

    uv1, vis1 = cameras.project_world(
        cam1, R_w_f, t_w_f, R_f_s1, t_f_s1, pts_w.reshape(-1, 3)
    )
    uv1 = uv1.reshape(T, S, 2)
    vis1 = vis1.reshape(T, S) & ok_plane

    # window-based sampling (same fix as the KLT template stage): one
    # aligned window per triangle from each image, then bilinear
    # interpolation as one-hot weight contractions -- instead of T*S
    # scattered HBM gathers per image (measured ~4x on TPU at T=512, S=225)
    uv1_c, _ = cameras.project_world(cam1, R_w_f, t_w_f, R_f_s1, t_f_s1, bc_w)
    patch0, in0 = _window_sample(img0, uv0_c, pix0, ws=2 * patch_half + 4)
    patch1, in1 = _window_sample(img1, uv1_c, uv1, ws=48)
    # masked ZNCC: invalid pixels contribute the patch mean (neutral)
    m = (vis1 & in0 & in1).astype(img0.dtype)
    frac = jnp.mean(m, axis=-1)
    score = _zncc(patch0 * m, patch1 * m)
    return tri_mask & vis0 & (frac > 0.6) & (score > zncc_tsh)


# ---------------------------------------------------------------------------
# device: dense point cloud by ray casting the projected mesh
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("stride", "height", "width"))
def raycast_pointcloud(lmk_w, tri, tri_mask, cam, R_w_f, t_w_f, R_f_s, t_f_s,
                       *, stride: int = 6, height: int = 480, width: int = 752,
                       min_depth: float = 0.25, max_depth: float = 5.0):
    """Dense cloud: cast a ray at every `stride`-th pixel against the mesh.

    Semantics of Mesh3D::generatePointCloud (mesh.cpp:539-700): project mesh
    vertices, find for each sample pixel the covering triangle (nearest by
    interpolated depth among those whose projection contains the pixel),
    return the 3D plane intersection.  The reference's 4 worker threads
    become one (Hs*Ws, T) masked reduction.

    Returns pts_w (Hs*Ws, 3), valid (Hs*Ws,).
    """
    # project triangle vertices
    p = lmk_w[tri]  # (T,3,3)
    uvv, visv = cameras.project_world(
        cam, R_w_f, t_w_f, R_f_s, t_f_s, p.reshape(-1, 3)
    )
    uvv = uvv.reshape(-1, 3, 2)  # (T,3,2)
    tri_ok = tri_mask & jnp.all(visv.reshape(-1, 3), axis=-1)

    ys = jnp.arange(stride // 2, height, stride, dtype=jnp.float32)
    xs = jnp.arange(stride // 2, width, stride, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pix = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (Np,2)

    # barycentric coords of each pixel in each triangle (Np,T)
    u, v, w = geo.barycentric_coords(
        pix[:, None, :], uvv[None, :, 0], uvv[None, :, 1], uvv[None, :, 2]
    )
    inside = (u >= 0) & (v >= 0) & (w >= 0) & tri_ok[None, :]

    # depth of the triangle plane point under the pixel: interpolate vertex
    # camera depths barycentrically (affine-approximate like the reference's
    # projected-triangle interpolation)
    p_c = cameras.world_to_cam(
        R_w_f, t_w_f, R_f_s, t_f_s, p.reshape(-1, 3)
    ).reshape(-1, 3, 3)
    z = p_c[..., 2]  # (T,3)
    z_pix = (
        u * z[None, :, 0] + v * z[None, :, 1] + w * z[None, :, 2]
    )  # (Np,T)
    # nearest covering triangle = plain min reduction (NOT argmin +
    # take_along_axis: only the depth is consumed, and a single reduce lets
    # XLA fuse the whole (Np,T) producer chain into it -- measured ~4x on
    # the full-capacity (10.5k x 512) table)
    z_best = jnp.min(jnp.where(inside, z_pix, jnp.inf), axis=1)
    valid = jnp.isfinite(z_best) & (z_best > min_depth) & (z_best < max_depth)

    # 3D point: back-project pixel ray to that depth
    rays_c = cam.backproject(pix)  # (Np,3) unit
    pts_c = rays_c * (z_best / jnp.maximum(rays_c[:, 2], 1e-6))[:, None]
    R_ws, t_ws = geo.pose_compose(R_w_f, t_w_f, R_f_s, t_f_s)
    pts_w = jnp.einsum("ij,nj->ni", R_ws, pts_c) + t_ws
    return pts_w, valid


# ---------------------------------------------------------------------------
# orchestration (the reference's Mesher thread, as a per-KF call)
# ---------------------------------------------------------------------------


class Mesher:
    """Per-keyframe mesh maintenance + dense cloud generation.

    Replaces the reference's detached Mesher thread + KF queue
    (mesher.cpp:47-97): call update() after each keyframe; device work is
    async-dispatched so it overlaps the next frame like the thread did.
    """

    def __init__(self, rig, cfg: MeshConfig = MeshConfig(), tri_cap: int = 512):
        self.rig = rig
        self.cfg = cfg
        self.tri_cap = tri_cap
        self.tri = np.zeros((tri_cap, 3), np.int32)
        self.tri_mask = np.zeros((tri_cap,), bool)
        self.cloud = []  # list of (pts_w, valid) device arrays

    @partial(jax.jit, static_argnames=("self",))
    def _project_pack(self, lmk, lmk_mask, R_kf, t_kf):
        """(L,3) [u, v, ok] pack: ONE device->host fetch feeds the host
        Delaunay (separate uv + mask fetches each cost a full RPC round
        trip on a tunneled device)."""
        cam0 = jax.tree.map(
            lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x,
            self.rig.cam,
        )
        uv, vis = cameras.project_world(
            cam0, R_kf, t_kf, self.rig.R_f_s[0], self.rig.t_f_s[0], lmk
        )
        p_c = cameras.world_to_cam(
            R_kf, t_kf, self.rig.R_f_s[0], self.rig.t_f_s[0], lmk
        )
        near = (p_c[:, 2] > 0) & (p_c[:, 2] < self.cfg.max_lmk_depth)
        ok = vis & lmk_mask & near
        return jnp.concatenate([uv, ok[:, None].astype(uv.dtype)], axis=-1)

    def update(self, images, window, R_kf, t_kf, make_cloud: bool = True):
        """Rebuild the KF-local mesh and (optionally) cast the dense cloud."""
        cam0 = jax.tree.map(
            lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x,
            self.rig.cam,
        )
        cam1 = jax.tree.map(
            lambda x: x[1] if hasattr(x, "shape") and x.ndim > 0 else x,
            self.rig.cam,
        )
        pk = np.asarray(self._project_pack(
            window.lmk, window.lmk_mask, R_kf, t_kf))
        tri, mask = delaunay_triangles(pk[:, :2], pk[:, 2] > 0.5, self.tri_cap)
        # one combined H2D upload for the host topology (tri + mask)
        up = jnp.asarray(np.concatenate(
            [tri, mask[:, None].astype(np.int32)], axis=1))
        tri = up[:, :3]
        mask = up[:, 3] > 0

        mask = filter_triangles(
            window.lmk, window.lmk_mask, tri, mask, cam0, R_kf, t_kf,
            self.rig.R_f_s[0], self.rig.t_f_s[0], self.cfg,
        )
        R_ws, t_ws = geo.pose_compose(R_kf, t_kf, self.rig.R_f_s[0], self.rig.t_f_s[0])
        mask = normal_consistency(window.lmk, tri, mask, t_ws,
                                  self.cfg.normal_cos_tsh)
        mask = zncc_validate(
            images[0], images[1], window.lmk, tri, mask, cam0, cam1,
            R_kf, t_kf, self.rig.R_f_s[0], self.rig.t_f_s[0],
            self.rig.R_f_s[1], self.rig.t_f_s[1],
            self.cfg.zncc_tsh, self.cfg.patch_half,
        )
        self.tri, self.tri_mask = tri, mask

        if make_cloud:
            H, W = images.shape[-2:]
            pts, valid = raycast_pointcloud(
                window.lmk, tri, mask, cam0, R_kf, t_kf,
                self.rig.R_f_s[0], self.rig.t_f_s[0],
                stride=self.cfg.ray_stride, height=int(H), width=int(W),
                min_depth=self.cfg.min_ray_depth, max_depth=self.cfg.max_ray_depth,
            )
            self.cloud.append((pts, valid))
        return tri, mask

    def dense_points(self):
        """Concatenated world-frame cloud across keyframes (host numpy)."""
        if not self.cloud:
            return np.zeros((0, 3), np.float32)
        out = []
        for pts, valid in self.cloud:
            p = np.asarray(pts)
            v = np.asarray(valid)
            out.append(p[v])
        return np.concatenate(out, 0) if out else np.zeros((0, 3), np.float32)

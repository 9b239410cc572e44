"""Synthetic EuRoC-like world: rendered stereo stream + IMU + ground truth.

Serves as the end-to-end validation and benchmark harness in lieu of real
EuRoC data (the reference validates by replaying EuRoC and scoring
log_slam/results.csv -- cpp/src/slamCore.cpp:509-519; here the world's
forward model is exact so ATE is measured against analytic ground truth,
the same synthetic-world pattern as the reference test suite).

The scene is a wall of Gaussian intensity blobs; images are rendered by
splatting all blobs in one fused XLA kernel.  IMU samples are derived from
the analytic trajectory by high-rate finite differences in float64.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sadvio_tpu.data.window import Rig
from sadvio_tpu.models import cameras, imu as imu_mod
from sadvio_tpu.utils import geometry as geo


class FrameData(NamedTuple):
    ts: float
    images: np.ndarray  # (C,H,W) float32 in [0,255]
    acc: np.ndarray  # (n,3) samples since previous frame
    gyr: np.ndarray  # (n,3)
    dt: np.ndarray  # (n,)


class SyntheticWorld(NamedTuple):
    rig: Rig
    imu_params: imu_mod.ImuParams
    frames: list  # [FrameData]
    gt_R: np.ndarray  # (T,3,3) body pose world-from-frame
    gt_t: np.ndarray  # (T,3)
    gt_v: np.ndarray  # (T,3)
    points: np.ndarray  # (N,3) scene points
    segments: np.ndarray = np.zeros((0, 2, 3), np.float32)  # (S,2,3) 3D lines


def make_rig(width=320, height=240, baseline=0.11, f=200.0, camera="pinhole"):
    C = 2
    if camera == "fisheye":
        # equidistant model with a similar field of view to the pinhole rig
        model = cameras.Fisheye(
            fx=jnp.full((C,), 240.0), fy=jnp.full((C,), 240.0),
            cx=jnp.full((C,), width / 2.0), cy=jnp.full((C,), height / 2.0),
            k1=jnp.full((C,), 0.02), k2=jnp.full((C,), -0.005),
            k3=jnp.full((C,), 0.0), k4=jnp.full((C,), 0.0),
            width=width, height=height,
        )
    elif camera == "double_sphere":
        model = cameras.DoubleSphere(
            fx=jnp.full((C,), 230.0), fy=jnp.full((C,), 230.0),
            cx=jnp.full((C,), width / 2.0), cy=jnp.full((C,), height / 2.0),
            alpha=jnp.full((C,), 0.55), xi=jnp.full((C,), -0.2),
            width=width, height=height,
        )
    elif camera == "omni":
        model = cameras.Omni(
            fx=jnp.full((C,), 360.0), fy=jnp.full((C,), 360.0),
            cx=jnp.full((C,), width / 2.0), cy=jnp.full((C,), height / 2.0),
            xi=jnp.full((C,), 0.8), k1=jnp.full((C,), -0.01),
            k2=jnp.full((C,), 0.002), p1=jnp.full((C,), 0.0),
            p2=jnp.full((C,), 0.0),
            width=width, height=height,
        )
    else:
        model = cameras.Pinhole(
            fx=jnp.full((C,), f), fy=jnp.full((C,), f),
            cx=jnp.full((C,), width / 2.0), cy=jnp.full((C,), height / 2.0),
            width=width, height=height,
        )
    R_f_s = jnp.broadcast_to(jnp.eye(3), (C, 3, 3))
    t_f_s = jnp.array([[0.0, 0.0, 0.0], [baseline, 0.0, 0.0]], jnp.float32)
    return Rig(cam=model, R_f_s=R_f_s, t_f_s=t_f_s)


@partial(jax.jit, static_argnames=("width", "height"))
def render_view(cam_f, cam_c, R_w_f, t_w_f, R_f_s, t_f_s, pts, intens,
                width: int, height: int, model=None):
    """Splat scene points into one camera image: (H,W) float32.

    Each point renders as a two-scale Gaussian (sharp core + soft halo):
    the halo keeps signal alive at coarse pyramid levels so pyramidal KLT
    has a wide convergence basin, like real multi-scale image texture.

    model: optional camera-model pytree; when given, splat centers come
    from model.project (fisheye/double-sphere/omni worlds) instead of the
    inline pinhole formula.
    """
    R_s_f = R_f_s.T
    p_f = (pts - t_w_f) @ R_w_f  # (N,3) body coords: R^T (p - t)
    p_c = p_f @ R_f_s + (R_s_f @ (-t_f_s))  # sensor coords
    z = p_c[:, 2]
    if model is not None:
        uv_m, ok_m = model.project(p_c)
        u, v = uv_m[:, 0], uv_m[:, 1]
        vis = ok_m & (z > 0.3) & (u > -12) & (u < width + 12) \
            & (v > -12) & (v < height + 12)
    else:
        u = cam_f * p_c[:, 0] / jnp.maximum(z, 0.1) + cam_c[0]
        v = cam_f * p_c[:, 1] / jnp.maximum(z, 0.1) + cam_c[1]
        vis = (z > 0.3) & (u > -12) & (u < width + 12) & (v > -12) & (v < height + 12)
    w = jnp.where(vis, intens, 0.0)
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    img = jnp.zeros((height, width), jnp.float32)
    for sigma, amp in ((1.6, 1.0), (5.0, 0.55)):
        gx = jnp.exp(-0.5 * ((xs[None, :] - u[:, None]) / sigma) ** 2)  # (N,W)
        gy = jnp.exp(-0.5 * ((ys[None, :] - v[:, None]) / sigma) ** 2)  # (N,H)
        img = img + amp * jnp.einsum(
            "nh,nw->hw", gy * w[:, None], gx, precision=jax.lax.Precision.DEFAULT
        )
    return jnp.clip(img, 0.0, 255.0)


def _sample_segments(rng, n_lines):
    """3D line segments on the blob wall (z ~ [4.5, 8]), orientations kept
    away from the stereo epipolar plane (x axis): a line parallel to the
    baseline is degenerate for two-view plane-intersection triangulation."""
    mid = np.stack([
        rng.uniform(-4.0, 4.0, n_lines), rng.uniform(-2.8, 2.8, n_lines),
        rng.uniform(4.8, 7.8, n_lines),
    ], -1)
    ang = rng.uniform(np.deg2rad(25), np.deg2rad(155), n_lines)
    flip = rng.choice([-1.0, 1.0], n_lines)
    d = np.stack([np.cos(ang) * flip, np.sin(ang),
                  rng.uniform(-0.15, 0.15, n_lines)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    half = rng.uniform(1.0, 1.8, (n_lines, 1))
    return np.stack([mid - d * half, mid + d * half], axis=1).astype(np.float32)


def _render_segments(img, rig, c, R_k, t_k, segs, thickness=1.3, amp=150.0):
    """Draw projected 3D segments into one camera image (numpy, host-side).

    Pinhole: straight 3D lines project to straight 2D segments, so drawing
    the chord between projected endpoints is exact."""
    if segs is None or len(segs) == 0:
        return img
    H, W = img.shape
    R_f_s = np.asarray(rig.R_f_s[c])
    t_f_s = np.asarray(rig.t_f_s[c])
    f = float(rig.cam.fx[c])
    cx, cy = float(rig.cam.cx[c]), float(rig.cam.cy[c])
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    out = img.astype(np.float64)
    for seg in segs:
        p_f = (seg - t_k) @ R_k  # R^T (p - t), rows
        p_c = (p_f - t_f_s) @ R_f_s
        if (p_c[:, 2] < 0.5).any():
            continue
        u = f * p_c[:, 0] / p_c[:, 2] + cx
        v = f * p_c[:, 1] / p_c[:, 2] + cy
        d = np.array([u[1] - u[0], v[1] - v[0]])
        Ln = max(np.hypot(*d), 1e-6)
        t_hat = d / Ln
        s = (xs - u[0]) * t_hat[0] + (ys - v[0]) * t_hat[1]
        perp = -(xs - u[0]) * t_hat[1] + (ys - v[0]) * t_hat[0]
        out += amp * ((s > 0) & (s < Ln)) * np.exp(-0.5 * (perp / thickness) ** 2)
    return np.clip(out, 0.0, 255.0).astype(np.float32)


def _trajectory(t, rot_scale=1.0, mode="default"):
    """Analytic trajectory (f64): lateral sweep + gentle bob, looking at +z.

    rot_scale scales the rotational excitation (rotation-rich trajectories
    make accel bias observable against the gravity-tilt degeneracy).

    mode="excursion": pan out 2.2 m to the right with a co-directed yaw and
    come back -- the start-of-run landmarks leave the field of view
    mid-excursion (their window observations roll out, so with global_map
    they are archived), and the return is a genuine revisit that exercises
    descriptor resurrection + loop closure."""
    if mode == "excursion":
        T = max(float(t[-1]), 1e-6)
        s = np.sin(np.pi * t / T)
        p = np.stack([
            2.2 * s,
            0.12 * np.sin(0.9 * t + 0.7),
            0.08 * np.sin(0.7 * t),
        ], -1)
        yaw = 0.5 * s
        pitch = 0.04 * np.sin(0.8 * t + 1.0)
        return p, yaw, pitch
    p = np.stack([
        0.8 * np.sin(0.5 * t),
        0.4 * np.sin(0.3 * t + 0.7),
        0.15 * np.sin(0.23 * t),
    ], -1)
    yaw = 0.12 * rot_scale * np.sin(0.4 * t)
    pitch = 0.06 * rot_scale * np.sin(0.31 * t + 1.0)
    return p, yaw, pitch


def _rot(yaw, pitch):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    return Ry @ Rx


def make_world(seed=0, n_frames=80, fps=20.0, imu_rate=200.0,
               width=320, height=240, n_points=240,
               noise_px=0.0, imu_noise=True,
               acc_bias=None, gyr_bias=None, rot_scale=1.0,
               gain_jitter=0.0, offset_jitter=0.0,
               occluder=False, camera="pinhole",
               n_lines=0, trajectory="default",
               wall_x=(-5.0, 5.0)) -> SyntheticWorld:
    """acc_bias/gyr_bias: optional constant (3,) sensor biases added to the
    IMU measurements -- the estimator should recover them (the reference's
    imu_test.cpp biasEstimation pattern).

    Hardening knobs (the EuRoC-proxy stress configuration):
      noise_px      per-pixel Gaussian intensity noise (sensor noise)
      gain_jitter   per-frame, per-camera multiplicative exposure flicker
                    (uniform in 1 +- gain_jitter)
      offset_jitter per-frame, per-camera additive intensity offset
      occluder      a dark disc sweeping through the image (dynamic
                    foreground object violating photometric constancy)
      n_lines       bright 3D line segments on the wall (linexd worlds;
                    pinhole rendering only)
    """
    rng = np.random.default_rng(seed)
    rig = make_rig(width, height, camera=camera)
    params = imu_mod.ImuParams.euroc()
    g = np.array([0.0, 0.0, -imu_mod.GRAVITY])

    # scene: wall of blobs at z in [4, 9] on a jittered grid -- guaranteed
    # angular separation so blob peaks don't merge (merged Gaussians shift
    # their apparent peak with viewpoint, biasing KLT systematically)
    span_x = wall_x[1] - wall_x[0]
    gx = int(np.ceil(np.sqrt(n_points * span_x / 7.0)))
    gy = int(np.ceil(n_points / gx))
    xs = np.linspace(wall_x[0], wall_x[1], gx)
    ys = np.linspace(-3.5, 3.5, gy)
    gxx, gyy = np.meshgrid(xs, ys)
    cell = np.array([xs[1] - xs[0], ys[1] - ys[0]])
    pts2 = np.stack([gxx.reshape(-1), gyy.reshape(-1)], -1)[:n_points]
    pts2 = pts2 + rng.uniform(-0.25, 0.25, pts2.shape) * cell
    # smooth depth field: neighbouring blobs share depth, so camera motion
    # cannot make their projections cross/merge
    ii, jj = np.meshgrid(np.arange(gx), np.arange(gy))
    zfield = 6.5 + 2.0 * np.sin(0.8 * ii) * np.cos(0.9 * jj)
    z = zfield.reshape(-1)[:n_points] + rng.uniform(-0.2, 0.2, len(pts2))
    pts = np.concatenate([pts2, z[:, None]], -1).astype(np.float32)
    n_points = len(pts)
    intens = rng.uniform(80, 220, n_points).astype(np.float32)
    segs = _sample_segments(rng, n_lines) if n_lines else np.zeros(
        (0, 2, 3), np.float32)

    # dense f64 trajectory at IMU rate
    n_sub = int(round(imu_rate / fps))
    dt_imu = 1.0 / imu_rate
    T = n_frames
    t_dense = np.arange(T * n_sub + 1) * dt_imu
    p_d, yaw_d, pitch_d = _trajectory(t_dense, rot_scale, mode=trajectory)
    R_d = np.stack([_rot(y, pp) for y, pp in zip(yaw_d, pitch_d)])
    v_d = np.gradient(p_d, dt_imu, axis=0)
    a_d = np.gradient(v_d, dt_imu, axis=0)

    # body rates from rotation finite differences (f64, vectorized)
    from scipy.spatial.transform import Rotation

    dRs = np.einsum("nij,nik->njk", R_d[:-1], R_d[1:])  # R_i^T R_{i+1}
    w_d = np.zeros((len(t_dense), 3))
    w_d[:-1] = Rotation.from_matrix(dRs).as_rotvec() / dt_imu
    w_d[-1] = w_d[-2]

    frames = []
    gt_R, gt_t, gt_v = [], [], []
    cam = rig.cam
    for k in range(T):
        i0 = k * n_sub
        R_k = R_d[i0]
        t_k = p_d[i0]
        gt_R.append(R_k)
        gt_t.append(t_k)
        gt_v.append(v_d[i0])
        imgs = []
        for c in range(2):
            model_c = None
            if camera != "pinhole":
                model_c = jax.tree.map(
                    lambda x, c=c: x[c] if np.ndim(x) > 0 else x, rig.cam)
            img = render_view(
                float(cam.fx[c]), (float(cam.cx[c]), float(cam.cy[c])),
                jnp.asarray(R_k, jnp.float32), jnp.asarray(t_k, jnp.float32),
                rig.R_f_s[c], rig.t_f_s[c], jnp.asarray(pts), jnp.asarray(intens),
                width, height, model=model_c,
            )
            img = np.asarray(img)
            if n_lines and camera == "pinhole":
                img = _render_segments(img, rig, c, R_k, t_k, segs)
            imgs.append(img)
        if gain_jitter > 0 or offset_jitter > 0:
            imgs = [np.clip(
                im * (1.0 + rng.uniform(-gain_jitter, gain_jitter))
                + rng.uniform(-offset_jitter, offset_jitter), 0.0, 255.0)
                for im in imgs]
        if occluder:
            # disc sweeping left->right and bobbing, ~12% of image width
            ys, xs_g = np.mgrid[0:height, 0:width]
            cx_o = (k / max(T - 1, 1)) * (width + 120.0) - 60.0
            cy_o = height * (0.5 + 0.3 * np.sin(0.5 * k))
            r_o = 0.12 * width
            occ = (xs_g - cx_o) ** 2 + (ys - cy_o) ** 2 < r_o ** 2
            imgs = [np.where(occ, 12.0, im) for im in imgs]
        if noise_px > 0:
            imgs = [im + rng.standard_normal(im.shape).astype(np.float32) * noise_px
                    for im in imgs]
        # IMU samples covering (k-1, k]
        if k == 0:
            acc = np.zeros((0, 3))
            gyr = np.zeros((0, 3))
            dts = np.zeros((0,))
        else:
            sl = slice((k - 1) * n_sub, k * n_sub)
            acc = np.einsum("nij,nj->ni", R_d[sl].transpose(0, 2, 1), a_d[sl] - g)
            gyr = w_d[sl].copy()
            if imu_noise:
                acc += rng.standard_normal(acc.shape) * params.acc_noise * np.sqrt(imu_rate)
                gyr += rng.standard_normal(gyr.shape) * params.gyr_noise * np.sqrt(imu_rate)
            if acc_bias is not None:
                acc += np.asarray(acc_bias)[None, :]
            if gyr_bias is not None:
                gyr += np.asarray(gyr_bias)[None, :]
            dts = np.full((n_sub,), dt_imu)
        frames.append(FrameData(
            ts=k / fps,
            images=np.stack(imgs).astype(np.float32),
            acc=acc.astype(np.float32), gyr=gyr.astype(np.float32),
            dt=dts.astype(np.float32),
        ))
    return SyntheticWorld(
        rig=rig, imu_params=params, frames=frames,
        gt_R=np.stack(gt_R).astype(np.float32),
        gt_t=np.stack(gt_t).astype(np.float32),
        gt_v=np.stack(gt_v).astype(np.float32),
        points=pts, segments=segs,
    )


def make_nofov_rig(width=320, height=240, lever=0.4, f=200.0):
    """Two cameras with opposite viewing directions (nofov mode): cam0
    looks +z from the body origin, cam1 looks -z from an x-offset lever."""
    C = 2
    model = cameras.Pinhole(
        fx=jnp.full((C,), f), fy=jnp.full((C,), f),
        cx=jnp.full((C,), width / 2.0), cy=jnp.full((C,), height / 2.0),
        width=width, height=height,
    )
    R1 = geo.so3_exp(jnp.asarray([0.0, np.pi, 0.0], jnp.float32))
    R_f_s = jnp.stack([jnp.eye(3), R1])
    t_f_s = jnp.asarray([[0.0, 0.0, 0.0], [lever, 0.0, 0.0]], jnp.float32)
    return Rig(cam=model, R_f_s=R_f_s, t_f_s=t_f_s)


def make_nofov_world(seed=0, n_frames=60, fps=20.0, width=320, height=240,
                     n_points=240, rot_scale=1.0, lever=0.4) -> SyntheticWorld:
    """Two blob walls (front z~[4,9], back z~[-9,-4]) seen by a nofov rig.

    rot_scale scales rotational excitation and lever the camera-1 mounting
    offset: scale-from-rigidity needs the lever-arm displacement
    |(R-I) t_s1| well above the ray noise floor."""
    rng = np.random.default_rng(seed)
    rig = make_nofov_rig(width, height, lever=lever)
    params = imu_mod.ImuParams.euroc()

    def wall(zlo, zhi, n):
        gx = int(np.ceil(np.sqrt(n * 10.0 / 7.0)))
        gy = int(np.ceil(n / gx))
        xs = np.linspace(-5, 5, gx)
        ys = np.linspace(-3.5, 3.5, gy)
        gxx, gyy = np.meshgrid(xs, ys)
        cell = np.array([xs[1] - xs[0], ys[1] - ys[0]])
        p2 = np.stack([gxx.reshape(-1), gyy.reshape(-1)], -1)[:n]
        p2 = p2 + rng.uniform(-0.25, 0.25, p2.shape) * cell
        ii, jj = np.meshgrid(np.arange(gx), np.arange(gy))
        zf = 0.5 * (zlo + zhi) + 0.3 * (zhi - zlo) * (
            np.sin(0.8 * ii) * np.cos(0.9 * jj)
        )
        z = zf.reshape(-1)[:n] + rng.uniform(-0.2, 0.2, len(p2))
        return np.concatenate([p2, z[:, None]], -1).astype(np.float32)

    pts = np.concatenate([wall(4.0, 9.0, n_points), wall(-9.0, -4.0, n_points)])
    intens = rng.uniform(80, 220, len(pts)).astype(np.float32)

    T = n_frames
    dt_f = 1.0 / fps
    t_dense = np.arange(T) * dt_f
    p_d, yaw_d, pitch_d = _trajectory(t_dense, rot_scale)
    R_d = np.stack([_rot(y, pp) for y, pp in zip(yaw_d, pitch_d)])
    v_d = np.gradient(p_d, dt_f, axis=0)

    frames = []
    cam = rig.cam
    for k in range(T):
        imgs = []
        for c in range(2):
            img = render_view(
                float(cam.fx[c]), (float(cam.cx[c]), float(cam.cy[c])),
                jnp.asarray(R_d[k], jnp.float32), jnp.asarray(p_d[k], jnp.float32),
                rig.R_f_s[c], rig.t_f_s[c], jnp.asarray(pts), jnp.asarray(intens),
                width, height,
            )
            imgs.append(np.asarray(img))
        frames.append(FrameData(
            ts=k * dt_f, images=np.stack(imgs).astype(np.float32),
            acc=np.zeros((0, 3), np.float32), gyr=np.zeros((0, 3), np.float32),
            dt=np.zeros((0,), np.float32),
        ))
    return SyntheticWorld(
        rig=rig, imu_params=params, frames=frames,
        gt_R=R_d.astype(np.float32), gt_t=p_d.astype(np.float32),
        gt_v=v_d.astype(np.float32), points=pts,
    )


def ate_rmse(est_t, gt_t, align=True, with_scale=False):
    """Absolute trajectory error after optional Umeyama alignment.

    with_scale=True uses Sim3 alignment (monocular modes have gauge scale).
    """
    est = np.asarray(est_t, np.float64)
    gt = np.asarray(gt_t, np.float64)
    if align and len(est) >= 3:
        mu_e = est.mean(0)
        mu_g = gt.mean(0)
        E = est - mu_e
        G = gt - mu_g
        U, S, Vt = np.linalg.svd(E.T @ G)
        d = np.sign(np.linalg.det(U @ Vt))
        Dm = np.diag([1.0, 1.0, d])
        R = (U @ Dm @ Vt).T
        s = 1.0
        if with_scale:
            # Umeyama: both the cross-covariance singular values and the
            # source variance must carry the same normalization
            s = (S * np.diag(Dm)).sum() / max((E ** 2).sum(), 1e-12)
        est = s * (est - mu_e) @ R.T + mu_g
    return float(np.sqrt(((est - gt) ** 2).sum(-1).mean()))

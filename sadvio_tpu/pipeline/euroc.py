"""EuRoC MAV dataset provider: CSV parsing, stereo+IMU sync, undistortion.

TPU-native re-design of the reference data provider
(reference: cpp/src/dataproviders/adataprovider.cpp -- sensor-calibration
loading + radtan undistort-map precompute:80-175, image-sensor factory with
downsampling + contrast enhancement:176-250, frame queue:257; EUROCGrabber
CSV parsing + timestamp sync with 2.5 ms tolerance / 20 ms stereo gate and
IMU-only frames between images:269-483).

Differences on purpose:
* The grabber thread + spin-wait queue (adataprovider.cpp:14-26) becomes a
  plain generator: JAX async dispatch already overlaps host IO with device
  compute, and prefetch() provides the double-buffering the thread gave.
* Undistortion is a precomputed remap grid applied as one batched bilinear
  gather on device (the reference precomputes cv::initUndistortRectifyMap).
"""

from __future__ import annotations

import csv
import os
from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sadvio_tpu.data.window import Rig
from sadvio_tpu.models import cameras, imu as imu_mod
from sadvio_tpu.pipeline.config import DatasetConfig
from sadvio_tpu.pipeline.synthetic import FrameData

NS = 1e-9


def _read_csv(path):
    rows = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            rows.append(row)
    return rows


def load_imu_csv(path):
    """imu0/data.csv -> (ts (N,), gyr (N,3), acc (N,3)). EuRoC column order
    is [ts, wx, wy, wz, ax, ay, az]."""
    rows = _read_csv(path)
    a = np.asarray([[float(x) for x in r] for r in rows], np.float64)
    return a[:, 0] * NS, a[:, 1:4], a[:, 4:7]


def load_cam_csv(path):
    """camN/data.csv -> (ts (N,), filenames)."""
    rows = _read_csv(path)
    ts = np.asarray([float(r[0]) for r in rows], np.float64) * NS
    names = [r[1].strip() for r in rows]
    return ts, names


def _load_image(path):
    from PIL import Image

    img = np.asarray(Image.open(path).convert("L"), np.float32)
    return img


def undistort_grid(calib, new_f=None):
    """Precomputed remap grid for radtan undistortion (one-time, host).

    Returns (map_uv (H,W,2) float32 source coords, pinhole intrinsics of the
    rectified image).  Semantics of the reference's undistort-map precompute
    (adataprovider.cpp:80-175).
    """
    fx, fy, cx, cy = calib.intrinsics[:4]
    k1, k2, p1, p2 = (list(calib.distortion) + [0.0] * 4)[:4]
    W, H = calib.width, calib.height
    nf = new_f or fx
    xs = (np.arange(W) - cx) / nf
    ys = (np.arange(H) - cy) / nf
    gx, gy = np.meshgrid(xs, ys)
    r2 = gx * gx + gy * gy
    rad = 1 + k1 * r2 + k2 * r2 * r2
    dx = 2 * p1 * gx * gy + p2 * (r2 + 2 * gx * gx)
    dy = p1 * (r2 + 2 * gy * gy) + 2 * p2 * gx * gy
    u = fx * (gx * rad + dx) + cx
    v = fy * (gy * rad + dy) + cy
    return np.stack([u, v], -1).astype(np.float32), (nf, nf, cx, cy)


@partial(jax.jit, static_argnames=())
def remap(img, map_uv):
    """Apply a remap grid with bilinear sampling (device)."""
    from sadvio_tpu.frontend.detect import bilinear_sample

    return bilinear_sample(img, map_uv)


@partial(jax.jit, static_argnames=("clip",))
def clahe(img, tiles: int = 8, clip: float = 2.0, bins: int = 64):
    """Contrast-limited adaptive histogram equalization, batched.

    TPU-native equivalent of the reference's cv::CLAHE preprocessing
    (ASensor.h applyCLAHE:102); histogram per tile via one-hot reductions,
    bilinear interpolation between tile transfer functions.
    """
    H, W = img.shape
    th, tw = H // tiles, W // tiles
    x = img[: th * tiles, : tw * tiles].reshape(tiles, th, tiles, tw)
    x = x.transpose(0, 2, 1, 3).reshape(tiles * tiles, th * tw)
    q = jnp.clip(x / 256.0 * bins, 0, bins - 1).astype(jnp.int32)
    hist = jax.vmap(lambda qq: jnp.zeros(bins).at[qq].add(1.0))(q)
    limit = clip * th * tw / bins
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / bins
    cdf = jnp.cumsum(hist, axis=1)
    cdf = cdf / cdf[:, -1:]
    lut = (cdf * 255.0).reshape(tiles, tiles, bins)

    # bilinear interpolation of per-tile LUTs at every pixel
    yy = (jnp.arange(H) + 0.5) / th - 0.5
    xx = (jnp.arange(W) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, tiles - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, tiles - 1)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    wy = jnp.clip(yy - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(xx - x0, 0.0, 1.0)[None, :]
    qi = jnp.clip(img / 256.0 * bins, 0, bins - 1).astype(jnp.int32)
    g = lambda ty, tx: lut[ty[:, None], tx[None, :], qi]
    out = (
        g(y0, x0) * (1 - wy) * (1 - wx) + g(y0, x1) * (1 - wy) * wx
        + g(y1, x0) * wy * (1 - wx) + g(y1, x1) * wy * wx
    )
    return out


@partial(jax.jit, static_argnames=())
def hist_equalize(img, bins: int = 256):
    """Global histogram equalization (ASensor applyHistogramEqualization)."""
    q = jnp.clip(img, 0, 255).astype(jnp.int32)
    hist = jnp.zeros(bins).at[q.reshape(-1)].add(1.0)
    cdf = jnp.cumsum(hist)
    cdf = (cdf - cdf[0]) / jnp.maximum(cdf[-1] - cdf[0], 1.0)
    return cdf[q] * 255.0


@partial(jax.jit, static_argnames=())
def agcwd(img, alpha: float = 0.5, bins: int = 256):
    """Adaptive gamma correction with weighting distribution
    (imgProcessing.h AGCWD semantics): gamma per intensity from the
    alpha-weighted smoothed histogram CDF."""
    q = jnp.clip(img, 0, 255).astype(jnp.int32)
    hist = jnp.zeros(bins).at[q.reshape(-1)].add(1.0)
    pdf = hist / jnp.maximum(jnp.sum(hist), 1.0)
    pdf_w = jnp.max(pdf) * ((pdf / jnp.maximum(jnp.max(pdf), 1e-12)) ** alpha)
    cdf_w = jnp.cumsum(pdf_w) / jnp.maximum(jnp.sum(pdf_w), 1e-12)
    levels = jnp.arange(bins, dtype=img.dtype) / (bins - 1)
    lut = 255.0 * levels ** (1.0 - cdf_w)
    return lut[q]


def enhance_contrast(img, method: str):
    """Dispatch on the config contrast_enhancer string
    (ConfigFileReader 'contrast_enhancer', ASensor.h:102 enhancers)."""
    if method in (None, "", "none"):
        return img
    if method == "clahe":
        return clahe(img)
    if method in ("histogram", "histeq"):
        return hist_equalize(img)
    if method == "agcwd":
        return agcwd(img)
    raise ValueError(f"unknown contrast enhancer: {method}")


def rig_from_dataset(ds) -> Rig:
    """Rig from a DatasetConfig (EuRoC T_BS is body-from-sensor = T_f_s).

    Dispatches on the calibration's camera model (the image-sensor factory of
    adataprovider.cpp:176-250): pinhole | fisheye (equidistant, k1..k4) |
    double_sphere (fx fy cx cy xi alpha) | omni (fx fy cx cy xi + radtan).
    All cameras of one rig must share a model family (they batch over C).
    """
    kinds = {c.model for c in ds.cameras}
    if len(kinds) != 1:
        raise ValueError(f"mixed camera models in one rig: {sorted(kinds)}")
    kind = kinds.pop()

    def col(i, default=None, from_dist=None):
        vals = []
        for c in ds.cameras:
            if i < len(c.intrinsics):
                vals.append(c.intrinsics[i])
            elif from_dist is not None and from_dist < len(c.distortion):
                vals.append(c.distortion[from_dist])
            elif default is not None:
                vals.append(default)
            else:
                raise ValueError(
                    f"{kind} calibration needs intrinsics[{i}]")
        return jnp.asarray(vals, jnp.float32)

    base = dict(fx=col(0), fy=col(1), cx=col(2), cy=col(3),
                width=ds.cameras[0].width, height=ds.cameras[0].height)
    if kind == "pinhole":
        model = cameras.Pinhole(**base)
    elif kind == "fisheye":
        # k1..k4 follow fx fy cx cy in intrinsics, or live in
        # distortion_coefficients (both spellings occur in the wild)
        model = cameras.Fisheye(
            **base, k1=col(4, 0.0, 0), k2=col(5, 0.0, 1),
            k3=col(6, 0.0, 2), k4=col(7, 0.0, 3),
        )
    elif kind == "double_sphere":
        model = cameras.DoubleSphere(**base, xi=col(4), alpha=col(5))
    elif kind == "omni":
        model = cameras.Omni(
            **base, xi=col(4),
            k1=col(5, 0.0, 0), k2=col(6, 0.0, 1),
            p1=col(7, 0.0, 2), p2=col(8, 0.0, 3),
        )
    else:
        raise ValueError(f"unknown camera model '{kind}'")
    Ts = [np.asarray(c.T_f_s, np.float64).reshape(4, 4) for c in ds.cameras]
    R_f_s = jnp.asarray(np.stack([T[:3, :3] for T in Ts]), jnp.float32)
    t_f_s = jnp.asarray(np.stack([T[:3, 3] for T in Ts]), jnp.float32)
    return Rig(cam=model, R_f_s=R_f_s, t_f_s=t_f_s)


class EurocProvider:
    """Frame stream from an EuRoC MAV directory (mav0/...).

    Yields FrameData with stereo-synced images (2.5 ms tolerance, 20 ms
    stereo gate -- EUROCGrabber semantics) and the IMU batch since the
    previous frame.
    """

    def __init__(self, root: str, dataset: Optional[DatasetConfig] = None,
                 contrast: str = "none", undistort: bool = True):
        m = os.path.join(root, "mav0") if os.path.isdir(os.path.join(root, "mav0")) else root
        self.root = m
        self.ts_imu, self.gyr, self.acc = load_imu_csv(
            os.path.join(m, "imu0", "data.csv")
        )
        self.ts0, self.names0 = load_cam_csv(os.path.join(m, "cam0", "data.csv"))
        self.ts1, self.names1 = load_cam_csv(os.path.join(m, "cam1", "data.csv"))
        self.dataset = dataset
        self.contrast = contrast
        self.maps = None
        if dataset is not None and undistort and dataset.cameras:
            self.maps = []
            for c in dataset.cameras:
                # only the pinhole path pre-undistorts (radtan remap,
                # adataprovider.cpp:80-175); wide-angle models keep their
                # distortion inside the projection itself
                if c.model == "pinhole" and any(abs(d) > 1e-12 for d in c.distortion[:4]):
                    grid, intr = undistort_grid(c)
                    self.maps.append(jnp.asarray(grid))
                else:
                    self.maps.append(None)

    def make_rig(self) -> Rig:
        return rig_from_dataset(self.dataset)

    def frames(self, max_frames: Optional[int] = None) -> Iterator[FrameData]:
        j1 = 0
        last_t = None
        i_imu = 0
        n_done = 0
        for i0, t0 in enumerate(self.ts0):
            # stereo partner within 20 ms (EUROCGrabber stereo gate)
            while j1 + 1 < len(self.ts1) and self.ts1[j1] < t0 - 0.0025:
                j1 += 1
            if abs(self.ts1[j1] - t0) > 0.020:
                continue
            img0 = _load_image(os.path.join(self.root, "cam0", "data", self.names0[i0]))
            img1 = _load_image(os.path.join(self.root, "cam1", "data", self.names1[j1]))
            imgs = [img0, img1]
            if self.maps is not None:
                imgs = [
                    np.asarray(remap(jnp.asarray(im), mp)) if mp is not None else im
                    for im, mp in zip(imgs, self.maps)
                ]
            if self.contrast not in (None, "", "none"):
                imgs = [
                    np.asarray(enhance_contrast(jnp.asarray(im), self.contrast))
                    for im in imgs
                ]

            # IMU batch covering (last_t, t0]
            k0 = i_imu
            while i_imu < len(self.ts_imu) and self.ts_imu[i_imu] <= t0:
                i_imu += 1
            if last_t is None:
                acc = np.zeros((0, 3), np.float32)
                gyr = np.zeros((0, 3), np.float32)
                dts = np.zeros((0,), np.float32)
            else:
                sel = slice(k0, i_imu)
                tsb = self.ts_imu[sel]
                prev = np.concatenate([[last_t], tsb[:-1]])
                dts = (tsb - prev).astype(np.float32)
                acc = self.acc[sel].astype(np.float32)
                gyr = self.gyr[sel].astype(np.float32)
            last_t = t0
            # ship real camera imagery as uint8: 4x less host->device wire
            # than f32 (the dominant per-frame cost on a tunneled chip), and
            # 8-bit is the sensor's native depth -- remap/CLAHE interpolation
            # residue below 1 intensity step carries no signal
            yield FrameData(
                ts=float(t0),
                images=np.clip(np.stack(imgs), 0, 255).astype(np.uint8),
                acc=acc, gyr=gyr, dt=dts,
            )
            n_done += 1
            if max_frames is not None and n_done >= max_frames:
                return


def write_results_csv(path, kf_traj):
    """log_slam/results.csv writer (slamCore.cpp:509-519 layout: ts + 3x4)."""
    os.makedirs(os.path.dirname(path), exist_ok=True) if os.path.dirname(path) else None
    with open(path, "w") as f:
        for ts, R, t in kf_traj:
            M = np.concatenate([np.asarray(R), np.asarray(t)[:, None]], 1)
            f.write(",".join([f"{ts:.9f}"] + [f"{x:.9f}" for x in M.reshape(-1)]) + "\n")


def write_vio_csv(path, rows):
    """log_slam/vio_poses.csv writer (slamBiMonoVIO.cpp:616-642 layout)."""
    with open(path, "w") as f:
        for r in rows:
            f.write(",".join(f"{x:.9f}" for x in r) + "\n")

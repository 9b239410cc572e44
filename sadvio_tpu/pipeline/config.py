"""Configuration system: two-level YAML matching the reference scheme.

Reference: config.yaml (algorithm parameters, parsed at
cpp/src/utilities/ConfigFileReader.cpp:5-59, schema in ConfigFileReader.h:8-54
and ros/config/config.yaml:1-167) + dataset yaml (sensor calibration, parsed
at cpp/src/dataproviders/adataprovider.cpp:28-175, e.g.
ros/config/dataset/eth.yaml).

Here both levels are frozen dataclasses loadable from the same YAML layouts;
capacities (static array sizes) are a third, TPU-specific group.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import yaml


@dataclass(frozen=True)
class FeatureConfig:
    """Per-feature-type settings (FeatureStruct, ConfigFileReader.h:8-24)."""

    label: str = "pointxd"
    detector: str = "fast"
    tracker: str = "klt"
    matcher: str = "brief"
    n_total: int = 400
    n_per_cell: int = 5
    max_reproj_err: float = 2.0
    # csv detector: folder of "<ts>.csv" keypoint files (csvKeypointDetector)
    folder: str = ""
    # ellipsepatternxd: physical pattern side length (m)
    pattern_side: float = 1.0


@dataclass(frozen=True)
class Capacities:
    """Static array capacities (TPU fixed-shape discipline)."""

    K: int = 13  # keyframe slots (max_kf_number + current)
    L: int = 512  # landmark slots
    P: int = 48  # prior-retained landmark slots
    N_imu: int = 64  # IMU samples per KF interval buffer
    pyr_levels: int = 3
    klt_radius: int = 7


@dataclass(frozen=True)
class SLAMConfig:
    """Algorithm parameters (Config struct, ConfigFileReader.h:26-54)."""

    slam_mode: str = "bimonovio"  # mono|bimono|monovio|bimonovio|nofov
    # route the window BA through a second device (the reference's
    # front-end/back-end thread split, cpp/main.cpp:37-42; here the "thread"
    # is async dispatch to a BackendExecutor device)
    multithreading: bool = False
    # OPT-IN latency mode for remote/tunneled devices (tens of ms per D2H
    # round trip): steady-state tracking frames never block on their own
    # health fetch -- the copy is harvested one frame later, and keyframe
    # CANDIDATES (eagerly-extrapolated stale vote) are confirmed against
    # fresh data before insertion (measured ~30 ms/frame saved on a
    # tunneled chip).  Off (default) = every frame votes on its own fresh
    # health, the reference's exact cadence semantics
    # (shouldInsertKeyframe, slamCore.cpp:375) -- on locally-attached
    # accelerators the fetch costs ~0.1 ms and the lag buys nothing.
    async_health: bool = False
    tracker: str = "klt"
    pose_estimator: str = "pnp"
    optimizer: str = "analytic"
    contrast_enhancer: str = "none"  # none|clahe|histeq
    marginalization: bool = True
    sparsification: bool = True
    # route the marginalization eigendecomposition chain through the host
    # float64 island (reference parity: Eigen doubles at 1e-12,
    # marginalization.cpp:318-342).  Off = f32 with Jacobi-equilibrated
    # eigendecompositions (pure-device; no host callback required).
    marg_f64: bool = False
    mesh3d: bool = False
    # LM iterations of the KF-rate window BA.  The reference runs up to 20
    # Ceres iterations with early convergence exit (AOptimizer.cpp:315-323);
    # with deferred-acceptance LM and one linearization per iteration, 8
    # fixed iterations match its accuracy at a fraction of the cost -- raise
    # for harder sequences.
    ba_iterations: int = 8
    # keyframes inserted unconditionally at map start (localmap.h:29; the
    # reference's shipped config uses 1, ros/config/config.yaml:33)
    min_kf_number: int = 1
    max_kf_number: int = 12
    fixed_frame_number: int = 1
    min_lmk_number: int = 35
    min_movement_parallax: float = 0.05  # deg, forces KF below
    max_movement_parallax: float = 4.0  # deg, forces KF above
    zncc_tsh: float = 0.8
    max_length_tsh: float = 0.5
    # archive an NFR relative-pose edge (marginalizeRelative,
    # BundleAdjustmentCERESAnalytic.cpp:665-809) each time a KF is
    # marginalized; end-of-run the pose graph over the archived KFs is
    # optimized and written out (beyond-reference consumer of the edges)
    pose_graph: bool = False
    # descriptor global map (globalmap.cpp addFrame + long-range
    # recoverFeatureFromMapLandmarks): marginalized landmarks are archived
    # with their BRIEF descriptors and resurrected by projection+descriptor
    # match when the camera revisits them
    global_map: bool = False
    # loop-closure / relocalization gates (beyond-reference consumers of the
    # global map; exposed as config keys like the reference's KF-vote gates
    # in config.yaml rather than source constants)
    lc_min_hits: int = 6  # resurrection burst size that triggers a closure try
    lc_consensus: float = 0.6  # min PnP-inlier fraction to accept a closure
    reloc_consensus: float = 0.5  # min inlier fraction for relocalization
    reloc_search_px: float = 25.0  # archive re-association box after a reset
    archive_capacity: int = 4096  # global-map landmark ring slots
    # bound on host-side archive growth (archived_kf nodes / pose-graph
    # edges): beyond this the oldest non-loop nodes are compacted by NFR
    # edge composition so soak runs stay O(1) in memory and
    # optimize_archive stays O(cap)
    archive_max_nodes: int = 256
    features: tuple = (FeatureConfig(),)
    caps: Capacities = Capacities()


@dataclass(frozen=True)
class CameraCalib:
    model: str  # pinhole|fisheye|double_sphere|omni
    width: int
    height: int
    intrinsics: tuple  # fx fy cx cy (+ model extras)
    distortion: tuple  # radtan k1 k2 p1 p2 (pinhole undistort path)
    T_f_s: tuple  # 4x4 row-major body-from-sensor (EuRoC T_BS)


@dataclass(frozen=True)
class ImuCalib:
    rate_hz: float = 200.0
    acc_noise: float = 2.0e-3
    gyr_noise: float = 1.7e-4
    acc_walk: float = 3.0e-3
    gyr_walk: float = 2.0e-5
    T_f_s: tuple = tuple(np.eye(4).reshape(-1).tolist())


@dataclass(frozen=True)
class DatasetConfig:
    cameras: tuple = ()
    imu: Optional[ImuCalib] = None


def load_slam_config(path: str) -> SLAMConfig:
    """Parse a config.yaml in the reference's layout."""
    with open(path) as f:
        y = yaml.safe_load(f)
    feats = []
    for fd in y.get("features_handled", []) or []:
        feats.append(FeatureConfig(
            # accept both our keys and the reference's *_label spellings
            # (ros/config/config.yaml:105-167)
            label=fd.get("label", fd.get("label_feature", "pointxd")),
            detector=fd.get("detector", fd.get("detector_label", "fast")),
            tracker=fd.get("tracker", fd.get("tracker_label", "klt")),
            matcher=fd.get("matcher", fd.get("matcher_label", "brief")),
            n_total=int(fd.get("number_detected", 400)),
            n_per_cell=int(fd.get("number_kept", 5)),
            max_reproj_err=float(fd.get("max_reproj_err", 2.0)),
            folder=str(fd.get("folder", "")),
            pattern_side=float(fd.get("pattern_side", 1.0)),
        ))
    kw = {}
    for key in ("slam_mode", "tracker", "pose_estimator", "optimizer",
                "contrast_enhancer"):
        if key in y:
            kw[key] = str(y[key])
    for key in ("min_kf_number", "max_kf_number", "fixed_frame_number",
                "min_lmk_number", "ba_iterations", "lc_min_hits",
                "archive_capacity", "archive_max_nodes"):
        if key in y:
            kw[key] = int(y[key])
    for key in ("min_movement_parallax", "max_movement_parallax", "ZNCC_tsh",
                "max_length_tsh", "lc_consensus", "reloc_consensus",
                "reloc_search_px"):
        if key in y:
            kw[key.lower()] = float(y[key])
    for key in ("marginalization", "sparsification", "mesh3d", "pose_graph",
                "global_map", "multithreading", "async_health", "marg_f64"):
        if key in y:
            kw[key] = bool(int(y[key]))
    if feats:
        kw["features"] = tuple(feats)
    cfg = SLAMConfig(**kw)
    caps = Capacities(K=cfg.max_kf_number + 1)
    return dataclasses.replace(cfg, caps=caps)


def load_dataset_config(path: str) -> DatasetConfig:
    """Parse a dataset yaml (adataprovider.cpp:28-175 layout)."""
    with open(path) as f:
        y = yaml.safe_load(f)
    cams = []
    ncam = int(y.get("ncam", 0))
    for i in range(ncam):
        c = y.get(f"cam{i}", y.get("camera_%d" % i))
        if c is None:
            continue
        T = np.asarray(c["T_BS"]["data"], np.float64).reshape(4, 4)
        # reference spelling aliases (adataprovider.cpp:80-175 accepts the
        # projection_model strings used by ros/config/dataset/*.yaml)
        model = str(c.get("camera_model", c.get("projection_model", "pinhole")))
        model = {"equidistant": "fisheye", "kannala_brandt": "fisheye",
                 "ds": "double_sphere"}.get(model, model)
        cams.append(CameraCalib(
            model=model,
            width=int(c["resolution"][0]), height=int(c["resolution"][1]),
            intrinsics=tuple(float(v) for v in c["intrinsics"]),
            distortion=tuple(float(v) for v in c.get("distortion_coefficients", [])),
            T_f_s=tuple(T.reshape(-1).tolist()),
        ))
    imu = None
    if "imu" in y or "imu0" in y:
        iy = y.get("imu", y.get("imu0"))
        T = np.asarray(iy["T_BS"]["data"], np.float64).reshape(4, 4) if "T_BS" in iy else np.eye(4)
        imu = ImuCalib(
            rate_hz=float(iy.get("rate_hz", 200.0)),
            acc_noise=float(iy.get("accelerometer_noise_density", 2.0e-3)),
            gyr_noise=float(iy.get("gyroscope_noise_density", 1.7e-4)),
            acc_walk=float(iy.get("accelerometer_random_walk", 3.0e-3)),
            gyr_walk=float(iy.get("gyroscope_random_walk", 2.0e-5)),
            T_f_s=tuple(T.reshape(-1).tolist()),
        )
    return DatasetConfig(cameras=tuple(cams), imu=imu)

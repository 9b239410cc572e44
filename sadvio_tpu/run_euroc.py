"""Offline entry point: EuRoC replay with config-driven mode dispatch.

TPU-native equivalent of the reference's offline main
(reference: cpp/main.cpp:3-51 -- parse argv [config dir, EuRoC dir], build
SLAMParameters, dispatch one of the 5 SLAM modes on the slam_mode string,
spawn grabber + front/back-end threads, write log_slam/).

Usage:
    python -m sadvio_tpu.run_euroc <config_dir> <euroc_mav_dir> [max_frames]

config_dir must hold config.yaml (+ optionally dataset/<name>.yaml pointed
to by `dataset:`); both files use the reference's YAML layouts
(pipeline/config.py).  The grabber thread + queue of the reference is the
native prefetching loader when built (pipeline/native_io.py), else the
Python provider.
"""

from __future__ import annotations

import os
import sys
import time


def build_slam(cfg, rig, imu_params):
    from sadvio_tpu.pipeline.mono import MonoSLAM
    from sadvio_tpu.pipeline.nofov_mode import NoFovSLAM
    from sadvio_tpu.pipeline.slam import StereoSLAM

    mode = cfg.slam_mode
    if mode in ("mono", "monovio"):
        return MonoSLAM(rig, cfg, imu_params=imu_params)
    if mode == "nofov":
        return NoFovSLAM(rig, cfg, imu_params=imu_params)
    if mode in ("bimono", "bimonovio"):
        return StereoSLAM(rig, cfg, imu_params=imu_params)
    raise SystemExit(f"unknown slam_mode: {mode}")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 2
    # in-process platform override: this machine's sitecustomize force-sets
    # jax_platforms at boot (the JAX_PLATFORMS env var is overridden), so a
    # subprocess that must run on CPU (e.g. the comparison protocol's
    # dry-test) needs an explicit config update before backend init
    plat = os.environ.get("SADVIO_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    config_dir, data_dir = argv[0], argv[1]
    max_frames = int(argv[2]) if len(argv) > 2 else None

    from sadvio_tpu.models import imu as imu_mod
    from sadvio_tpu.pipeline import config as cfg_mod
    from sadvio_tpu.pipeline import euroc

    cfg = cfg_mod.load_slam_config(os.path.join(config_dir, "config.yaml"))
    ds_path = None
    for cand in ("dataset.yaml", os.path.join("dataset", "eth.yaml")):
        p = os.path.join(config_dir, cand)
        if os.path.exists(p):
            ds_path = p
            break
    dataset = cfg_mod.load_dataset_config(ds_path) if ds_path else None

    provider = None
    try:
        from sadvio_tpu.pipeline.native_io import NativeEurocProvider

        provider = NativeEurocProvider(data_dir)
        print(f"[native loader] {provider.n_frames} synced frames")
    except Exception as e:  # fall back to the Python provider
        print(f"[python loader] (native unavailable: {e})")
        provider = euroc.EurocProvider(data_dir, dataset=dataset,
                                       contrast=cfg.contrast_enhancer)

    if dataset is not None and dataset.cameras:
        rig = euroc.rig_from_dataset(dataset)
        imu_params = (
            imu_mod.ImuParams(
                acc_noise=dataset.imu.acc_noise, gyr_noise=dataset.imu.gyr_noise,
                acc_walk=dataset.imu.acc_walk, gyr_walk=dataset.imu.gyr_walk,
                rate_hz=dataset.imu.rate_hz,
            )
            if dataset.imu else None
        )
    else:
        raise SystemExit("a dataset yaml with camera calibration is required")

    slam = build_slam(cfg, rig, imu_params)
    t0 = time.perf_counter()
    n = 0
    # one-frame-lookahead prefetch loop (the run() pipeline): the next
    # frame's image upload + IMU pack ride the device link during the
    # current frame's compute, so the native loader's prefetch ring and the
    # device-upload overlap both engage on this path
    it = provider.frames(max_frames=max_frames)
    frame = next(it, None)
    pending = slam._upload_images(frame) if frame is not None else None
    out = {}
    while frame is not None:
        nxt = next(it, None)
        out = slam.process_frame(frame, images_dev=pending, prefetch_frame=nxt)
        pending = slam._prefetched
        frame = nxt
        n += 1
        if n % 50 == 0:
            print(f"frame {n}: kf={len(slam.kf_traj)} "
                  f"ntrk={out.get('n_tracked', '-')}")
    dt = time.perf_counter() - t0
    print(f"{n} frames in {dt:.1f}s ({n / max(dt, 1e-9):.1f} fps)")
    slam.write_logs("log_slam")
    print("wrote log_slam/results.csv, vio_poses.csv")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

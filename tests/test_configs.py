"""Every shipped config preset must parse and build a consistent rig.

Mirrors the reference's implicit contract that each ros/config/dataset/*.yaml
works with SLAMParameters (slamParameters.cpp:44-61): the preset directories
under configs/ are the user-facing equivalents.
"""

import glob
import os

import numpy as np
import pytest

from sadvio_tpu.pipeline import config as cfg_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRESETS = sorted(
    d for d in glob.glob(os.path.join(REPO, "configs", "*"))
    if os.path.isdir(d)
)


def test_presets_exist():
    assert len(PRESETS) >= 5


@pytest.mark.parametrize("preset", PRESETS, ids=[os.path.basename(p) for p in PRESETS])
def test_preset_loads(preset):
    cfg = cfg_mod.load_slam_config(os.path.join(preset, "config.yaml"))
    ds = cfg_mod.load_dataset_config(os.path.join(preset, "dataset.yaml"))
    assert cfg.slam_mode in ("mono", "bimono", "monovio", "bimonovio", "nofov")
    n_needed = 1 if cfg.slam_mode in ("mono", "monovio") else 2
    assert len(ds.cameras) >= n_needed
    for cam in ds.cameras:
        assert cam.model in ("pinhole", "fisheye", "double_sphere", "omni")
        assert cam.width > 0 and cam.height > 0
        assert len(cam.intrinsics) >= 4
        fx, fy, cx, cy = cam.intrinsics[:4]
        assert 0 < cx < cam.width and 0 < cy < cam.height
        T = np.asarray(cam.T_f_s).reshape(4, 4)
        # valid rigid transform: orthonormal rotation block
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert abs(np.linalg.det(R) - 1.0) < 1e-6
    if cfg.slam_mode.endswith("vio"):
        assert ds.imu is not None
        assert ds.imu.rate_hz > 0
    # the rig builder must accept the calibration
    if len(ds.cameras) >= 1:
        from sadvio_tpu.pipeline.euroc import rig_from_dataset

        rig = rig_from_dataset(ds)
        assert rig.C == len(ds.cameras)


def test_lc_gate_keys_parse(tmp_path):
    """The loop-closure/relocalization gates are YAML-configurable."""
    p = tmp_path / "config.yaml"
    p.write_text(
        "slam_mode: bimono\nglobal_map: 1\npose_graph: 1\n"
        "lc_min_hits: 11\nlc_consensus: 0.8\nreloc_consensus: 0.7\n"
        "reloc_search_px: 40.0\narchive_capacity: 512\n"
        "archive_max_nodes: 99\n")
    cfg = cfg_mod.load_slam_config(str(p))
    assert cfg.lc_min_hits == 11
    assert cfg.lc_consensus == 0.8
    assert cfg.reloc_consensus == 0.7
    assert cfg.reloc_search_px == 40.0
    assert cfg.archive_capacity == 512
    assert cfg.archive_max_nodes == 99


MODEL_CLASS = {
    "pinhole": "Pinhole", "fisheye": "Fisheye",
    "double_sphere": "DoubleSphere", "omni": "Omni",
}


@pytest.mark.parametrize("preset", PRESETS, ids=[os.path.basename(p) for p in PRESETS])
def test_preset_builds_pipeline(preset):
    """Each preset must construct its full SLAM pipeline object with the
    right camera-model class and optimizer dispatch (slamParameters.cpp:44-281
    contract: every shipped preset works with the factory)."""
    from sadvio_tpu.models import imu as imu_mod
    from sadvio_tpu.pipeline.euroc import rig_from_dataset
    from sadvio_tpu.run_euroc import build_slam

    cfg = cfg_mod.load_slam_config(os.path.join(preset, "config.yaml"))
    ds = cfg_mod.load_dataset_config(os.path.join(preset, "dataset.yaml"))
    rig = rig_from_dataset(ds)
    assert type(rig.cam).__name__ == MODEL_CLASS[ds.cameras[0].model]
    imu_params = (
        imu_mod.ImuParams(
            acc_noise=ds.imu.acc_noise, gyr_noise=ds.imu.gyr_noise,
            acc_walk=ds.imu.acc_walk, gyr_walk=ds.imu.gyr_walk,
            rate_hz=ds.imu.rate_hz,
        ) if ds.imu is not None else None
    )
    slam = build_slam(cfg, rig, imu_params)
    want_angular = cfg.optimizer.lower().startswith("angular")
    assert bool(slam._ba_opts.angular) == want_angular

"""Visualizer surface: trajectory, tracked-feature overlay, mesh wireframe
(the reference RViz visualizer's artifact set, rosVisualizer.h:84-95,195-565,
rendered to PNG in this environment)."""

import dataclasses
import os

import numpy as np
import pytest

from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM
from sadvio_tpu.tools import visualize


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    world = synthetic.make_world(seed=2, n_frames=16, width=320, height=240,
                                 n_points=200, imu_noise=False)
    cfg = SLAMConfig(
        slam_mode="bimono", max_kf_number=5, min_lmk_number=25,
        max_movement_parallax=1.0, min_movement_parallax=0.02,
        mesh3d=True, max_length_tsh=2.0, zncc_tsh=0.5,
        caps=Capacities(K=6, L=160, P=24, pyr_levels=3, klt_radius=5))
    slam = StereoSLAM(world.rig, cfg)
    for f in world.frames:
        slam.process_frame(f)
    return world, slam


def test_snapshot_overlays(run, tmp_path):
    world, slam = run
    files = visualize.snapshot(slam, world.frames[-1], str(tmp_path / "snap"))
    assert any(f.endswith("_features.png") for f in files)
    assert any(f.endswith("_mesh.png") for f in files)
    for f in files:
        assert os.path.getsize(f) > 5000  # a real render, not an empty figure


def test_plot_run(run, tmp_path):
    world, slam = run
    out = visualize.plot_run(slam, str(tmp_path / "traj.png"), world=world)
    assert os.path.getsize(out) > 5000


def test_multithreading_backend_executor(run):
    """config multithreading=1 routes the backend step through the
    BackendExecutor (PP split); trajectory quality is preserved."""
    world, _ = run
    cfg = SLAMConfig(
        slam_mode="bimono", max_kf_number=5, min_lmk_number=25,
        max_movement_parallax=1.0, min_movement_parallax=0.02,
        multithreading=True,
        caps=Capacities(K=6, L=160, P=24, pyr_levels=3, klt_radius=5))
    slam = StereoSLAM(world.rig, cfg)
    assert slam.backend_exec is not None
    est = slam.run(world.frames)
    ate = synthetic.ate_rmse(est, world.gt_t[: len(est)])
    assert ate < 0.05, f"PP-routed ATE {ate:.4f} m"

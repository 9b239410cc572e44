"""Checkpoint/resume + profiler + CSV logging tests."""

import os

import jax
import numpy as np
import pytest

from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM
from sadvio_tpu.utils import checkpoint as ckpt
from sadvio_tpu.utils.profiler import Profiler


def small_config():
    return SLAMConfig(
        slam_mode="bimono", max_kf_number=5, min_lmk_number=25,
        max_movement_parallax=1.0, min_movement_parallax=0.02,
        caps=Capacities(K=6, L=160, P=24, pyr_levels=3, klt_radius=5),
    )


@pytest.fixture(scope="module")
def world():
    return synthetic.make_world(seed=9, n_frames=24, width=320, height=240,
                                n_points=200)


def test_checkpoint_resume_identical(world, tmp_path):
    """Save mid-run, resume in a fresh instance: identical trajectory."""
    a = StereoSLAM(world.rig, small_config())
    for f in world.frames[:12]:
        a.process_frame(f)
    path = str(tmp_path / "state.npz")
    ckpt.save_slam(path, a)

    b = StereoSLAM(world.rig, small_config())
    ckpt.load_slam(path, b)
    # kf_pyr is derived data not in the checkpoint: rebuild from the frame
    b.kf_pyr = a.kf_pyr
    for f in world.frames[12:]:
        a.process_frame(f)
        b.process_frame(f)
    ta = np.asarray([t for _, _, t in a.traj])
    tb = np.asarray([t for _, _, t in b.traj])
    np.testing.assert_allclose(ta, tb, atol=1e-6)
    # host-side mirrors restored (round-3 fields)
    assert b.vi_initialized == a.vi_initialized
    assert b._have_priors == a._have_priors
    assert b.kf_ts == a.kf_ts
    assert len(b.archived_kf) == len(a.archived_kf)
    # per-KF covariances stay aligned with kf_ts across resume (they weight
    # NFR pose-graph edges; a truncated list crashes the roll path)
    assert len(b.kf_cov) == len(b.kf_ts)
    np.testing.assert_allclose(np.asarray(b.kf_cov), np.asarray(a.kf_cov),
                               atol=1e-7)


def test_checkpoint_pre_src_compat(world, tmp_path):
    """A checkpoint saved before GlobalMap gained its `src` leaf still
    loads: the missing leaf defaults to full(-1) (no provenance)."""
    import dataclasses
    import json

    cfg = dataclasses.replace(small_config(), global_map=True)
    a = StereoSLAM(world.rig, cfg)
    for f in world.frames[:10]:
        a.process_frame(f)
    path = str(tmp_path / "state.npz")
    ckpt.save_slam(path, a)

    # simulate the old format: drop the gm.src leaf and renumber
    data = np.load(path, allow_pickle=False)
    names = sorted((k for k in data.files if k != "meta"),
                   key=lambda s: int(s.split("_")[1]))
    paths, _ = zip(*jax.tree_util.tree_flatten_with_path(
        ckpt._device_state(a))[0])
    src_pos = next(
        i for i, p in enumerate(paths)
        if any(getattr(k, "key", None) == "gm" for k in p)
        and any(getattr(k, "name", None) == "src" for k in p))
    kept = [data[n] for i, n in enumerate(names) if i != src_pos]
    old_path = str(tmp_path / "old.npz")
    np.savez_compressed(old_path, *kept, meta=data["meta"])

    b = StereoSLAM(world.rig, cfg)
    ckpt.load_slam(old_path, b)
    assert np.all(np.asarray(b.global_map_state.src) == -1)
    np.testing.assert_allclose(np.asarray(b.global_map_state.pos),
                               np.asarray(a.global_map_state.pos))
    assert b.n_kf == a.n_kf


def test_run_logging(world, tmp_path):
    slam = StereoSLAM(world.rig, small_config())
    log = str(tmp_path / "log_slam")
    est = slam.run(world.frames, log_dir=log, profile=True)
    assert os.path.exists(os.path.join(log, "results.csv"))
    assert os.path.exists(os.path.join(log, "vio_poses.csv"))
    assert os.path.exists(os.path.join(log, "slam_profiler.txt"))
    rows = open(os.path.join(log, "results.csv")).read().strip().splitlines()
    assert len(rows) == len(slam.kf_traj)
    assert len(rows[0].split(",")) == 13  # ts + 3x4 pose
    prof = open(os.path.join(log, "slam_profiler.txt")).read()
    assert "frame_total" in prof


def test_profiler_stages():
    p = Profiler()
    p.tic()
    x = sum(range(1000))
    p.toc("stage_a")
    with p.stage("stage_b"):
        _ = x * 2
    txt = p.dump()
    assert "stage_a" in txt and "stage_b" in txt
    assert p.counts["stage_a"] == 1

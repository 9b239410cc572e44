"""Long-run soak: the kitchen-sink pipeline over hundreds of frames.

The reference's working regime is thousands of frames (EuRoC sequences);
this soak drives every optional subsystem at once (marginalization +
sparsification + global map + pose graph + mesh + linexd) over a long
excursion with a genuine revisit and one forced tracking failure, and
asserts the properties that only show up at length:

  * bounded host memory: archive compaction caps archived_kf /
    pose_graph_edges (slam._maybe_compact_archive)
  * no recompiles after warmup: the stage-kernel jit caches stop growing
  * bounded per-frame wall drift: the tail of the run is not slower than
    the middle (no O(run-length) work on the frame path)
  * the estimator survives: reset + recovery, finite poses, sane ATE
"""

import time

import numpy as np
import pytest

from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, FeatureConfig, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM

N_FRAMES = 360
ARCHIVE_CAP = 16
OCCLUDE = range(160, 166)  # 6 black frames: > 5 consecutive PnP failures


@pytest.fixture(scope="module")
def soak_world():
    return synthetic.make_world(
        seed=13, n_frames=N_FRAMES, width=320, height=240, n_points=420,
        n_lines=10, imu_noise=False, noise_px=1.0,
        trajectory="excursion", wall_x=(-5.0, 11.0))


def test_soak_kitchen_sink(soak_world):
    cfg = SLAMConfig(
        slam_mode="bimono", max_kf_number=5, min_lmk_number=25,
        max_movement_parallax=0.4, min_movement_parallax=0.02,
        marginalization=True, sparsification=True,
        global_map=True, pose_graph=True, mesh3d=True,
        archive_max_nodes=ARCHIVE_CAP,
        features=(FeatureConfig(), FeatureConfig(label="linexd")),
        caps=Capacities(K=6, L=256, P=24, pyr_levels=3, klt_radius=5),
    )
    slam = StereoSLAM(soak_world.rig, cfg)

    stage_kernels = [StereoSLAM._frontend, StereoSLAM._insert_kf,
                     StereoSLAM._backend, StereoSLAM._marg_roll,
                     StereoSLAM._pyramids]

    def cache_sizes():
        try:
            return [k._cache_size() for k in stage_kernels]
        except AttributeError:  # jax version without the probe
            return None

    wall = np.zeros(N_FRAMES)
    warm_caches = None
    n_kf = 0
    for i, f in enumerate(soak_world.frames):
        if i in OCCLUDE:
            f = f._replace(images=np.zeros_like(f.images))
        t0 = time.perf_counter()
        out = slam.process_frame(f)
        wall[i] = time.perf_counter() - t0
        n_kf += bool(out.get("is_kf"))
        if i == 220:  # post-reset recovery done; every code path has run
            warm_caches = cache_sizes()

    # --- survival ---------------------------------------------------------
    assert slam.n_resets >= 1, "occlusion did not force a reset"
    assert np.isfinite(np.asarray(slam.t_cur)).all()
    assert n_kf >= 20, n_kf
    slam._flush_health()
    assert len(slam.traj) == N_FRAMES  # one pose row per frame, none lost

    # --- bounded host memory ---------------------------------------------
    # soft cap: loop-closure endpoints are protected, allow 2x headroom
    assert len(slam.archived_kf) <= 2 * ARCHIVE_CAP, len(slam.archived_kf)
    assert len(slam.pose_graph_edges) <= 4 * ARCHIVE_CAP, \
        len(slam.pose_graph_edges)
    # compaction actually ran (the run archives far more KFs than the cap)
    assert n_kf - slam.caps.K > len(slam.archived_kf)

    # --- no recompiles after warmup --------------------------------------
    if warm_caches is not None:
        end_caches = cache_sizes()
        assert end_caches == warm_caches, (
            f"stage kernels recompiled after warmup: "
            f"{warm_caches} -> {end_caches}")

    # --- bounded per-frame wall drift ------------------------------------
    mid = np.median(wall[200:260])
    tail = np.median(wall[300:355])
    assert tail < 2.0 * mid + 0.02, (
        f"frame wall drifts with run length: mid {mid*1e3:.1f} ms -> "
        f"tail {tail*1e3:.1f} ms")

    # --- accuracy over the long run --------------------------------------
    R0, t0 = soak_world.gt_R[0], soak_world.gt_t[0]
    gt = np.stack([R0.T @ (soak_world.gt_t[i] - t0)
                   for i in range(N_FRAMES)])
    est = np.asarray([t for _, _, t in slam.traj])
    ate = synthetic.ate_rmse(est, gt[: len(est)])
    assert ate < 0.35, f"soak ATE {ate:.3f} m"
    # the windowed pose-graph correction stays finite and bounded in size
    nodes = slam.optimize_archive()
    assert all(np.isfinite(t).all() for _, _, t in nodes)

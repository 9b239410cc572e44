"""Genuine revisit loop closure, end to end -- no manufactured state.

The excursion trajectory pans 2.2 m out with a co-directed yaw and returns:
the start-of-run landmarks leave the field of view, their window
observations roll out (marginalized -> archived into the descriptor global
map), and the return is a true revisit.  Descriptor resurrection bursts
emit PnP loop-closure edges to the archived keyframes, and
optimize_archive -- fusing them with NFR chain + live-window odometry
edges -- measurably reduces the drift accumulated over the excursion.
(Beyond reference: the reference archives NFR factors but ships no
consumer.)
"""

import numpy as np

from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM


def test_revisit_loop_closure_reduces_drift():
    world = synthetic.make_world(seed=11, n_frames=90, width=320, height=240,
                                 n_points=420, imu_noise=False, noise_px=1.0,
                                 trajectory="excursion", wall_x=(-5.0, 11.0))
    cfg = SLAMConfig(
        slam_mode="bimono", max_kf_number=5, min_lmk_number=25,
        max_movement_parallax=1.0, min_movement_parallax=0.02,
        marginalization=True, sparsification=True,
        global_map=True, pose_graph=True,
        caps=Capacities(K=6, L=256, P=24, pyr_levels=3, klt_radius=5),
    )
    slam = StereoSLAM(world.rig, cfg)
    lcs, res_total = [], 0
    for f in world.frames:
        out = slam.process_frame(f)
        res_total += out.get("gm_resurrected", 0)
        if "loop_closure" in out:
            lcs.append(out["loop_closure"])
    assert slam.n_resets == 0
    # the excursion archived map content and the return resurrected it
    assert len(slam.archived_kf) >= 10
    assert res_total >= 10, f"only {res_total} resurrections on the revisit"
    long_lcs = [(a, b) for a, b in lcs if b - a > 1.0]
    assert len(long_lcs) >= 3, f"loop closures: {lcs}"

    # ground truth in the estimator gauge (world = first body frame)
    R0, t0 = world.gt_R[0], world.gt_t[0]
    gt = {float(f.ts): R0.T @ (world.gt_t[i] - t0)
          for i, f in enumerate(world.frames)}
    nodes = slam.optimize_archive()
    node_t = {}
    for ts, R, t in nodes:
        node_t.setdefault(float(ts), np.asarray(t))
    err_raw, err_opt = [], []
    for j, ts in enumerate(slam.kf_ts):
        err_raw.append(np.linalg.norm(np.asarray(slam.window.t[j]) - gt[ts]))
        err_opt.append(np.linalg.norm(node_t[ts] - gt[ts]))
    assert np.isfinite(err_opt).all()
    # drift at the end of the loop drops materially.  The exact ratio is
    # RNG-stream sensitive (the closure accuracy floor is the drift the
    # archived landmarks carried when archived): measured 0.080 -> 0.032
    # on one stream, 0.075 -> 0.054 on another -- gate at 0.8 so the test
    # asserts the mechanism, not one stream's luck
    assert err_opt[-1] < 0.8 * err_raw[-1], (
        f"loop closure did not close drift: {err_opt[-1]:.4f} vs "
        f"{err_raw[-1]:.4f}")
    # the worst live-window error must not grow: the graph may
    # redistribute the misclosure along the chain, but not amplify it
    assert np.max(err_opt) <= 1.05 * np.max(err_raw)


def test_strict_gates_suppress_relocalization():
    """The loop-closure/relocalization gates are CONFIG keys, not source
    constants: an impossibly strict lc_min_hits suppresses both the
    relocalization and any closure edge on the same occlusion scenario that
    relocalizes under the default gates (test below)."""
    world = synthetic.make_world(seed=7, n_frames=40, width=320, height=240,
                                 n_points=220, imu_noise=False)
    cfg = SLAMConfig(
        slam_mode="bimono", max_kf_number=5, min_lmk_number=25,
        max_movement_parallax=1.0, min_movement_parallax=0.02,
        marginalization=True, sparsification=True,
        global_map=True, pose_graph=True,
        lc_min_hits=999,
        caps=Capacities(K=6, L=200, P=24, pyr_levels=3, klt_radius=5),
    )
    slam = StereoSLAM(world.rig, cfg)
    relocalized, closures = False, 0
    for i, f in enumerate(world.frames):
        if 20 <= i < 26:
            f = f._replace(images=np.zeros_like(f.images))
        out = slam.process_frame(f)
        relocalized |= out.get("relocalized", False)
        closures += "loop_closure" in out
    assert slam.n_resets >= 1
    assert not relocalized, "strict gate did not suppress relocalization"
    assert closures == 0, closures


def test_relocalization_after_reset_keeps_gauge():
    """Tracking failure (occluded frames) -> reset -> the bootstrap KF
    relocalizes against the archived global map and CONTINUES the original
    gauge instead of re-zeroing at the origin (beyond reference: the
    reference's reset always restarts the world frame)."""
    world = synthetic.make_world(seed=7, n_frames=40, width=320, height=240,
                                 n_points=220, imu_noise=False)
    cfg = SLAMConfig(
        slam_mode="bimono", max_kf_number=5, min_lmk_number=25,
        max_movement_parallax=1.0, min_movement_parallax=0.02,
        marginalization=True, sparsification=True,
        global_map=True, pose_graph=True,
        caps=Capacities(K=6, L=200, P=24, pyr_levels=3, klt_radius=5),
    )
    slam = StereoSLAM(world.rig, cfg)
    relocalized = False
    for i, f in enumerate(world.frames):
        if 20 <= i < 26:  # 6 black frames: > 5 consecutive PnP failures
            f = f._replace(images=np.zeros_like(f.images))
        out = slam.process_frame(f)
        relocalized |= out.get("relocalized", False)
    assert slam.n_resets >= 1, "occlusion did not trigger a reset"
    assert relocalized, "bootstrap did not relocalize against the archive"

    # post-recovery trajectory stays in the ORIGINAL gauge: compare the
    # final estimate against ground truth expressed in the first frame's
    # gauge.  Without relocalization the gauge re-zeros at frame ~27 and
    # the error would be ~|t_gt(27)| (decimeters).
    R0, t0 = world.gt_R[0], world.gt_t[0]
    gt_last = R0.T @ (world.gt_t[len(world.frames) - 1] - t0)
    err = np.linalg.norm(np.asarray(slam.t_cur) - gt_last)
    assert err < 0.12, f"post-recovery gauge error {err:.3f} m"

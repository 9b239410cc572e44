"""NoFov pipeline end-to-end: metric scale recovered from the rigid rig.

Reference: cpp/src/slamNonOverlappingFov.cpp (pipeline), nofov_test.cpp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.nofov_mode import NoFovSLAM


@pytest.mark.slow
def test_nofov_metric_scale():
    world = synthetic.make_nofov_world(seed=4, n_frames=40, width=320,
                                       height=240, n_points=200)
    cfg = SLAMConfig(
        slam_mode="nofov", max_kf_number=5, min_lmk_number=25,
        max_movement_parallax=1.0, min_movement_parallax=0.02,
        marginalization=True, sparsification=True,
        # L is split between the cameras: cam0 [0,L/2), cam1 [L/2,L)
        caps=Capacities(K=6, L=320, P=24, pyr_levels=3, klt_radius=5),
    )
    slam = NoFovSLAM(world.rig, cfg, boot_parallax_deg=1.5)
    scale_ratio = None
    i0 = None
    for i, f in enumerate(world.frames):
        out = slam.process_frame(f)
        if i0 is None and slam.initialized:
            i0 = i
        if "scale_applied" in out:
            scale_ratio = out["scale_applied"]
    assert slam.initialized, "nofov bootstrap never triggered"
    est = np.asarray([t for _, _, t in slam.traj])[i0:]
    gt = world.gt_t[i0: i0 + len(est)]
    # trajectory shape must be right regardless of scale
    ate_shape = synthetic.ate_rmse(est, gt, with_scale=True)
    assert ate_shape < 0.08, f"nofov shape ATE {ate_shape:.4f} m"
    if scale_ratio is not None:
        # with the rigidity-derived scale applied, the *metric* (no-scale-
        # alignment) ATE must also be small
        ate_metric = synthetic.ate_rmse(est, gt, with_scale=False)
        assert ate_metric < 0.25, f"nofov metric ATE {ate_metric:.4f} m"


def test_nofov_recovers_from_scale_perturbation():
    """Continuous scale maintenance (slamNonOverlappingFov.cpp:423-633):
    after a mid-sequence 1.4x scale corruption of the window, the per-KF
    scale RANSAC + damped correction + the joint two-camera window BA
    (whose rigid lever arm observes metric scale) pull the map back.

    Observability note: the lever-displacement signal |(R-I) t_s1| must sit
    above the sub-pixel correspondence noise floor, hence the rotation-rich
    trajectory and vehicle-scale 1.5 m lever here; at the default 0.4 m
    lever with gentle motion the scale direction is a near-null direction
    of the bundle (verified) and NO estimator can recover it."""
    world = synthetic.make_nofov_world(seed=6, n_frames=52, width=320,
                                       height=240, n_points=200,
                                       rot_scale=1.5, lever=1.5)
    cfg = SLAMConfig(
        slam_mode="nofov", max_kf_number=5, min_lmk_number=25,
        max_movement_parallax=0.5, min_movement_parallax=0.02,
        caps=Capacities(K=6, L=320, P=24, pyr_levels=3, klt_radius=5),
    )
    slam = NoFovSLAM(world.rig, cfg, boot_parallax_deg=1.5)
    perturbed_at = None
    for i, f in enumerate(world.frames):
        out = slam.process_frame(f)
        if perturbed_at is None and slam.scale_state["applied"] and i >= 20:
            slam._apply_scale_window(1.4)  # corrupt the window scale
            perturbed_at = i
    assert slam.initialized and slam.scale_state["applied"]
    assert perturbed_at is not None, "scale never bootstrapped"
    assert slam.scale_state["n_est"] >= 2, "continuous estimation inactive"
    # camera-1 landmarks participate in the joint bundle
    L = slam.caps.L
    assert int(np.asarray(slam.window.lmk_mask)[L // 2:].sum()) > 20
    # segment scale over the post-recovery tail must be back near metric
    est = np.asarray([t for _, _, t in slam.traj])
    tail = 10
    seg_e = np.linalg.norm(np.diff(est[-tail:], axis=0), axis=-1).sum()
    seg_g = np.linalg.norm(
        np.diff(world.gt_t[len(est) - tail: len(est)], axis=0), axis=-1).sum()
    ratio = seg_e / max(seg_g, 1e-9)
    assert 0.75 < ratio < 1.3, f"tail scale {ratio:.3f} did not recover"

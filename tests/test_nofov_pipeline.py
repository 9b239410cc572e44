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
        caps=Capacities(K=6, L=160, P=24, pyr_levels=3, klt_radius=5),
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

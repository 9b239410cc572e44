"""Standalone heavy pipeline drives: IMU-bias recovery, exotic camera
models, and the hardened (EuRoC-proxy stress) world.

Split from test_pipeline.py on purpose: each of these builds a full set of
pipeline traces (different camera pytree types retrace every stage), and
this machine's XLA:CPU compiler SIGSEGVs when too many executables
accumulate in one module (tests/conftest.py clears compile caches at module
boundaries).
"""

import dataclasses

import numpy as np
import pytest

from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM
from tests.test_pipeline import small_config


def test_bimonovio_recovers_imu_bias():
    """Stereo VIO with a true nonzero gyro/accel bias: VIInit + window VI-BA
    must recover it and hold ATE with noisy IMU (imu_test.cpp biasEstimation
    pattern at the pipeline level)."""
    gyr_bias = np.array([0.02, -0.015, 0.01])
    acc_bias = np.array([0.05, 0.04, -0.06])
    # rotation-rich trajectory: accel bias is only observable against the
    # gravity-tilt degeneracy when the body rotates enough
    w = synthetic.make_world(seed=5, n_frames=40, width=320, height=240,
                             n_points=200, imu_noise=True, rot_scale=4.0,
                             acc_bias=acc_bias, gyr_bias=gyr_bias)
    slam = StereoSLAM(w.rig, small_config("bimonovio"), imu_params=w.imu_params)
    est = slam.run(w.frames)
    assert slam.vi_initialized, "VIInit never converged"
    ate = synthetic.ate_rmse(est, w.gt_t[: len(est)])
    assert ate < 0.06, f"ATE {ate:.4f} m with IMU bias"
    k = slam.n_kf - 1
    bg = np.asarray(slam.window.bg[k])
    assert np.linalg.norm(bg - gyr_bias) < 0.01, f"gyro bias {bg} vs {gyr_bias}"
    ba_est = np.asarray(slam.window.ba[k])
    # accel bias couples with the residual gravity tilt: over a 2 s window a
    # ~0.5 deg tilt ambiguity = ~0.09 m/s^2 apparent bias is irreducible
    assert np.linalg.norm(ba_est - acc_bias) < 0.15, f"accel bias {ba_est}"


@pytest.mark.parametrize("camera", ["fisheye", "double_sphere", "omni"])
def test_bimono_exotic_camera_angular_ba(camera):
    """Exotic camera rigs + angular (bearing-vector) BA end-to-end: the
    AngularAdjustment optimizer path drives the full pipeline for every
    non-pinhole model, not just a unit solve (optimizer: AngularAnalytic,
    slamParameters.cpp:263-281)."""
    w = synthetic.make_world(seed=13, n_frames=30, width=320, height=240,
                             n_points=200, imu_noise=False, camera=camera)
    cfg = dataclasses.replace(small_config("bimono"), optimizer="angular")
    slam = StereoSLAM(w.rig, cfg)
    assert slam._ba_opts.angular
    est = slam.run(w.frames)
    assert len(slam.kf_traj) >= 3
    ate = synthetic.ate_rmse(est, w.gt_t[: len(est)])
    assert ate < 0.06, f"{camera} angular-BA ATE {ate:.4f} m"


def test_bimonovio_hardened_world():
    """EuRoC-proxy stress: per-pixel noise + exposure flicker + a moving
    occluding object.  The full stereo-VIO stack (KLT fb-check, epipolar
    gate, Huber BA, outlier removal, ESKF) must hold the ATE bar."""
    w = synthetic.make_world(seed=9, n_frames=40, width=320, height=240,
                             n_points=200, imu_noise=True, noise_px=2.0,
                             gain_jitter=0.12, offset_jitter=8.0,
                             occluder=True)
    slam = StereoSLAM(w.rig, small_config("bimonovio"), imu_params=w.imu_params)
    est = slam.run(w.frames)
    assert slam.n_resets == 0, "stress world should not force a reset"
    ate = synthetic.ate_rmse(est, w.gt_t[: len(est)])
    assert ate < 0.08, f"hardened-world ATE {ate:.4f} m"

"""End-to-end pipeline tests on the synthetic world (small capacities).

The de-facto integration test of the reference is an EuRoC replay scored on
log_slam/results.csv; here the synthetic world provides exact ground truth
(see sadvio_tpu/pipeline/synthetic.py).
"""

import dataclasses

import numpy as np
import pytest

from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM


def small_config(mode):
    return SLAMConfig(
        slam_mode=mode,
        max_kf_number=5,
        min_lmk_number=25,
        max_movement_parallax=1.0,
        min_movement_parallax=0.02,
        marginalization=True,
        sparsification=True,
        caps=Capacities(K=6, L=160, P=24, pyr_levels=3, klt_radius=5),
    )


@pytest.fixture(scope="module")
def world():
    return synthetic.make_world(seed=3, n_frames=40, width=320, height=240,
                                n_points=200, imu_noise=True)


def test_bimono_tracks_trajectory(world):
    slam = StereoSLAM(world.rig, small_config("bimono"))
    est = slam.run(world.frames)
    assert len(est) == len(world.frames)
    n_kf = len(slam.kf_traj)
    assert n_kf >= 3, f"only {n_kf} keyframes"
    ate = synthetic.ate_rmse(est, world.gt_t[: len(est)])
    assert ate < 0.05, f"ATE {ate:.4f} m"


def test_bimonovio_tracks_trajectory(world):
    slam = StereoSLAM(world.rig, small_config("bimonovio"),
                      imu_params=world.imu_params)
    est = slam.run(world.frames)
    ate = synthetic.ate_rmse(est, world.gt_t[: len(est)])
    assert ate < 0.05, f"ATE {ate:.4f} m"
    # gravity-aligned: z axis of first KF pose should be near world z
    R0 = slam.kf_traj[0][1]
    assert abs(R0[2, 2]) > 0.95
    # the VI bootstrap must have fired (slamBiMonoVIO.cpp:94-100 parity)
    assert slam.vi_initialized


def test_bimonovio_window_rolls_with_vio_prior(world):
    """Stereo VIO with a small window: marginalization + sparsifyVIO prior
    (15-dof state prior + pose-relative landmark factors) live e2e, with
    VIInit having run first."""
    cfg = dataclasses.replace(
        small_config("bimonovio"), max_movement_parallax=0.5,
        caps=Capacities(K=4, L=160, P=24, pyr_levels=3, klt_radius=5),
    )
    slam = StereoSLAM(world.rig, cfg, imu_params=world.imu_params)
    est = slam.run(world.frames)
    assert slam.vi_initialized
    assert len(slam.archived_kf) >= 1, "window never rolled"
    assert bool(slam.priors.sp_mask.any()), "sparsifyVIO state prior missing"
    ate = synthetic.ate_rmse(est, world.gt_t[: len(est)])
    assert ate < 0.05, f"VIO-roll ATE {ate:.4f} m"


def test_bimonovio_dense_marginalization_rolls(world):
    """Dense (non-sparsified) prior in the VIO path: the 15K+3P replay
    factor carries the IMU-state marginal across window rolls."""
    cfg = dataclasses.replace(
        small_config("bimonovio"), sparsification=False,
        max_movement_parallax=0.5, multithreading=True,
        caps=Capacities(K=4, L=160, P=24, pyr_levels=3, klt_radius=5),
    )
    slam = StereoSLAM(world.rig, cfg, imu_params=world.imu_params)
    est = slam.run(world.frames)
    assert slam.vi_initialized
    assert len(slam.archived_kf) >= 1, "window never rolled"
    assert bool(slam.priors.dn_mask), "dense prior never activated"
    ate = synthetic.ate_rmse(est, world.gt_t[: len(est)])
    assert ate < 0.05, f"dense-VIO ATE {ate:.4f} m"


def test_bimono_dense_marginalization(world):
    """`sparsification: 0` config path: the exact dense marginal is replayed
    as one linear prior factor instead of the Chow-Liu set
    (BundleAdjustmentCERESAnalytic.cpp:316-429 parity)."""
    cfg = dataclasses.replace(
        small_config("bimono"), sparsification=False, max_movement_parallax=0.5,
        caps=Capacities(K=4, L=160, P=24, pyr_levels=3, klt_radius=5),
    )
    slam = StereoSLAM(world.rig, cfg)
    est = slam.run(world.frames)
    ate = synthetic.ate_rmse(est, world.gt_t[: len(est)])
    assert ate < 0.05, f"dense-marg ATE {ate:.4f} m"
    assert len(slam.archived_kf) >= 1, "window never rolled"
    assert bool(slam.priors.dn_mask), "dense prior never activated"
    assert not bool(slam.priors.ll_mask.any())


def test_mono_tracks_trajectory(world):
    """Monocular VO: bootstrap by essential init, Sim3-aligned ATE."""
    from sadvio_tpu.pipeline.mono import MonoSLAM
    from sadvio_tpu.data.window import Rig
    import jax

    # mono rig: just cam0
    rig1 = Rig(
        cam=jax.tree.map(lambda x: x[:1] if hasattr(x, "ndim") and x.ndim > 0 else x,
                         world.rig.cam),
        R_f_s=world.rig.R_f_s[:1], t_f_s=world.rig.t_f_s[:1],
    )
    cfg = small_config("mono")
    slam = MonoSLAM(rig1, cfg, boot_parallax_deg=2.0)

    class MonoFrame:
        def __init__(self, f):
            self.ts = f.ts
            self.images = f.images[:1]
            self.acc, self.gyr, self.dt = f.acc, f.gyr, f.dt

    i0 = None
    for i, f in enumerate(world.frames):
        slam.process_frame(MonoFrame(f))
        if i0 is None and slam.initialized:
            i0 = i
    assert slam.initialized, "mono bootstrap never triggered"
    # compare only the post-bootstrap segment (pre-init poses are identity)
    est = np.asarray([t for _, _, t in slam.traj])[i0:]
    ate = synthetic.ate_rmse(est, world.gt_t[i0: i0 + len(est)], with_scale=True)
    assert ate < 0.08, f"mono ATE {ate:.4f} m"


def test_bimono_matcher_tracking(world):
    """Descriptor-matcher tracking mode (reference tracker: matcher)."""
    import dataclasses as _dc

    cfg = _dc.replace(small_config("bimono"), tracker="matcher")
    slam = StereoSLAM(world.rig, cfg)
    est = slam.run(world.frames[:25])
    ate = synthetic.ate_rmse(est, world.gt_t[:len(est)])
    # integer-pixel matches get a level-0 LK sub-pixel polish (the
    # reference re-describes + refines): KLT-grade accuracy expected
    assert ate < 0.05, f"matcher-mode ATE {ate:.4f} m"
    assert len(slam.kf_traj) >= 2


def test_bimono_with_mesh3d(world):
    """Densification wired at KF rate (mesh3d config flag)."""
    import dataclasses as _dc

    cfg = _dc.replace(small_config("bimono"), mesh3d=True,
                      max_length_tsh=2.0, zncc_tsh=0.5)
    slam = StereoSLAM(world.rig, cfg)
    for f in world.frames[:16]:
        out = slam.process_frame(f)
    assert slam.mesher is not None
    cloud = slam.mesher.dense_points()
    assert len(cloud) > 30
    # cloud points must lie in the synthetic wall's depth band (z in [4,9]
    # world frame; slam world ~= gt frame here)
    z = cloud[:, 2]
    assert (np.abs(z - np.clip(z, 3.0, 10.0)) < 1e-6).mean() > 0.9


def test_corrupt_frames_trigger_reset(world):
    """Failure recovery (slamBiMonoVIO.cpp:545-553): zeroed images ->
    dead-reckon, then a full re-initialization after >5 consecutive fails.
    Regression: reset() once crashed on an unbound name."""
    slam = StereoSLAM(world.rig, small_config("bimono"))
    for f in world.frames[:8]:
        slam.process_frame(f)
    assert slam.initialized
    blank = world.frames[8]._replace(images=np.zeros_like(world.frames[8].images))
    for _ in range(10):
        out = slam.process_frame(blank)
    assert slam.n_resets >= 1  # failure recovery fired
    for p in [p for (_, _, p) in slam.traj]:
        assert np.isfinite(p).all()
    # pipeline must re-bootstrap cleanly on good frames
    for f in world.frames[9:14]:
        out = slam.process_frame(f)
    assert slam.initialized and out["ok"]

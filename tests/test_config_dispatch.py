"""Config keys change pipeline behavior (round-4 parity items).

Covers the three keys the round-3 verdict found parsed-but-ignored:
  * pose_estimator (createPoseEstimator, slamParameters.cpp:242-260 +
    predict, slamCore.cpp:432-466)
  * min_kf_number (localmap.cpp:6-7 / localmap.h:29)
  * the dt > 1 s forced-KF IMU-drift guard (slamBiMonoVIO.cpp:445-447)
"""

import dataclasses

import numpy as np
import pytest

from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM


@pytest.fixture(scope="module")
def world():
    return synthetic.make_world(seed=3, n_frames=20, width=320, height=240,
                                n_points=200, imu_noise=False)


def base_cfg(**kw):
    return SLAMConfig(
        slam_mode="bimono", max_kf_number=5, min_lmk_number=25,
        max_movement_parallax=1.0, min_movement_parallax=0.02,
        caps=Capacities(K=6, L=160, P=24, pyr_levels=3, klt_radius=5), **kw)


def test_pose_estimator_epipolar_dispatch(world):
    """pose_estimator: epipolar keeps the motion prediction as the frame
    pose (slamCore.cpp:448-450) -- the trajectory must differ from the PnP
    mode yet stay sane (KF-rate BA still corrects keyframes)."""
    est = {}
    for mode in ("pnp", "epipolar"):
        slam = StereoSLAM(world.rig, base_cfg(pose_estimator=mode))
        for f in world.frames:
            slam.process_frame(f)
        est[mode] = np.asarray([t for _, _, t in slam.traj])
    ate_epi = synthetic.ate_rmse(est["epipolar"], world.gt_t[:len(est["epipolar"])])
    ate_pnp = synthetic.ate_rmse(est["pnp"], world.gt_t[:len(est["pnp"])])
    assert ate_pnp < 0.02
    assert ate_epi < 0.15  # prediction-held frame poses drift more
    # the dispatch is real: the two modes produce different trajectories
    n = min(len(est["pnp"]), len(est["epipolar"]))
    assert np.abs(est["pnp"][:n] - est["epipolar"][:n]).max() > 1e-5


def test_min_kf_number_bootstrap(world):
    """min_kf_number forces that many unconditional keyframes at map start,
    even under an impossible parallax gate."""
    cfg = base_cfg(min_kf_number=4)
    # impossible vote gates: without the bootstrap force nothing would insert
    cfg = dataclasses.replace(cfg, min_movement_parallax=50.0,
                              max_movement_parallax=60.0, min_lmk_number=1)
    slam = StereoSLAM(world.rig, cfg)
    n_kf = 0
    for f in world.frames[:6]:
        out = slam.process_frame(f)
        n_kf += bool(out.get("is_kf"))
    assert n_kf >= 4, n_kf

    # control: with min_kf_number=1 the same gates insert only the first KF
    slam1 = StereoSLAM(world.rig, dataclasses.replace(cfg, min_kf_number=1))
    n_kf1 = 0
    for f in world.frames[:6]:
        out = slam1.process_frame(f)
        n_kf1 += bool(out.get("is_kf"))
    assert n_kf1 == 1, n_kf1


def test_profiler_field_set(world, tmp_path):
    """slam_profiler.txt carries the reference's per-stage field set
    (slamCore.cpp:554-584) plus the raw fused-stage table."""
    slam = StereoSLAM(world.rig, base_cfg())
    slam.run(world.frames[:10], log_dir=str(tmp_path))
    txt = (tmp_path / "slam_profiler.txt").read_text()
    for field in ("Number of frames:", "Number of keyframes:",
                  "Img process dt:", "Detection dt:", "Prediction",
                  "Matching in time dt:", "Average filter time dt:",
                  "Landmark init dt:", "Optimize frame dt:",
                  "Marginalization dt:", "Optimize window dt:",
                  "Front end dt:", "Back end dt:"):
        assert field in txt, field
    # fused-stage rows recorded with nonzero call counts
    assert "track_predict_filter" in txt
    assert "pyramids" in txt


def test_async_health_latency_mode(world):
    """Opt-in async_health (remote-device latency mode): steady tracking
    frames vote on lagged health (pose_ts marks the lag), keyframe
    candidates are confirmed fresh, no trajectory rows are lost, and ATE
    holds on the module world."""
    slam = StereoSLAM(world.rig, base_cfg(async_health=True))
    lagged = 0
    for f in world.frames:
        out = slam.process_frame(f)
        if "pose_ts" in out and out["pose_ts"] != f.ts:
            lagged += 1
    slam._flush_health()
    est = np.asarray([t for _, _, t in slam.traj])
    ate = synthetic.ate_rmse(est, world.gt_t[: len(est)])
    assert ate < 0.05, ate
    assert lagged >= 5, "async steady state never engaged"
    assert len(slam.traj) == len(world.frames)  # one row per frame, none lost


def test_keep_overflow_surfaced_without_profiling(world):
    """A keep set larger than the P prior slots degrades the prior
    (overflow landmarks demoted to lonely); the count must surface in the
    per-KF out dict of the NORMAL loop, not only under profiling."""
    # near-every-frame keyframes so the window fills and marginalization
    # actually runs within the 20-frame module world
    cfg = SLAMConfig(
        slam_mode="bimono", max_kf_number=5, min_lmk_number=25,
        max_movement_parallax=0.05, min_movement_parallax=0.01,
        caps=Capacities(K=6, L=160, P=4, pyr_levels=3, klt_radius=5))
    slam = StereoSLAM(world.rig, cfg)
    ovf = []
    for f in world.frames:
        out = slam.process_frame(f)
        # unconditional on every KF past the bootstrap (which has no backend)
        if out.get("is_kf") and "ba_cost" in out:
            assert "keep_overflow" in out
            ovf.append(out["keep_overflow"])
    # the textured world co-observes far more than 4 landmarks across the
    # roll boundary: at least one marginalization must report overflow
    assert max(ovf) > 0, ovf


def test_time_forced_keyframe_vio():
    """A >1 s gap since the last KF forces one in VIO even with zero
    parallax (stationary camera), bounding the preintegration interval
    (slamBiMonoVIO.cpp:445-447)."""
    world = synthetic.make_world(seed=3, n_frames=16, width=320, height=240,
                                 n_points=200, imu_noise=False)
    cfg = dataclasses.replace(base_cfg(), slam_mode="bimonovio")
    slam = StereoSLAM(world.rig, cfg, imu_params=world.imu_params)
    for f in world.frames:
        slam.process_frame(f)
    assert slam.initialized

    # stationary tail: repeat the last image at 0.4 s steps with still IMU
    last = world.frames[-1]
    R_last = world.gt_R[-1]
    acc_still = (R_last.T @ np.array([0.0, 0.0, 9.81])).astype(np.float32)
    kfs = []
    for i in range(1, 7):
        ts = last.ts + 0.4 * i
        n = 80  # 0.4 s at 200 Hz
        f = synthetic.FrameData(
            ts=ts, images=last.images,
            acc=np.tile(acc_still, (n, 1)),
            gyr=np.zeros((n, 3), np.float32),
            dt=np.full((n,), 1.0 / 200.0, np.float32),
        )
        out = slam.process_frame(f)
        kfs.append((out.get("is_kf", False), out.get("parallax_deg", 0.0)))
    # at least one forced KF in the stationary stretch, and the estimator
    # survives (finite pose)
    assert any(k for k, _ in kfs), kfs
    assert np.isfinite(np.asarray(slam.t_cur)).all()


def test_imu_factor_gap_gate():
    """An inter-KF gap > 1 s masks out its IMU preintegration factor
    (AOptimizer.cpp:68-70): the accumulated noise over such a stretch is
    useless as a constraint; the window BA must not consume it."""
    import jax.numpy as jnp

    world = synthetic.make_world(seed=3, n_frames=16, width=320, height=240,
                                 n_points=200, imu_noise=False)
    cfg = dataclasses.replace(base_cfg(), slam_mode="bimonovio")
    slam = StereoSLAM(world.rig, cfg, imu_params=world.imu_params)
    for f in world.frames:
        slam.process_frame(f)
    slot_before = slam.n_kf

    # one frame 1.3 s later (a sensor dropout): its forced KF appears but
    # the overlong IMU factor is dropped
    last = world.frames[-1]
    R_last = world.gt_R[-1]
    acc_still = (R_last.T @ np.array([0.0, 0.0, 9.81])).astype(np.float32)
    n = 260  # 1.3 s at 200 Hz
    f = synthetic.FrameData(
        ts=last.ts + 1.3, images=last.images,
        acc=np.tile(acc_still, (n, 1)),
        gyr=np.zeros((n, 3), np.float32),
        dt=np.full((n,), 1.0 / 200.0, np.float32),
    )
    out = slam.process_frame(f)
    assert out["is_kf"]  # dt > 1 s forces the KF
    idx = slam.n_kf - 2  # factor between the previous KF and this one
    assert not bool(slam.imu.mask[idx]), "overlong IMU factor not masked"
    # a normal-rate follow-up restores masked=True factors
    f2 = synthetic.FrameData(
        ts=last.ts + 1.3 + 0.3, images=last.images,
        acc=np.tile(acc_still, (60, 1)),
        gyr=np.zeros((60, 3), np.float32),
        dt=np.full((60,), 1.0 / 200.0, np.float32),
    )
    slam.process_frame(f2)
    assert np.isfinite(np.asarray(slam.t_cur)).all()

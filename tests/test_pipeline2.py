"""Pipeline e2e tests, part 2 (split from test_pipeline.py: the
XLA:CPU backend aborts when too many executables accumulate in
one pytest module -- see tests/conftest.py)."""

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


def test_pose_graph_edges_and_archive(world):
    """pose_graph=True: each marginalization archives the leaving KF and
    emits an NFR relative edge (marginalizeRelative parity) whose measured
    retraction matches the relative pose of consecutive archived KFs."""
    import dataclasses as _dc
    import jax.numpy as jnp
    from sadvio_tpu.utils import geometry as geo

    cfg = _dc.replace(
        small_config("bimono"), pose_graph=True, max_movement_parallax=0.5,
        caps=Capacities(K=4, L=160, P=24, pyr_levels=3, klt_radius=5),
    )
    slam = StereoSLAM(world.rig, cfg)
    slam.run(world.frames)
    assert len(slam.archived_kf) >= 1
    assert len(slam.pose_graph_edges) >= 1
    for ts0, ts1, dx, inf in slam.pose_graph_edges:
        assert ts1 > ts0
        assert np.isfinite(dx).all() and np.isfinite(inf).all()
        np.testing.assert_allclose(inf, inf.T, atol=1e-2 * max(abs(inf).max(), 1))
        assert np.linalg.eigvalsh(inf.astype(np.float64)).min() > -1e-3 * abs(inf).max()
    # resurrection fired at least once over the run OR every landmark stayed
    # tracked (tiny world): just assert the flag machinery is intact
    from sadvio_tpu.data.window import LMK_RESURRECTED
    flags = np.asarray(slam.window.lmk_flags)
    assert ((flags & ~(LMK_RESURRECTED | 0xFF)) == 0).all()

    # -- the pose graph is APPLIED, not just collected: corrupting an
    # archived pose and re-optimizing pulls it back via the NFR edges
    nodes0 = slam.optimize_archive()
    assert len(nodes0) >= len(slam.archived_kf)
    ts1, R1, t1 = slam.archived_kf[1] if len(slam.archived_kf) > 1 \
        else slam.archived_kf[0]
    idx = [i for i, (ts, _, _) in enumerate(nodes0) if ts == ts1][0]
    if idx == 0:
        return  # node 0 is the gauge; nothing to pull back
    t_orig = np.asarray(nodes0[idx][2])
    slam.archived_kf[idx] = (ts1, R1, np.asarray(t1) + np.array([0.5, 0, 0]))
    corrected = slam.optimize_archive()
    err = np.linalg.norm(np.asarray(corrected[idx][2]) - t_orig)
    assert err < 0.15, f"pose graph left the corrupted node {err:.3f} m away"


def test_global_map_resurrection(world):
    """Descriptor global map (global_map=1): landmarks wiped from the window
    are recovered from the archive by projection + BRIEF match, restoring
    map continuity (globalmap.cpp + long-range
    recoverFeatureFromMapLandmarks)."""
    import jax.numpy as jnp

    from sadvio_tpu.data import globalmap as gmap

    cfg = dataclasses.replace(small_config("bimono"), global_map=True)
    slam = StereoSLAM(world.rig, cfg)
    for f in world.frames[:14]:
        slam.process_frame(f)
    assert slam.initialized
    lmk_before = np.asarray(slam.window.lmk).copy()
    alive = np.asarray(slam.window.lmk_mask).copy()
    assert alive.sum() > 50
    # simulate landmarks long gone from the window: archive + wipe
    slam.global_map_state = gmap.archive(
        slam.global_map_state, slam.window.lmk, slam.lmk_desc,
        jnp.asarray(alive))
    slam.window = slam.window.replace(
        lmk_mask=jnp.zeros_like(slam.window.lmk_mask))
    slam.tracks = slam.tracks.replace(
        valid=jnp.zeros_like(slam.tracks.valid),
        has3d=jnp.zeros_like(slam.tracks.has3d))
    n_res = 0
    for f in world.frames[14:22]:
        out = slam.process_frame(f)
        n_res += out.get("gm_resurrected", 0)
    assert n_res > 20, f"only {n_res} landmarks resurrected from the archive"
    # resurrected landmarks carry their archived (true) positions: each must
    # coincide with SOME original landmark (fresh slots, so compare as sets)
    mask_now = np.asarray(slam.window.lmk_mask)
    from sadvio_tpu.data.window import LMK_RESURRECTED
    res = (np.asarray(slam.window.lmk_flags) & LMK_RESURRECTED) > 0
    res_pos = np.asarray(slam.window.lmk)[mask_now & res]
    orig = lmk_before[alive]
    assert len(res_pos) > 5
    d = np.linalg.norm(res_pos[:, None] - orig[None], axis=-1).min(1)
    assert np.median(d) < 0.3, f"resurrected positions off by {np.median(d)}"


def test_monovio_tracks_trajectory(world):
    """Monocular VIO end-to-end: bootstrap, VIInit with scale, metric ATE.

    Regression guard: MonoSLAM.process_frame used to accumulate the IMU
    batch AND delegate to StereoSLAM.process_frame which accumulated it
    again -- every sample preintegrated twice."""
    from sadvio_tpu.pipeline.mono import MonoSLAM
    from sadvio_tpu.data.window import Rig
    import jax

    rig1 = Rig(
        cam=jax.tree.map(lambda x: x[:1] if hasattr(x, "ndim") and x.ndim > 0 else x,
                         world.rig.cam),
        R_f_s=world.rig.R_f_s[:1], t_f_s=world.rig.t_f_s[:1],
    )
    cfg = small_config("monovio")
    slam = MonoSLAM(rig1, cfg, imu_params=world.imu_params, boot_parallax_deg=2.0)

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
    assert slam.initialized, "monovio bootstrap never triggered"
    est = np.asarray([t for _, _, t in slam.traj])[i0:]
    # VIInit recovers metric scale from the IMU: allow Sim3 only for the
    # alignment rotation, but check the raw scale is within 30% of truth
    ate = synthetic.ate_rmse(est, world.gt_t[i0: i0 + len(est)], with_scale=True)
    assert ate < 0.08, f"monovio ATE {ate:.4f} m"
    if slam.vi_initialized:
        span_est = np.linalg.norm(est[-1] - est[0])
        span_gt = np.linalg.norm(world.gt_t[i0 + len(est) - 1] - world.gt_t[i0])
        assert span_gt == 0 or 0.7 < span_est / max(span_gt, 1e-9) < 1.4, (
            f"metric scale off: est span {span_est:.3f} vs gt {span_gt:.3f}"
        )

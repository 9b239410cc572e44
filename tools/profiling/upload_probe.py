"""Fetch-forced stage timings on the TPU for the frame and KF paths."""
import time, functools
import numpy as np, jax, jax.numpy as jnp
from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM
from sadvio_tpu.frontend import detect, klt, pnp

world = synthetic.make_world(seed=5, n_frames=30, width=752, height=480,
                             n_points=400, imu_noise=True)
cfg = SLAMConfig(slam_mode="bimonovio", max_kf_number=10, min_lmk_number=40,
                 max_movement_parallax=1.0, min_movement_parallax=0.02,
                 caps=Capacities(K=11, L=512, P=48, pyr_levels=4, klt_radius=5))
slam = StereoSLAM(world.rig, cfg, imu_params=world.imu_params)
for f in world.frames[:12]:
    slam.process_frame(f)
f = world.frames[12]
dev = slam._upload_images(f)
T = time.perf_counter

def bench(name, fn, *a, n=5, **k):
    r = fn(*a, **k); np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    ts = []
    for _ in range(n):
        t0 = T(); r = fn(*a, **k); np.asarray(jax.tree.leaves(r)[0]).ravel()[0]; ts.append((T()-t0)*1e3)
    print(f"{name}: {np.median(ts):.1f} ms")
    return r

pyr = bench("pyramids", slam._pyramids, dev)
Rp, tp, vp = slam._predict_pose(f)
bench("frontend(all)", slam._frontend, slam.kf_pyr, pyr, slam.tracks, slam.window, Rp, tp, slam._next_key())
bench("klt.track(one dir x2 eq)", lambda: klt.track(
    slam.kf_pyr[0], pyr[0], slam.tracks.uv_kf[0], slam.tracks.uv[0], slam.tracks.valid[0],
    levels=4, radius=5, engine="batched"))
bench("pnp_ransac", pnp.pnp_ransac, jax.tree.map(lambda x: x[0] if hasattr(x, 'ndim') and x.ndim else x, slam.rig.cam),
      slam.rig.R_f_s[0], slam.rig.t_f_s[0], slam.window.lmk, slam.tracks.uv[0],
      slam.tracks.valid[0] & slam.tracks.has3d, Rp, tp, slam._next_key())
bench("detect", detect.detect_features, pyr[0][0], existing_uv=slam.tracks.uv[0],
      existing_valid=slam.tracks.valid[0], gh=8, gw=10, k_per_cell=5)
bench("insert_kf", slam._insert_kf, pyr, slam.tracks, slam.window, slam.obs, slam.imu,
      slam.pre_cur, Rp, tp, vp, jnp.float32(f.ts), slam._next_key(), 9)
from sadvio_tpu.backend import ba
bench("backend BA", slam._backend, slam.window, slam.obs, slam.imu, slam.priors, 1)
bench("marg_roll", slam._marg_roll, slam.window, slam.obs, slam.imu, slam.priors, slam.tracks, True)

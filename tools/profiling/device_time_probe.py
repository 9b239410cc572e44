"""Pure device-time probe: enqueue N calls back-to-back, block once."""
import time
import numpy as np
import jax, jax.numpy as jnp
from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM
from sadvio_tpu.frontend import klt
from sadvio_tpu.ops import klt_kernel

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

def devtime(name, fn, n=20):
    r = fn(); jax.block_until_ready(r)
    t0 = T()
    rs = [fn() for _ in range(n)]
    jax.block_until_ready(rs[-1])
    print(f"{name}: {(T()-t0)/n*1e3:.2f} ms/call (amortized)")
    return rs[0]

pyr = devtime("pyramids", lambda: slam._pyramids(dev))
Rp, tp, vp = slam._predict_pose(f)
key = slam._next_key()
devtime("frontend", lambda: slam._frontend(slam.kf_pyr, pyr, slam.tracks, slam.window, Rp, tp, key, kf_tmpl=slam.kf_tmpl))
devtime("frontend nocache", lambda: slam._frontend(slam.kf_pyr, pyr, slam.tracks, slam.window, Rp, tp, key))
devtime("klt.track pallas+cache", lambda: klt.track(
    slam.kf_pyr[0], pyr[0], slam.tracks.uv_kf[0], slam.tracks.uv[0], slam.tracks.valid[0],
    levels=4, radius=5, engine="pallas", tmpl_wins=slam.kf_tmpl))
devtime("klt.track pallas", lambda: klt.track(
    slam.kf_pyr[0], pyr[0], slam.tracks.uv_kf[0], slam.tracks.uv[0], slam.tracks.valid[0],
    levels=4, radius=5, engine="pallas"))

# KLT internals: templates (XLA einsum path) vs pallas iterate, per level
uv = slam.tracks.uv_kf[0]
img0 = slam.kf_pyr[0][0]; img1 = pyr[0][0]
warp = jnp.broadcast_to(jnp.eye(2), (512, 2, 2))
tmpl = jax.jit(lambda i0, u: klt._templates(i0, u, warp, 5, 1e-3))
Tt, gx, gy, nrm, gg = devtime("templates L0", lambda: tmpl(img0, uv))
devtime("lk_iterate L0", lambda: klt_kernel.lk_iterate(img1, uv, Tt, gx, gy, nrm, iters=10))
img0s = slam.kf_pyr[0][3]; img1s = pyr[0][3]
uvs = uv / 8.0
Ts, gxs, gys, nrms, _ = tmpl(img0s, uvs)
devtime("templates L3", lambda: tmpl(img0s, uvs))
devtime("lk_iterate L3", lambda: klt_kernel.lk_iterate(img1s, uvs, Ts, gxs, gys, nrms, iters=10))
devtime("backend BA", lambda: slam._backend(slam.window, slam.obs, slam.imu, slam.priors, 1), n=10)
devtime("insert_kf", lambda: slam._insert_kf(pyr, slam.tracks, slam.window, slam.obs, slam.imu,
        slam.pre_cur, Rp, tp, vp, jnp.float32(f.ts), key, 9), n=10)

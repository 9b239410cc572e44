"""Stage-level latency breakdown of one frame on the tunneled TPU."""
import time
import numpy as np
import jax
from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM

world = synthetic.make_world(seed=5, n_frames=30, width=752, height=480,
                             n_points=400, imu_noise=True)
cfg = SLAMConfig(slam_mode="bimonovio", max_kf_number=10, min_lmk_number=40,
                 max_movement_parallax=1.0, min_movement_parallax=0.02,
                 caps=Capacities(K=11, L=512, P=48, pyr_levels=4, klt_radius=5))
slam = StereoSLAM(world.rig, cfg, imu_params=world.imu_params)
for f in world.frames[:12]:
    slam.process_frame(f)

f = world.frames[12]
T = lambda: time.perf_counter()
t0 = T(); dev = slam._upload_images(f); t1 = T()
jax.block_until_ready(dev); t2 = T()
slam._accumulate_imu(f); t3 = T()
pyr = slam._pyramids(dev); t4 = T()
Rp, tp, vp = slam._predict_pose(f); t5 = T()
tr, Rn, tn, health, _, _, _ = slam._frontend(slam.kf_pyr, pyr, slam.tracks, slam.window, Rp, tp, slam._next_key()); t6 = T()
h = np.asarray(health); t7 = T()
h2 = np.asarray(health); t8 = T()
print(f"upload(enqueue): {(t1-t0)*1e3:.1f} ms")
print(f"upload(sync):    {(t2-t1)*1e3:.1f} ms")
print(f"accum_imu:       {(t3-t2)*1e3:.1f} ms")
print(f"pyramids disp:   {(t4-t3)*1e3:.1f} ms")
print(f"predict disp:    {(t5-t4)*1e3:.1f} ms")
print(f"frontend disp:   {(t6-t5)*1e3:.1f} ms")
print(f"health fetch:    {(t7-t6)*1e3:.1f} ms")
print(f"refetch(cached): {(t8-t7)*1e3:.1f} ms")

# pure device execution times (block on outputs, no fetch)
import jax
def timed(label, fn, *a, n=3, **k):
    fn(*a, **k)  # warm
    ts = []
    for _ in range(n):
        t0 = T(); r = fn(*a, **k); jax.block_until_ready(r); ts.append((T()-t0)*1e3)
    print(f"{label}: {np.median(ts):.1f} ms")
    return r

dev2 = slam._upload_images(f); jax.block_until_ready(dev2)
pyr2 = timed("pyramids exec", slam._pyramids, dev2)
timed("frontend exec", slam._frontend, slam.kf_pyr, pyr2, slam.tracks, slam.window, Rp, tp, slam._next_key())
from sadvio_tpu.frontend import klt as kltm, pnp as pnpm
timed("klt exec", kltm.track, slam.kf_pyr[0], pyr2[0], slam.tracks.uv_kf[0], slam.tracks.uv[0], slam.tracks.valid[0], levels=slam.caps.pyr_levels, radius=slam.caps.klt_radius, engine=slam.klt_engine)

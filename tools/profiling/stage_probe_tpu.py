import time
import numpy as np
import jax
import jax.numpy as jnp
from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM

world = synthetic.make_world(seed=5, n_frames=40, width=752, height=480,
                             n_points=400, imu_noise=True)
cfg = SLAMConfig(slam_mode="bimonovio", max_kf_number=10, min_lmk_number=40,
                 max_movement_parallax=1.0, min_movement_parallax=0.02,
                 marginalization=True, sparsification=True,
                 caps=Capacities(K=11, L=512, P=48, pyr_levels=4, klt_radius=5))
slam = StereoSLAM(world.rig, cfg, imu_params=world.imu_params)
for f in world.frames[:10]:
    slam.process_frame(f)

# instrument one non-KF-ish frame path piecewise
import sadvio_tpu.models.imu as imu_mod
from sadvio_tpu.utils import geometry as geo

def tic():
    return time.perf_counter()

for i, f in enumerate(world.frames[10:25]):
    t0 = tic()
    if slam.vio:
        slam._accumulate_imu(f)
    jax.block_until_ready(slam.pre_cur.dR); t1 = tic()
    imgs = jnp.asarray(f.images); jax.block_until_ready(imgs); t2 = tic()
    pyr = slam._pyramids(imgs); jax.block_until_ready(pyr[0][0]); t3 = tic()
    R_pred, t_pred, v_pred = slam._predict_pose(f)
    jax.block_until_ready(t_pred); t4 = tic()
    tr, R_new, t_new, health, _, _, _ = slam._frontend(slam.kf_pyr, pyr, slam.tracks,
        slam.window, R_pred, t_pred, slam._next_key())
    jax.block_until_ready(health); t5 = tic()
    h = np.asarray(health); t6 = tic()
    print(f"f{i}: imu={1e3*(t1-t0):.0f} xfer={1e3*(t2-t1):.0f} pyr={1e3*(t3-t2):.0f} "
          f"pred={1e3*(t4-t3):.0f} frontend={1e3*(t5-t4):.0f} fetch={1e3*(t6-t5):.0f} ms")
    # keep the real pipeline state consistent: replay through process_frame
    slam.tracks = tr
    slam.R_cur, slam.t_cur = R_new, t_new

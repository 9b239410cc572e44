import time
import numpy as np
import jax
from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM

world = synthetic.make_world(seed=5, n_frames=50, width=752, height=480,
                             n_points=400, imu_noise=True)
cfg = SLAMConfig(slam_mode="bimonovio", max_kf_number=10, min_lmk_number=40,
                 max_movement_parallax=1.0, min_movement_parallax=0.02,
                 marginalization=True, sparsification=True,
                 caps=Capacities(K=11, L=512, P=48, pyr_levels=4, klt_radius=5))
slam = StereoSLAM(world.rig, cfg, imu_params=world.imu_params)
for i, f in enumerate(world.frames):
    t0 = time.perf_counter()
    out = slam.process_frame(f)
    dt = (time.perf_counter() - t0) * 1000
    if i >= 10:
        print(f"f{i}: {dt:.0f} ms  kf={out.get('is_kf')}")

"""Per-frame latency probe on the real (tunneled) TPU chip.

Mimics StereoSLAM.run()'s prefetch loop: the next frame's H2D transfer is
enqueued before the current frame's blocking fetch."""
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
frames = world.frames
pending = slam._upload_images(frames[0])
lat = []
for i, f in enumerate(frames):
    t0 = time.perf_counter()
    nxt_f = frames[i + 1] if i + 1 < len(frames) else None
    out = slam.process_frame(f, images_dev=pending, prefetch_frame=nxt_f)
    pending = slam._prefetched
    dt = (time.perf_counter() - t0) * 1000
    if i >= 10:
        lat.append((dt, bool(out.get("is_kf"))))
        print(f"f{i}: {dt:.0f} ms  kf={out.get('is_kf')}")
nk = [d for d, k in lat if not k]
kf = [d for d, k in lat if k]
print(f"median non-KF: {np.median(nk):.0f} ms  median KF: {np.median(kf) if kf else float('nan'):.0f} ms")

"""Device-time probe: mesher kernels + insert_kf internals on the TPU."""
import time
import numpy as np
import jax, jax.numpy as jnp
from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM
from sadvio_tpu.frontend import detect, klt
from sadvio_tpu.mesh import mesh as mesh_mod

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
pyr = slam._pyramids(dev)
T = time.perf_counter

def devtime(name, fn, n=20):
    r = fn(); jax.block_until_ready(r)
    t0 = T()
    rs = [fn() for _ in range(n)]
    jax.block_until_ready(rs[-1])
    print(f"{name}: {(T()-t0)/n*1e3:.2f} ms/call")
    return rs[0]

# --- insert_kf internals ---
key = slam._next_key()
devtime("detect_features", lambda: detect.detect_features(
    pyr[0][0], existing_uv=slam.tracks.uv[0], existing_valid=slam.tracks.valid[0],
    gh=8, gw=10, k_per_cell=4))
sm = detect.smooth3(pyr[0][0])
uvd = slam.tracks.uv[0]
devtime("brief_describe", lambda: detect.brief_describe(sm, uvd))
devtime("stereo track", lambda: klt.track(
    pyr[0], pyr[1], uvd, uvd, slam.tracks.valid[0], levels=4, radius=5,
    engine=slam.klt_engine))
devtime("template_cache", lambda: slam._template_cache(pyr, slam.tracks.uv_kf[0]))

# --- mesher kernels (ZNCC validation + raycast) ---
lmk = slam.window.lmk
lmask = slam.window.lmk_mask
uvp, vis = None, None
from sadvio_tpu.models import cameras
cam0 = jax.tree.map(lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x, slam.rig.cam)
cam1 = jax.tree.map(lambda x: x[1] if hasattr(x, "shape") and x.ndim > 0 else x, slam.rig.cam)
R_kf = slam.window.R[slam.n_kf - 1]; t_kf = slam.window.t[slam.n_kf - 1]
uvp, vis = cameras.project_world(cam0, R_kf, t_kf, slam.rig.R_f_s[0], slam.rig.t_f_s[0], lmk)
tri, tmask = mesh_mod.delaunay_triangles(np.asarray(uvp), np.asarray(vis & lmask), 512)
tri = jnp.asarray(tri); tmask = jnp.asarray(tmask)
print(f"triangles: {int(tmask.sum())}")
img0 = pyr[0][0]; img1 = pyr[1][0]
devtime("zncc_validate", lambda: mesh_mod.zncc_validate(
    img0, img1, lmk, tri, tmask, cam0, cam1, R_kf, t_kf,
    slam.rig.R_f_s[0], slam.rig.t_f_s[0], slam.rig.R_f_s[1], slam.rig.t_f_s[1]), n=5)
devtime("raycast", lambda: mesh_mod.raycast_pointcloud(
    lmk, tri, tmask, cam0, R_kf, t_kf, slam.rig.R_f_s[0], slam.rig.t_f_s[0],
    height=480, width=752), n=5)

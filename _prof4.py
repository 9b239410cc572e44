import time, numpy as np, jax, jax.numpy as jnp
from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.frontend import klt, pnp, epipolar
from sadvio_tpu.models import cameras

world = synthetic.make_world(seed=5, n_frames=3, width=752, height=480, n_points=400)
rig = world.rig
img0 = jnp.asarray(world.frames[0].images[0])
img1 = jnp.asarray(world.frames[1].images[0])
L = 512
rng = np.random.default_rng(0)
uv = jnp.asarray(rng.uniform(50, 400, (L, 2)).astype(np.float32))
valid = jnp.ones((L,), bool)

def bench(name, fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.1f} ms")

pyr0 = jax.jit(lambda im: tuple(klt.build_pyramid(im, 4)))(img0)
pyr1 = jax.jit(lambda im: tuple(klt.build_pyramid(im, 4)))(img1)
jax.block_until_ready(pyr0)

for up in (True, False):
    f = jax.jit(lambda p0, p1, u, v: klt.track(p0, p1, u, u, v, levels=4, radius=5, use_pallas=up))
    bench(f"klt.track pallas={up}", f, pyr0, pyr1, uv, valid)

cam0 = jax.tree.map(lambda x: x[0] if jnp.ndim(x) > 0 else x, rig.cam)
lmk = jnp.asarray(rng.uniform(-3, 3, (L, 3)).astype(np.float32) + [0, 0, 6])
uvp, vis = cameras.project_world(cam0, jnp.eye(3), jnp.zeros(3), rig.R_f_s[0], rig.t_f_s[0], lmk)
fpnp = jax.jit(lambda l, u, v, k: pnp.pnp_ransac(cam0, rig.R_f_s[0], rig.t_f_s[0], l, u, v, jnp.eye(3), jnp.zeros(3), k))
bench("pnp_ransac", fpnp, lmk, uvp, vis, jax.random.PRNGKey(0))

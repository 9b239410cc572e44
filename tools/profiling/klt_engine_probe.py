"""KLT engine comparison on the real chip (two-point-slope protocol).

Measures, dependency-chained so the tunnel RPC cancels:
  * track() full call per engine (pallas / batched), with and without the
    KF-cached template windows
  * per-stage: template build per level, iterate per level, per engine
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from sadvio_tpu.pipeline import synthetic
from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
from sadvio_tpu.pipeline.slam import StereoSLAM
from sadvio_tpu.frontend import klt

REPS = 3


def slope(chain_fn, n_a=2, n_b=8):
    def timed(n):
        t0 = time.perf_counter()
        s = float(np.asarray(chain_fn(n)).sum())
        assert np.isfinite(s) or True
        return time.perf_counter() - t0

    float(np.asarray(chain_fn(1)).sum())  # compile+warm
    dt_a = min(timed(n_a) for _ in range(REPS))
    dt_b = min(timed(n_b) for _ in range(REPS))
    return (dt_b - dt_a) * 1000.0 / (n_b - n_a)


def main():
    world = synthetic.make_world(seed=5, n_frames=30, width=752, height=480,
                                 n_points=400, imu_noise=True)
    cfg = SLAMConfig(slam_mode="bimonovio", max_kf_number=10, min_lmk_number=40,
                     max_movement_parallax=1.0, min_movement_parallax=0.02,
                     caps=Capacities(K=11, L=512, P=48, pyr_levels=4, klt_radius=5))
    slam = StereoSLAM(world.rig, cfg, imu_params=world.imu_params)
    for f in world.frames[:12]:
        slam.process_frame(f)

    f = world.frames[12]
    pyr = slam._pyramids(slam._upload_images(f))
    uv0 = slam.tracks.uv_kf[0]
    valid = slam.tracks.valid[0]
    levels, radius = slam.caps.pyr_levels, slam.caps.klt_radius
    tmpl = klt.template_windows_pyr(slam.kf_pyr[0], uv0, levels, radius)

    # realistic seed error: production seeds from the predicted pose, ~1 px
    # off; converged seeds + early exit would understate the real cost
    deltas = [jnp.asarray([0.9, -0.7], jnp.float32),
              jnp.asarray([-0.8, 0.6], jnp.float32),
              jnp.asarray([0.5, 1.0], jnp.float32)]
    for engine in ("pallas", "batched"):
        for use_tmpl in (False, True):
            def chain(n, engine=engine, use_tmpl=use_tmpl):
                uv = uv0
                for k in range(n):
                    seed = uv0 + deltas[k % 3] + 1e-12 * uv.sum()
                    uv, ok, _ = klt.track(
                        slam.kf_pyr[0], pyr[0], uv0, seed, valid,
                        levels=levels, radius=radius, engine=engine,
                        tmpl_wins=tmpl if use_tmpl else None)
                return uv
            ms = slope(chain)
            print(f"track engine={engine:8s} tmpl_cached={use_tmpl}: {ms:7.3f} ms",
                  flush=True)

    # per-stage: template build per level (warp=identity) and iterate-only
    N = uv0.shape[0]
    eye = jnp.broadcast_to(jnp.eye(2), (N, 2, 2))

    for lvl in (0, 1):
        img0 = slam.kf_pyr[0][lvl]
        img1 = pyr[0][lvl]
        uv_l = uv0 / (2.0 ** lvl)

        tw = klt.template_windows(img0, uv_l, radius)

        @jax.jit
        def tmpl_stage(uv, img0=img0, tw=tw):
            T, gx, gy, nrm, gg = klt._templates(img0, uv, eye, radius, 1e-3,
                                                tmpl_win=tw)
            return T

        def chain_tmpl(n, uv_l=uv_l, tmpl_stage=tmpl_stage):
            uv = uv_l
            out = None
            for _ in range(n):
                out = tmpl_stage(uv)
                uv = uv_l + 1e-12 * out.sum()
            return out
        print(f"  L{lvl} template stage (cached win): {slope(chain_tmpl):7.3f} ms",
              flush=True)

        @jax.jit
        def tmpl_stage_nc(uv, img0=img0):
            T, gx, gy, nrm, gg = klt._templates(img0, uv, eye, radius, 1e-3)
            return T

        def chain_tmpl_nc(n, uv_l=uv_l, f=tmpl_stage_nc):
            uv = uv_l
            out = None
            for _ in range(n):
                out = f(uv)
                uv = uv_l + 1e-12 * out.sum()
            return out
        print(f"  L{lvl} template stage (fresh win):  {slope(chain_tmpl_nc):7.3f} ms",
              flush=True)

        T0, gx0, gy0, nrm0, _ = jax.jit(
            lambda uv: klt._templates(img0, uv, eye, radius, 1e-3, tmpl_win=tw)
        )(uv_l)

        from sadvio_tpu.ops import klt_kernel

        @jax.jit
        def it_pallas(uv, img1=img1):
            return klt_kernel.lk_iterate(img1, uv, T0, gx0, gy0, nrm0, iters=10)

        def chain_pallas(n):
            uv = uv_l
            out = None
            for _ in range(n):
                out = it_pallas(uv)
                uv = out[:, :2] * 0 + uv_l + 1e-12 * out.sum()
            return out
        print(f"  L{lvl} iterate pallas  (10 it):     {slope(chain_pallas):7.3f} ms",
              flush=True)

        @jax.jit
        def it_batched(uv, img1=img1):
            uvo, err, inwin = klt._iterate_batched(img1, uv, T0, gx0, gy0, nrm0,
                                                   radius, 10)
            return uvo

        def chain_batched(n):
            uv = uv_l
            out = None
            for _ in range(n):
                out = it_batched(uv)
                uv = uv_l + 1e-12 * out.sum()
            return out
        print(f"  L{lvl} iterate batched (10 it):     {slope(chain_batched):7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()

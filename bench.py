"""Benchmark: one JSON line covering the whole hot path.

Headline metric (stable across rounds): milliseconds per LM iteration of the
full stereo-VIO window BA at window=10 keyframes, L=512 landmark slots (the
BASELINE.json "BA ms/iter at window=10" axis).  Baseline: the reference's
implied CPU budget -- 20 LM iterations inside its back-end real-time budget
with 4 threads (AOptimizer.cpp:315-323); 10 ms/iter is the parity bar.
vs_baseline > 1 means faster than the bar.

"submetrics" guards the rest of the system (regressions anywhere become
machine-visible): KLT frame tracking, mesher ZNCC validation + raycast, and
an end-to-end synthetic stereo-VIO run (ATE + wall-clock per frame at EuRoC
shapes).  Each section is independently fault-isolated: a failure nulls its
entry instead of killing the bench.

Measurement protocol "two-point-slope-v3-scan" (tunneled-TPU safe): the device
plugin here can return from block_until_ready without having executed, so
timings are forced by a VALUE fetch, and repeated ops are DEPENDENCY-CHAINED
(call k+1 consumes call k's output) so fetching the final value provably
forces the whole chain; t(long chain) - t(short chain) cancels the fixed
per-fetch tunnel round trip (~26-33 ms).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# the CPU-fingerprinted persistent compilation cache is configured by
# sadvio_tpu/__init__.py (imported below via __graft_entry__)

BASELINE_MS_PER_ITER = 10.0
ITERS = 20
# Chains deeper than ~20 unfetched solves deadlock the axon tunnel's queue.
CHAIN_A = 5
CHAIN_B = 20
REPS = 3
PROTOCOL = "two-point-slope-v3-scan"


def _fin(x):
    """Masked mesh/track outputs legitimately carry NaN/inf rows; reduce to
    a finite scalar so scan carries stay finite."""
    return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))


def scan_slope(make_scalar, n_a=4, n_b=20, carry0=None):
    """Time a kernel by chaining evaluations inside ONE jitted lax.scan per
    length -- a single tunnel dispatch each, immune to the multi-dispatch
    scheduling noise that made per-call chains swing 2.5 -> 27 ms between
    runs; the two-length slope cancels the fixed ~30 ms value fetch.

    make_scalar(aux, eps) -> (aux, scalar): aux is an optional pytree carry
    (evolving state like TrackState), eps a tiny scalar dependency link.
    """

    def runner(n):
        def run(x0):
            def body(carry, _):
                aux, e = carry
                aux, s = make_scalar(aux, e)
                return (aux, e + 1e-12 * s), ()

            (aux, out), _ = jax.lax.scan(body, (x0, jnp.float32(0.0)), None,
                                         length=n)
            return out

        return jax.jit(run)

    r_a, r_b = runner(n_a), runner(n_b)

    def timed(r):
        t0 = time.perf_counter()
        s = float(np.asarray(r(carry0)))
        assert np.isfinite(s), f"non-finite scan carry: {s}"
        return time.perf_counter() - t0

    timed(r_a), timed(r_b)  # compile + warm
    dt_a = min(timed(r_a) for _ in range(REPS))
    dt_b = min(timed(r_b) for _ in range(REPS))
    assert dt_b > dt_a, f"non-monotone scan timings: {dt_a:.4f}s vs {dt_b:.4f}s"
    return (dt_b - dt_a) * 1000.0 / (n_b - n_a)


def bench_ba():
    from __graft_entry__ import _tiny_problem
    from sadvio_tpu.backend import ba

    problem = _tiny_problem(K=11, C=2, L=512, P=48)
    opts = ba.BAOptions(iters=ITERS)

    def chain(problem, n):
        """n dependency-chained solves; tiny pose jitter between links keeps
        LM off its converged fixed point without changing the compute."""
        state = problem.state
        for k in range(n):
            p = problem._replace(
                state=state.replace(t=state.t + 1e-7 * (k + 1))
            )
            state, stats = ba.ba_solve(p, opts)
        return state

    def timed(n):
        t0 = time.perf_counter()
        out = chain(problem, n)
        s = float(np.asarray(out.t).sum())  # forces the whole chain
        assert np.isfinite(s)
        return time.perf_counter() - t0

    float(np.asarray(chain(problem, 1).t).sum())  # compile + warm

    dt_a = min(timed(CHAIN_A) for _ in range(REPS))
    dt_b = min(timed(CHAIN_B) for _ in range(REPS))
    # guard: on a tunnel hiccup the slope can collapse -- fail loudly with
    # the raw numbers rather than emit a nonsensical ms/iter
    assert dt_b > dt_a, f"non-monotone chain timings: {dt_a:.4f}s vs {dt_b:.4f}s"
    return (dt_b - dt_a) * 1000.0 / (ITERS * (CHAIN_B - CHAIN_A))


def bench_klt(world, slam):
    """Frame-rate KLT (512 slots, production engine), chained via uv.

    Measures the PRODUCTION frame-rate path: template windows are KF-cached
    (slam._template_cache runs once per keyframe, not per frame), and each
    link seeds ~1 px off the optimum -- the realistic predicted-pose seed
    error -- so the epsilon early exit runs a representative iteration
    count instead of re-polishing an already-converged point."""
    import jax.numpy as jnp
    from sadvio_tpu.frontend import klt

    f = world.frames[12]
    pyr = slam._pyramids(slam._upload_images(f))
    uv0 = slam.tracks.uv_kf[0]
    valid = slam.tracks.valid[0]
    tmpl = klt.template_windows_pyr(
        slam.kf_pyr[0], uv0, slam.caps.pyr_levels, slam.caps.klt_radius)
    deltas = [jnp.asarray([0.9, -0.7], jnp.float32),
              jnp.asarray([-0.8, 0.6], jnp.float32),
              jnp.asarray([0.5, 1.0], jnp.float32)]

    dstack = jnp.stack(deltas)

    def step(k, e):
        seed = uv0 + dstack[k % 3] + e
        uv, ok, _ = klt.track(
            slam.kf_pyr[0], pyr[0], uv0, seed, valid,
            levels=slam.caps.pyr_levels, radius=slam.caps.klt_radius,
            engine=slam.klt_engine, tmpl_wins=tmpl)
        return k + 1, _fin(uv)

    return scan_slope(step, carry0=jnp.int32(0))


def bench_mesh(world, slam):
    """Mesher ZNCC validation + dense raycast per keyframe."""
    from sadvio_tpu.mesh import mesh as mesh_mod
    from sadvio_tpu.models import cameras

    f = world.frames[12]
    pyr = slam._pyramids(slam._upload_images(f))
    cam0 = jax.tree.map(lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x,
                        slam.rig.cam)
    cam1 = jax.tree.map(lambda x: x[1] if hasattr(x, "shape") and x.ndim > 0 else x,
                        slam.rig.cam)
    lmk = slam.window.lmk
    R_kf = slam.window.R[slam.n_kf - 1]
    t_kf = slam.window.t[slam.n_kf - 1]
    uvp, vis = cameras.project_world(
        cam0, R_kf, t_kf, slam.rig.R_f_s[0], slam.rig.t_f_s[0], lmk)
    tri, tmask = mesh_mod.delaunay_triangles(
        np.asarray(uvp), np.asarray(vis & slam.window.lmk_mask), 512)
    tri = jnp.asarray(tri)
    tmask = jnp.asarray(tmask)
    img0, img1 = pyr[0][0], pyr[1][0]

    H, W = np.asarray(img0).shape

    def one(img):
        ok = mesh_mod.zncc_validate(
            img, img1, lmk, tri, tmask, cam0, cam1, R_kf, t_kf,
            slam.rig.R_f_s[0], slam.rig.t_f_s[0],
            slam.rig.R_f_s[1], slam.rig.t_f_s[1])
        pts, pmask = mesh_mod.raycast_pointcloud(
            lmk, tri, tmask & ok, cam0, R_kf, t_kf,
            slam.rig.R_f_s[0], slam.rig.t_f_s[0],
            height=int(H), width=int(W), max_depth=12.0)
        return pts

    def one_zncc(img):
        return mesh_mod.zncc_validate(
            img, img1, lmk, tri, tmask, cam0, cam1, R_kf, t_kf,
            slam.rig.R_f_s[0], slam.rig.t_f_s[0],
            slam.rig.R_f_s[1], slam.rig.t_f_s[1])

    def one_ray(pts_lmk):
        pts, pmask = mesh_mod.raycast_pointcloud(
            pts_lmk, tri, tmask, cam0, R_kf, t_kf,
            slam.rig.R_f_s[0], slam.rig.t_f_s[0],
            height=int(H), width=int(W), max_depth=12.0)
        return pts

    # attributable breakdown: each submetric maps to ONE probe (zncc,
    # raycast) plus the combined per-KF chain they ride in production.
    # These kernels are sub-millisecond, so the scans are long enough that
    # the compute delta clears the ~10 ms run-to-run variance of the fixed
    # fetch cost (short scans made the slope non-monotone)
    total = scan_slope(lambda aux, e: (aux, _fin(one(img0 + e))),
                       n_a=8, n_b=72)
    zncc = scan_slope(lambda aux, e: (aux, _fin(one_zncc(img0 + e))),
                      n_a=8, n_b=72)
    ray = scan_slope(lambda aux, e: (aux, _fin(one_ray(lmk + e))),
                     n_a=8, n_b=72)
    return total, zncc, ray


def bench_klt_production(world, slam):
    """KLT on the per-call production protocol (one dispatch per frame,
    value-forced two-point chain slope) -- the number comparable to rounds
    <= 3 and to what run() actually pays per frame on-device.  Reported
    alongside the scan number so cross-round deltas attribute to code, not
    measurement scope (VERDICT r4 weak #5)."""
    import jax.numpy as jnp
    from sadvio_tpu.frontend import klt

    f = world.frames[12]
    pyr = slam._pyramids(slam._upload_images(f))
    uv0 = slam.tracks.uv_kf[0]
    valid = slam.tracks.valid[0]
    tmpl = klt.template_windows_pyr(
        slam.kf_pyr[0], uv0, slam.caps.pyr_levels, slam.caps.klt_radius)
    d0 = jnp.asarray([0.9, -0.7], jnp.float32)

    def chain(n):
        seed = uv0 + d0
        for _ in range(n):
            uv, ok, _ = klt.track(
                slam.kf_pyr[0], pyr[0], uv0, seed, valid,
                levels=slam.caps.pyr_levels, radius=slam.caps.klt_radius,
                engine=slam.klt_engine, tmpl_wins=tmpl)
            seed = uv0 + d0 + 1e-9 * uv  # dependency link
        return uv

    def timed(n):
        t0 = time.perf_counter()
        s = float(np.asarray(_fin(chain(n))))
        assert np.isfinite(s)
        return time.perf_counter() - t0

    timed(1)  # warm
    dt_a = min(timed(CHAIN_A) for _ in range(REPS))
    dt_b = min(timed(CHAIN_B) for _ in range(REPS))
    assert dt_b > dt_a, (dt_a, dt_b)
    return (dt_b - dt_a) * 1000.0 / (CHAIN_B - CHAIN_A)


def bench_soak():
    """Medium soak at reduced image shapes: kitchen-sink config (marg +
    sparsif + global map + pose graph), 150 frames through the production
    prefetch loop.  Guards steady-state wall drift and archive bounding on
    the real chip."""
    from sadvio_tpu.pipeline import synthetic
    from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
    from sadvio_tpu.pipeline.slam import StereoSLAM

    world = synthetic.make_world(seed=9, n_frames=150, width=320, height=240,
                                 n_points=300, imu_noise=True,
                                 trajectory="excursion", wall_x=(-5.0, 11.0))
    frames = [f._replace(images=np.clip(f.images, 0, 255).astype(np.uint8))
              for f in world.frames]
    cfg = SLAMConfig(
        slam_mode="bimonovio", max_kf_number=5, min_lmk_number=30,
        max_movement_parallax=0.6, min_movement_parallax=0.02,
        global_map=True, pose_graph=True, archive_max_nodes=24,
        async_health=True,  # remote-deployment latency mode (see bench_e2e)
        caps=Capacities(K=6, L=256, P=24, pyr_levels=3, klt_radius=5))
    slam = StereoSLAM(world.rig, cfg, imu_params=world.imu_params)
    slam.run(frames[:30])  # warm
    per_frame = []
    tail = frames[30:]
    pending = slam._upload_images(tail[0])
    for i, f in enumerate(tail):
        tf = time.perf_counter()
        nxt = tail[i + 1] if i + 1 < len(tail) else None
        slam.process_frame(f, images_dev=pending, prefetch_frame=nxt)
        pending = slam._prefetched
        per_frame.append((time.perf_counter() - tf) * 1000.0)
    jax.block_until_ready(slam.t_cur)
    slam._flush_health()
    est = np.asarray([t for _, _, t in slam.traj])
    ate = synthetic.ate_rmse(est, world.gt_t[: len(est)])
    first = float(np.median(per_frame[:40]))
    last = float(np.median(per_frame[-40:]))
    out = {
        "soak_wall_ms_median": round(float(np.median(per_frame)), 2),
        "soak_wall_drift_ratio": round(last / max(first, 1e-9), 3),
        "soak_ate_mm": round(ate * 1000.0, 2),
        "soak_archived_nodes": len(slam.archived_kf),
    }
    # pose-graph-corrected KF trajectory (the closure consumer's value,
    # measured on-chip): ATE over the optimize_archive nodes vs their GT
    try:
        gt_by_ts = {float(f.ts): world.gt_t[i]
                    for i, f in enumerate(world.frames)}
        nodes = [(ts, t) for ts, _, t in slam.optimize_archive()
                 if float(ts) in gt_by_ts]
        if len(nodes) >= 5:
            est_pg = np.asarray([t for _, t in nodes])
            gt_pg = np.asarray([gt_by_ts[float(ts)] for ts, _ in nodes])
            out["soak_ate_posegraph_mm"] = round(
                synthetic.ate_rmse(est_pg, gt_pg) * 1000.0, 2)
    except Exception as e:  # pragma: no cover
        out["soak_pg_error"] = str(e)[:80]
    return out


def bench_frame_device(world, slam):
    """Dependency-chained DEVICE compute of the frame-rate path
    (pyramids + the fused track/predict/filter/ESKF kernel) -- the number
    that excludes tunnel RPCs, host logic and prefetch contention, so
    e2e_wall - this = transport/host overhead, attributable."""
    import jax.numpy as jnp

    f = world.frames[16]
    img_dev = slam._upload_images(
        f._replace(images=np.clip(f.images, 0, 255).astype(np.uint8)))
    key = slam.key
    pre_cov = slam.pre_cur.cov
    v_pred = slam.v_cur

    def link(tracks, img):
        pyr = slam._pyramids(img)
        tracks, _, _, health, _, _, _ = slam._frontend(
            slam.kf_pyr, pyr, tracks, slam.window, slam.R_cur, slam.t_cur,
            key, kf_tmpl=slam.kf_tmpl, eskf_on=True, pre_cov=pre_cov,
            v_pred=v_pred, R_cur=slam.R_cur, t_cur=slam.t_cur)
        return tracks, health

    def step(tracks, e):
        img = (img_dev.astype(jnp.float32) + e).astype(img_dev.dtype)
        tracks, health = link(tracks, img)
        return tracks, _fin(health)

    return scan_slope(step, carry0=slam.tracks)


def bench_e2e():
    """End-to-end synthetic stereo-VIO at EuRoC shapes: ATE + wall/frame.

    Frames ship as uint8 (real camera data is 8-bit; 4x less tunnel wire)
    and run through StereoSLAM.run's prefetch pipeline -- the production
    EuRoC deployment path."""
    from sadvio_tpu.pipeline import synthetic
    from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
    from sadvio_tpu.pipeline.slam import StereoSLAM

    world = synthetic.make_world(seed=5, n_frames=30, width=752, height=480,
                                 n_points=400, imu_noise=True)
    frames = [f._replace(images=np.clip(f.images, 0, 255).astype(np.uint8))
              for f in world.frames]
    cfg = SLAMConfig(
        slam_mode="bimonovio", max_kf_number=10, min_lmk_number=40,
        max_movement_parallax=1.0, min_movement_parallax=0.02,
        # the bench runs on a tunneled chip (tens of ms per D2H round
        # trip): measure the remote-deployment latency mode
        async_health=True,
        caps=Capacities(K=11, L=512, P=48, pyr_levels=4, klt_radius=5))
    slam = StereoSLAM(world.rig, cfg, imu_params=world.imu_params)
    slam.run(frames[:15])  # warm phase compiles every stage kernel
    # measured phase: the production prefetch loop, timed PER FRAME so the
    # median is robust to tunnel-load stalls (the single-shot mean swung
    # 101 -> 210 ms between runs purely with background tunnel state)
    per_frame = []
    tail = frames[15:]
    pending = slam._upload_images(tail[0])
    t0 = time.perf_counter()
    for i, f in enumerate(tail):
        tf = time.perf_counter()
        nxt = tail[i + 1] if i + 1 < len(tail) else None
        slam.process_frame(f, images_dev=pending, prefetch_frame=nxt)
        pending = slam._prefetched
        per_frame.append((time.perf_counter() - tf) * 1000.0)
    jax.block_until_ready(slam.t_cur)
    wall_ms = (time.perf_counter() - t0) * 1000.0 / len(tail)
    est = np.asarray([t for _, _, t in slam.traj])
    ate = synthetic.ate_rmse(est, world.gt_t[: len(est)])
    return ate * 1000.0, wall_ms, float(np.median(per_frame)), slam, world


# per-metric measurement protocols (VERDICT r4 weak #5: cross-round deltas
# must attribute to code, not measurement-scope changes)
PROTO_SCAN = "scan-slope"          # lax.scan chained, single dispatch
PROTO_CHAIN = "per-call-chain"     # one dispatch per call, value-forced
PROTO_WALL = "wall-clock-loop"     # production loop, host timers


def main():
    sub = {}
    proto = {"vio_window_ba_ms_per_iter_w10_l512": PROTO_CHAIN}
    ms_per_iter = bench_ba()

    slam = world = None
    try:
        ate_mm, wall_ms, med_ms, slam, world = bench_e2e()
        sub["e2e_synth_ate_mm"] = round(ate_mm, 3)
        sub["e2e_wall_ms_per_frame"] = round(wall_ms, 2)
        sub["e2e_wall_ms_median"] = round(med_ms, 2)
        proto["e2e_wall_ms_per_frame"] = PROTO_WALL
        proto["e2e_wall_ms_median"] = PROTO_WALL
    except Exception as e:  # pragma: no cover - fault isolation
        sub["e2e_error"] = str(e)[:120]
    if slam is not None:
        try:
            sub["e2e_device_ms_per_frame"] = round(
                bench_frame_device(world, slam), 3)
            proto["e2e_device_ms_per_frame"] = PROTO_SCAN
        except Exception as e:  # pragma: no cover
            sub["e2e_device_error"] = str(e)[:120]
        try:
            sub["klt_ms_l512"] = round(bench_klt(world, slam), 3)
            proto["klt_ms_l512"] = PROTO_SCAN
        except Exception as e:  # pragma: no cover
            sub["klt_error"] = str(e)[:120]
        try:
            sub["klt_ms_l512_production"] = round(
                bench_klt_production(world, slam), 3)
            proto["klt_ms_l512_production"] = PROTO_CHAIN
        except Exception as e:  # pragma: no cover
            sub["klt_production_error"] = str(e)[:120]
        try:
            mesh_total, zncc_ms, ray_ms = bench_mesh(world, slam)
            sub["mesh_kf_ms"] = round(mesh_total, 3)
            sub["zncc_ms"] = round(zncc_ms, 3)
            sub["raycast_ms"] = round(ray_ms, 3)
            for k in ("mesh_kf_ms", "zncc_ms", "raycast_ms"):
                proto[k] = PROTO_SCAN
        except Exception as e:  # pragma: no cover
            sub["mesh_error"] = str(e)[:120]
    try:
        soak = bench_soak()
        sub.update(soak)
        for k in soak:
            proto[k] = PROTO_WALL
    except Exception as e:  # pragma: no cover
        sub["soak_error"] = str(e)[:120]

    print(json.dumps({
        "metric": "vio_window_ba_ms_per_iter_w10_l512",
        "value": round(ms_per_iter, 4),
        "unit": "ms/iter",
        "vs_baseline": round(BASELINE_MS_PER_ITER / ms_per_iter, 3),
        "protocol": PROTOCOL,
        "protocols": proto,
        "submetrics": sub,
    }))


if __name__ == "__main__":
    main()

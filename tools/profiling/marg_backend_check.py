"""Cross-backend marginalization A/B probe (the round-5 debug methodology).

The square-root marginalization fix (backend/marginalization.py) came out
of exactly this workflow: the VIO soak measured 156 mm ATE on the real TPU
vs 25 mm on CPU from identical code, and comparing the marginalization
outputs ON THE SAME CHECKPOINTED STATE across backends exposed a phantom
15-dof prior (f32 H-space Schur chain + backend-dependent eigh noise).

This probe makes that comparison repeatable:

    python tools/profiling/marg_backend_check.py --phase capture  # TPU run
    python tools/profiling/marg_backend_check.py --phase eval --platform tpu
    python tools/profiling/marg_backend_check.py --phase eval --platform cpu
    python tools/profiling/marg_backend_check.py --phase compare

(Phases are separate processes; NEVER run two JAX processes concurrently
on this machine.)  `capture` runs the stressed VIO excursion until the
window fills and checkpoints the estimator; each `eval` loads it, runs
marginalize (sparsified VIO + dense modes) and the NFR relative edge, and
dumps the factor informations; `compare` prints relative differences --
anything beyond ~1e-3 on a factor information is a backend-numerics red
flag of the kind that cost 6x ATE in round 5.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

OUT = Path(__file__).resolve().parent / "marg_backend_out"
STATE = OUT / "state.npz"


def _build_slam():
    from sadvio_tpu.pipeline import synthetic
    from sadvio_tpu.pipeline.config import Capacities, SLAMConfig
    from sadvio_tpu.pipeline.slam import StereoSLAM

    world = synthetic.make_world(seed=9, n_frames=40, width=320, height=240,
                                 n_points=300, imu_noise=True,
                                 trajectory="excursion", wall_x=(-5.0, 11.0))
    cfg = SLAMConfig(
        slam_mode="bimonovio", max_kf_number=5, min_lmk_number=30,
        max_movement_parallax=0.6, min_movement_parallax=0.02,
        caps=Capacities(K=6, L=256, P=24, pyr_levels=3, klt_radius=5))
    slam = StereoSLAM(world.rig, cfg, imu_params=world.imu_params)
    return world, slam


def phase_capture():
    from sadvio_tpu.utils import checkpoint as ckpt

    world, slam = _build_slam()
    for i, f in enumerate(world.frames):
        slam.process_frame(f)
        if slam.n_kf >= slam.caps.K and slam.vi_initialized:
            break
    OUT.mkdir(exist_ok=True)
    ckpt.save_slam(str(STATE), slam)
    print(f"captured at frame {i}: n_kf={slam.n_kf} vi={slam.vi_initialized}")


def phase_eval(platform):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # loud failure instead of a vacuous CPU-vs-CPU PASS when the requested
    # backend is absent (JAX silently falls back)
    got = jax.devices()[0].platform
    assert (got == "cpu") == (platform == "cpu"), (
        f"requested platform {platform!r} but JAX initialized {got!r}")
    import numpy as np

    from sadvio_tpu.backend import marginalization as marg
    from sadvio_tpu.utils import checkpoint as ckpt

    world, slam = _build_slam()
    ckpt.load_slam(str(STATE), slam)
    out = {}
    new, info = marg.marginalize(slam.window, slam.obs, slam.rig, slam.imu,
                                 slam.priors, slam._ba_opts, vio=True,
                                 sparsify=True)
    W = np.asarray(new.sp_sqrt_info[1], np.float64)
    out["sp_info"] = W.T @ W
    out["plp_info"] = np.einsum(
        "kab,kac->kbc", np.asarray(new.plp_sqrt_info, np.float64),
        np.asarray(new.plp_sqrt_info, np.float64))
    out["Ak"] = np.asarray(info["Ak"], np.float64)
    dense, _ = marg.marginalize(slam.window, slam.obs, slam.rig, slam.imu,
                                slam.priors, slam._ba_opts, vio=True,
                                sparsify=False)
    J = np.asarray(dense.dn_J, np.float64)
    out["dn_info"] = J.T @ J
    dx, inf_e, n_sh = marg.marginalize_relative(
        slam.window, slam.obs, slam.rig, slam.imu, slam._ba_opts, vio=True)
    out["nfr_dx"] = np.asarray(dx, np.float64)
    out["nfr_info"] = np.asarray(inf_e, np.float64)
    np.savez(OUT / f"eval_{platform}.npz", **out)
    for k, v in out.items():
        print(f"{platform} {k}: norm {np.linalg.norm(v):.6g}")


def phase_compare():
    import numpy as np

    a = np.load(OUT / "eval_tpu.npz")
    b = np.load(OUT / "eval_cpu.npz")
    # scale-aware verdicts: a factor-information difference only matters
    # relative to the BLANKET's information scale -- "phantom" means
    # claiming blanket-scale information out of noise (the round-5 bug's
    # sp_info was ~3% of ||Ak||: flagged; sub-1e-4-of-||Ak|| differences in
    # near-zero marginals are the chain's noise floor: benign)
    ak_scale = max(np.linalg.norm(b["Ak"]), 1e-20)
    fail = False
    for k in a.files:
        num = np.linalg.norm(a[k] - b[k])
        own = max(np.linalg.norm(b[k]), 1e-20)
        if k in ("sp_info", "plp_info"):
            rel = num / ak_scale
            bad = rel > 1e-4
            what = "vs blanket scale"
        elif k == "nfr_info":
            rel = num / own
            bad = rel > 0.15
            what = "vs own norm"
        else:
            rel = num / own
            bad = rel > 1e-3
            what = "vs own norm"
        fail |= bad
        flag = "  <-- RED FLAG" if bad else ""
        print(f"{k:10s} |a| {np.linalg.norm(a[k]):.4g}  |b| {own:.4g}  "
              f"diff {rel:.3e} {what}{flag}")
    print("PASS" if not fail else "FAIL: backend-dependent numerics")
    return 0 if not fail else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=("capture", "eval", "compare"),
                    required=True)
    ap.add_argument("--platform", default="tpu",
                    choices=("tpu", "cpu"))
    args = ap.parse_args()
    if args.phase == "capture":
        phase_capture()
    elif args.phase == "eval":
        phase_eval(args.platform)
    else:
        raise SystemExit(phase_compare())

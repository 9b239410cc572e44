"""Predictive multi-chip scaling model for the landmark-sharded window BA.

The virtual-device wall-clock table (scaling_probe.py) cannot measure chip
scaling -- 8 virtual devices share 2 cores.  This probe predicts it from
first principles plus two measurements that ARE possible here:

* --phase hlo (CPU, virtual mesh): compile ba_solve over an n-device lmk
  mesh and COUNT the collective bytes GSPMD actually inserts, parsed from
  the optimized HLO.  The reduced camera-system psum is the only
  critical-path collective; its size is O((K*15 + P*3)^2), independent of L.
* --phase time (real TPU chip): measure ms/LM-iter at (K=32, L=4096) and
  (K=32, L=256).  The slope over L is the landmark-local work (shards 1/n);
  the intercept is the replicated work (reduced solve, dense factors, fixed
  overhead) that does not shard.
* --phase model: combine both JSON outputs into the predicted-efficiency
  table written into SCALING.md:
      T(n)   = T_lmk / n + T_red + T_coll(n)
      T_coll = 2 * B * (n - 1) / n / BW     (bidirectional-ring all-reduce)
      E(n)   = T(1) / (n * T(n))

Usage (two JAX processes, run sequentially -- never concurrently here):
    python tools/profiling/traffic_model.py --phase hlo
    python tools/profiling/traffic_model.py --phase time
    python tools/profiling/traffic_model.py --phase model
"""

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

OUT = Path(__file__).resolve().parent / "traffic_model_out"
K, L_BIG, L_SMALL, P = 32, 4096, 256, 48
ITERS = 20

# public "How to Scale Your Model" figures for v5e: ~45 GB/s bidirectional
# per ICI link along one ring axis; DCN is ~an order of magnitude below
BW_ICI = 45e9
BW_DCN = 2.5e9


def phase_hlo():
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from __graft_entry__ import _tiny_problem
    from sadvio_tpu.backend import ba
    from sadvio_tpu.parallel import sharding

    DT = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
          "pred": 1, "s8": 1, "u8": 1}
    res = {}
    for n in (2, 4, 8):
        problem = _tiny_problem(K=K, C=2, L=L_BIG, P=P)
        mesh = sharding.make_mesh(n)
        sharded = sharding.shard_problem(problem, mesh)
        opts = ba.BAOptions(iters=1)
        txt = jax.jit(ba.ba_solve, static_argnums=1).lower(
            sharded, opts).compile().as_text()
        total = 0
        ops = []
        for line in txt.splitlines():
            if "all-reduce(" not in line and "all-gather(" not in line \
                    and "reduce-scatter(" not in line:
                continue
            m = re.search(r"=\s*\(?([a-z0-9]+)\[([\d,]*)\]", line)
            if not m:
                continue
            dt = DT.get(m.group(1), 4)
            dims = [int(d) for d in m.group(2).split(",") if d] or [1]
            nbytes = dt * int(__import__("numpy").prod(dims))
            kind = ("all-reduce" if "all-reduce(" in line else
                    "all-gather" if "all-gather(" in line else "reduce-scatter")
            total += nbytes
            ops.append({"kind": kind, "bytes": nbytes})
        res[str(n)] = {"bytes_per_iter": total, "n_collectives": len(ops),
                       "ops": ops[:16]}
        print(f"n={n}: {len(ops)} collectives, {total/1e6:.3f} MB/LM-iter")
    OUT.mkdir(exist_ok=True)
    (OUT / "hlo.json").write_text(json.dumps(res, indent=1))


def _measure_ms_per_iter(L):
    import numpy as np

    from __graft_entry__ import _tiny_problem
    from sadvio_tpu.backend import ba

    problem = _tiny_problem(K=K, C=2, L=L, P=P)
    opts = ba.BAOptions(iters=ITERS)

    def chain(n):
        state = problem.state
        for k in range(n):
            p = problem._replace(state=state.replace(t=state.t + 1e-7 * (k + 1)))
            state, _ = ba.ba_solve(p, opts)
        return state

    float(np.asarray(chain(1).t).sum())
    def timed(n):
        t0 = time.perf_counter()
        s = float(np.asarray(chain(n).t).sum())
        assert np.isfinite(s)
        return time.perf_counter() - t0
    a = min(timed(2) for _ in range(3))
    b = min(timed(6) for _ in range(3))
    return (b - a) * 1000.0 / (4 * ITERS)


def phase_time():
    import jax

    res = {"platform": jax.devices()[0].platform}
    for L in (L_SMALL, L_BIG):
        ms = _measure_ms_per_iter(L)
        res[str(L)] = ms
        print(f"K={K} L={L}: {ms:.4f} ms/LM-iter")
    OUT.mkdir(exist_ok=True)
    (OUT / "time.json").write_text(json.dumps(res, indent=1))


def phase_model():
    hlo = json.loads((OUT / "hlo.json").read_text())
    tim = json.loads((OUT / "time.json").read_text())
    t_big, t_small = tim[str(L_BIG)], tim[str(L_SMALL)]
    per_lmk_ms = (t_big - t_small) / (L_BIG - L_SMALL)
    t_lmk = per_lmk_ms * L_BIG            # shards 1/n
    t_red = t_big - t_lmk                 # replicated (solve + overhead)
    rows = []
    for n in (1, 2, 4, 8, 16):
        B = hlo.get(str(min(n, 8)), hlo["8"])["bytes_per_iter"]
        for bw, link in ((BW_ICI, "ici"), (BW_DCN, "dcn")):
            t_coll = 0.0 if n == 1 else 2 * B * (n - 1) / n / bw * 1e3
            t_n = t_lmk / n + t_red + t_coll
            eff = t_big / (n * t_n)
            rows.append({"n": n, "link": link, "ms_per_iter": round(t_n, 4),
                         "coll_ms": round(t_coll, 4), "efficiency": round(eff, 3)})
    model = {
        "shapes": {"K": K, "L": L_BIG, "P": P},
        "measured_ms_per_iter_1chip": round(t_big, 4),
        "t_lmk_ms": round(t_lmk, 4), "t_red_ms": round(t_red, 4),
        "bytes_per_iter": {n: v["bytes_per_iter"] for n, v in hlo.items()},
        "bw_ici": BW_ICI, "bw_dcn": BW_DCN,
        "platform": tim["platform"],
        "rows": rows,
    }
    (OUT / "model.json").write_text(json.dumps(model, indent=1))
    for r in rows:
        print(r)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=("hlo", "time", "model"), required=True)
    args = ap.parse_args()
    {"hlo": phase_hlo, "time": phase_time, "model": phase_model}[args.phase]()

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
    from jax.sharding import NamedSharding, PartitionSpec

    def count(txt):
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
        return total, ops

    for n in (2, 4, 8):
        problem = _tiny_problem(K=K, C=2, L=L_BIG, P=P)
        mesh = sharding.make_mesh(n)
        sharded = sharding.shard_problem(problem, mesh)
        row = {}
        for tag, ds in (("lmk_only", None),
                        ("dense_sharded",
                         NamedSharding(mesh, PartitionSpec("lmk", None)))):
            # per-LM-iteration bytes = program(iters=2) - program(iters=1)
            # (isolates the scan body from one-time prologue collectives)
            byt = {}
            for it in (1, 2):
                opts = ba.BAOptions(iters=it, dense_shard=ds)
                txt = jax.jit(ba.ba_solve, static_argnums=1).lower(
                    sharded, opts).compile().as_text()
                byt[it], ops = count(txt)
            per_iter = max(byt[2] - byt[1], 0)
            row[tag] = {"bytes_per_iter": per_iter,
                        "bytes_total_1iter": byt[1],
                        "n_collectives": len(ops)}
            print(f"n={n} {tag}: {per_iter/1e6:.3f} MB/LM-iter "
                  f"({byt[1]/1e6:.3f} MB one-time+first)")
        # legacy key consumed by phase_model
        row["bytes_per_iter"] = row["lmk_only"]["bytes_per_iter"]
        res[str(n)] = row
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


def _measure_dense_parts():
    """Split the replicated intercept t_red into its two components at a
    near-zero landmark count (L=8):

    * dense_ms -- ba._linearize: the small-factor tangent sweep + H
      assembly.  This part NOW SHARDS over the mesh (BAOptions.dense_shard
      shards the jacfwd basis), so it divides by n in the refined model.
    * solve_ms -- ba._solve_from_lin: damping + masking + the (K*D+3P)
      Cholesky.  Irreducibly replicated (every device needs the full dx).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _tiny_problem
    from sadvio_tpu.backend import ba

    problem = _tiny_problem(K=K, C=2, L=8, P=P)
    opts = ba.BAOptions(iters=1)
    free = ba._free_mask(problem)
    lin_fn = jax.jit(ba._linearize)
    solve_fn = jax.jit(ba._solve_from_lin)

    def chain_lin(n):
        state = problem.state
        c = jnp.float32(0.0)
        for _ in range(n):
            p = problem._replace(state=state.replace(t=state.t + 1e-12 * c))
            lin = lin_fn(p, opts)
            c = lin.cost
        return c

    lin0 = lin_fn(problem, opts)

    def chain_solve(n):
        c = jnp.float32(0.0)
        for _ in range(n):
            dxd, dl, ok = solve_fn(
                lin0._replace(b=lin0.b + 1e-12 * c), problem, opts, free,
                jnp.float32(1e-4))
            c = jnp.sum(dxd)
        return c

    def slope(chain, n_a=5, n_b=25):
        float(np.asarray(chain(1)))  # compile + warm

        def timed(n):
            t0 = time.perf_counter()
            s = float(np.asarray(chain(n)))
            assert np.isfinite(s)
            return time.perf_counter() - t0

        a = min(timed(n_a) for _ in range(3))
        b = min(timed(n_b) for _ in range(3))
        assert b > a, (a, b)
        return (b - a) * 1000.0 / (n_b - n_a)

    return slope(chain_lin), slope(chain_solve)


def phase_time():
    import jax

    res = {"platform": jax.devices()[0].platform}
    for L in (L_SMALL, L_BIG):
        ms = _measure_ms_per_iter(L)
        res[str(L)] = ms
        print(f"K={K} L={L}: {ms:.4f} ms/LM-iter")
    dense_ms, solve_ms = _measure_dense_parts()
    res["dense_ms"] = dense_ms
    res["solve_ms"] = solve_ms
    print(f"dense linearize (shardable): {dense_ms:.4f} ms;"
          f" reduced solve (replicated): {solve_ms:.4f} ms")
    OUT.mkdir(exist_ok=True)
    (OUT / "time.json").write_text(json.dumps(res, indent=1))


def phase_model():
    hlo = json.loads((OUT / "hlo.json").read_text())
    tim = json.loads((OUT / "time.json").read_text())
    t_big, t_small = tim[str(L_BIG)], tim[str(L_SMALL)]
    per_lmk_ms = (t_big - t_small) / (L_BIG - L_SMALL)
    t_lmk = per_lmk_ms * L_BIG            # shards 1/n
    t_red = t_big - t_lmk                 # intercept: everything not ~L
    # split of the intercept (measured standalone at L=8):
    #   dense linearize -> shards 1/n with BAOptions.dense_shard
    #   reduced solve   -> irreducibly replicated
    t_dense = min(tim.get("dense_ms", 0.0), max(t_red - 0.05, 0.0))
    t_fix = t_red - t_dense
    rows = []
    for n in (1, 2, 4, 8, 16):
        h = hlo.get(str(min(n, 8)), hlo["8"])
        B = h["bytes_per_iter"]
        B_ds = h.get("dense_sharded", {}).get("bytes_per_iter", B)
        for bw, link in ((BW_ICI, "ici"), (BW_DCN, "dcn")):
            t_coll = 0.0 if n == 1 else 2 * B * (n - 1) / n / bw * 1e3
            t_coll_ds = 0.0 if n == 1 else 2 * B_ds * (n - 1) / n / bw * 1e3
            # production lmk-only sharding: dense part replicated
            t_n = t_lmk / n + t_red + t_coll
            # shard_dense=True variant: dense rows shard but pay resharding
            t_n_ds = (t_lmk + t_dense) / n + t_fix + t_coll_ds
            rows.append({
                "n": n, "link": link,
                "ms_per_iter": round(t_n, 4),
                "coll_ms": round(t_coll, 4),
                "efficiency": round(t_big / (n * t_n), 3),
                "ms_per_iter_dense_sharded": round(t_n_ds, 4),
                "coll_ms_dense_sharded": round(t_coll_ds, 4),
                "efficiency_dense_sharded": round(t_big / (n * t_n_ds), 3),
            })
    # composite DP x lmk mesh at fixed window size: the seq axis is
    # embarrassingly parallel (multiseq.ba_solve_batch, zero collectives),
    # so E(dp x nl) = E_lmk(nl) under load balance
    comp = []
    for dp, nl in ((2, 1), (4, 2), (2, 4), (8, 2), (4, 4)):
        r = next(x for x in rows if x["n"] == nl and x["link"] == "ici")
        comp.append({"mesh": f"{dp}x{nl}", "chips": dp * nl,
                     "efficiency": r["efficiency"] if nl > 1 else 1.0})
    model = {
        "shapes": {"K": K, "L": L_BIG, "P": P},
        "measured_ms_per_iter_1chip": round(t_big, 4),
        "t_lmk_ms": round(t_lmk, 4), "t_red_ms": round(t_red, 4),
        "t_dense_ms": round(t_dense, 4), "t_fix_ms": round(t_fix, 4),
        "dense_ms_standalone": round(tim.get("dense_ms", 0.0), 4),
        "solve_ms_standalone": round(tim.get("solve_ms", 0.0), 4),
        "bytes_per_iter": {n: v["bytes_per_iter"] for n, v in hlo.items()},
        "bw_ici": BW_ICI, "bw_dcn": BW_DCN,
        "platform": tim["platform"],
        "rows": rows,
        "composite_dp_lmk": comp,
    }
    (OUT / "model.json").write_text(json.dumps(model, indent=1))
    for r in rows:
        print(r)
    print("composite:", comp)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=("hlo", "time", "model"), required=True)
    args = ap.parse_args()
    {"hlo": phase_hlo, "time": phase_time, "model": phase_model}[args.phase]()

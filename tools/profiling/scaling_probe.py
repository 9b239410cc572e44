"""Sharded-BA scaling measurement on the virtual 8-device CPU mesh.

Measures wall time of the landmark-sharded window BA (parallel/sharding.py)
at 1/2/4/8 devices for a window big enough to matter (K=32, L=4096 -- the
shapes profiled in ba_scale_probe.py) and reports parallel efficiency
T1 / (n * Tn), writing SCALING.md.

HONESTY CAVEAT (recorded in the output): the 8 "devices" are virtual XLA
host-platform devices multiplexed onto this machine's 2 physical CPU cores,
and a SINGLE XLA:CPU device already multithreads its compute across all
cores -- so sharding cannot produce wall-clock speedup here at all; it can
only add partition/collective overhead.  What this measurement validates is
(a) the partitioned program is correct at every mesh size and (b) the
overhead of the inserted collectives stays bounded (the n=2 slowdown is the
overhead floor).  Chip-count scaling must be measured on a real slice where
each mesh element owns private compute.

Usage: python tools/profiling/scaling_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from __graft_entry__ import _tiny_problem
from sadvio_tpu.backend import ba
from sadvio_tpu.parallel import sharding

K, L, P = 32, 4096, 48
REPS = 3


def main():
    problem = _tiny_problem(K=K, C=2, L=L, P=P)
    opts = ba.BAOptions(iters=2)
    rows = []
    t1 = None
    for n in (1, 2, 4, 8):
        mesh = sharding.make_mesh(n)
        state, stats = sharding.ba_solve_sharded(problem, opts, mesh)  # compile
        jax.block_until_ready(state)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            state, stats = sharding.ba_solve_sharded(problem, opts, mesh)
            s = float(np.asarray(state.t).sum())  # value-forced
            ts.append(time.perf_counter() - t0)
        tn = min(ts)
        if t1 is None:
            t1 = tn
        eff = t1 / (n * tn)
        rows.append({"devices": n, "wall_s": round(tn, 4),
                     "speedup": round(t1 / tn, 3),
                     "efficiency": round(eff, 3)})
        print(json.dumps(rows[-1]))

    with open(os.path.join(os.path.dirname(__file__), "..", "..",
                           "SCALING.md"), "w") as f:
        f.write("# Sharded-BA scaling (virtual 8-device CPU mesh)\n\n")
        f.write(f"Window K={K}, L={L} landmark slots, 2 LM iterations, "
                f"min of {REPS} value-forced reps.\n\n")
        f.write("**Caveat:** the 8 devices are virtual XLA host devices on "
                "2 physical cores, and ONE XLA:CPU device already "
                "multithreads across all cores -- sharding cannot speed up "
                "wall-clock here, only add partition/collective overhead. "
                "This measures (a) correctness of the partitioned program "
                "at every mesh size and (b) the collective-overhead floor "
                "(the n=2 delta). Chip-count scaling needs a real slice "
                "with private compute per mesh element.\n\n")
        f.write("| devices | wall [s] | speedup | efficiency |\n")
        f.write("|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['devices']} | {r['wall_s']} | {r['speedup']} "
                    f"| {r['efficiency']} |\n")
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()

"""Benchmark: windowed VI-BA throughput on the target device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: milliseconds per LM iteration of the full stereo-VIO window BA at
window=10 keyframes, L=512 landmark slots (the BASELINE.json "BA ms/iter at
window=10" axis).  Baseline: the reference's implied CPU budget -- 20 LM
iterations inside its back-end real-time budget with 4 threads
(AOptimizer.cpp:315-323); we take 10 ms/iter as the reference-parity bar.
vs_baseline > 1 means faster than the bar.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_MS_PER_ITER = 10.0
ITERS = 20


def main():
    from __graft_entry__ import _tiny_problem
    from sadvio_tpu.backend import ba

    problem = _tiny_problem(K=11, C=2, L=512, P=48)
    opts = ba.BAOptions(iters=ITERS)

    # compile
    state, stats = ba.ba_solve(problem, opts)
    jax.block_until_ready(state)

    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        state, stats = ba.ba_solve(problem, opts)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / n_rep
    ms_per_iter = dt * 1000.0 / ITERS

    print(json.dumps({
        "metric": "vio_window_ba_ms_per_iter_w10_l512",
        "value": round(ms_per_iter, 4),
        "unit": "ms/iter",
        "vs_baseline": round(BASELINE_MS_PER_ITER / ms_per_iter, 3),
    }))


if __name__ == "__main__":
    main()

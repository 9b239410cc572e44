"""Benchmark: windowed VI-BA throughput on the target device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: milliseconds per LM iteration of the full stereo-VIO window BA at
window=10 keyframes, L=512 landmark slots (the BASELINE.json "BA ms/iter at
window=10" axis).  Baseline: the reference's implied CPU budget -- 20 LM
iterations inside its back-end real-time budget with 4 threads
(AOptimizer.cpp:315-323); we take 10 ms/iter as the reference-parity bar.
vs_baseline > 1 means faster than the bar.

Measurement protocol (tunneled-TPU safe): the device plugin here can return
from block_until_ready without having executed, so timings are forced by a
VALUE fetch, and the solves are DEPENDENCY-CHAINED (solve k+1 consumes solve
k's state) so fetching the final scalar provably forces every solve in the
chain.  One fetch round trip is amortized over the whole chain.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MS_PER_ITER = 10.0
ITERS = 20
# Two-point slope: t(CHAIN_B) - t(CHAIN_A) cancels the fixed per-fetch
# tunnel round trip (~26-33 ms) exactly, so the metric reads device
# throughput.  Chains deeper than ~20 unfetched solves deadlock the axon
# tunnel's queue, so the long chain stays at 20.
CHAIN_A = 5
CHAIN_B = 20
REPS = 3


def main():
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

    # compile + warm, forced by a value fetch
    float(np.asarray(chain(problem, 1).t).sum())

    dt_a = min(timed(CHAIN_A) for _ in range(REPS))
    dt_b = min(timed(CHAIN_B) for _ in range(REPS))
    ms_per_iter = (dt_b - dt_a) * 1000.0 / (ITERS * (CHAIN_B - CHAIN_A))

    print(json.dumps({
        "metric": "vio_window_ba_ms_per_iter_w10_l512",
        "value": round(ms_per_iter, 4),
        "unit": "ms/iter",
        "vs_baseline": round(BASELINE_MS_PER_ITER / ms_per_iter, 3),
    }))


if __name__ == "__main__":
    main()

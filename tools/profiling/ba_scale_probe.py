"""Window-BA throughput vs problem size on the real chip.

The reference's window is capped at 12 KFs because CPU Schur-LM grows
superlinearly; on the MXU the reduced-system work is batched matmuls, so the
window can grow before real time is at risk. This probe measures ms/LM-iter
for several (K, L) to document that headroom (BASELINE.md).

Protocol: dependency-chained value-fetched solves (see bench.py docstring --
block_until_ready can return pre-execution on the tunneled device).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def measure(K, L, iters=20, chain_n=5):
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_problem
    from sadvio_tpu.backend import ba

    problem = _tiny_problem(K=K, C=2, L=L, P=48)
    opts = ba.BAOptions(iters=iters)

    def chain(problem, n):
        state = problem.state
        for k in range(n):
            p = problem._replace(state=state.replace(t=state.t + 1e-7 * (k + 1)))
            state, _ = ba.ba_solve(p, opts)
        return state

    float(np.asarray(chain(problem, 1).t).sum())  # compile + warm
    t0 = time.perf_counter()
    out = chain(problem, chain_n)
    s = float(np.asarray(out.t).sum())
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return dt * 1000.0 / (iters * chain_n)


if __name__ == "__main__":
    import jax

    print("device:", jax.devices()[0].platform)
    for K, L in [(11, 512), (17, 1024), (33, 2048), (65, 4096)]:
        ms = measure(K, L)
        print(f"K={K - 1:3d} kf  L={L:5d} lmk  {ms:8.3f} ms/LM-iter")

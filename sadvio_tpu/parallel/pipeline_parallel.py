"""Pipeline parallelism: front end and back end on different devices.

The PP axis of SURVEY.md 2.7's mapping.  The reference overlaps its front
end (frame-rate tracking) and back end (KF-rate window BA + marginalization)
with two POSIX threads sharing a pointer graph under `_map_mutex`
(cpp/main.cpp:37-42, slamBiMonoVIO.cpp:522-580).  Here the same overlap is
expressed with devices instead of threads: the backend problem is placed on
a second device and solved there while the first device keeps tracking --
JAX's async dispatch provides the "threads", device placement provides the
isolation, and the handoff is one small pytree transfer (the window state,
O(K*15 + L*3) floats) instead of a mutex-guarded shared map.

Works degenerately with one device (executor device == frontend device):
dispatch is still async, matching the single-chip pipeline's behavior.
"""

from __future__ import annotations

import jax

from sadvio_tpu.backend import ba


class BackendExecutor:
    """Runs window BA on a designated device, overlapped with the caller.

    submit() transfers the problem to the backend device and enqueues the
    solve WITHOUT blocking (async dispatch).  collect() transfers the result
    back (blocking only if the solve is still running).  One solve may be in
    flight at a time -- the KF-rate cadence of the pipeline.
    """

    def __init__(self, device=None, opts: ba.BAOptions | None = None):
        devs = jax.devices()
        self.device = device if device is not None else devs[-1]
        self.opts = opts or ba.BAOptions(iters=8)
        self._pending = None

    def submit(self, problem: ba.BAProblem):
        if self._pending is not None:
            raise RuntimeError("backend solve already in flight; collect() first")
        problem = jax.device_put(problem, self.device)
        state, stats = ba.ba_solve(problem, self.opts)  # async dispatch
        self._pending = (state, stats)

    @property
    def busy(self) -> bool:
        return self._pending is not None

    def collect(self, to_device=None):
        """Fetch the finished state (blocks until the solve completes)."""
        if self._pending is None:
            raise RuntimeError("nothing submitted")
        state, stats = self._pending
        self._pending = None
        if to_device is not None:
            state = jax.device_put(state, to_device)
        return state, stats

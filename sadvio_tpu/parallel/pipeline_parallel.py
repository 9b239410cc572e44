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

    def submit_fn(self, fn, *args):
        """Run an arbitrary jitted backend step on the executor device.

        Used by the pipeline (config `multithreading`, the reference's
        front/back-end thread split) to route its full _backend step -- BA +
        outlier removal -- through the second device; args are transferred,
        fn is dispatched asynchronously, and the result tuple is collected
        with collect()."""
        if self._pending is not None:
            raise RuntimeError("backend solve already in flight; collect() first")
        args = jax.device_put(args, self.device)
        self._pending = fn(*args)

    @property
    def busy(self) -> bool:
        return self._pending is not None

    def collect(self, to_device=None):
        """Fetch the finished result (async: returns transferred futures)."""
        if self._pending is None:
            raise RuntimeError("nothing submitted")
        out = self._pending
        self._pending = None
        if to_device is not None:
            # transfer everything except the trailing stats dict
            state, rest = out[0], out[1:]
            state = jax.device_put(state, to_device)
            if len(rest) > 1:
                rest = (*jax.device_put(rest[:-1], to_device), rest[-1])
            out = (state, *rest)
        return out

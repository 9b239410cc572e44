"""Stage profiler: tic/toc stack + running averages + profiler dump.

TPU-native equivalent of the reference's profiling machinery
(reference: cpp/include/utilities/timer.h:16-27 tic/toc stack;
cpp/src/slamCore.cpp:468-507 running per-stage averages;
:554-584 log_slam/slam_profiler.txt writer).

Device-time caveat handled here: JAX dispatch is async, so a stage is timed
by blocking on its outputs (block=...) -- same measurement discipline as
bench.py.  Use sparingly on the hot path; per-stage timing is for the
profiler dump, not the steady-state loop.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax


class Profiler:
    def __init__(self):
        self.sums = defaultdict(float)
        self.counts = defaultdict(int)
        self._stack = []

    def tic(self):
        self._stack.append(time.perf_counter())

    def toc(self, name, block=None):
        if block is not None:
            jax.block_until_ready(block)
        dt = time.perf_counter() - self._stack.pop()
        self.sums[name] += dt
        self.counts[name] += 1
        return dt

    @contextmanager
    def stage(self, name, block_fn=None):
        self.tic()
        out = {}
        try:
            yield out
        finally:
            self.toc(name, block=out.get("block"))

    def avg_ms(self, name):
        c = self.counts[name]
        return 1000.0 * self.sums[name] / c if c else 0.0

    def dump(self, path=None):
        """slam_profiler.txt-style stage table (slamCore.cpp:554-584)."""
        lines = ["stage                          avg_ms      calls     total_s"]
        for name in sorted(self.sums):
            lines.append(
                f"{name:<28} {self.avg_ms(name):>9.3f} {self.counts[name]:>10d}"
                f" {self.sums[name]:>11.3f}"
            )
        text = "\n".join(lines)
        if path:
            with open(path, "w") as f:
                f.write(text + "\n")
        return text

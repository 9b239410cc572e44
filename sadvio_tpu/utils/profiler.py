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
        """Raw stage table (all recorded stages)."""
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

    def dump_slam(self, path=None, *, n_frames=0, n_keyframes=0,
                  pose_estimator="pnp", mesh_on=False):
        """slam_profiler.txt with the reference's field set
        (slamCore.cpp:554-584), mapped onto this pipeline's fused stages:

          Img process dt        <- pyramids (per frame)
          Prediction ... dt     <- track_predict_filter (the fused
                                   track+PnP/epipolar+filter+ESKF kernel;
                                   the reference's Prediction/Matching in
                                   time/filter/cleaning rows are one kernel
                                   here, so they share this number)
          Detection dt          <- detect_lmk_init (detect+stereo+
                                   triangulate, per KF)
          Landmark init dt      <- (inside detect_lmk_init; 0 row kept for
                                   layout parity)
          Marginalization dt    <- marginalization
          Optimize window dt    <- window_opt
          Mesh dt               <- mesh (when mesh3d)

        followed by the raw stage table for everything else recorded.
        """
        import time as _time

        am = self.avg_ms
        kf_over_frames = n_keyframes / max(n_frames, 1)
        front = (am("pyramids") + am("imu_preint") + am("track_predict_filter")
                 + (am("detect_lmk_init") + am("line_channel"))
                 * kf_over_frames)
        back = (am("window_opt") + am("marginalization")
                + am("nfr_edge")) * kf_over_frames
        # layout parity with the reference dump (slamCore.cpp:554-584).
        # Several reference rows map onto ONE fused kernel here (the
        # track/predict/filter/ESKF stages execute as a single XLA program,
        # and detection/stereo-matching/landmark-init likewise): those rows
        # print the fused measurement ANNOTATED with the kernel it came
        # from, rather than pretending four independent measurements exist.
        tpf = f"{am('track_predict_filter'):.3f} (=track_predict_filter)"
        dli = f"{am('detect_lmk_init'):.3f} (=detect_lmk_init)"
        rows = [
            "===== SLAM profiler =======",
            str(int(_time.time())),
            f"Number of frames: {n_frames}",
            f"Number of keyframes: {n_keyframes}",
            f"Img process dt: {am('pyramids'):.3f}",
            f"Detection dt: {dli}",
            f"Prediction {pose_estimator}RANSAC dt: {tpf}",
            f"Matching in frame dt: {dli}",
            f"Matching in time dt: {tpf}",
            f"Average filter time dt: {tpf}",
            f"Average cleaning time dt: {am('window_opt'):.3f} (=window_opt)",
            f"Landmark init dt: {dli}",
            f"Optimize frame dt: {tpf}",
            f"Marginalization dt: {am('marginalization'):.3f}",
        ]
        if mesh_on:
            rows.append(f"Mesh dt: {am('mesh'):.3f}")
        rows += [
            f"Optimize window dt: {am('window_opt'):.3f}",
            f"Front end dt: {front:.3f}",
            f"Back end dt: {back:.3f}",
            "",
        ]
        text = "\n".join(rows) + self.dump()
        if path:
            with open(path, "w") as f:
                f.write(text + "\n")
        return text

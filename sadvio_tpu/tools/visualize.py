"""Offline visualization: trajectory + landmark/dense-cloud renders to PNG.

Counterpart of the reference's RViz visualizer surface
(reference: ros/src/rosVisualizer.h:78-604 -- pose/trajectory markers,
local+global clouds, mesh triangle lists).  No ROS exists in this
environment, so the same artifacts are rendered to PNG with matplotlib:

    python -m sadvio_tpu.tools.visualize log_slam/results.csv out.png
or programmatically via plot_run(slam, path).
"""

from __future__ import annotations

import sys

import numpy as np


def _load_results_csv(path):
    rows = []
    for line in open(path):
        vals = [float(x) for x in line.strip().split(",")]
        rows.append((vals[0], np.asarray(vals[1:]).reshape(3, 4)))
    ts = np.asarray([r[0] for r in rows])
    t = np.stack([r[1][:, 3] for r in rows])
    return ts, t


def plot_trajectory(t_est, path, t_gt=None, cloud=None, title="trajectory"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 4.5))
    ax1 = fig.add_subplot(1, 2, 1)
    ax1.plot(t_est[:, 0], t_est[:, 1], "-", lw=1.5, label="estimate")
    if t_gt is not None:
        ax1.plot(t_gt[:, 0], t_gt[:, 1], "--", lw=1.0, label="ground truth")
    if cloud is not None and len(cloud):
        ax1.scatter(cloud[:, 0], cloud[:, 1], s=0.3, alpha=0.25, label="cloud")
    ax1.set_xlabel("x [m]")
    ax1.set_ylabel("y [m]")
    ax1.set_aspect("equal", adjustable="datalim")
    ax1.legend(fontsize=8)
    ax1.set_title(f"{title} (top view)")

    ax2 = fig.add_subplot(1, 2, 2)
    s = np.arange(len(t_est))
    for i, lbl in enumerate("xyz"):
        ax2.plot(s, t_est[:, i], lw=1.0, label=f"est {lbl}")
        if t_gt is not None:
            ax2.plot(s, t_gt[: len(s), i], "--", lw=0.7)
    ax2.set_xlabel("frame")
    ax2.set_ylabel("position [m]")
    ax2.legend(fontsize=8)
    ax2.set_title("per-axis position")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    return path


def plot_run(slam, path, world=None):
    """Render a finished pipeline run (+ mesh cloud when present)."""
    t_est = np.asarray([t for _, _, t in slam.traj])
    t_gt = world.gt_t[: len(t_est)] if world is not None else None
    cloud = None
    mesher = getattr(slam, "mesher", None)
    if mesher is not None:
        cloud = mesher.dense_points()
    return plot_trajectory(t_est, path, t_gt=t_gt, cloud=cloud)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 2
    ts, t = _load_results_csv(argv[0])
    plot_trajectory(t, argv[1], title=argv[0])
    print(f"wrote {argv[1]} ({len(t)} poses)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Full-stack integration: EuRoC-format dataset on disk -> CLI -> results.csv.

The synthetic world is written out as a real EuRoC directory (PNG images +
CSVs) plus the two reference-layout YAML configs, then the offline entry
point replays it (main.cpp semantics).  Exercises config parsing, the data
provider, mode dispatch, the full pipeline and the log writers in one go.
"""

import os

import numpy as np
import pytest

from sadvio_tpu.pipeline import synthetic


@pytest.fixture(scope="module")
def euroc_dir(tmp_path_factory):
    from PIL import Image

    world = synthetic.make_world(seed=6, n_frames=24, width=320, height=240,
                                 n_points=200)
    root = tmp_path_factory.mktemp("ds") / "mav0"
    t0 = 1.0
    for c in (0, 1):
        d = root / f"cam{c}" / "data"
        d.mkdir(parents=True)
        rows = ["#ts,filename"]
        for f in world.frames:
            ts_ns = int((t0 + f.ts) * 1e9)
            name = f"{ts_ns}.png"
            Image.fromarray(f.images[c].astype(np.uint8), "L").save(d / name)
            rows.append(f"{ts_ns},{name}")
        (root / f"cam{c}" / "data.csv").write_text("\n".join(rows) + "\n")
    di = root / "imu0"
    di.mkdir(parents=True)
    rows = ["#ts,wx,wy,wz,ax,ay,az"]
    t_abs = t0
    for f in world.frames:
        for k in range(len(f.dt)):
            t_abs += float(f.dt[k])
            vals = [*f.gyr[k].tolist(), *f.acc[k].tolist()]
            rows.append(",".join([str(int(t_abs * 1e9))] +
                                 [f"{v:.7f}" for v in vals]))
    (di / "data.csv").write_text("\n".join(rows) + "\n")

    cfgd = tmp_path_factory.mktemp("cfg")
    (cfgd / "config.yaml").write_text(
        "slam_mode: bimono\n"
        "tracker: klt\n"
        "pose_estimator: pnp\n"
        "optimizer: Analytic\n"
        "contrast_enhancer: none\n"
        "marginalization: 1\n"
        "sparsification: 1\n"
        "mesh3d: 0\n"
        "min_kf_number: 3\n"
        "max_kf_number: 5\n"
        "fixed_frame_number: 1\n"
        "min_lmk_number: 25\n"
        "min_movement_parallax: 0.02\n"
        "max_movement_parallax: 1.0\n"
    )
    cam = world.rig.cam
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[0, 3] = 0.11
    def cam_block(i, T):
        return (
            f"cam{i}:\n"
            "  camera_model: pinhole\n"
            f"  resolution: [320, 240]\n"
            f"  intrinsics: [{float(cam.fx[i])}, {float(cam.fy[i])},"
            f" {float(cam.cx[i])}, {float(cam.cy[i])}]\n"
            "  distortion_coefficients: [0.0, 0.0, 0.0, 0.0]\n"
            "  T_BS:\n"
            f"    data: {T.reshape(-1).tolist()}\n"
        )
    (cfgd / "dataset.yaml").write_text(
        "ncam: 2\n" + cam_block(0, T0) + cam_block(1, T1)
        + "imu0:\n  rate_hz: 200.0\n"
        "  accelerometer_noise_density: 2.0e-3\n"
        "  gyroscope_noise_density: 1.7e-4\n"
        "  accelerometer_random_walk: 3.0e-3\n"
        "  gyroscope_random_walk: 2.0e-5\n"
        "  T_BS:\n    data: "
        + str(np.eye(4).reshape(-1).tolist()) + "\n"
    )
    return str(cfgd), str(root.parent), world


def test_run_euroc_cli(euroc_dir, tmp_path, monkeypatch):
    cfgd, data_dir, world = euroc_dir
    from sadvio_tpu import run_euroc

    monkeypatch.chdir(tmp_path)
    rc = run_euroc.main([cfgd, data_dir])
    assert rc == 0
    rows = open(tmp_path / "log_slam" / "results.csv").read().strip().splitlines()
    assert len(rows) >= 3
    # last KF position must be finite and near the ground truth trajectory
    last = np.asarray([float(x) for x in rows[-1].split(",")[1:]]).reshape(3, 4)
    assert np.isfinite(last).all()
    assert np.linalg.norm(last[:, 3]) < 2.0  # world spans < 1 m


def test_compare_euroc_protocol(euroc_dir, tmp_path, monkeypatch):
    """Dry-run of the one-command comparison protocol on the fabricated
    dataset: sadvio row with ATE vs a fabricated EuRoC ground-truth csv.
    (The reference row needs the reference binary, absent here.)"""
    import json
    import sys

    cfgd, data_dir, world = euroc_dir
    # the subprocess must stay off the tunneled TPU (see run_euroc.main's
    # SADVIO_PLATFORM override; env vars alone are force-overridden here)
    monkeypatch.setenv("SADVIO_PLATFORM", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import compare_euroc

    # fabricate mav0/state_groundtruth_estimate0 from the synthetic truth,
    # in the estimator gauge (world = first body frame), EuRoC ns stamps
    gt_dir = os.path.join(data_dir, "mav0", "state_groundtruth_estimate0")
    os.makedirs(gt_dir, exist_ok=True)
    R0, t0 = world.gt_R[0], world.gt_t[0]
    rows = ["#ts,px,py,pz,qw,qx,qy,qz"]
    for i, f in enumerate(world.frames):
        p = R0.T @ (world.gt_t[i] - t0)
        rows.append(f"{int((1.0 + f.ts) * 1e9)},{p[0]},{p[1]},{p[2]},1,0,0,0")
    with open(os.path.join(gt_dir, "data.csv"), "w") as fh:
        fh.write("\n".join(rows) + "\n")

    out = tmp_path / "cmp"
    rc = compare_euroc.main([
        "--dataset", data_dir, "--config", cfgd, "--out", str(out)])
    assert rc == 0
    table = json.loads((out / "comparison.json").read_text())
    assert table[0]["system"] == "sadvio_tpu"
    assert table[0]["frames"] >= 20
    assert table[0]["fps"] > 0
    assert table[0]["ate_m"] is not None and table[0]["ate_m"] < 0.1
    assert table[0]["gt_pairs"] >= 3

"""Native C++ data loader round-trip: fake EuRoC dir -> synced FrameData.

Checks CSV parse, stereo sync (2.5 ms / 20 ms gates), IMU batching, PNG and
PGM decode, and agreement with the pure-Python EurocProvider.
"""

import os

import numpy as np
import pytest

from sadvio_tpu.pipeline import euroc as pyio

W, H, NF, IMU_HZ, FPS = 64, 48, 6, 200, 20


@pytest.fixture(scope="module")
def fake_euroc(tmp_path_factory):
    root = tmp_path_factory.mktemp("euroc") / "mav0"
    rng = np.random.default_rng(0)
    from PIL import Image

    imgs = []
    for c in (0, 1):
        d = root / f"cam{c}" / "data"
        d.mkdir(parents=True)
        rows = ["#ts,filename"]
        for k in range(NF):
            ts_ns = int((1.0 + k / FPS) * 1e9)
            img = rng.integers(0, 255, (H, W), np.uint8)
            name = f"{ts_ns}.png"
            Image.fromarray(img, "L").save(d / name)
            rows.append(f"{ts_ns},{name}")
            if c == 0:
                imgs.append(img)
        (root / f"cam{c}" / "data.csv").write_text("\n".join(rows) + "\n")
    di = root / "imu0"
    di.mkdir(parents=True)
    rows = ["#ts,wx,wy,wz,ax,ay,az"]
    n_imu = int(NF / FPS * IMU_HZ) + IMU_HZ
    for k in range(n_imu):
        ts_ns = int((1.0 - 0.5 + k / IMU_HZ) * 1e9)
        v = rng.standard_normal(6) * 0.01
        v[5] = 9.81
        rows.append(",".join([str(ts_ns)] + [f"{x:.6f}" for x in v]))
    (di / "data.csv").write_text("\n".join(rows) + "\n")
    return str(root.parent), imgs


def test_python_provider(fake_euroc):
    root, imgs = fake_euroc
    p = pyio.EurocProvider(root)
    frames = list(p.frames())
    assert len(frames) == NF
    assert frames[0].images.shape == (2, H, W)
    np.testing.assert_allclose(frames[0].images[0], imgs[0].astype(np.float32))
    # frames after the first must carry one inter-frame IMU batch each
    for f in frames[1:]:
        assert 8 <= len(f.dt) <= 12  # 200/20 = 10 per interval
        np.testing.assert_allclose(f.dt.sum(), 1.0 / FPS, atol=1e-3)


def test_native_matches_python(fake_euroc):
    native = pytest.importorskip("sadvio_tpu.pipeline.native_io")
    root, imgs = fake_euroc
    try:
        np_ = native.NativeEurocProvider(root)
    except RuntimeError:
        pytest.skip("native loader not built")
    assert np_.n_frames == NF
    py = pyio.EurocProvider(root)
    for fn, fp in zip(np_.frames(), py.frames()):
        assert abs(fn.ts - fp.ts) < 1e-9
        np.testing.assert_allclose(fn.images, fp.images, atol=0.5)
        assert len(fn.dt) == len(fp.dt)
        if len(fn.dt):
            np.testing.assert_allclose(fn.dt, fp.dt, atol=1e-6)
            np.testing.assert_allclose(fn.acc, fp.acc, atol=1e-5)
            np.testing.assert_allclose(fn.gyr, fp.gyr, atol=1e-5)
    np_.close()


def test_contrast_enhancers(rng):
    import jax.numpy as jnp

    img = jnp.asarray(rng.uniform(20, 120, (48, 64)), jnp.float32)
    for method in ("clahe", "histeq", "agcwd"):
        out = np.asarray(pyio.enhance_contrast(img, method))
        assert out.shape == img.shape
        assert np.isfinite(out).all()
        assert 0.0 <= out.min() and out.max() <= 255.0 + 1e-3
    # equalization must widen the dynamic range of a low-contrast image
    he = np.asarray(pyio.enhance_contrast(img, "histeq"))
    assert he.max() - he.min() > (120 - 20) * 1.5


def test_native_delaunay_matches_scipy(rng):
    """native/delaunay.cpp produces a valid Delaunay triangulation: same
    triangle count as scipy (triangulations of points in general position
    are unique), empty circumcircles, consistent orientation."""
    from sadvio_tpu.pipeline.native_io import native_delaunay

    pts = rng.uniform(0, 100, (60, 2)).astype(np.float32)
    tris = native_delaunay(pts)
    if tris is None:
        import pytest

        pytest.skip("native library not built")

    from scipy.spatial import Delaunay

    ref = Delaunay(pts.astype(np.float64))
    assert len(tris) == len(ref.simplices)

    p = pts.astype(np.float64)
    for (a, b, c) in tris:
        A, B, C = p[a], p[b], p[c]
        # CCW orientation
        area2 = (B[0] - A[0]) * (C[1] - A[1]) - (B[1] - A[1]) * (C[0] - A[0])
        assert area2 > 0
        # empty circumcircle (Delaunay property), via the incircle determinant
        for d in range(len(p)):
            if d in (a, b, c):
                continue
            D = p[d]
            m = np.array([
                [A[0] - D[0], A[1] - D[1], (A[0] - D[0]) ** 2 + (A[1] - D[1]) ** 2],
                [B[0] - D[0], B[1] - D[1], (B[0] - D[0]) ** 2 + (B[1] - D[1]) ** 2],
                [C[0] - D[0], C[1] - D[1], (C[0] - D[0]) ** 2 + (C[1] - D[1]) ** 2],
            ])
            assert np.linalg.det(m) <= 1e-6 * np.abs(m).max() ** 3


def test_native_delaunay_degenerate():
    """Collinear and duplicate inputs must not crash or emit triangles."""
    from sadvio_tpu.pipeline.native_io import native_delaunay

    line = np.stack([np.arange(5, dtype=np.float32),
                     np.arange(5, dtype=np.float32)], -1)
    tris = native_delaunay(line)
    if tris is None:
        import pytest

        pytest.skip("native library not built")
    assert len(tris) == 0
    dup = np.zeros((4, 2), np.float32)
    assert len(native_delaunay(dup)) == 0

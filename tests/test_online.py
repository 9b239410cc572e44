"""Online provider tests: ROS-analog push callbacks -> synchronized frames.

Covers the sync rules of the reference grabber (adataprovider.cpp:373-483)
on the middleware-agnostic path (sensorSubscriber.h semantics).
"""

import threading

import numpy as np

from sadvio_tpu.pipeline.online import OnlineProvider, VisualizerHub


def _img(v):
    return np.full((4, 6), float(v), np.float32)


def test_stereo_sync_and_imu_batching():
    p = OnlineProvider(n_cams=2)
    # IMU at 100 Hz from t=0
    for i in range(30):
        p.push_imu(0.01 * i, [0, 0, 9.81], [0, 0, 0])
    # frame 0 at t=0.05, partner within 2 ms
    p.push_image(0, 0.050, _img(1))
    p.push_image(1, 0.051, _img(2))
    # frame 1 at t=0.15
    p.push_image(0, 0.150, _img(3))
    p.push_image(1, 0.150, _img(4))

    f0 = p.next(timeout=1.0)
    assert f0 is not None and f0.ts == 0.050
    assert f0.images.shape == (2, 4, 6)
    assert f0.acc.shape[0] == 0  # first frame: no preceding batch

    f1 = p.next(timeout=1.0)
    assert f1 is not None and f1.ts == 0.150
    # IMU strictly in (0.05, 0.15]: samples at 0.06..0.15 -> 10
    assert f1.acc.shape[0] == 10
    np.testing.assert_allclose(f1.dt.sum(), 0.10, atol=1e-6)


def test_unpaired_frame_dropped():
    p = OnlineProvider(n_cams=2)
    p.push_imu(0.0, [0, 0, 0], [0, 0, 0])
    p.push_image(0, 0.050, _img(1))   # partner never arrives near this ts
    p.push_image(1, 0.120, _img(2))   # next stereo pair
    p.push_image(0, 0.121, _img(3))
    p.push_imu(0.2, [0, 0, 0], [0, 0, 0])
    f = p.next(timeout=1.0)
    assert f is not None and abs(f.ts - 0.121) < 1e-9


def test_close_unblocks_consumer():
    p = OnlineProvider(n_cams=1)
    got = []

    def consume():
        got.append(p.next(timeout=5.0))

    t = threading.Thread(target=consume)
    t.start()
    p.close()
    t.join(2.0)
    assert not t.is_alive() and got == [None]


def test_visualizer_hub_fanout():
    hub = VisualizerHub()
    seen = []
    hub.subscribe("pose", lambda pl: seen.append(("pose", pl["t"][0])))
    hub.subscribe("trajectory", lambda pl: seen.append(("traj", len(pl))))
    hub.publish_keyframe(R=np.eye(3), t=np.asarray([1.0, 0, 0]),
                         traj=np.zeros((5, 3)))
    assert ("pose", 1.0) in seen and ("traj", 5) in seen


def test_decode_compressed_png_jpeg():
    """CompressedImage payload decoding (sensorSubscriber.h compressed
    path): PNG round-trips bit-exact to the gray source; JPEG stays close.
    Color payloads collapse to the channel mean like the raw path."""
    import io

    from PIL import Image as PILImage

    from sadvio_tpu.ros2_node import decode_compressed

    rng = np.random.default_rng(0)
    gray = rng.integers(0, 255, (32, 48), np.uint8)
    buf = io.BytesIO()
    PILImage.fromarray(gray).save(buf, format="PNG")
    out = decode_compressed(buf.getvalue())
    assert out.dtype == np.float32 and out.shape == (32, 48)
    np.testing.assert_array_equal(out, gray.astype(np.float32))

    buf = io.BytesIO()
    PILImage.fromarray(gray).save(buf, format="JPEG", quality=92)
    out_j = decode_compressed(buf.getvalue())
    assert np.abs(out_j - gray).mean() < 4.0

    rgb = rng.integers(0, 255, (8, 8, 3), np.uint8)
    buf = io.BytesIO()
    PILImage.fromarray(rgb).save(buf, format="PNG")
    out_c = decode_compressed(buf.getvalue())
    np.testing.assert_allclose(out_c, rgb.astype(np.float32).mean(-1))

"""CSV precomputed-keypoint provider tests (csvKeypointDetector parity)."""

import numpy as np
import jax.numpy as jnp

from sadvio_tpu.frontend import csv_keypoints as ck


def _write_csv(path, uvs, descs):
    with open(path, "w") as f:
        f.write("idx,u,v,desc\n")
        for (u, v), d in zip(uvs, descs):
            ds = ", ".join(str(int(x)) for x in d)
            f.write(f"[{u}, {v}], [{ds}]\n")


def test_load_and_match(tmp_path):
    rng = np.random.default_rng(3)
    uvs = rng.uniform(0, 400, (20, 2)).round(2)
    descs = rng.integers(0, 255, (20, 128))
    _write_csv(tmp_path / "1403636579763555584.csv", uvs, descs)

    uv, desc, valid = ck.load_csv_keypoints(
        str(tmp_path), 1403636579763555584, capacity=32)
    assert int(valid.sum()) == 20
    np.testing.assert_allclose(np.asarray(uv)[:20], uvs, atol=1e-2)

    # second view: same descriptors, permuted; matching must invert the perm
    perm = rng.permutation(20)
    uv_b = jnp.asarray(np.vstack([np.asarray(uv)[:20][perm],
                                  np.zeros((12, 2), np.float32)]))
    desc_b = jnp.asarray(np.vstack([np.asarray(desc)[:20][perm],
                                    np.zeros((12, 128), np.float32)]))
    valid_b = jnp.asarray([True] * 20 + [False] * 12)
    idx, ok = ck.match_csv_keypoints(desc, valid, desc_b, valid_b)
    ok = np.asarray(ok)
    assert ok[:20].all() and not ok[20:].any()
    inv = np.argsort(perm)
    np.testing.assert_array_equal(np.asarray(idx)[:20], inv)


def test_missing_file_gives_empty(tmp_path):
    uv, desc, valid = ck.load_csv_keypoints(str(tmp_path), 42, capacity=8)
    assert not bool(valid.any())

"""Sequence-parallel (time-sharded) IMU preintegration vs the sequential scan.

Reference semantics: cpp/src/data/sensors/IMU.cpp:5-91 (processIMU); the
distributed version must reproduce the single-device scan bit-for-bit up to
float reassociation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.models import imu as imu_mod
from sadvio_tpu.parallel import time_sharding


def _stream(rng, n, pad_tail=0):
    acc = rng.normal(0.0, 2.0, (n, 3)).astype(np.float32)
    acc[:, 2] += imu_mod.GRAVITY
    gyr = rng.normal(0.0, 0.5, (n, 3)).astype(np.float32)
    dt = np.full((n,), 1.0 / 200.0, np.float32)
    if pad_tail:
        dt[-pad_tail:] = 0.0
        acc[-pad_tail:] = 0.0
        gyr[-pad_tail:] = 0.0
    return jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt)


def _check_equal(a: imu_mod.Preintegration, b: imu_mod.Preintegration):
    np.testing.assert_allclose(a.dR, b.dR, atol=3e-6)
    np.testing.assert_allclose(a.dv, b.dv, atol=1e-5)
    np.testing.assert_allclose(a.dp, b.dp, atol=1e-5)
    np.testing.assert_allclose(a.dt, b.dt, atol=1e-6)
    # near-zero cross terms reassociate; scale atol to the matrix magnitude
    np.testing.assert_allclose(
        a.cov, b.cov, rtol=2e-4, atol=2e-4 * float(np.abs(np.asarray(a.cov)).max()))
    for f in ("J_dR_bg", "J_dv_ba", "J_dv_bg", "J_dp_ba", "J_dp_bg"):
        np.testing.assert_allclose(
            getattr(a, f), getattr(b, f), rtol=2e-4, atol=2e-6, err_msg=f)


@pytest.mark.parametrize("pad_tail", [0, 37])
def test_time_sharded_matches_sequential(rng, pad_tail):
    acc, gyr, dt = _stream(rng, 256, pad_tail)
    ba = jnp.asarray([0.02, -0.01, 0.03], jnp.float32)
    bg = jnp.asarray([0.001, 0.002, -0.001], jnp.float32)
    params = imu_mod.ImuParams.euroc()

    seq = imu_mod.preintegrate(acc, gyr, dt, ba, bg, params)
    mesh = time_sharding.make_time_mesh(8)
    dist = time_sharding.preintegrate_time_sharded(
        acc, gyr, dt, ba, bg, params, mesh)
    _check_equal(seq, dist)


def test_assoc_single_device_unchanged(rng):
    """preintegrate_assoc (now routed through chunk_summary) still matches
    the sequential scan."""
    acc, gyr, dt = _stream(rng, 128)
    ba = jnp.zeros(3, jnp.float32)
    bg = jnp.asarray([0.0, 0.001, 0.0], jnp.float32)
    params = imu_mod.ImuParams.euroc()
    seq = imu_mod.preintegrate(acc, gyr, dt, ba, bg, params)
    assoc = imu_mod.preintegrate_assoc(acc, gyr, dt, ba, bg, params)
    _check_equal(seq, assoc)


def test_combine_summary_associative(rng):
    acc, gyr, dt = _stream(rng, 96)
    ba = jnp.zeros(3, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    params = imu_mod.ImuParams.euroc()
    chunks = [
        imu_mod.chunk_summary(acc[i:i + 32], gyr[i:i + 32], dt[i:i + 32],
                              ba, bg, params)
        for i in (0, 32, 64)
    ]
    a, b, c = chunks
    left = imu_mod.combine_summary(imu_mod.combine_summary(a, b), c)
    right = imu_mod.combine_summary(a, imu_mod.combine_summary(b, c))
    for f in ("dR", "dv", "dp", "dt", "M9", "cov", "M15", "X"):
        np.testing.assert_allclose(
            getattr(left, f), getattr(right, f), rtol=2e-4, atol=1e-6,
            err_msg=f)
    whole = imu_mod.chunk_summary(acc, gyr, dt, ba, bg, params)
    np.testing.assert_allclose(left.dp, whole.dp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        left.cov, whole.cov, rtol=2e-4,
        atol=2e-4 * float(np.abs(np.asarray(whole.cov)).max()))

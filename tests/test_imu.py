"""IMU preintegration tests on synthetic streams.

Mirrors the reference imu_test.cpp strategy (constant acceleration, pure
rotation, covariance growth, bias-Jacobian finite differences, prediction).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sadvio_tpu.models import imu as imu_mod
from sadvio_tpu.utils import geometry as geo

P = imu_mod.ImuParams.euroc()
G = jnp.array([0.0, 0.0, -imu_mod.GRAVITY], jnp.float32)


def make_stream(n, acc, gyr, dt=0.005):
    a = jnp.tile(jnp.asarray(acc, jnp.float32), (n, 1))
    w = jnp.tile(jnp.asarray(gyr, jnp.float32), (n, 1))
    h = jnp.full((n,), dt, jnp.float32)
    return a, w, h


def test_constant_acceleration():
    """Static body, accelerometer measures -g + extra accel in body frame."""
    n, dt = 200, 0.005
    extra = jnp.array([0.3, 0.0, 0.0], jnp.float32)
    a, w, h = make_stream(n, np.array([0.3, 0.0, imu_mod.GRAVITY]), np.zeros(3), dt)
    pre = imu_mod.preintegrate(a, w, h, jnp.zeros(3), jnp.zeros(3), P)
    T = n * dt
    np.testing.assert_allclose(float(pre.dt), T, rtol=1e-5)
    # prediction from rest with R_i = I: a_world = R a_body + g = extra
    R_j, p_j, v_j = imu_mod.predict(pre, jnp.eye(3), jnp.zeros(3), jnp.zeros(3), g=G)
    np.testing.assert_allclose(np.asarray(v_j), np.asarray(extra) * T, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_j), 0.5 * np.asarray(extra) * T * T, atol=1e-3)
    np.testing.assert_allclose(np.asarray(R_j), np.eye(3), atol=1e-6)


def test_pure_rotation():
    n, dt = 100, 0.005
    wz = 0.7
    a, w, h = make_stream(n, np.zeros(3), np.array([0.0, 0.0, wz]), dt)
    pre = imu_mod.preintegrate(a, w, h, jnp.zeros(3), jnp.zeros(3), P)
    expected = geo.so3_exp(jnp.array([0.0, 0.0, wz * n * dt], jnp.float32))
    np.testing.assert_allclose(np.asarray(pre.dR), np.asarray(expected), atol=1e-4)


def test_masked_padding_is_noop():
    n = 64
    a, w, h = make_stream(n, np.array([0.1, 0.2, 9.9]), np.array([0.01, 0.02, 0.03]))
    pre_full = imu_mod.preintegrate(a, w, h, jnp.zeros(3), jnp.zeros(3), P)
    # pad with garbage samples of dt=0
    pad_a = jnp.concatenate([a, jnp.full((32, 3), 123.0)], 0)
    pad_w = jnp.concatenate([w, jnp.full((32, 3), -9.0)], 0)
    pad_h = jnp.concatenate([h, jnp.zeros(32)], 0)
    pre_pad = imu_mod.preintegrate(pad_a, pad_w, pad_h, jnp.zeros(3), jnp.zeros(3), P)
    for f in ["dR", "dv", "dp", "cov", "dt", "J_dR_bg", "J_dp_ba"]:
        np.testing.assert_allclose(
            np.asarray(getattr(pre_pad, f)), np.asarray(getattr(pre_full, f)), atol=1e-6
        )


def test_covariance_growth(rng):
    n = 128
    a, w, h = make_stream(n, np.array([0.0, 0.0, 9.81]), np.zeros(3))
    pre_half = imu_mod.preintegrate(a[:64], w[:64], h[:64], jnp.zeros(3), jnp.zeros(3), P)
    pre_full = imu_mod.preintegrate(a, w, h, jnp.zeros(3), jnp.zeros(3), P)
    c1 = np.trace(np.asarray(pre_half.cov))
    c2 = np.trace(np.asarray(pre_full.cov))
    assert c2 > c1 > 0
    # symmetric PSD
    C = np.asarray(pre_full.cov)
    np.testing.assert_allclose(C, C.T, atol=1e-12)
    assert np.linalg.eigvalsh(C).min() > -1e-12


def test_bias_jacobians_fd(rng):
    """First-order bias correction vs re-integration at perturbed bias."""
    n = 100
    acc = rng.standard_normal((n, 3)) * 0.5 + np.array([0, 0, 9.81])
    gyr = rng.standard_normal((n, 3)) * 0.2
    a = jnp.asarray(acc, jnp.float32)
    w = jnp.asarray(gyr, jnp.float32)
    h = jnp.full((n,), 0.005, jnp.float32)
    ba0 = jnp.zeros(3)
    bg0 = jnp.zeros(3)
    pre = imu_mod.preintegrate(a, w, h, ba0, bg0, P)
    eps = 1e-3
    for k in range(3):
        dba = jnp.zeros(3).at[k].set(eps)
        pre2 = imu_mod.preintegrate(a, w, h, ba0 + dba, bg0, P)
        dR_c, dv_c, dp_c = imu_mod.bias_corrected_deltas(pre, ba0 + dba, bg0)
        np.testing.assert_allclose(np.asarray(dv_c), np.asarray(pre2.dv), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dp_c), np.asarray(pre2.dp), atol=1e-4)
        dbg = jnp.zeros(3).at[k].set(eps)
        pre3 = imu_mod.preintegrate(a, w, h, ba0, bg0 + dbg, P)
        dR_c, dv_c, dp_c = imu_mod.bias_corrected_deltas(pre, ba0, bg0 + dbg)
        np.testing.assert_allclose(np.asarray(dR_c), np.asarray(pre3.dR), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv_c), np.asarray(pre3.dv), atol=2e-3)
        np.testing.assert_allclose(np.asarray(dp_c), np.asarray(pre3.dp), atol=2e-3)


def test_residual_zero_at_truth(rng):
    """Simulate a moving body; residual at true states must vanish."""
    n, dt = 200, 0.005
    # body rotating slowly about z while accelerating along body x
    wz = 0.3
    a_body = np.array([0.5, 0.0, 0.0])
    R = np.eye(3)
    p = np.zeros(3)
    v = np.zeros(3)
    g = np.array([0.0, 0.0, -imu_mod.GRAVITY])
    accs, gyrs = [], []
    for _ in range(n):
        # measured acc = R^T (a_world - g); choose a_world = R @ a_body
        a_world = R @ a_body
        accs.append(R.T @ (a_world - g))
        gyrs.append(np.array([0.0, 0.0, wz]))
        # integrate ground truth (euler, matching preintegration discretization)
        p = p + v * dt + 0.5 * a_world * dt * dt
        v = v + a_world * dt
        R = R @ np.asarray(geo.so3_exp(jnp.asarray([0, 0, wz * dt], dtype=jnp.float64)))
    a = jnp.asarray(np.stack(accs), jnp.float32)
    w = jnp.asarray(np.stack(gyrs), jnp.float32)
    h = jnp.full((n,), dt, jnp.float32)
    pre = imu_mod.preintegrate(a, w, h, jnp.zeros(3), jnp.zeros(3), P)
    r = imu_mod.residual(
        pre,
        jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(R, jnp.float32), jnp.asarray(p, jnp.float32), jnp.asarray(v, jnp.float32),
    )
    assert np.abs(np.asarray(r)).max() < 5e-3, np.asarray(r)


def test_sqrt_info_whitens():
    n = 50
    a, w, h = make_stream(n, np.array([0.0, 0.0, 9.81]), np.array([0.1, 0, 0]))
    pre = imu_mod.preintegrate(a, w, h, jnp.zeros(3), jnp.zeros(3), P)
    W = imu_mod.sqrt_info(pre)
    C = np.asarray(pre.cov)
    WCWt = np.asarray(W) @ C @ np.asarray(W).T
    np.testing.assert_allclose(WCWt, np.eye(9), atol=1e-3)


def test_associative_scan_matches_sequential(rng):
    """preintegrate_assoc (log-depth, time-shardable) == preintegrate."""
    n = 64
    acc = jnp.asarray(rng.normal(0, 2.0, (n, 3)) + [0, 0, 9.81], jnp.float32)
    gyr = jnp.asarray(rng.normal(0, 0.5, (n, 3)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.004, 0.006, (n,)), jnp.float32)
    dt = dt.at[50:].set(0.0)  # padding tail must be a no-op in both
    ba = jnp.asarray([0.02, -0.01, 0.03], jnp.float32)
    bg = jnp.asarray([0.001, 0.002, -0.001], jnp.float32)
    params = imu_mod.ImuParams.euroc()

    seq = imu_mod.preintegrate(acc, gyr, dt, ba, bg, params)
    par = imu_mod.preintegrate_assoc(acc, gyr, dt, ba, bg, params)

    for name in ("dR", "dv", "dp", "dt", "J_dR_bg", "J_dv_ba", "J_dv_bg",
                 "J_dp_ba", "J_dp_bg"):
        a, b = np.asarray(getattr(seq, name)), np.asarray(getattr(par, name))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5, err_msg=name)
    # covariance spans ~1e-10..1e-4; compare equilibrated
    ca, cb = np.asarray(seq.cov), np.asarray(par.cov)
    d = np.sqrt(np.clip(np.diagonal(ca), 1e-16, None))
    np.testing.assert_allclose(ca / np.outer(d, d), cb / np.outer(d, d),
                               atol=5e-3)

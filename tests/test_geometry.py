"""Finite-difference and round-trip tests for the Lie-group core.

Mirrors the reference's synthetic-verification style (residual_test.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.utils import geometry as geo


def rand_w(rng, scale=1.0, n=()):
    return jnp.asarray(rng.standard_normal((*n, 3)) * scale, dtype=jnp.float32)


def test_exp_log_roundtrip(rng):
    w = rand_w(rng, 1.0, (64,))
    # log(exp(w)) == w only holds inside the injectivity radius ||w|| < pi
    n = np.linalg.norm(np.asarray(w), axis=-1, keepdims=True)
    w = jnp.asarray(np.asarray(w) * np.minimum(1.0, 3.0 / np.maximum(n, 1e-9)))
    R = geo.so3_exp(w)
    w2 = geo.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-5)


def test_exp_log_small_angle(rng):
    w = rand_w(rng, 1e-7, (8,))
    R = geo.so3_exp(w)
    np.testing.assert_allclose(np.asarray(geo.so3_log(R)), np.asarray(w), atol=1e-9)


def test_exp_log_near_pi(rng):
    axis = rng.standard_normal((16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    w = jnp.asarray(axis * (np.pi - 1e-4), dtype=jnp.float32)
    R = geo.so3_exp(w)
    w2 = geo.so3_log(R)
    # sign of axis may flip at pi; compare rotations. Precision near pi is
    # limited to ~sqrt(eps_f32) through the trace formula.
    R2 = geo.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=2e-3)


def test_rotation_orthonormal(rng):
    R = geo.so3_exp(rand_w(rng, 2.0, (32,)))
    eye = np.eye(3, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.tile(eye, (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), np.ones(32), atol=1e-5)


def test_left_jacobian_fd(rng):
    """J_l: Exp(w + dw) ~ Exp(J_l dw) Exp(w)."""
    w = rand_w(rng, 1.0)
    Jl = geo.so3_left_jacobian(w)
    eps = 1e-3
    for k in range(3):
        dw = jnp.zeros(3).at[k].set(eps)
        lhs = geo.so3_exp(w + dw)
        rhs = geo.so3_exp(Jl @ dw) @ geo.so3_exp(w)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_left_jacobian_inverse(rng):
    w = rand_w(rng, 1.5, (16,))
    J = geo.so3_left_jacobian(w)
    Jinv = geo.so3_left_jacobian_inv(w)
    eye = np.tile(np.eye(3, dtype=np.float32), (16, 1, 1))
    np.testing.assert_allclose(np.asarray(J @ Jinv), eye, atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi_np = rng.standard_normal((32, 6))
    # keep rotation angles well below pi (log is only invertible there)
    n = np.linalg.norm(xi_np[:, :3], axis=-1, keepdims=True)
    xi_np[:, :3] *= 2.5 / np.maximum(n, 2.5)
    xi = jnp.asarray(xi_np, dtype=jnp.float32)
    R, t = geo.se3_exp(xi)
    xi2 = geo.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_pose_compose_inverse(rng):
    Ra, ta = geo.so3_exp(rand_w(rng, 1.0, (8,))), rand_w(rng, 2.0, (8,))
    Rb, tb = geo.pose_inverse(Ra, ta)
    Rc, tc = geo.pose_compose(Ra, ta, Rb, tb)
    np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3, dtype=np.float32), (8, 1, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc), np.zeros((8, 3)), atol=1e-5)


def test_retract_local_roundtrip(rng):
    R, t = geo.so3_exp(rand_w(rng, 1.0, (8,))), rand_w(rng, 2.0, (8,))
    dx = jnp.asarray(rng.standard_normal((8, 6)) * 0.3, dtype=jnp.float32)
    R2, t2 = geo.pose_retract(R, t, dx)
    dx2 = geo.pose_local(R, t, R2, t2)
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx), atol=1e-5)


def test_quat_roundtrip(rng):
    w = rand_w(rng, 2.0, (64,))
    R = geo.so3_exp(w)
    q = geo.rot_to_quat(R)
    R2 = geo.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_barycentric():
    a = jnp.array([0.0, 0.0])
    b = jnp.array([1.0, 0.0])
    c = jnp.array([0.0, 1.0])
    u, v, w = geo.barycentric_coords(jnp.array([0.25, 0.25]), a, b, c)
    np.testing.assert_allclose([float(u), float(v), float(w)], [0.5, 0.25, 0.25], atol=1e-6)
    u, v, w = geo.barycentric_coords(jnp.array([2.0, 2.0]), a, b, c)
    assert float(u) < 0  # outside


def test_jit_and_vmap(rng):
    w = rand_w(rng, 1.0, (16,))
    f = jax.jit(jax.vmap(geo.so3_exp))
    np.testing.assert_allclose(np.asarray(f(w)), np.asarray(geo.so3_exp(w)), atol=1e-6)


def test_jvp_safe_at_zero():
    """jacfwd/jacrev through exp/log/Jl at exactly-zero rotation must be
    finite: sqrt' (0) is infinite and NaN tangents leak through where()
    branches -- the classic JAX Lie-group pitfall (broke VIO BA: the IMU
    factor differentiates so3_exp(J_dR_bg @ dbg) at dbg == 0 exactly)."""
    z = jnp.zeros(3)
    for fn in (geo.so3_exp, geo.so3_left_jacobian, geo.so3_right_jacobian,
               geo.so3_left_jacobian_inv, geo.so3_right_jacobian_inv):
        J = jax.jacfwd(fn)(z)
        assert np.all(np.isfinite(np.asarray(J))), fn.__name__
    J = jax.jacfwd(lambda w: geo.so3_log(geo.so3_exp(w)))(z)
    assert np.all(np.isfinite(np.asarray(J)))
    np.testing.assert_allclose(np.asarray(J), np.eye(3), atol=1e-5)
    # d/dw log(R0 exp(w)) at w=0 must be finite for R0 == I (prior factors)
    J2 = jax.jacfwd(lambda w: geo.pose_local(
        jnp.eye(3), jnp.zeros(3), geo.so3_exp(w), jnp.zeros(3)))(z)
    assert np.all(np.isfinite(np.asarray(J2)))


def test_orthonormalize():
    rng2 = np.random.default_rng(3)
    w = jnp.asarray(rng2.standard_normal((16, 3)), jnp.float32)
    R = geo.so3_exp(w)
    E = jnp.asarray(rng2.standard_normal((16, 3, 3)) * 1e-4, jnp.float32)
    Rn = geo.so3_orthonormalize(R + E)
    err = np.asarray(jnp.swapaxes(Rn, -1, -2) @ Rn - jnp.eye(3))
    assert np.abs(err).max() < 2e-6

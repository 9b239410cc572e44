"""Camera model tests: project/backproject consistency + FD Jacobians.

Synthetic-world style mirroring the reference residual_test.cpp fixtures.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sadvio_tpu.models import cameras as cam
from sadvio_tpu.utils import geometry as geo


def make_models():
    f32 = lambda v: jnp.float32(v)
    return {
        "pinhole": cam.make_pinhole(458.0, 457.0, 367.0, 248.0),
        "ds": cam.DoubleSphere(f32(364.0), f32(364.0), f32(376.0), f32(240.0), f32(0.57), f32(-0.18)),
        "fisheye": cam.Fisheye(f32(380.0), f32(380.0), f32(376.0), f32(240.0),
                               f32(0.01), f32(-0.002), f32(0.001), f32(-0.0005)),
        "omni": cam.Omni(f32(480.0), f32(480.0), f32(376.0), f32(240.0), f32(0.8),
                         f32(0.01), f32(-0.005), f32(0.0002), f32(-0.0001)),
    }


def sample_points(rng, n=128):
    p = rng.standard_normal((n, 3)) * np.array([0.4, 0.3, 0.0]) + np.array([0.0, 0.0, 3.0])
    p[:, 2] += rng.uniform(0.5, 5.0, n)
    return jnp.asarray(p, dtype=jnp.float32)


@pytest.mark.parametrize("name", ["pinhole", "ds", "fisheye", "omni"])
def test_project_backproject_roundtrip(rng, name):
    model = make_models()[name]
    p = sample_points(rng)
    uv, valid = model.project(p)
    ray = model.backproject(uv)
    ray_true = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    err = np.asarray(jnp.linalg.norm(ray - ray_true, axis=-1))
    v = np.asarray(valid)
    assert v.sum() > 50
    assert err[v].max() < 2e-3, f"{name}: max ray err {err[v].max()}"


@pytest.mark.parametrize("name", ["pinhole", "ds", "fisheye", "omni"])
def test_point_jacobian_fd(rng, name):
    model = make_models()[name]
    p = sample_points(rng, 16)
    uv, J, valid = model.project_jac(p)
    eps = 1e-3
    for k in range(3):
        dp = jnp.zeros(3).at[k].set(eps)
        uv2, _ = model.project(p + dp)
        fd = (uv2 - uv) / eps
        v = np.asarray(valid)
        np.testing.assert_allclose(np.asarray(J[..., k])[v], np.asarray(fd)[v], atol=0.2, rtol=2e-2)


def test_world_chain_jacobians(rng):
    """FD-check the 2x6 pose and 2x3 landmark Jacobians of project_world_jac."""
    model = make_models()["pinhole"]
    R_w_f = geo.so3_exp(jnp.asarray(rng.standard_normal(3) * 0.3, jnp.float32))
    t_w_f = jnp.asarray(rng.standard_normal(3), jnp.float32)
    R_f_s = geo.so3_exp(jnp.asarray([0.0, 0.01, 0.0], jnp.float32))
    t_f_s = jnp.asarray([0.05, 0.0, 0.0], jnp.float32)
    # landmarks in front of camera in world frame
    p_c = sample_points(rng, 32)
    R_w_s, t_w_s = geo.pose_compose(R_w_f, t_w_f, R_f_s, t_f_s)
    p_w = geo.pose_apply(R_w_s, t_w_s, p_c)

    uv0, J_pose, J_lmk, valid = cam.project_world_jac(
        model, R_w_f, t_w_f, R_f_s, t_f_s, p_w
    )
    v = np.asarray(valid)
    assert v.sum() > 20
    eps = 1e-3  # f32 central-difference sweet spot for O(100) px values
    for k in range(6):
        dx = jnp.zeros(6).at[k].set(eps)
        R2, t2 = geo.pose_retract(R_w_f, t_w_f, dx)
        uv2, _ = cam.project_world(model, R2, t2, R_f_s, t_f_s, p_w)
        R3, t3 = geo.pose_retract(R_w_f, t_w_f, -dx)
        uv3, _ = cam.project_world(model, R3, t3, R_f_s, t_f_s, p_w)
        fd = np.asarray((uv2 - uv3) / (2 * eps))
        np.testing.assert_allclose(np.asarray(J_pose[..., k])[v], fd[v], atol=0.5, rtol=3e-2)
    for k in range(3):
        dp = jnp.zeros(3).at[k].set(eps)
        uv2, _ = cam.project_world(model, R_w_f, t_w_f, R_f_s, t_f_s, p_w + dp)
        uv3, _ = cam.project_world(model, R_w_f, t_w_f, R_f_s, t_f_s, p_w - dp)
        fd = np.asarray((uv2 - uv3) / (2 * eps))
        np.testing.assert_allclose(np.asarray(J_lmk[..., k])[v], fd[v], atol=0.5, rtol=3e-2)


def test_bearing_world(rng):
    model = make_models()["pinhole"]
    R_w_f = geo.so3_exp(jnp.asarray(rng.standard_normal(3) * 0.2, jnp.float32))
    t_w_f = jnp.asarray(rng.standard_normal(3), jnp.float32)
    R_f_s, t_f_s = geo.pose_identity()
    p_c = sample_points(rng, 16)
    p_w = geo.pose_apply(R_w_f, t_w_f, p_c)
    uv, valid = cam.project_world(model, R_w_f, t_w_f, R_f_s, t_f_s, p_w)
    rays = cam.bearing_world(model, R_w_f, t_w_f, R_f_s, t_f_s, uv)
    # bearing should point from camera center to landmark
    d = p_w - t_w_f
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(rays)[v], np.asarray(d)[v], atol=1e-4)

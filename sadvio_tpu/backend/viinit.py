"""Visual-inertial initialization: gravity / velocity / bias / scale solve.

TPU-native re-design of the reference VIInit
(reference: cpp/src/optimizers/AOptimizer.cpp:448-581 -- Ceres problem over a
2-dof gravity direction, per-KF velocities, one shared delta-bias and an
optional log-scale, holding the vision-only poses fixed; afterwards the whole
map is rotated gravity-down and rescaled; cost functions IMUFactorInit /
IMUFactorInitBis, residuals.hpp:302-505).

Here the same nonlinear least squares is solved with a fixed-iteration
Gauss-Newton on a packed parameter vector; Jacobians by jacfwd (the problem
is tiny: 2 + 3K + 6 + 1 unknowns).  The preintegrated IMU deltas between
consecutive keyframes are the measurements.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sadvio_tpu.models import imu as imu_mod
from sadvio_tpu.utils import geometry as geo


def _gravity_dir(g2):
    """2-dof tangent perturbation of the -z gravity direction."""
    base = jnp.array([0.0, 0.0, -1.0])
    w = jnp.array([g2[0], g2[1], 0.0])
    return geo.so3_exp(w) @ base


@partial(jax.jit, static_argnames=("optimize_scale", "iters"))
def vi_init(R, t, kf_mask, imu_chain, *, optimize_scale: bool = False,
            iters: int = 12, g_mag: float = imu_mod.GRAVITY):
    """Solve for gravity direction, velocities, shared bias delta, scale.

    R (K,3,3), t (K,3): vision-only keyframe poses (arbitrary world frame,
    arbitrary scale if monocular).  imu_chain: preintegrations between
    consecutive slots.  Returns dict with:
      R_align (3,3)  -- world rotation taking the estimated gravity to -z
      scale ()       -- metric scale factor exp(log_s)
      v (K,3)        -- velocities in the *aligned, scaled* world frame
      ba, bg (3,)    -- bias estimates at the init point
      converged ()   -- residual decrease sanity flag
    Apply: R' = R_align R, t' = s * R_align t, lmk' = s * R_align lmk,
    exactly like the reference rotates/rescales the local map
    (AOptimizer.cpp:448-581 tail).
    """
    K = R.shape[0]
    pre = imu_chain.pre
    pm = imu_chain.mask

    n_v = 3 * K
    dim = 2 + n_v + 6 + 1  # g2, v, dba+dbg, log_s

    def unpack(x):
        g2 = x[0:2]
        v = x[2 : 2 + n_v].reshape(K, 3)
        dba = x[2 + n_v : 5 + n_v]
        dbg = x[5 + n_v : 8 + n_v]
        log_s = jnp.where(optimize_scale, x[8 + n_v], 0.0)
        return g2, v, dba, dbg, log_s

    def residuals(x):
        g2, v, dba, dbg, log_s = unpack(x)
        s = jnp.exp(log_s)
        g = _gravity_dir(g2) * g_mag

        def pair(k):
            pre_k = jax.tree.map(lambda a: a[k], pre)
            dR, dv, dp = imu_mod.bias_corrected_deltas(pre_k, dba, dbg)
            dt = pre_k.dt
            Ri = R[k]
            Rj = R[k + 1]
            r_R = geo.so3_log(dR.T @ (Ri.T @ Rj))
            r_v = Ri.T @ (v[k + 1] - v[k] - g * dt) - dv
            r_p = Ri.T @ (s * (t[k + 1] - t[k]) - v[k] * dt - 0.5 * g * dt * dt) - dp
            ok = pm[k] & kf_mask[k] & kf_mask[k + 1]
            # whitening: rotation tight, velocity/position by IMU noise scale
            r = jnp.concatenate([r_R * 1e2, r_v * 1e1, r_p * 1e1])
            return jnp.where(ok, r, 0.0)

        return jax.vmap(pair)(jnp.arange(K - 1)).reshape(-1)

    x0 = jnp.zeros((dim,))
    r0 = residuals(x0)
    c0 = jnp.sum(r0 * r0)

    def lm(carry, _):
        # accept/reject damped step: plain GN oscillates on some windows
        # (overshoots on the gravity 2-dof when velocity is weakly excited)
        x, lam, cost = carry
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        H = J.T @ J
        H = H + (lam * jnp.diagonal(H) + 1e-8) * jnp.eye(dim)
        dx = jnp.linalg.solve(H, -J.T @ r)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)
        x_t = x + dx
        r_t = residuals(x_t)
        c_t = jnp.sum(r_t * r_t)
        accept = jnp.isfinite(c_t) & (c_t < cost)
        x = jnp.where(accept, x_t, x)
        cost = jnp.where(accept, c_t, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 10.0), 1e-9, 1e6)
        return (x, lam, cost), None

    (x, _, c1), _ = jax.lax.scan(lm, (x0, jnp.asarray(1e-4), c0), None,
                                 length=iters)
    g2, v, dba, dbg, log_s = unpack(x)
    r1 = residuals(x)
    s = jnp.exp(log_s)

    # rotation aligning the estimated gravity onto [0,0,-1]
    g_hat = _gravity_dir(g2)
    target = jnp.array([0.0, 0.0, -1.0])
    axis = jnp.cross(g_hat, target)
    sin_a = jnp.linalg.norm(axis)
    cos_a = jnp.dot(g_hat, target)
    w = axis / jnp.maximum(sin_a, 1e-9) * jnp.arctan2(sin_a, cos_a)
    R_align = geo.so3_exp(jnp.where(sin_a < 1e-9, jnp.zeros(3), w))

    # velocities were solved in the vision frame; move them to aligned frame
    v_aligned = jnp.einsum("ij,kj->ki", R_align, v) * 1.0  # v already metric
    ba0 = pre.ba_lin[0] + dba
    bg0 = pre.bg_lin[0] + dbg
    n_pairs = jnp.sum(pm & kf_mask[:-1] & kf_mask[1:])
    converged = (jnp.sum(r1 * r1) < jnp.sum(r0 * r0) + 1e-6) & (n_pairs >= 2)
    return {
        "R_align": R_align, "scale": s, "v": v_aligned,
        "ba": ba0, "bg": bg0, "g_dir": g_hat,
        "cost0": jnp.sum(r0 * r0), "cost": jnp.sum(r1 * r1),
        "converged": converged,
    }


def apply_alignment(state, R_align, scale):
    """Rotate/rescale the whole window state (AOptimizer VIInit tail)."""
    R = jnp.einsum("ij,kjl->kil", R_align, state.R)
    t = scale * jnp.einsum("ij,kj->ki", R_align, state.t)
    lmk = scale * jnp.einsum("ij,lj->li", R_align, state.lmk)
    return state.replace(R=R, t=t, lmk=lmk)

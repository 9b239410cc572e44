"""On-manifold IMU preintegration as a masked lax.scan.

TPU-native re-design of the reference IMU model
(reference: cpp/src/data/sensors/IMU.cpp:5-120 -- processIMU /
estimateTransform / biasDeltaCorrection / updateBiases).

Forster-style preintegration between keyframes i and j:
  dR_{k+1} = dR_k Exp((w - bg) dt)
  dv_{k+1} = dv_k + dR_k (a - ba) dt
  dp_{k+1} = dp_k + dv_k dt + 0.5 dR_k (a - ba) dt^2
with 9x9 covariance propagation over state order (dphi, dv, dp) and
first-order bias Jacobians, exactly the quantities the reference maintains
(IMU.h fields _delta_R/_delta_v/_delta_p/_cov/_J_*).

Arrays are fixed-capacity: a preintegration buffer holds up to N samples with
a per-sample dt; padding samples carry dt=0 and are no-ops, so keyframe
intervals of varying sample counts reuse one compiled kernel (the reference's
per-sample mutex-guarded accumulation becomes one scan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from sadvio_tpu.utils import geometry as geo

GRAVITY = 9.81


@struct.dataclass
class ImuParams:
    """Continuous-time noise densities (EuRoC yaml convention)."""

    acc_noise: jnp.ndarray  # m/s^2/sqrt(Hz)
    gyr_noise: jnp.ndarray  # rad/s/sqrt(Hz)
    acc_walk: jnp.ndarray  # m/s^3/sqrt(Hz)
    gyr_walk: jnp.ndarray  # rad/s^2/sqrt(Hz)
    rate_hz: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(200.0))

    @classmethod
    def euroc(cls):
        return cls(
            acc_noise=jnp.float32(2.0e-3),
            gyr_noise=jnp.float32(1.7e-4),
            acc_walk=jnp.float32(3.0e-3),
            gyr_walk=jnp.float32(2.0e-5),
            rate_hz=jnp.float32(200.0),
        )


@struct.dataclass
class Preintegration:
    """Preintegrated deltas between two keyframes at bias linearization point."""

    dR: jnp.ndarray  # (3,3)
    dv: jnp.ndarray  # (3,)
    dp: jnp.ndarray  # (3,)
    cov: jnp.ndarray  # (9,9) over (dphi, dv, dp)
    J_dR_bg: jnp.ndarray  # (3,3)
    J_dv_ba: jnp.ndarray
    J_dv_bg: jnp.ndarray
    J_dp_ba: jnp.ndarray
    J_dp_bg: jnp.ndarray
    dt: jnp.ndarray  # scalar total time
    ba_lin: jnp.ndarray  # (3,) accel bias at linearization
    bg_lin: jnp.ndarray  # (3,) gyro bias at linearization

    @classmethod
    def identity(cls, dtype=jnp.float32):
        eye = jnp.eye(3, dtype=dtype)
        z3 = jnp.zeros((3, 3), dtype=dtype)
        return cls(
            dR=eye, dv=jnp.zeros(3, dtype), dp=jnp.zeros(3, dtype),
            cov=jnp.zeros((9, 9), dtype),
            J_dR_bg=z3, J_dv_ba=z3, J_dv_bg=z3, J_dp_ba=z3, J_dp_bg=z3,
            dt=jnp.zeros((), dtype), ba_lin=jnp.zeros(3, dtype), bg_lin=jnp.zeros(3, dtype),
        )


def preintegrate(acc, gyr, dt, ba, bg, params: ImuParams, init: Preintegration | None = None):
    """Integrate a buffer of IMU samples. Padding samples must have dt == 0.

    acc, gyr: (N,3); dt: (N,); ba, bg: (3,) bias linearization point.
    Semantics of IMU::processIMU (IMU.cpp:5-91) over the whole buffer at once.
    """
    if init is None:
        init = Preintegration.identity(acc.dtype)
    init = init.replace(ba_lin=ba, bg_lin=bg)

    def step(state: Preintegration, inp):
        a, w, h = inp
        active = h > 0.0
        hs = jnp.where(active, h, 1.0)  # safe dt for division-free math
        h_ = jnp.where(active, h, 0.0)
        a_c = a - state.ba_lin
        w_c = w - state.bg_lin
        wdt = w_c * h_
        dR_inc = geo.so3_exp(wdt)
        Jr = geo.so3_right_jacobian(wdt)
        Ra = state.dR @ geo.skew(a_c)

        # covariance propagation: x = (dphi, dv, dp)
        A = jnp.zeros((9, 9), acc.dtype)
        A = A.at[0:3, 0:3].set(dR_inc.T)
        A = A.at[3:6, 0:3].set(-Ra * h_)
        A = A.at[3:6, 3:6].set(jnp.eye(3, dtype=acc.dtype))
        A = A.at[6:9, 0:3].set(-0.5 * Ra * h_ * h_)
        A = A.at[6:9, 3:6].set(jnp.eye(3, dtype=acc.dtype) * h_)
        A = A.at[6:9, 6:9].set(jnp.eye(3, dtype=acc.dtype))
        B = jnp.zeros((9, 6), acc.dtype)
        B = B.at[0:3, 0:3].set(Jr * h_)
        B = B.at[3:6, 3:6].set(state.dR * h_)
        B = B.at[6:9, 3:6].set(0.5 * state.dR * h_ * h_)
        # discrete noise: sigma_c^2 / dt  (continuous density -> discrete)
        qg = params.gyr_noise ** 2 / hs
        qa = params.acc_noise ** 2 / hs
        Q = jnp.diag(jnp.concatenate([jnp.full(3, qg), jnp.full(3, qa)]).astype(acc.dtype))
        cov = A @ state.cov @ A.T + B @ Q @ B.T

        # bias Jacobians (first order, Forster eq. 44-46 semantics)
        J_dR_bg = dR_inc.T @ state.J_dR_bg - Jr * h_
        J_dv_ba = state.J_dv_ba - state.dR * h_
        J_dv_bg = state.J_dv_bg - Ra @ state.J_dR_bg * h_
        J_dp_ba = state.J_dp_ba + state.J_dv_ba * h_ - 0.5 * state.dR * h_ * h_
        J_dp_bg = state.J_dp_bg + state.J_dv_bg * h_ - 0.5 * Ra @ state.J_dR_bg * h_ * h_

        dp = state.dp + state.dv * h_ + 0.5 * state.dR @ a_c * h_ * h_
        dv = state.dv + state.dR @ a_c * h_
        dR = state.dR @ dR_inc

        new = state.replace(
            dR=dR, dv=dv, dp=dp, cov=cov,
            J_dR_bg=J_dR_bg, J_dv_ba=J_dv_ba, J_dv_bg=J_dv_bg,
            J_dp_ba=J_dp_ba, J_dp_bg=J_dp_bg, dt=state.dt + h_,
        )
        # masked samples are strict no-ops
        out = jax.tree.map(lambda n, o: jnp.where(active, n, o), new, state)
        return out, None

    final, _ = jax.lax.scan(step, init, (acc, gyr, dt))
    return final


@struct.dataclass
class ChunkSummary:
    """Preintegration of a contiguous sample chunk, closed under composition.

    Carries, besides the deltas/covariance/bias-Jacobians of the chunk, the
    accumulated linear transition products M9 (covariance propagation) and
    M15 (bias-Jacobian propagation) so that two adjacent chunks compose with
    `combine_summary` — the algebra that makes the 200 Hz IMU stream
    shardable along time across devices (SURVEY.md §2.7 sequence
    parallelism; reference semantics: IMU.cpp:5-91 per-sample loop).
    """

    dR: jnp.ndarray  # (3,3) delta rotation over the chunk
    dv: jnp.ndarray  # (3,)
    dp: jnp.ndarray  # (3,)
    dt: jnp.ndarray  # scalar chunk duration
    M9: jnp.ndarray  # (9,9) product of per-sample covariance transitions
    cov: jnp.ndarray  # (9,9) chunk covariance (from zero initial)
    M15: jnp.ndarray  # (15,15) product of bias-Jacobian transitions
    X: jnp.ndarray  # (15,3) stacked bias Jacobians of the chunk


def combine_summary(a: ChunkSummary, b: ChunkSummary) -> ChunkSummary:
    """Compose chunk `a` (earlier) with chunk `b` (later). Associative.

    Chunk `b`'s transitions were built with prefix rotations local to its own
    start, while in the concatenated stream every one of its per-sample
    transitions carries the extra left rotation ``a.dR``:
    A_global = G A_local Gᵀ with G = diag(I, a.dR, a.dR) (the dphi row is
    rotation-free, the dv/dp rows each carry one dR_prev factor), and
    likewise for the 15x15 bias-Jacobian transitions with
    G15 = diag(I, a.dR x4).  So b's products/covariance are conjugated into
    the global frame before the textbook affine composition.
    """
    dtype = a.dR.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    z3 = jnp.zeros((3, 3), dtype)

    def blockdiag(blocks):
        rows = []
        n = len(blocks)
        for i, blk in enumerate(blocks):
            rows.append(jnp.concatenate(
                [blk if j == i else z3 for j in range(n)], axis=-1))
        return jnp.concatenate(rows, axis=-2)

    G9 = blockdiag([eye3, a.dR, a.dR])
    G15 = blockdiag([eye3, a.dR, a.dR, a.dR, a.dR])
    M9b = G9 @ b.M9 @ G9.T
    M15b = G15 @ b.M15 @ G15.T
    return ChunkSummary(
        dR=a.dR @ b.dR,
        dv=a.dv + a.dR @ b.dv,
        dp=a.dp + a.dv * b.dt + a.dR @ b.dp,
        dt=a.dt + b.dt,
        M9=M9b @ a.M9,
        cov=M9b @ a.cov @ M9b.T + G9 @ b.cov @ G9.T,
        M15=M15b @ a.M15,
        X=M15b @ a.X + G15 @ b.X,
    )


def summary_to_preintegration(s: ChunkSummary, ba, bg) -> Preintegration:
    return Preintegration(
        dR=s.dR, dv=s.dv, dp=s.dp, cov=s.cov,
        J_dR_bg=s.X[0:3], J_dv_ba=s.X[3:6], J_dv_bg=s.X[6:9],
        J_dp_ba=s.X[9:12], J_dp_bg=s.X[12:15],
        dt=s.dt, ba_lin=ba, bg_lin=bg,
    )


def preintegrate_assoc(acc, gyr, dt, ba, bg, params: ImuParams):
    """Log-depth preintegration via jax.lax.associative_scan.

    Same outputs as `preintegrate` (deltas, 9x9 covariance, bias Jacobians)
    but in O(log N) depth instead of an O(N) sequential scan — the
    "sequence-parallel" formulation of the reference's per-sample loop
    (IMU.cpp:5-91): the time axis shards across devices and each combine is
    a small batched matmul (MXU work, not scalar chain).

    Three passes, all associative:
      1. the delta recursion is the group law of (R, v, p, t):
         (Ra,va,pa,ta)∘(Rb,vb,pb,tb) =
         (Ra Rb, va + Ra vb, pa + va tb + Ra pb, ta + tb);
         its prefix rotations feed the linearized passes;
      2. covariance: Σ_k = A_k Σ_{k-1} A_kᵀ + C_k is the affine pair scan
         (M,C)a∘(M,C)b = (Mb Ma, Mb Ca Mbᵀ + Cb);
      3. the five bias Jacobians stack into one 15x3 state with an affine
         recursion X_k = M_k X_{k-1} + c_k, scanned the same way.

    Padding samples (dt == 0) are exact no-ops (their elements are group /
    affine identities).
    """
    return summary_to_preintegration(
        chunk_summary(acc, gyr, dt, ba, bg, params), ba, bg)


def chunk_summary(acc, gyr, dt, ba, bg, params: ImuParams) -> ChunkSummary:
    """Composable preintegration summary of one sample chunk (see
    `ChunkSummary`); the local half of the time-sharded preintegration in
    `sadvio_tpu/parallel/time_sharding.py`."""
    dtype = acc.dtype
    n = acc.shape[0]
    active = dt > 0.0
    h_ = jnp.where(active, dt, 0.0)
    hs = jnp.where(active, dt, 1.0)
    a_c = acc - ba[None, :]
    w_c = gyr - bg[None, :]
    wdt = w_c * h_[:, None]
    dR_inc = jax.vmap(geo.so3_exp)(wdt)  # (N,3,3)
    Jr = jax.vmap(geo.so3_right_jacobian)(wdt)

    # -- pass 1: delta group law --------------------------------------------
    def combine_delta(ea, eb):
        Ra, va, pa, ta = ea
        Rb, vb, pb, tb = eb
        return (Ra @ Rb,
                va + jnp.einsum("...ij,...j->...i", Ra, vb),
                pa + va * tb[..., None] + jnp.einsum("...ij,...j->...i", Ra, pb),
                ta + tb)

    elems = (dR_inc, a_c * h_[:, None], 0.5 * a_c * (h_ * h_)[:, None], h_)
    pR, pv, pp, pt = jax.lax.associative_scan(combine_delta, elems)
    # exclusive prefix rotation (dR before each sample)
    dR_prev = jnp.concatenate(
        [jnp.eye(3, dtype=dtype)[None], pR[:-1]], axis=0)

    # -- pass 2: covariance affine scan --------------------------------------
    Ra_s = jnp.einsum("nij,njk->nik", dR_prev, jax.vmap(geo.skew)(a_c))
    eye3 = jnp.eye(3, dtype=dtype)
    h1 = h_[:, None, None]
    A = jnp.zeros((n, 9, 9), dtype)
    A = A.at[:, 0:3, 0:3].set(jnp.swapaxes(dR_inc, -1, -2))
    A = A.at[:, 3:6, 0:3].set(-Ra_s * h1)
    A = A.at[:, 3:6, 3:6].set(eye3)
    A = A.at[:, 6:9, 0:3].set(-0.5 * Ra_s * h1 * h1)
    A = A.at[:, 6:9, 3:6].set(eye3 * h1)
    A = A.at[:, 6:9, 6:9].set(eye3)
    B = jnp.zeros((n, 9, 6), dtype)
    B = B.at[:, 0:3, 0:3].set(Jr * h1)
    B = B.at[:, 3:6, 3:6].set(dR_prev * h1)
    B = B.at[:, 6:9, 3:6].set(0.5 * dR_prev * h1 * h1)
    qg = params.gyr_noise ** 2 / hs
    qa = params.acc_noise ** 2 / hs
    Qd = jnp.concatenate(
        [jnp.tile(qg[:, None], (1, 3)), jnp.tile(qa[:, None], (1, 3))], axis=1)
    C = jnp.einsum("nik,nk,njk->nij", B, Qd.astype(dtype), B)

    def combine_aff_cov(ea, eb):
        Ma, Ca = ea
        Mb, Cb = eb
        return (jnp.einsum("...ij,...jk->...ik", Mb, Ma),
                jnp.einsum("...ij,...jk,...lk->...il", Mb, Ca, Mb) + Cb)

    M9s, covs = jax.lax.associative_scan(combine_aff_cov, (A, C))

    # -- pass 3: bias Jacobians, stacked affine scan --------------------------
    # X = [J_dR_bg; J_dv_ba; J_dv_bg; J_dp_ba; J_dp_bg]  (15,3)
    M = jnp.zeros((n, 15, 15), dtype)
    M = M.at[:, 0:3, 0:3].set(jnp.swapaxes(dR_inc, -1, -2))
    M = M.at[:, 3:6, 3:6].set(eye3)
    M = M.at[:, 6:9, 0:3].set(-Ra_s * h1)
    M = M.at[:, 6:9, 6:9].set(eye3)
    M = M.at[:, 9:12, 3:6].set(eye3 * h1)
    M = M.at[:, 9:12, 9:12].set(eye3)
    M = M.at[:, 12:15, 0:3].set(-0.5 * Ra_s * h1 * h1)
    M = M.at[:, 12:15, 6:9].set(eye3 * h1)
    M = M.at[:, 12:15, 12:15].set(eye3)
    c = jnp.zeros((n, 15, 3), dtype)
    c = c.at[:, 0:3].set(-Jr * h1)         # J_dR_bg += -Jr h
    c = c.at[:, 3:6].set(-dR_prev * h1)    # J_dv_ba += -dR h
    c = c.at[:, 9:12].set(-0.5 * dR_prev * h1 * h1)  # J_dp_ba += -dR h^2/2

    def combine_aff(ea, eb):
        Ma, ca = ea
        Mb, cb = eb
        return (jnp.einsum("...ij,...jk->...ik", Mb, Ma),
                jnp.einsum("...ij,...jk->...ik", Mb, ca) + cb)

    M15s, Xs = jax.lax.associative_scan(combine_aff, (M, c))

    return ChunkSummary(
        dR=pR[-1], dv=pv[-1], dp=pp[-1], dt=pt[-1],
        M9=M9s[-1], cov=covs[-1], M15=M15s[-1], X=Xs[-1],
    )


def bias_corrected_deltas(pre: Preintegration, ba, bg):
    """First-order bias correction (IMU::biasDeltaCorrection, IMU.cpp:104-108).

    Returns (dR', dv', dp') at new biases (ba, bg).
    """
    dba = ba - pre.ba_lin
    dbg = bg - pre.bg_lin
    dR = pre.dR @ geo.so3_exp(pre.J_dR_bg @ dbg)
    dv = pre.dv + pre.J_dv_ba @ dba + pre.J_dv_bg @ dbg
    dp = pre.dp + pre.J_dp_ba @ dba + pre.J_dp_bg @ dbg
    return dR, dv, dp


def predict(pre: Preintegration, R_i, p_i, v_i, ba=None, bg=None, g=None):
    """IMU-only state prediction (IMU::estimateTransform, IMU.cpp:93-102)."""
    if g is None:
        g = jnp.array([0.0, 0.0, -GRAVITY], dtype=p_i.dtype)
    if ba is not None:
        dR, dv, dp = bias_corrected_deltas(pre, ba, bg)
    else:
        dR, dv, dp = pre.dR, pre.dv, pre.dp
    dt = pre.dt
    R_j = R_i @ dR
    v_j = v_i + g * dt + R_i @ dv
    p_j = p_i + v_i * dt + 0.5 * g * dt * dt + R_i @ dp
    return R_j, p_j, v_j


def residual(pre: Preintegration, R_i, p_i, v_i, ba_i, bg_i, R_j, p_j, v_j, g=None):
    """9-dim preintegration residual (r_dR, r_dv, r_dp).

    Semantics of the reference IMUFactor (residuals.hpp:133-245), evaluated at
    arbitrary states with first-order bias correction.  Jacobians are obtained
    by jacfwd over retractions in backend.factors -- no hand chain rule.
    """
    if g is None:
        g = jnp.array([0.0, 0.0, -GRAVITY], dtype=p_i.dtype)
    dR, dv, dp = bias_corrected_deltas(pre, ba_i, bg_i)
    dt = pre.dt
    r_R = geo.so3_log(dR.T @ (R_i.T @ R_j))
    r_v = R_i.T @ (v_j - v_i - g * dt) - dv
    r_p = R_i.T @ (p_j - p_i - v_i * dt - 0.5 * g * dt * dt) - dp
    return jnp.concatenate([r_R, r_v, r_p])


def sqrt_info(pre: Preintegration, eps_rel: float = 1e-5):
    """Whitening W s.t. W cov W^T = I (so W^T W = cov^-1).

    Mirrors the LLT sqrt-info whitening in residuals.hpp:133-245.  The
    covariance spans ~10 orders of magnitude across (dphi, dv, dp) blocks, so
    it is diagonally equilibrated before the f32 Cholesky.
    """
    cov = pre.cov
    d = jnp.sqrt(jnp.clip(jnp.diagonal(cov), 1e-16, None))
    Cn = cov / (d[:, None] * d[None, :])
    Cn = Cn + jnp.eye(9, dtype=cov.dtype) * eps_rel
    L = jnp.linalg.cholesky(Cn)
    Ln_inv = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(9, dtype=cov.dtype), lower=True
    )
    return Ln_inv / d[None, :]

"""Break one BA LM iteration into its pieces and time each on the TPU.

The tunneled device has a ~26 ms host round trip, so each piece is timed as a
lax.scan of N dependency-chained evaluations inside ONE jitted call, forced by
ONE value fetch; per-eval time = (t_chain(N) - t_chain(0-ish)) / N.  The chain
feeds a scalar derived from each eval back into the next state so XLA cannot
hoist or elide any iteration.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _tiny_problem
from sadvio_tpu.backend import ba

N = 200


def chain_time(make_scalar, state0, label):
    """make_scalar(state) -> scalar; chained via state.t += 1e-12*scalar."""

    def run(st):
        def body(carry, _):
            s = make_scalar(carry)
            carry = carry.replace(t=carry.t + 1e-12 * s)
            return carry, ()

        out, _ = jax.lax.scan(body, st, None, length=N)
        return out.t.sum()

    r2 = jax.jit(run)
    float(np.asarray(r2(state0)))  # compile+warm
    t0 = time.perf_counter()
    s = float(np.asarray(r2(state0)))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    ms = dt * 1000 / N
    print(f"{label:38s} {ms:7.4f} ms/eval")
    return ms


def main():
    problem = _tiny_problem(K=11, C=2, L=512, P=48)
    opts = ba.BAOptions(iters=1)
    free = ba._free_mask(problem)
    lam = jnp.float32(1e-4)
    priors = problem.priors
    K = problem.state.K
    Dd = K * ba.D + priors.P * 3

    def reproj_scalar(st):
        r, Jp, Jl, m, w = ba._reproj_terms(st, problem.obs, problem.rig, opts)
        return r.sum() + Jp.sum() + Jl.sum() + w.sum()

    chain_time(reproj_scalar, problem.state, "reproj linearization (r,Jp,Jl,w)")

    def reproj_r_only(st):
        r, Jp, Jl, m, w = ba._reproj_terms(st, problem.obs, problem.rig, opts)
        return r.sum() + w.sum()

    chain_time(reproj_r_only, problem.state, "reproj residuals only (DCE jac)")

    def accum_scalar(st):
        r, Jp, Jl, m, w = ba._reproj_terms(st, problem.obs, problem.rig, opts)
        wJl = w[..., None, None] * Jl
        Hll = jnp.einsum("kclai,kclaj->lij", wJl, Jl)
        bl = -jnp.einsum("kclai,kcla->li", wJl, r)
        wJp = w[..., None, None] * Jp
        Hpl = (wJp[..., :, None] * Jl[..., None, :]).sum((1, 3))
        Hpp = jnp.einsum("kclai,kclaj->kij", wJp, Jp)
        bp = -jnp.einsum("kclai,kcla->ki", wJp, r)
        return Hll.sum() + bl.sum() + Hpl.sum() + Hpp.sum() + bp.sum()

    chain_time(accum_scalar, problem.state, "reproj lin + normal-eq accumulation")

    def dense_scalar(st):
        def rfun(dxd):
            s2 = ba._apply_dense_delta(st, priors, dxd)
            return ba._dense_residuals(s2, problem.imu, priors, opts)

        dx0 = jnp.zeros((Dd,), jnp.float32)
        J = jax.jacfwd(rfun)(dx0)
        rr = rfun(dx0)
        return (J.T @ J).sum() + (J.T @ rr).sum()

    chain_time(dense_scalar, problem.state, "dense factors jacfwd + JtJ")

    def lm_scalar(st):
        dxd, dl, ok = ba._lm_step(problem._replace(state=st), opts, free, lam)
        return dxd.sum() + dl.sum()

    chain_time(lm_scalar, problem.state, "_lm_step (lin+schur+solve)")

    def cost_scalar(st):
        return ba.robust_cost(problem._replace(state=st), opts)

    chain_time(cost_scalar, problem.state, "robust_cost")

    def iter_scalar(st):
        prob = problem._replace(state=st)
        dxd, dl, ok = ba._lm_step(prob, opts, free, lam)
        trial = ba._apply_dense_delta(st, priors, dxd)
        trial = trial.replace(lmk=trial.lmk + dl)
        # keep the cost eval in the timed graph through a non-foldable path
        # (x*0 could legally be constant-folded by the simplifier)
        cost = ba.robust_cost(problem._replace(state=trial), opts)
        return 1e-30 * cost + dxd.sum() + dl.sum()

    chain_time(iter_scalar, problem.state, "full iteration (step+cost)")

    # schur pieces given fixed linearization tensors
    state = problem.state
    r, Jp, Jl, m, w = jax.jit(
        lambda st: ba._reproj_terms(st, problem.obs, problem.rig, opts)
    )(state)
    slot = ba.slot_of_lmk(priors, state.L)
    elim = state.lmk_mask & (slot >= priors.P)
    em = elim.astype(jnp.float32)

    def schur_scalar(st):
        # shift tensors by a function of st so the chain forces re-eval
        eps = st.t.sum() * 0 + 1.0
        wJl = (w * eps)[..., None, None] * Jl
        Hll = jnp.einsum("kclai,kclaj->lij", wJl, Jl)
        Hpl = ((w * eps)[..., None, None, None] * Jp[..., :, None] * Jl[..., None, :]).sum((1, 3))
        Hll_e = Hll * em[:, None, None]
        Hpl_e = Hpl * em[None, :, None, None]
        dll = jnp.abs(jnp.diagonal(Hll_e, axis1=-2, axis2=-1))
        damp = lam * dll + 1e-5 + (1.0 - em[:, None])
        from sadvio_tpu.utils import geometry as geo

        Hll_d = Hll_e + jax.vmap(jnp.diag)(damp)
        Hll_inv = geo.inv3x3(Hll_d) * em[:, None, None]
        W_kl = jnp.einsum("klij,ljm->klim", Hpl_e, Hll_inv)
        Hred = -jnp.einsum("klab,qlcb->kqac", W_kl, Hpl_e)
        return Hred.sum()

    chain_time(schur_scalar, problem.state, "schur correction (given lin)")

    H = jnp.eye(Dd) * 3.0
    b = jnp.ones((Dd,))

    def chol_scalar(st):
        Hx = H + st.t.sum() * 0
        Lc = jnp.linalg.cholesky(Hx)
        return jax.scipy.linalg.cho_solve((Lc, True), b).sum()

    chain_time(chol_scalar, problem.state, f"cholesky solve ({Dd})")


if __name__ == "__main__":
    main()

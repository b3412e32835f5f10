"""Natural-gradient VI for the tridiagonal-precision GPCV family.

Round-4 measurements (BENCH_SCALING.md) showed the full-resolution GPCV
under-converging at large n with plain Adam: the per-datum ELBO's curvature
spectrum spreads with n (the BM prior's tridiagonal precision has
off-diagonals ~ n / vol), so at n=2000 Adam at lr=0.01 needs ~4000
iterations to reach the family optimum that n=500 reaches by ~1000 — and
raising the lr diverges (`tools/gpcv_convergence.py`).

The fix is to stop fighting the geometry: for a Gaussian variational family
the ELBO's natural-gradient updates are available in closed form
(Khan & Nielsen's variational online Newton), and for THIS family — the
tridiagonal-precision q against the Markov BM prior with a factorized
likelihood — every piece is O(n):

* precision:  ``Q <- (1 - rho) Q + rho (P + curv)`` where ``P`` is the BM
  prior precision (tridiagonal closed form, :func:`min_precision`) and
  ``curv_i = -2 dE[log p(y_i|f_i)]/ds_i`` is the expected per-datum
  curvature (positive for the exp likelihood; floored at 0 in general).
  The convex combination of SPD tridiagonals stays SPD tridiagonal —
  the family is closed under the update.
* mean:  ``m <- m + beta Q^{-1} (dELL/dm - P (m - mu0))`` — a Newton-like
  step solved with two bidiagonal substitutions.
* hyperparameters (kernel vol, constant mean, cv-likelihood mixture):
  one Adam step per iteration on the ELBO holding q fixed (block
  coordinate; the reference trains everything with one Adam,
  ``train_utils.py:40``).

Measured on the SABR oracle (seed 2019): n=2000 reaches the family
optimum (rel-err 0.222 / ELBO -0.435) in **10 iterations** — what Adam
needed 4000 for — and convergence speed is independent of n.  Per-step
cost matches an Adam ELBO step on CPU, but NOT on TPU: the extra
bidiagonal factor/solve/Takahashi passes roughly double the
sequential-scan count, and on the chip those log-depth scans dominate —
measured 4.7x Adam's per-iteration cost at B=16/n=999 (0.323 s vs
0.068 s per 300-iter stage).  The n-independent convergence more than
pays for it (30 NGVI iterations beat 300+ Adam iterations on both cost
and quality), so the recipe is *few* NGVI steps, not an NGVI swap at a
fixed iteration budget — ``PipelineConfig.gpcv_opt`` therefore defaults
to the reference-protocol ``"adam"`` and documents ``"ngvi"`` +
``gpcv_iters~30`` as the long-series configuration (BENCH_SCALING
round 5).

The reference has no analog: gpytorch's ``NGD`` exists but the paper's
training uses plain Adam on the dense Cholesky parameterization
(``single_task_variational_gp.py:66-122``, ``train_utils.py:40``), which
is exactly the geometry that degrades with n.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..ops.bidiag import (
    bidiag_chol_from_tridiag,
    bidiag_solve_lower,
    bidiag_solve_upper,
    min_precision,
    takahashi_band,
    tridiag_q_kl_bm_prior,
)

__all__ = ["ngvi_tridiag_fit", "tridiag_matvec"]


def tridiag_matvec(diag, off, v):
    """``T v`` for symmetric tridiagonal ``T`` (main ``diag``, first ``off``)."""
    upper = jnp.concatenate(
        [off * v[..., 1:], jnp.zeros_like(v[..., :1])], axis=-1
    )
    lower = jnp.concatenate(
        [jnp.zeros_like(v[..., :1]), off * v[..., :-1]], axis=-1
    )
    return diag * v + upper + lower


def ngvi_tridiag_fit(module, params, train_x, y, train_iters: int,
                     hyper_lr: float = 0.01, rho: float = 0.5,
                     beta: float = 1.0):
    """Fit a ``q="tridiag"`` :class:`~volt_tpu.models.gpcv.GPCVModel` by
    natural-gradient VI.

    Drop-in replacement for the Adam scan in :func:`volt_tpu.train._fit_gpcv`:
    takes and returns the same parameter pytree (``variational_mean``,
    ``q_log_d``, ``q_e`` + hyperparameter blocks) and a per-iteration
    negative-ELBO trajectory, so states, warm starts, and ``ok`` lanes are
    unaffected.

    ``rho`` damps the precision update (``rho=1`` is the exact
    fixed-point/Newton step; 0.5 is robust across the test universes),
    ``beta`` the natural mean step.  ``hyper_lr`` is the Adam rate for the
    hyperparameter block (the reference's 0.01, ``train_utils.py:40``).
    """
    if module.q != "tridiag":
        raise ValueError("ngvi_tridiag_fit requires a q='tridiag' module")
    opt = optax.adam(hyper_lr)
    jitter = module._KL_JITTER
    n = y.shape[-1]
    # for the exp likelihood the ELL does not depend on any hyperparameter
    # (no trainable likelihood params; the constant mean and kernel vol
    # enter only the KL), so the hyper gradient needs just the O(n)
    # closed-form KL — not a reverse pass over the whole ELBO.
    ell_depends_on_hypers = module.likelihood.param != "exp"

    d0, e0 = jnp.exp(params["q_log_d"]), params["q_e"]
    # tridiagonal precision from its bidiagonal Cholesky:
    # (L L^T)_ii = d_i^2 + e_{i-1}^2, (L L^T)_{i+1,i} = d_i e_i.
    q_diag0 = d0 * d0 + jnp.concatenate(
        [jnp.zeros_like(d0[..., :1]), e0 * e0], axis=-1
    )
    q_off0 = d0[..., :-1] * e0
    m0 = params["variational_mean"]
    hyper0 = {k: v for k, v in params.items()
              if k not in ("variational_mean", "q_log_d", "q_e")}

    def ell_mean(m, s, lik_params):
        return jnp.mean(module.likelihood.expected_log_prob(
            lik_params, y, m, s, num_locs=module.num_locs,
            method=module.ell_method,
        ), axis=-1)

    def kl(h, m, d, e):
        return tridiag_q_kl_bm_prior(
            train_x, module.kernel.vol(h["kernel"]), m, d, e,
            module.mean(h["mean"], train_x), jitter=jitter,
        )

    def pack(m, d, e, h):
        return {**h, "variational_mean": m, "q_log_d": jnp.log(d), "q_e": e}

    def step(carry, _):
        m, q_diag, q_off, d, e, s, h, opt_state = carry
        lik_params = h["likelihood"]
        g_m, g_s = jax.grad(
            lambda ms: n * ell_mean(ms[0], ms[1], lik_params)
        )((m, s))

        vol = module.kernel.vol(h["kernel"])[..., 0]
        p_diag, p_off, _ = min_precision(train_x, jitter / vol)
        p_diag, p_off = p_diag / vol, p_off / vol

        # precision: mirror-descent toward P + expected curvature (the
        # floor keeps Q SPD for non-log-concave likelihoods, e.g. cv)
        curv = jnp.maximum(-2.0 * g_s, 0.0)
        q_diag = (1.0 - rho) * q_diag + rho * (p_diag + curv)
        q_off = (1.0 - rho) * q_off + rho * p_off

        # mean: natural step  m += beta * Q^{-1} grad_m ELBO
        mu0 = module.mean(h["mean"], train_x)
        grad_m = g_m - tridiag_matvec(p_diag, p_off, m - mu0)
        d, e = bidiag_chol_from_tridiag(q_diag, q_off)
        delta = bidiag_solve_upper(d, e, bidiag_solve_lower(d, e, grad_m))
        m = m + beta * delta
        s = takahashi_band(d, e)[0]

        # hyperparameters: one Adam step on the ELBO holding q fixed
        if ell_depends_on_hypers:
            loss, gh = jax.value_and_grad(
                lambda hh: kl(hh, m, d, e) / n
                - ell_mean(m, s, hh["likelihood"])
            )(h)
        else:
            kl_val, gh = jax.value_and_grad(
                lambda hh: kl(hh, m, d, e)
            )(h)
            gh = jax.tree.map(lambda g: g / n, gh)
            loss = kl_val / n - ell_mean(m, s, lik_params)
        updates, opt_state = opt.update(gh, opt_state)
        h = optax.apply_updates(h, updates)
        return (m, q_diag, q_off, d, e, s, h, opt_state), loss

    d0c, e0c = bidiag_chol_from_tridiag(q_diag0, q_off0)
    s0 = takahashi_band(d0c, e0c)[0]
    (m, q_diag, q_off, d, e, _, h, _), losses = jax.lax.scan(
        step, (m0, q_diag0, q_off0, d0c, e0c, s0, hyper0, opt.init(hyper0)),
        None, length=train_iters,
    )
    return pack(m, d, e, h), losses

"""Unwhitened variational GP strategy — the GPCV inference engine.

The reference's GPCV stage is an ``ApproximateGP`` with a Cholesky
variational distribution, an **unwhitened** variational strategy, and
inducing points fixed at the training inputs (reference
``models/single_task_variational_gp.py:66-122``, invoked from
``train_utils.py:26-30``).  Because inducing == train == query, the
training-time posterior *is* ``q(u) = N(m, L L^T)`` directly (gpytorch
short-circuits the strategy when the query equals the inducing points), so
the ELBO needs no strategy algebra at all — just Gauss–Hermite expected
log-likelihoods of the marginals plus ``KL(q(u) || p(u))``.

The Laplace-style initialization (reference
``single_task_variational_gp.py:204-254``) is reproduced exactly for the
``"exp"`` likelihood parameterization: a running-std heuristic initializes
the latent path, and the variational covariance starts at
``S = L (L^T H^{-1} L + I)^{-1} L^T`` (``L = chol(Kuu)``, ``H`` the
likelihood Hessian), with the stored Cholesky root scaled by 10.
(The reference's ``"cv"`` init branch mixes shapes inconsistently and is
unused by any caller; it is intentionally not replicated.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.chol import add_jitter, cholesky_solve, psd_safe_cholesky
from ..ops.mvn import mvn_kl

__all__ = [
    "elbo_at_inducing",
    "elbo_at_inducing_whitened",
    "laplace_initialize",
    "variational_predict",
    "variational_predict_whitened",
    "VariationalState",
]

_HIGHEST = jax.lax.Precision.HIGHEST


class VariationalState(NamedTuple):
    """Learnable variational parameters (a pytree)."""

    variational_mean: jax.Array       # (..., n)
    chol_variational_covar: jax.Array  # (..., n, n); lower triangle is used


def _tril(x):
    return jnp.tril(x)


def elbo_at_inducing(state: VariationalState, prior_mean, kuu, y,
                     expected_log_prob_fn, num_data=None, beta: float = 1.0,
                     chol_jitter: float | None = None,
                     chol_max_tries: int = 3,
                     chol_p=None):
    """Variational ELBO with inducing == train == query.

    ``elbo = mean_i E_q[log p(y_i | f_i)] - beta * KL(q || p) / num_data``
    (gpytorch ``VariationalELBO`` with ``combine_terms=True``).

    ``expected_log_prob_fn(y, mean, var)`` returns the per-datum expected
    log-likelihood (e.g. the volatility likelihood's GH quadrature).

    ``chol_p`` is an optional precomputed lower Cholesky of ``kuu`` —
    kernels with structure-aware factorizations pass it (FBM's
    increment-domain factor, ``FBMKernel.prior_cholesky``: the
    value-domain ladder lost 1-4 of 8 lanes per batch to the
    near-singular float32 prior; the increment-domain one loses none).
    ``chol_jitter`` / ``chol_max_tries`` tune the fallback ladder.
    """
    n = y.shape[-1]
    if num_data is None:
        num_data = n
    chol_q = _tril(state.chol_variational_covar)
    marg_var = jnp.sum(chol_q * chol_q, axis=-1)
    ell = expected_log_prob_fn(y, state.variational_mean, marg_var)
    if chol_p is None:
        chol_p = psd_safe_cholesky(kuu, jitter=chol_jitter,
                                   max_tries=chol_max_tries)
    kl = mvn_kl(state.variational_mean, chol_q, prior_mean, chol_p)
    return jnp.mean(ell, axis=-1) - kl * beta / num_data


def variational_predict(state: VariationalState, prior_mean_u, kuu,
                        kux, prior_mean_x, kxx_diag=None, kxx=None,
                        chol_kuu=None):
    """Unwhitened predictive at arbitrary points ``x``.

    ``mean = Kxu Kuu^{-1} (m - mu_u) + mu_x``
    ``cov  = Kxx - Kxu Kuu^{-1} (Kuu - S) Kuu^{-1} Kux``

    Pass ``kxx`` for a full covariance or ``kxx_diag`` for marginals only;
    ``chol_kuu`` optionally supplies a structure-aware prior factor (see
    :func:`elbo_at_inducing`).  Returns ``(mean, var_or_cov)``.
    """
    chol = chol_kuu if chol_kuu is not None else psd_safe_cholesky(kuu)
    kuu_inv_kux = cholesky_solve(chol, kux)  # (..., n_u, n_x)
    diff = (state.variational_mean - prior_mean_u)[..., None]
    mean = jnp.matmul(
        jnp.swapaxes(kuu_inv_kux, -1, -2), diff, precision=_HIGHEST
    )[..., 0] + prior_mean_x

    chol_q = _tril(state.chol_variational_covar)
    # S Kuu^{-1} Kux via the root:  S = Cq Cq^T
    half = jnp.matmul(
        jnp.swapaxes(chol_q, -1, -2), kuu_inv_kux, precision=_HIGHEST
    )
    if kxx is not None:
        data_term = jnp.matmul(
            jnp.swapaxes(kux, -1, -2), kuu_inv_kux, precision=_HIGHEST
        )
        s_term = jnp.matmul(jnp.swapaxes(half, -1, -2), half,
                            precision=_HIGHEST)
        return mean, kxx - data_term + s_term
    if kxx_diag is None:
        raise ValueError("pass kxx or kxx_diag")
    data_term = jnp.sum(kux * kuu_inv_kux, axis=-2)
    s_term = jnp.sum(half * half, axis=-2)
    return mean, kxx_diag - data_term + s_term


def elbo_at_inducing_whitened(state: VariationalState, prior_mean, kuu, y,
                              expected_log_prob_fn, num_data=None,
                              beta: float = 1.0):
    """Whitened-strategy ELBO at inducing == train == query.

    In the whitened parameterization ``f = mu + L_K u'`` with
    ``u' ~ q = N(m, S)``: the marginals are
    ``mean = mu + L_K m``, ``var_i = row_i(L_K S L_K^T)`` and the KL is
    against the standard normal — no prior solves at all.  (The reference's
    GPCV always selects the unwhitened strategy,
    ``train_utils.py:26-30``; this exists for the
    ``use_whitened_var_strat=True`` configuration of
    ``single_task_variational_gp.py:96-102``.)
    """
    n = y.shape[-1]
    if num_data is None:
        num_data = n
    chol_q = _tril(state.chol_variational_covar)
    chol_k = psd_safe_cholesky(kuu)
    mean = prior_mean + jnp.einsum(
        "...ij,...j->...i", chol_k, state.variational_mean,
        precision=_HIGHEST,
    )
    half = jnp.matmul(chol_k, chol_q, precision=_HIGHEST)
    marg_var = jnp.sum(half * half, axis=-1)
    ell = expected_log_prob_fn(y, mean, marg_var)
    eye = jnp.broadcast_to(
        jnp.eye(n, dtype=kuu.dtype), chol_q.shape
    )
    kl = mvn_kl(state.variational_mean, chol_q,
                jnp.zeros_like(state.variational_mean), eye)
    return jnp.mean(ell, axis=-1) - kl * beta / num_data


def variational_predict_whitened(state: VariationalState, kuu, kux,
                                 prior_mean_x, kxx_diag=None, kxx=None):
    """Whitened predictive at arbitrary points.

    ``mean = Kxu L_K^{-T} m + mu_x``;
    ``cov = Kxx - Kxu Kuu^{-1} Kux + (Kxu L_K^{-T}) S (L_K^{-1} Kux)``.
    """
    from ..ops.chol import solve_lower_triangular

    chol_k = psd_safe_cholesky(kuu)
    interp = solve_lower_triangular(chol_k, kux)  # L_K^{-1} Kux: (n_u, n_x)
    mean = jnp.einsum(
        "...ux,...u->...x", interp, state.variational_mean,
        precision=_HIGHEST,
    ) + prior_mean_x
    chol_q = _tril(state.chol_variational_covar)
    half = jnp.matmul(jnp.swapaxes(chol_q, -1, -2), interp,
                      precision=_HIGHEST)
    if kxx is not None:
        data_term = jnp.matmul(jnp.swapaxes(interp, -1, -2), interp,
                               precision=_HIGHEST)
        s_term = jnp.matmul(jnp.swapaxes(half, -1, -2), half,
                            precision=_HIGHEST)
        return mean, kxx - data_term + s_term
    if kxx_diag is None:
        raise ValueError("pass kxx or kxx_diag")
    data_term = jnp.sum(interp * interp, axis=-2)
    s_term = jnp.sum(half * half, axis=-2)
    return mean, kxx_diag - data_term + s_term


def running_std_latent_init(y, clamp_min: float = 1e-4):
    """Running-std heuristic for the latent log-vol path.

    ``rs[i] = std(y[:i], ddof=1)`` with the first 10 entries pinned to
    ``rs[10]`` (reference ``single_task_variational_gp.py:213-216``).
    Returns ``(f, running_std)`` with ``f = log(clamp(rs, 1e-4))``.
    """
    y = jnp.asarray(y)
    n = y.shape[-1]
    if n <= 10:
        # the rs[10] pin needs an 11th entry; the reference IndexErrors
        # here, we fail with the actual contract
        raise ValueError(
            f"running-std init needs at least 11 points (the first 10 "
            f"entries are pinned to the 11th), got n={n}"
        )
    s1 = jnp.cumsum(y, axis=-1)
    s2 = jnp.cumsum(y * y, axis=-1)
    # shift so entry i reflects y[:i] (exclusive)
    zeros = jnp.zeros_like(y[..., :1])
    s1 = jnp.concatenate([zeros, s1[..., :-1]], axis=-1)
    s2 = jnp.concatenate([zeros, s2[..., :-1]], axis=-1)
    counts = jnp.arange(n, dtype=y.dtype)
    var = (s2 - s1 * s1 / jnp.maximum(counts, 1.0)) / jnp.maximum(
        counts - 1.0, 1.0
    )
    rs = jnp.sqrt(jnp.maximum(var, 0.0))
    rs = jnp.where(counts[..., :] < 10, rs[..., 10:11], rs)
    f = jnp.log(jnp.clip(rs, min=clamp_min))
    return f, rs


def exp_laplace_inv_hessian(y, f):
    """Diagonal of the exp-parameterization Laplace curvature inverse,
    ``clamp(0.5 y^-2 exp(2 f), 1e-4, 1e3)`` (reference
    ``single_task_variational_gp.py:221-225``).  The single shared
    definition of the clamp band — the full-rank, tridiag and multitask
    init paths all use it, so they cannot drift apart (mirror of the
    likelihood's cv-side ``laplace_inv_hessian``)."""
    return jnp.clip(0.5 * y**-2.0 * jnp.exp(2.0 * f), min=1e-4, max=1000.0)


def laplace_initialize(kuu, y, f=None, root_scale: float = 10.0,
                       inv_hess=None, chol_kuu=None,
                       exp_hessian: str = "reference"):
    """Laplace-style variational init for the ``"exp"`` parameterization.

    Reference ``single_task_variational_gp.py:204-254``:

    * ``f`` from the running-std heuristic (unless supplied),
    * ``H^{-1} = clamp(diag_embed(0.5 * y^-2 * exp(2 f)), 1e-4, 1e3)`` —
      the clamp runs AFTER ``diag_embed``, so the off-diagonal zeros are
      raised to 1e-4 and the matrix is the dense
      ``diag(clamp(.)) + 1e-4 (11^T - I)``, not a diagonal (parity
      quirk, pinned against a float64 oracle in tests),
    * ``S = L (L^T H^{-1} L + I)^{-1} L^T`` with ``L = chol(Kuu)``,
    * stored root ``tril(chol(S)) * 10``.

    Returns ``(VariationalState, mean_constant_init)`` where the constant
    mean inits to ``log(mean(running_std))``.

    ``inv_hess`` overrides the exp-parameterization curvature with an
    explicit diagonal (the cv init passes the exact autodiff Hessian of
    its own likelihood — ``models/gpcv.py``); when omitted the exp form
    above is used, with ``exp_hessian="reference"`` replicating the dense
    clamp-after-diag_embed quirk and ``"diag"`` using the plain diagonal
    (the sparse extension's choice — its inducing grid is not the
    reference's anyway).  ``chol_kuu`` optionally supplies a
    structure-aware prior factor (see :func:`elbo_at_inducing`); ``kuu``
    may then be ``None``.
    """
    y = jnp.asarray(y)
    if f is None:
        f, rs = running_std_latent_init(y)
        mean_const = jnp.log(jnp.mean(rs, axis=-1))
    else:
        rs = None
        mean_const = None

    dense_m = None
    if inv_hess is None:
        inv_hess = exp_laplace_inv_hessian(y, f)
        if exp_hessian == "reference":
            n = inv_hess.shape[-1]
            eye = jnp.eye(n, dtype=bool)
            dense_m = jnp.where(
                eye, inv_hess[..., :, None],
                jnp.asarray(1e-4, inv_hess.dtype),
            )
        elif exp_hessian != "diag":
            raise ValueError("exp_hessian must be 'reference' or 'diag'")

    if chol_kuu is None:
        chol_kuu = psd_safe_cholesky(kuu)
    if dense_m is not None:
        inner = jnp.matmul(
            jnp.swapaxes(chol_kuu, -1, -2),
            jnp.matmul(dense_m, chol_kuu, precision=_HIGHEST),
            precision=_HIGHEST,
        )
    else:
        inner = jnp.matmul(
            jnp.swapaxes(chol_kuu, -1, -2) * inv_hess[..., None, :],
            chol_kuu,
            precision=_HIGHEST,
        )
    inner = add_jitter(inner, 1.0)
    s = jnp.matmul(
        chol_kuu,
        cholesky_solve(
            psd_safe_cholesky(inner), jnp.swapaxes(chol_kuu, -1, -2)
        ),
        precision=_HIGHEST,
    )
    s_root = jnp.tril(psd_safe_cholesky(s)) * root_scale
    state = VariationalState(variational_mean=f, chol_variational_covar=s_root)
    return state, mean_const

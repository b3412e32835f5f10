"""Dense multivariate-normal algebra: log-prob, KL, conditionals, sampling.

These are the numerical backbone ops that the reference delegates to
GPyTorch/PyTorch (Cholesky-based ``log_prob``, ``torch.cholesky_solve``
conditionals, MVN KL).  All functions take explicit arrays, support leading
batch dimensions, and are jit/vmap-safe.  Factorizations go through
:func:`volt_tpu.ops.chol.psd_safe_cholesky` so jitter escalation is
deterministic control flow rather than exception-driven retry.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .chol import (
    cholesky_solve,
    psd_safe_cholesky,
    solve_lower_triangular,
    tril_inverse_quad,
)

__all__ = [
    "mvn_log_prob",
    "mvn_log_prob_chol",
    "mvn_kl",
    "conditional",
    "sample_mvn",
]

_LOG_2PI = math.log(2.0 * math.pi)

# GP conditionals need true float32 accumulation: on TPU the default matmul
# precision is bfloat16, which is far outside the 1e-5 MLL parity budget.
_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HIGHEST)


def mvn_log_prob_chol(y, mean, chol):
    """``log N(y; mean, L L^T)`` given the lower Cholesky factor."""
    n = y.shape[-1]
    diff = y - mean
    quad = tril_inverse_quad(chol, diff)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
    )
    return -0.5 * (quad + logdet + n * _LOG_2PI)


def mvn_log_prob(y, mean, cov, jitter: float | None = None):
    """``log N(y; mean, cov)`` via psd-safe Cholesky."""
    return mvn_log_prob_chol(y, mean, psd_safe_cholesky(cov, jitter=jitter))


def mvn_kl(mean_q, chol_q, mean_p, chol_p):
    """``KL(N(mean_q, Lq Lq^T) || N(mean_p, Lp Lp^T))`` (batched).

    Cholesky-parameterized for stability: trace and quadratic terms are
    triangular solves, log-dets are diagonal sums.

    ``chol_q`` is typically a raw *parameterized* root (gpytorch's
    ``CholeskyVariationalDistribution`` leaves the diagonal
    unconstrained), so Adam can drive its diagonal negative mid-fit;
    ``Lq Lq^T`` is unchanged and ``log|Sq| = 2 sum log |diag|``, so the
    absolute value keeps the KL *value* finite there — dropping it makes
    the loss trajectory (and any `isfinite(loss)` health flag) NaN while
    the gradients (``1/diag``) remain exactly those of ``log|diag|``.
    Same policy as the BM closed form (``ops/brownian.py``) and
    ``gp/kronecker._tri_logdet``.
    """
    n = mean_q.shape[-1]
    # tr(Sp^{-1} Sq) = || Lp^{-1} Lq ||_F^2
    a = solve_lower_triangular(chol_p, chol_q)
    trace = jnp.sum(a * a, axis=(-2, -1))
    quad = tril_inverse_quad(chol_p, mean_p - mean_q)
    logdet_p = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_p, axis1=-2, axis2=-1)), -1)
    logdet_q = 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(chol_q, axis1=-2, axis2=-1))), -1
    )
    return 0.5 * (trace + quad - n + logdet_p - logdet_q)


def conditional(k_tr, k_tr_te, k_te, residual, jitter: float | None = None,
                chol_tr=None):
    """Gaussian conditional of test points given exact train observations.

    Mirrors the reference's one-step conditional (``rollout_utils.py:26-44``):
    ``mean = K_te_tr (K_tr)^{-1} residual``,
    ``cov  = K_te - K_te_tr (K_tr)^{-1} K_tr_te``,
    with a psd-safe Cholesky of ``K_tr`` (reference passes ``jitter=1e-4``)
    unless ``chol_tr`` supplies a precomputed (e.g. structure-aware) factor.

    ``residual`` is ``y_train - mean_train`` shaped ``(..., n)``.
    Returns ``(cond_mean (..., m), cond_cov (..., m, m))``.
    """
    chol = chol_tr if chol_tr is not None \
        else psd_safe_cholesky(k_tr, jitter=jitter)
    solved = cholesky_solve(chol, residual[..., None])
    k_te_tr = jnp.swapaxes(k_tr_te, -1, -2)
    cond_mean = _mm(k_te_tr, solved)
    cond_cov = k_te - _mm(k_te_tr, cholesky_solve(chol, k_tr_te))
    return cond_mean[..., 0], cond_cov


def sample_mvn(key, mean, cov, sample_shape=(), jitter: float | None = None):
    """Draw samples from ``N(mean, cov)`` via psd-safe Cholesky."""
    chol = psd_safe_cholesky(cov, jitter=jitter)
    shape = tuple(sample_shape) + mean.shape
    z = jax.random.normal(key, shape, mean.dtype)
    return mean + jnp.einsum("...ij,...j->...i", chol, z, precision=_HIGHEST)

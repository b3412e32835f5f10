"""Well-conditioned factorizations of the fractional-BM covariance.

The FBM kernel ``K(s, t) = (s^{2H} + t^{2H} - |s-t|^{2H}) / 2`` (reference
``kernels/FBMKernel.py:38-59``) is the covariance of fBm pinned at
``B(0) = 0``, so its Gram matrix on an increasing grid factors through the
*increments* ``g_i = B(t_i) - B(t_{i-1})`` (with ``t_0 := 0``):

    K = A G A^T,   A = unit lower-triangular (cumsum),
    G[i, j] = Cov(g_i, g_j)
            = (|t_i - t_{j-1}|^{2H} + |t_{i-1} - t_j|^{2H}
               - |t_i - t_j|^{2H} - |t_{i-1} - t_{j-1}|^{2H}) / 2.

Because ``A`` and ``chol(G)`` are both lower-triangular,
``chol(K) = A @ chol(G) = cumsum(chol(G), axis=-2)`` exactly — and ``G``
(discrete fractional Gaussian noise on equispaced grids) is *dramatically*
better conditioned than ``K``: measured on ``arange(1..n)/252`` grids,
``cond(G) <= ~1.5e3`` across ``H in [0.1, 0.9], n <= 2000`` while
``cond(K)`` reaches ``1.5e8`` (H=0.9, n=400 — where even a float64
Cholesky of ``K`` fails outright).  Factorizing in increment domain is
what makes the float32 FBM pipeline robust on TPU; the value-domain
``psd_safe_cholesky(K)`` ladder it replaces lost 1-4 of 8 lanes per batch
to NaN factorizations (BENCH_SCALING.md round-3 FBM table).

A diagonal (noise) term extends the identity: ``A^{-1}`` is the
first-difference matrix ``D``, so

    K + c I = A (G + c D D^T) A^T,

with ``D D^T`` the fixed tridiagonal ``[-1, 2, -1]`` (first diagonal entry
1), so noisy covariances factor in increment domain too.
"""

from __future__ import annotations

import jax.numpy as jnp

from .chol import psd_safe_cholesky

__all__ = [
    "fbm_increment_cov",
    "fbm_cholesky",
    "fbm_noise_cholesky",
]


def _prepend_zero(x):
    return jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :-1]],
                           axis=-1)


def fbm_increment_cov(x, two_h):
    """Covariance of the fBm increments over grid ``x`` (``(..., n, n)``).

    ``x`` is an increasing positive grid ``(..., n)``; ``two_h`` is
    ``2 * H`` broadcastable against ``(..., 1, 1)``.  On an equispaced grid
    this is the (Toeplitz) fGn covariance ``dx^{2H} rho(|i-j|)``; the
    formula below is exact on any grid.
    """
    x = jnp.asarray(x)
    two_h = jnp.asarray(two_h)
    if two_h.ndim and two_h.shape[-1] == 1:
        two_h = two_h[..., None]  # (..., 1, 1)
    xp = _prepend_zero(x)
    ti, tim = x[..., :, None], xp[..., :, None]
    tj, tjm = x[..., None, :], xp[..., None, :]
    g = 0.5 * (
        jnp.abs(ti - tjm) ** two_h
        + jnp.abs(tim - tj) ** two_h
        - jnp.abs(ti - tj) ** two_h
        - jnp.abs(tim - tjm) ** two_h
    )
    return g


def fbm_cholesky(x, two_h, jitter: float | None = None, max_tries: int = 3):
    """Lower Cholesky factor of the FBM Gram matrix, increment-domain.

    ``chol(K) = cumsum(chol(G), axis=-2)`` (see module docstring).  The
    jitter ladder runs on the well-conditioned ``G``; the gpytorch-default
    ladder suffices where the value-domain factorization needed the deep
    ``1e-5 x 10^5`` ladder and still failed lanes.

    Note the returned factor is *exact* for ``K`` itself — jitter added to
    ``G`` regularizes in increment domain, i.e. perturbs ``K`` by
    ``eps A A^T`` (a time-scaled BM ridge) rather than ``eps I``.
    """
    g = fbm_increment_cov(x, two_h)
    lg = psd_safe_cholesky(g, jitter=jitter, max_tries=max_tries)
    return jnp.cumsum(lg, axis=-2)


def fbm_noise_cholesky(x, two_h, noise, jitter: float | None = None,
                       max_tries: int = 3):
    """Lower Cholesky of ``K + noise * I`` via ``G + noise * D D^T``.

    ``noise`` broadcasts against ``(..., 1, 1)``; ``D D^T`` is the
    tridiagonal second-difference stencil (first diagonal entry 1).
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    noise = jnp.asarray(noise)
    if noise.ndim and noise.shape[-1] == 1:
        noise = noise[..., None]
    g = fbm_increment_cov(x, two_h)
    diag = jnp.concatenate(
        [jnp.ones((1,), x.dtype), 2.0 * jnp.ones((n - 1,), x.dtype)]
    )
    ddt = jnp.diag(diag) - jnp.diag(jnp.ones((n - 1,), x.dtype), 1) \
        - jnp.diag(jnp.ones((n - 1,), x.dtype), -1)
    lg = psd_safe_cholesky(g + noise * ddt, jitter=jitter,
                           max_tries=max_tries)
    return jnp.cumsum(lg, axis=-2)

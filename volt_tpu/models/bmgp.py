"""Exact GP over log-volatility with Brownian-motion drift mean.

Stage-2 of the Volt pipeline: after GPCV infers a volatility path, this
model fits ``log(vol)`` with a BM (or FBM) kernel and the analytic Itô
drift mean ``-0.5 * vol_param^2 * t`` (reference ``models/BMGP.py:9-28``),
making the vol prior a geometric Brownian motion.  Forecast vol paths are
joint posterior samples at the test grid.
"""

from __future__ import annotations

import flax.struct as struct
import jax
import jax.numpy as jnp

from ..gp.exact import exact_mll, posterior
from ..kernels import BMKernel, FBMKernel
from ..likelihoods import GaussianLikelihood
from ..ops.mvn import sample_mvn
from ..utils.static import ConfigEq

__all__ = ["BMGP", "BMGPState"]


@struct.dataclass
class BMGPState:
    """Fitted vol-GP: parameters plus the conditioning data."""

    module: "BMGP" = struct.field(pytree_node=False)
    params: dict
    train_x: jax.Array  # (..., n) time grid
    train_y: jax.Array  # (..., n) log-vol observations

    def posterior(self, test_x):
        return self.module.posterior(self.params, self.train_x, self.train_y,
                                     test_x)

    def sample(self, key, test_x, sample_shape=()):
        return self.module.sample(key, self.params, self.train_x,
                                  self.train_y, test_x, sample_shape)

    def sample_forecast(self, key, test_x, sample_shape=()):
        """O(n + S*H) joint posterior samples at strictly-future points
        (BM kernel only; see ``BMGP.sample_forecast``)."""
        return self.module.sample_forecast(key, self.params, self.train_x,
                                           self.train_y, test_x,
                                           sample_shape)


class BMGP(ConfigEq):
    """Static configuration + pure functions for the vol GP."""

    def __init__(self, kernel: str = "bm", batch_shape: tuple = ()):
        if kernel == "bm":
            self.kernel = BMKernel(batch_shape=batch_shape)
        elif kernel == "fbm":
            self.kernel = FBMKernel(batch_shape=batch_shape)
        else:
            raise ValueError("kernel must be 'bm' or 'fbm'")
        self.likelihood = GaussianLikelihood(batch_shape=batch_shape)
        self.batch_shape = tuple(batch_shape)

    def init(self, dtype=jnp.float32):
        # The reference's ``vol_lh.noise.data = 1e-2`` (train_utils.py:71)
        # is a silent no-op (documented in GaussianLikelihood); raw_noise
        # therefore starts at gpytorch's default 0.
        return {
            "kernel": self.kernel.init(dtype),
            "likelihood": self.likelihood.init(dtype),
        }

    def mean(self, params, x):
        """Analytic drift ``-0.5 vol^2 t`` (reference BMGP.py:20-21)."""
        vol = self.kernel.vol(params["kernel"])
        return -0.5 * vol**2.0 * x

    def _require_bm(self, method: str):
        """The Markov/Kalman closed forms are BM-only; applied to an FBM
        kernel they run without error but are silently far from the true
        posterior (treating the Hurst parameter as the BM vol)."""
        if not isinstance(self.kernel, BMKernel):
            raise ValueError(
                f"{method} requires the BM kernel (Markov closed forms); "
                f"use posterior/sample for {type(self.kernel).__name__}"
            )

    def mll(self, params, x, y):
        noise = self.likelihood.noise(params["likelihood"])
        if isinstance(self.kernel, FBMKernel):
            # factorize K + s I in increment domain (FBMKernel
            # .noise_cholesky): exact, but conditioned like fGn — the
            # value-domain Cholesky fails in float32 at H ~ 0.9 for n in
            # the hundreds (ops/fbm.py), i.e. in the middle of a fit
            # whenever the Hurst trajectory wanders high.
            from ..ops.mvn import mvn_log_prob_chol

            chol = self.kernel.noise_cholesky(params["kernel"], x, noise)
            n = y.shape[-1]
            return mvn_log_prob_chol(y, self.mean(params, x), chol) / n
        cov = self.kernel(params["kernel"], x)
        return exact_mll(y, self.mean(params, x), cov, noise)

    # -- eigendecomposition cross-check path (BM kernel only) ----------------
    #
    # K + s I = vol * M + s I with M = min(x) FIXED: eigendecompose M once
    # per grid, and every (vol, noise) pair re-uses it — O(n^2) per step
    # vs the reference's O(n^3) re-factorization (SURVEY.md §3.2 hot
    # loop).  NOT the production fit path: training dispatches to
    # mll_spectral (closed-form spectrum, O(n)/step) or mll_kalman (O(n)
    # scan) — grid_cache/mll_fast survive as an independent form the
    # tests pin those against.

    def grid_cache(self, x):
        if not isinstance(self.kernel, BMKernel):
            return None
        m = jnp.minimum(x[..., :, None], x[..., None, :])
        evals, evecs = jnp.linalg.eigh(m)
        return jnp.maximum(evals, 0.0), evecs

    def mll_kalman(self, params, x, y):
        """O(n) exact MLL via the Kalman filter (BM kernel only).

        ``vol * min(x) + s I`` is a random walk with increments
        ``vol * dx`` observed under noise ``s`` — the filter's innovation
        decomposition gives the same value/gradients as the dense MLL with
        no factorization at all (robust to ``x_0 = 0``: a zero first
        increment is just a delta prior).
        """
        from ..ops.tridiag import brownian_noise_mll_kalman

        vol = self.kernel.vol(params["kernel"])[..., 0]
        noise = self.likelihood.noise(params["likelihood"])[..., 0]
        resid = y - self.mean(params, x)
        return brownian_noise_mll_kalman(vol[..., None] * x, noise, resid)

    def spectral_cache(self, x, y):
        """Closed-form eigensystem of ``min(x)`` on an *equispaced* grid.

        With ``x_i = x0 + i dx``, ``min(x_i, x_j) = x0 + dx min(i, j)``
        (indices from 1) and the integer min-matrix has the exact
        DST-like eigensystem

            ``mu_k = 1 / (4 sin^2((2k+1) pi / (2(2n+1))))``
            ``u_k[j] = 2/sqrt(2n+1) * sin((2k+1) j pi / (2n+1))``

        so no factorization is needed even once per fit, and after
        projecting ``y`` and ``x`` onto the basis (one batched matmul —
        or, past :data:`~volt_tpu.ops.brownian._PROJECT_FFT_MIN_N`, one
        O(n log n) FFT transform with NO n x n object at all, valid for
        any ``n``), every (vol, noise) MLL evaluation in
        :meth:`mll_spectral` is elementwise O(n) — fully parallel,
        unlike the O(n)-sequential Kalman scan.  The ``x0`` offset is a
        rank-1 term handled by Sherman-Morrison.  Callers must ensure
        ``x`` is equispaced.
        """
        from ..ops.brownian import min_kernel_eigenvalues, min_kernel_project

        n = x.shape[-1]
        dx = x[..., 1] - x[..., 0]
        x0 = x[..., 0]
        mu = min_kernel_eigenvalues(n, x.dtype)
        p_y = min_kernel_project(y)
        p_t = min_kernel_project(x)
        w = min_kernel_project(jnp.ones((n,), x.dtype))
        return {"mu": mu, "dx": dx, "x0": x0, "p_y": p_y, "p_t": p_t,
                "w": w}

    def mll_spectral(self, params, cache):
        """Exact MLL from :meth:`spectral_cache` — elementwise O(n)/step.

        With 0-indexed grid points ``x_i = x0 + i dx``,
        ``min(x_i, x_j) = (x0 - dx) 11^T + dx M`` where ``M`` is the
        1-indexed integer min-matrix, so
        ``K + s I = diag(vol dx mu + s) + vol (x0 - dx) w w^T`` in M's
        closed-form eigenbasis; the quadratic form and log-determinant
        follow from Sherman-Morrison and the matrix-determinant lemma
        with no sequential dependency.  Matches :meth:`mll_kalman` / the
        dense MLL (pinned in tests).
        """
        import math

        mu, dx, x0 = cache["mu"], cache["dx"], cache["x0"]
        p_y, p_t, w = cache["p_y"], cache["p_t"], cache["w"]
        n = mu.shape[-1]
        vol = self.kernel.vol(params["kernel"])[..., 0]
        noise = self.likelihood.noise(params["likelihood"])[..., 0]

        d = vol[..., None] * dx[..., None] * mu + noise[..., None]
        p_r = p_y + 0.5 * (vol**2.0)[..., None] * p_t  # r = y - (-vol^2 x / 2)
        a = vol * (x0 - dx)
        wd = w / d
        s = 1.0 + a * jnp.sum(w * wd, axis=-1)
        quad = (
            jnp.sum(p_r * p_r / d, axis=-1)
            - a * jnp.sum(wd * p_r, axis=-1) ** 2 / s
        )
        logdet = jnp.sum(jnp.log(d), axis=-1) + jnp.log(s)
        return -0.5 * (quad + logdet + n * math.log(2.0 * math.pi)) / n

    def mll_fast(self, params, x, y, cache):
        import math

        evals, evecs = cache
        n = y.shape[-1]
        vol = self.kernel.vol(params["kernel"])[..., 0]
        noise = self.likelihood.noise(params["likelihood"])[..., 0]
        r = y - self.mean(params, x)
        rot = jnp.einsum("...ij,...i->...j", evecs, r,
                         precision=jax.lax.Precision.HIGHEST)
        denom = vol[..., None] * evals + noise[..., None]
        quad = jnp.sum(rot * rot / denom, axis=-1)
        logdet = jnp.sum(jnp.log(denom), axis=-1)
        return -0.5 * (quad + logdet + n * math.log(2.0 * math.pi)) / n

    def forecast_state(self, params, train_x, train_y):
        """Filtered posterior ``(mean, var)`` of the latent residual at
        the LAST train point given all observations (O(n) Kalman scan,
        BM kernel only)."""
        from ..ops.tridiag import brownian_noise_filter

        self._require_bm("forecast_state")
        vol = self.kernel.vol(params["kernel"])[..., 0]
        noise = self.likelihood.noise(params["likelihood"])[..., 0]
        resid = train_y - self.mean(params, train_x)
        return brownian_noise_filter(vol[..., None] * train_x, noise, resid)

    def posterior_forecast(self, params, train_x, train_y, test_x):
        """Joint posterior over STRICTLY-FUTURE test points, closed form.

        The BM kernel is Markov, so conditioning on all train data
        collapses to the filtered state at the last train point:

            ``mean_j = m(x*_j) + mu_n``
            ``cov_jk = P_n + vol * (min(x*_j, x*_k) - x_n)``

        — identical to the dense joint posterior (pinned in tests) at
        O(n + H^2) instead of O(n^3): the pipeline's vol-path sampling
        was the last super-linear memory/compute object at large n
        (an n x n covariance + Cholesky per asset).

        Valid ONLY for strictly-future increasing ``test_x``; violating
        grids return all-NaN (``ops.brownian.future_grid_ok``) rather
        than a wrong posterior.
        """
        from ..ops.brownian import future_grid_ok, nan_poison

        self._require_bm("posterior_forecast")
        mu, p = self.forecast_state(params, train_x, train_y)
        vol = self.kernel.vol(params["kernel"])[..., 0]
        mean = self.mean(params, test_x) + mu[..., None]
        gap = jnp.minimum(test_x[..., :, None], test_x[..., None, :]) \
            - train_x[..., -1:, None]
        cov = p[..., None, None] + vol[..., None, None] * gap
        ok = future_grid_ok(test_x, train_x)
        return (nan_poison(mean, ok[..., None]),
                nan_poison(cov, ok[..., None, None]))

    def sample_forecast(self, key, params, train_x, train_y, test_x,
                        sample_shape=()):
        """Joint posterior samples at future test points in O(n + S*H).

        Draws the filtered last-point state, then independent Brownian
        increments (cumsum) — no covariance materialization at all, so
        forecasting works unchanged at n in the tens of thousands.

        Valid ONLY for strictly-future increasing ``test_x``; violating
        grids return all-NaN (``ops.brownian.future_grid_ok``) rather
        than a wrong distribution.
        """
        from ..ops.brownian import future_grid_ok, nan_poison

        self._require_bm("sample_forecast")
        mu, p = self.forecast_state(params, train_x, train_y)
        vol = self.kernel.vol(params["kernel"])[..., 0]
        incs = vol[..., None] * jnp.diff(
            test_x, axis=-1, prepend=train_x[..., -1:]
        )
        batch = jnp.broadcast_shapes(mu.shape, incs.shape[:-1])
        h = test_x.shape[-1]
        k0, k1 = jax.random.split(key)
        shape = (*tuple(sample_shape), *batch)
        r0 = mu + jnp.sqrt(p) * jax.random.normal(k0, shape, train_y.dtype)
        z = jax.random.normal(k1, (*shape, h), train_y.dtype)
        r = r0[..., None] + jnp.cumsum(jnp.sqrt(incs) * z, axis=-1)
        ok = future_grid_ok(test_x, train_x)
        return nan_poison(r + self.mean(params, test_x), ok[..., None])

    def posterior(self, params, train_x, train_y, test_x):
        """Latent posterior ``p(f* | y)`` (noisy conditioning on train)."""
        k_tr = self.kernel(params["kernel"], train_x)
        k_tr_te = self.kernel(params["kernel"], train_x, test_x)
        k_te = self.kernel(params["kernel"], test_x)
        resid = train_y - self.mean(params, train_x)
        noise = self.likelihood.noise(params["likelihood"])
        chol_tr = None
        if isinstance(self.kernel, FBMKernel):
            # increment-domain factor of K + s I (see mll)
            chol_tr = self.kernel.noise_cholesky(params["kernel"], train_x,
                                                 noise)
        mean, cov = posterior(k_tr, k_tr_te, k_te, resid, noise,
                              chol_tr=chol_tr)
        return mean + self.mean(params, test_x), cov

    def sample(self, key, params, train_x, train_y, test_x, sample_shape=()):
        """Joint posterior samples of the latent log-vol at ``test_x``."""
        mean, cov = self.posterior(params, train_x, train_y, test_x)
        return sample_mvn(key, mean, cov, sample_shape)

    def fit_state(self, params, train_x, train_y) -> BMGPState:
        return BMGPState(module=self, params=params, train_x=train_x,
                         train_y=train_y)

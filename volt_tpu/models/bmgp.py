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

    def mll(self, params, x, y):
        cov = self.kernel(params["kernel"], x)
        noise = self.likelihood.noise(params["likelihood"])
        return exact_mll(y, self.mean(params, x), cov, noise)

    # -- factorization-free training path (BM kernel only) ------------------
    #
    # K + s I = vol * M + s I with M = min(x) FIXED: eigendecompose M once
    # per grid, and every (vol, noise) pair re-uses it — the per-iteration
    # cost of the vol-model fit drops from O(n^3) to O(n^2) (the reference
    # re-factorizes each Adam step, SURVEY.md §3.2 hot loop).

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

    def posterior(self, params, train_x, train_y, test_x):
        """Latent posterior ``p(f* | y)`` (noisy conditioning on train)."""
        k_tr = self.kernel(params["kernel"], train_x)
        k_tr_te = self.kernel(params["kernel"], train_x, test_x)
        k_te = self.kernel(params["kernel"], test_x)
        resid = train_y - self.mean(params, train_x)
        noise = self.likelihood.noise(params["likelihood"])
        mean, cov = posterior(k_tr, k_tr_te, k_te, resid, noise)
        return mean + self.mean(params, test_x), cov

    def sample(self, key, params, train_x, train_y, test_x, sample_shape=()):
        """Joint posterior samples of the latent log-vol at ``test_x``."""
        mean, cov = self.posterior(params, train_x, train_y, test_x)
        return sample_mvn(key, mean, cov, sample_shape)

    def fit_state(self, params, train_x, train_y) -> BMGPState:
        return BMGPState(module=self, params=params, train_x=train_x,
                         train_y=train_y)

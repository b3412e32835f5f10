"""GPCV: the stage-1 variational volatility model.

A variational GP with a BM/FBM kernel, constant mean, unwhitened strategy,
inducing points fixed at the training inputs, and the heteroscedastic
volatility likelihood (reference ``models/single_task_variational_gp.py``
as configured by ``train_utils.py:20-31``).  Training maximizes the
Gauss–Hermite ELBO; the output of the stage is the posterior-mean predicted
scale — the inferred volatility path.
"""

from __future__ import annotations

import flax.struct as struct
import jax
import jax.numpy as jnp

from ..gp.variational import (
    VariationalState,
    elbo_at_inducing,
    laplace_initialize,
    variational_predict,
)
from ..kernels import BMKernel, FBMKernel
from ..likelihoods import VolatilityGaussianLikelihood
from ..means import ConstantMean
from ..ops.brownian import bm_kl_against_prior
from ..ops.quadrature import DEFAULT_NUM_LOCS
from ..utils.static import ConfigEq

__all__ = ["GPCVModel", "GPCVState"]


@struct.dataclass
class GPCVState:
    module: "GPCVModel" = struct.field(pytree_node=False)
    params: dict
    train_x: jax.Array
    targets: jax.Array  # scaled returns

    def predicted_scale(self, mc_samples=None, key=None):
        return self.module.predicted_scale(
            self.params, self.train_x, mc_samples=mc_samples, key=key
        )


class GPCVModel(ConfigEq):
    """Note on parameterizations: training supports both likelihoods, but
    the Laplace initialization implements the ``"exp"`` Hessian (the only
    one any reference pipeline uses; the reference's ``"cv"`` init branch
    mixes shapes inconsistently — SURVEY.md §7 hard part 3).  With
    ``param="cv"`` the running-std/exp-Hessian init is used as a heuristic
    starting point."""

    def __init__(self, kernel: str = "bm", param: str = "exp",
                 num_locs: int = DEFAULT_NUM_LOCS):
        if kernel == "bm":
            self.kernel = BMKernel()
        elif kernel == "fbm":
            self.kernel = FBMKernel()
        else:
            raise ValueError("kernel must be 'bm' or 'fbm'")
        self.mean = ConstantMean()
        self.likelihood = VolatilityGaussianLikelihood(param=param)
        self.num_locs = num_locs

    def init(self, train_x, y, key=None, dtype=jnp.float32):
        """Laplace-style init (reference ``train_utils.py:31``)."""
        kernel_params = self.kernel.init(dtype)
        kuu = self.kernel(kernel_params, train_x)
        var_state, mean_const = laplace_initialize(kuu, y)
        return {
            "kernel": kernel_params,
            "mean": {"constant": mean_const[..., None]},
            "likelihood": self.likelihood.init(dtype, key=key),
            "variational_mean": var_state.variational_mean,
            "chol_variational_covar": var_state.chol_variational_covar,
        }

    def _var_state(self, params):
        return VariationalState(
            variational_mean=params["variational_mean"],
            chol_variational_covar=params["chol_variational_covar"],
        )

    def elbo(self, params, train_x, y):
        """Variational ELBO at inducing == train == query points.

        For the BM kernel the KL's prior-side algebra is closed-form (the
        min-kernel Cholesky is a diff-and-scale operator,
        :mod:`volt_tpu.ops.brownian`), so each ELBO+grad step is
        factorization-free — the reference pays a dense Cholesky per
        iteration here (SURVEY.md §3.1 hot loop).
        """
        prior_mean = self.mean(params["mean"], train_x)

        def ell(yy, mean, var):
            return self.likelihood.expected_log_prob(
                params["likelihood"], yy, mean, var, num_locs=self.num_locs
            )

        state = self._var_state(params)
        if isinstance(self.kernel, BMKernel):
            n = y.shape[-1]
            chol_q = jnp.tril(state.chol_variational_covar)
            marg_var = jnp.sum(chol_q * chol_q, axis=-1)
            ell_vals = ell(y, state.variational_mean, marg_var)
            kl = bm_kl_against_prior(
                train_x, self.kernel.vol(params["kernel"]),
                state.variational_mean, chol_q, prior_mean,
            )
            return jnp.mean(ell_vals, axis=-1) - kl / n
        kuu = self.kernel(params["kernel"], train_x)
        return elbo_at_inducing(state, prior_mean, kuu, y, ell)

    def init_sparse(self, train_x, inducing_x, y, key=None,
                    dtype=jnp.float32):
        """Sparse (inducing-point) init for long series.

        The reference caps sequence length at n ~ 2000
        (``max_cholesky_size``, ``GPGenerator.py:62``).  Here the exact
        Volt/vol stages are already O(n)-capable (tridiagonal precision /
        shared-grid eigendecomposition), and this SVGP-style GPCV with
        ``m << n`` inducing points removes the last quadratic object — the
        full-rank variational covariance — for n in the tens of thousands.
        The Laplace heuristic initializes the inducing values from the
        running std subsampled onto the inducing grid.
        """
        kernel_params = self.kernel.init(dtype)
        kuu = self.kernel(kernel_params, inducing_x)
        from ..gp.variational import running_std_latent_init

        f_full, rs = running_std_latent_init(y)
        n = train_x.shape[-1]
        m = inducing_x.shape[-1]
        take = jnp.clip(
            jnp.searchsorted(train_x, inducing_x), 0, n - 1
        )
        f_m = f_full[..., take]
        # no x10 root inflation here: that is a full-rank-parity choice
        # (single_task_variational_gp.py:251); the sparse extension starts
        # at the plain Laplace covariance, which converges much faster.
        state, _ = laplace_initialize(kuu, y[..., take], f=f_m,
                                      root_scale=1.0)
        return {
            "kernel": kernel_params,
            "mean": {"constant": jnp.log(jnp.mean(rs, axis=-1))[..., None]},
            "likelihood": self.likelihood.init(dtype, key=key),
            "variational_mean": state.variational_mean,
            "chol_variational_covar": state.chol_variational_covar,
        }

    def elbo_sparse(self, params, train_x, inducing_x, y):
        """SVGP ELBO: GH expected log-prob of the unwhitened predictive
        marginals at the n train points + KL over the m inducing points."""
        state = self._var_state(params)
        kuu = self.kernel(params["kernel"], inducing_x)
        kux = self.kernel(params["kernel"], inducing_x, train_x)
        kxx_diag = self.kernel(params["kernel"], train_x, diag=True)
        prior_u = self.mean(params["mean"], inducing_x)
        prior_x = self.mean(params["mean"], train_x)
        mean, var = variational_predict(state, prior_u, kuu, kux, prior_x,
                                        kxx_diag=kxx_diag)
        var = jnp.maximum(var, 1e-8)
        ell = self.likelihood.expected_log_prob(
            params["likelihood"], y, mean, var, num_locs=self.num_locs
        )
        n = y.shape[-1]
        if isinstance(self.kernel, BMKernel):
            kl = bm_kl_against_prior(
                inducing_x, self.kernel.vol(params["kernel"]),
                state.variational_mean,
                jnp.tril(state.chol_variational_covar), prior_u,
            )
        else:
            from ..ops.chol import psd_safe_cholesky
            from ..ops.mvn import mvn_kl

            kl = mvn_kl(state.variational_mean,
                        jnp.tril(state.chol_variational_covar), prior_u,
                        psd_safe_cholesky(kuu))
        return jnp.mean(ell, axis=-1) - kl / n

    def latent_marginals(self, params, train_x, test_x=None):
        """Posterior marginals of the latent ``f``.

        At the training inputs this is ``q`` itself (the unwhitened
        strategy's short-circuit); at new points the unwhitened predictive.
        """
        state = self._var_state(params)
        if test_x is None:
            chol_q = jnp.tril(state.chol_variational_covar)
            return state.variational_mean, jnp.sum(chol_q * chol_q, axis=-1)
        kuu = self.kernel(params["kernel"], train_x)
        kux = self.kernel(params["kernel"], train_x, test_x)
        kxx_diag = self.kernel(params["kernel"], test_x, diag=True)
        prior_u = self.mean(params["mean"], train_x)
        prior_x = self.mean(params["mean"], test_x)
        return variational_predict(state, prior_u, kuu, kux, prior_x,
                                   kxx_diag=kxx_diag)

    def predicted_scale(self, params, train_x, test_x=None, mc_samples=None,
                        key=None):
        """The stage output: ``E_f[scale(f)]`` at the query points.

        Reference ``train_utils.py:62-67`` (10-sample MC there; analytic
        Gauss–Hermite here unless ``mc_samples`` is given).
        """
        mean, var = self.latent_marginals(params, train_x, test_x)
        return self.likelihood.expected_scale(
            params["likelihood"], mean, var, mc_samples=mc_samples, key=key
        )

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
    exp_laplace_inv_hessian,
    laplace_initialize,
    running_std_latent_init,
    variational_predict,
)
from ..kernels import BMKernel, FBMKernel
from ..likelihoods import VolatilityGaussianLikelihood
from ..means import ConstantMean
from ..ops.bidiag import (
    bidiag_chol_from_tridiag,
    bidiag_solve_lower,
    min_precision,
    takahashi_band,
    tridiag_q_kl_bm_prior,
)
from ..ops.brownian import bm_kl_against_prior
from ..ops.quadrature import DEFAULT_NUM_LOCS
from ..utils.static import ConfigEq

__all__ = ["GPCVModel", "GPCVState"]


@struct.dataclass
class GPCVState:
    module: "GPCVModel" = struct.field(pytree_node=False)
    params: dict
    train_x: jax.Array  # the full return grid
    targets: jax.Array  # scaled returns on train_x
    # sparse (inducing-point) fits carry their m-point inducing grid here;
    # dense fits leave it None (inducing == train, the unwhitened
    # strategy's assumption)
    inducing_x: jax.Array | None = None

    def predicted_scale(self, mc_samples=None, key=None):
        if self.inducing_x is not None:
            mean, var = self.module.latent_marginals(
                self.params, self.inducing_x, self.train_x
            )
            return self.module.likelihood.expected_scale(
                self.params["likelihood"], mean, jnp.maximum(var, 1e-8),
                mc_samples=mc_samples, key=key,
            )
        return self.module.predicted_scale(
            self.params, self.train_x, mc_samples=mc_samples, key=key
        )


class GPCVModel(ConfigEq):
    """Note on parameterizations: both likelihoods get a principled
    Laplace initialization.  ``"exp"`` uses the reference's closed-form
    inverse Hessian; ``"cv"`` inverts its softplus-mixture scale against
    the running std (damped Newton) and takes the *exact autodiff
    Hessian* of its own log-likelihood — the reference's cv branch
    (``single_task_variational_gp.py:227-238``) overwrites ``y`` with the
    latent and inverts a single-component approximation; SURVEY.md marks
    it broken, fixed here by design.  Recovery quality under ``"cv"`` is
    pinned in ``tests/test_pipeline.py``.

    ``q`` selects the variational family:

    * ``"full"`` — the reference's dense ``n x n`` Cholesky covariance
      (``single_task_variational_gp.py:66-122``), O(n^2) parameters;
    * ``"tridiag"`` — tridiagonal-*precision* q (bidiagonal Cholesky,
      O(n) parameters, O(n) ELBO — :mod:`volt_tpu.ops.bidiag`).  For the
      BM prior and a factorized likelihood the optimal Gaussian posterior
      has tridiagonal precision, so this family contains the full-rank
      optimum; it exists purely to kill the n^2 Adam traffic that
      dominates the fit at n ~ 1000 (PERFORMANCE.md).
    """

    def __init__(self, kernel: str = "bm", param: str = "exp",
                 num_locs: int = DEFAULT_NUM_LOCS, q: str = "full",
                 ell_method: str | None = None):
        if kernel == "bm":
            self.kernel = BMKernel()
        elif kernel == "fbm":
            self.kernel = FBMKernel()
        else:
            raise ValueError("kernel must be 'bm' or 'fbm'")
        if q not in ("full", "tridiag"):
            raise ValueError("q must be 'full' or 'tridiag'")
        if q == "tridiag" and kernel != "bm":
            # the tridiagonal-precision family relies on the BM prior's
            # Markov property; FBM is not Markov.
            raise ValueError("q='tridiag' requires the BM kernel")
        self.q = q
        self.mean = ConstantMean()
        self.likelihood = VolatilityGaussianLikelihood(param=param)
        self.num_locs = num_locs
        # ell_method forces the expected-log-likelihood estimator:
        # "quadrature" restores the reference's GH-75 term exactly
        # (train_utils.py:52) for strict trajectory parity; None keeps the
        # likelihood's default (exact closed form for param="exp").
        if ell_method not in (None, "quadrature", "analytic"):
            raise ValueError("ell_method must be None, 'quadrature' or "
                             "'analytic'")
        self.ell_method = ell_method

    def init(self, train_x, y, key=None, dtype=jnp.float32):
        """Laplace-style init (reference ``train_utils.py:31``).

        For ``q='tridiag'`` the same Laplace covariance is exactly
        representable: ``S = (K^{-1} + diag(inv_hess))^{-1}`` has
        tridiagonal precision for the BM prior (no x10 root inflation —
        see ``_init_tridiag``).
        """
        kernel_params = self.kernel.init(dtype)
        lik_params = self.likelihood.init(dtype, key=key)
        if self.q == "tridiag":
            return self._init_tridiag(kernel_params, lik_params, train_x, y,
                                      dtype)
        chol_kuu = self._prior_chol(kernel_params, train_x)
        # init runs eagerly (no jit DCE): build the dense Gram only when
        # no structure-aware factor covers it (BM parity path).
        kuu = None if chol_kuu is not None else self.kernel(
            kernel_params, train_x
        )
        # The reference's x10 root inflation
        # (single_task_variational_gp.py:251) is kept for the BM kernel
        # (trajectory-parity-pinned); against the FBM prior — which is
        # near-singular on grids starting at 0 — the inflated init
        # diverges outright (loss ~1e8 -> NaN by iter ~100), while the
        # plain Laplace covariance converges to an 0.18-0.22-rel-err vol
        # recovery (measured, n=149 SABR; same precedent as the
        # tridiag/sparse inits).  Re-checked after the increment-domain
        # factorization landed: the inflated init still diverges (final
        # loss ~3e5 vs -1.5), so the deviation is an optimization-
        # landscape fact, not a conditioning artifact.
        root_scale = 10.0 if isinstance(self.kernel, BMKernel) else 1.0
        if self.likelihood.param == "cv":
            f, mean_const, inv_hess = self._cv_laplace_pieces(lik_params, y)
            var_state, _ = laplace_initialize(kuu, y, f=f,
                                              inv_hess=inv_hess,
                                              root_scale=root_scale,
                                              chol_kuu=chol_kuu)
        else:
            var_state, mean_const = laplace_initialize(
                kuu, y, root_scale=root_scale, chol_kuu=chol_kuu
            )
        return {
            "kernel": kernel_params,
            "mean": {"constant": mean_const[..., None]},
            "likelihood": lik_params,
            "variational_mean": var_state.variational_mean,
            "chol_variational_covar": var_state.chol_variational_covar,
        }

    def _prior_chol(self, kernel_params, x):
        """Structure-aware prior Cholesky, or ``None`` for the default.

        FBM routes through the increment-domain factorization
        (:mod:`volt_tpu.ops.fbm`): exact for ``K(x, x)`` but conditioned
        like fractional Gaussian noise (cond ~1e3 instead of ~1e8), which
        eliminated the per-lane float32 Cholesky failures the deep jitter
        ladder could only contain (BENCH_SCALING.md round-3 FBM table).
        BM never factorizes a prior (closed forms throughout).
        """
        if isinstance(self.kernel, FBMKernel):
            return self.kernel.prior_cholesky(kernel_params, x)
        return None

    def _cv_laplace_pieces(self, lik_params, y):
        """The cv-parameterization Laplace ingredients: latent init from
        inverting ``scale(f) = running_std``, constant mean likewise, and
        the clamped inverse of the exact autodiff Hessian (same clamp
        band as the exp branch)."""
        _, rs = running_std_latent_init(y)
        f = self.likelihood.latent_from_scale(lik_params, rs)
        mean_const = self.likelihood.latent_from_scale(
            lik_params, jnp.mean(rs, axis=-1)
        )
        inv_hess = self.likelihood.laplace_inv_hessian(lik_params, y, f)
        return f, mean_const, inv_hess

    # --- tridiagonal-precision q (TPU-native; see ops/bidiag.py) -----------

    _KL_JITTER = 1e-6

    def _init_tridiag(self, kernel_params, lik_params, train_x, y, dtype):
        if self.likelihood.param == "cv":
            f, mean_const, inv_hess = self._cv_laplace_pieces(lik_params, y)
        else:
            f, rs = running_std_latent_init(y)
            mean_const = jnp.log(jnp.mean(rs, axis=-1))
            inv_hess = exp_laplace_inv_hessian(y, f)
        vol = self.kernel.vol(kernel_params)[..., 0]
        a_diag, a_off, _ = min_precision(train_x, self._KL_JITTER / vol)
        # plain Laplace precision K^{-1} + diag(inv_hess) — deliberately
        # WITHOUT the reference's x10 root inflation
        # (single_task_variational_gp.py:251): starting at the Laplace
        # covariance itself converges markedly faster in this
        # parameterization (measured: ELBO -0.333 by iter 100 vs the
        # inflated init still at +1.2 at iter 300 on the n=60 probe;
        # same precedent as init_sparse below).
        q_diag = a_diag / vol + inv_hess
        q_off = a_off / vol
        d, e = bidiag_chol_from_tridiag(q_diag, q_off)
        return {
            "kernel": kernel_params,
            "mean": {"constant": mean_const[..., None]},
            "likelihood": lik_params,
            "variational_mean": f,
            "q_log_d": jnp.log(d),
            "q_e": e,
        }

    def _q_chol(self, params):
        """Bidiagonal precision-Cholesky ``(d, e)`` of the tridiag q."""
        return jnp.exp(params["q_log_d"]), params["q_e"]

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
                params["likelihood"], yy, mean, var, num_locs=self.num_locs,
                method=self.ell_method,
            )

        if self.q == "tridiag":
            # O(n) ELBO: Takahashi marginals + closed-form tridiagonal KL.
            n = y.shape[-1]
            d, e = self._q_chol(params)
            m = params["variational_mean"]
            marg_var, _ = takahashi_band(d, e)
            ell_vals = ell(y, m, marg_var)
            kl = tridiag_q_kl_bm_prior(
                train_x, self.kernel.vol(params["kernel"]), m, d, e,
                prior_mean, jitter=self._KL_JITTER,
            )
            return jnp.mean(ell_vals, axis=-1) - kl / n
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
        # FBM (BM never reaches this branch): the prior factor comes from
        # the increment domain, so no kuu build or deep ladder is needed.
        return elbo_at_inducing(
            state, prior_mean, None, y, ell,
            chol_p=self._prior_chol(params["kernel"], train_x),
        )

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
        lik_params = self.likelihood.init(dtype, key=key)
        chol_kuu = self._prior_chol(kernel_params, inducing_x)
        kuu = None if chol_kuu is not None else self.kernel(
            kernel_params, inducing_x
        )
        f_exp, rs = running_std_latent_init(y)
        n = train_x.shape[-1]
        take = jnp.clip(
            jnp.searchsorted(train_x, inducing_x), 0, n - 1
        )
        # latent init inverts the likelihood's own scale function (exp:
        # the running-std log, reference parity; cv: Newton on the
        # softplus mixture) — same principle as the dense init paths.
        if self.likelihood.param == "cv":
            f_full = self.likelihood.latent_from_scale(lik_params, rs)
        else:
            f_full = f_exp
        f_m = f_full[..., take]
        if self.likelihood.param == "cv":
            inv_hess = self.likelihood.laplace_inv_hessian(
                lik_params, y[..., take], f_m
            )
            mean_const = self.likelihood.latent_from_scale(
                lik_params, jnp.mean(rs, axis=-1)
            )
        else:
            inv_hess = None  # exp closed form inside laplace_initialize
            mean_const = jnp.log(jnp.mean(rs, axis=-1))
        # no x10 root inflation here: that is a full-rank-parity choice
        # (single_task_variational_gp.py:251); the sparse extension starts
        # at the plain Laplace covariance, which converges much faster.
        # Likewise exp_hessian="diag": the clamp-after-diag_embed quirk is
        # full-rank reference parity, not a principled curvature.
        state, _ = laplace_initialize(
            kuu, y[..., take], f=f_m, root_scale=1.0, inv_hess=inv_hess,
            chol_kuu=chol_kuu, exp_hessian="diag",
        )
        return {
            "kernel": kernel_params,
            "mean": {"constant": mean_const[..., None]},
            "likelihood": lik_params,
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
        chol_kuu = self._prior_chol(params["kernel"], inducing_x)
        mean, var = variational_predict(state, prior_u, kuu, kux, prior_x,
                                        kxx_diag=kxx_diag,
                                        chol_kuu=chol_kuu)
        var = jnp.maximum(var, 1e-8)
        ell = self.likelihood.expected_log_prob(
            params["likelihood"], y, mean, var, num_locs=self.num_locs,
            method=self.ell_method,
        )
        n = y.shape[-1]
        if isinstance(self.kernel, BMKernel):
            kl = bm_kl_against_prior(
                inducing_x, self.kernel.vol(params["kernel"]),
                state.variational_mean,
                jnp.tril(state.chol_variational_covar), prior_u,
            )
        else:
            from ..ops.mvn import mvn_kl

            kl = mvn_kl(state.variational_mean,
                        jnp.tril(state.chol_variational_covar), prior_u,
                        chol_kuu)
        return jnp.mean(ell, axis=-1) - kl / n

    def latent_marginals(self, params, train_x, test_x=None):
        """Posterior marginals of the latent ``f``.

        At the training inputs this is ``q`` itself (the unwhitened
        strategy's short-circuit); at new points the unwhitened predictive.
        """
        if self.q == "tridiag":
            d, e = self._q_chol(params)
            m = params["variational_mean"]
            if test_x is None:
                return m, takahashi_band(d, e)[0]
            return self._predict_tridiag(params, d, e, m, train_x, test_x)
        state = self._var_state(params)
        if test_x is None:
            chol_q = jnp.tril(state.chol_variational_covar)
            return state.variational_mean, jnp.sum(chol_q * chol_q, axis=-1)
        kuu = self.kernel(params["kernel"], train_x)
        kux = self.kernel(params["kernel"], train_x, test_x)
        kxx_diag = self.kernel(params["kernel"], test_x, diag=True)
        prior_u = self.mean(params["mean"], train_x)
        prior_x = self.mean(params["mean"], test_x)
        return variational_predict(
            state, prior_u, kuu, kux, prior_x, kxx_diag=kxx_diag,
            chol_kuu=self._prior_chol(params["kernel"], train_x),
        )

    def _predict_tridiag(self, params, d, e, m, train_x, test_x):
        """Unwhitened predictive marginals with the tridiag q.

        Same algebra as :func:`volt_tpu.gp.variational.variational_predict`
        with ``S Kuu^{-1} Kux`` routed through the precision root:
        ``S B = L^{-T} (L^{-1} B)``, two bidiagonal solves per column.
        """
        from ..ops.chol import cholesky_solve, psd_safe_cholesky

        kuu = self.kernel(params["kernel"], train_x)
        kux = self.kernel(params["kernel"], train_x, test_x)
        kxx_diag = self.kernel(params["kernel"], test_x, diag=True)
        prior_u = self.mean(params["mean"], train_x)
        prior_x = self.mean(params["mean"], test_x)
        chol = psd_safe_cholesky(kuu)
        kuu_inv_kux = cholesky_solve(chol, kux)  # (..., n_u, n_x)
        diff = (m - prior_u)[..., None]
        mean = jnp.matmul(
            jnp.swapaxes(kuu_inv_kux, -1, -2), diff,
            precision=jax.lax.Precision.HIGHEST,
        )[..., 0] + prior_x
        data_term = jnp.sum(kux * kuu_inv_kux, axis=-2)
        # ||L^{-1} b_j||^2 per column j gives diag(B^T S B).
        bt = jnp.swapaxes(kuu_inv_kux, -1, -2)  # (..., n_x, n_u)
        d_b = jnp.broadcast_to(d[..., None, :], bt.shape)
        e_b = jnp.broadcast_to(
            e[..., None, :], (*bt.shape[:-1], bt.shape[-1] - 1)
        )
        half = bidiag_solve_lower(d_b, e_b, bt)
        s_term = jnp.sum(half * half, axis=-1)
        return mean, kxx_diag - data_term + s_term

    def predicted_scale(self, params, train_x, test_x=None, mc_samples=None,
                        key=None):
        """The stage output: ``E_f[scale(f)]`` at the query points.

        Reference ``train_utils.py:62-67`` (10-sample MC there; analytic
        Gauss–Hermite here unless ``mc_samples`` is given).
        """
        mean, var = self.latent_marginals(params, train_x, test_x)
        # float32 cancellation in the unwhitened predictive (kxx - data
        # + s) can leave a slightly negative variance at query points
        # inside a dense train grid; the ELBO paths clamp identically.
        var = jnp.maximum(var, 1e-8)
        return self.likelihood.expected_scale(
            params["likelihood"], mean, var, mc_samples=mc_samples, key=key
        )

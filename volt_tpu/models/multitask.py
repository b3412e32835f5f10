"""Kronecker multitask models: correlated assets / stations.

* :class:`MultitaskBMGP` — exact multitask GP over log-vol paths with
  ``K = BM(x) (x) IndexKernel`` and the per-task Itô drift mean scaled by
  the task-covariance diagonal (reference ``models/BMGP.py:30-56``).
* :class:`MultitaskVariationalGP` — the hand-rolled Kronecker variational
  GP (explicit ``N x N`` data and ``T x T`` task variational roots,
  reference ``models/multi_task_variational_gp.py``).

Kronecker structure is kept symbolic throughout (``gp/kronecker.py``) —
the ``NT x NT`` covariance is never materialized for training.

Parity notes: the reference's ``task_covar.var.data /= 10`` mutates a
*computed* tensor (a silent no-op, like the noise pins documented in
``likelihoods/``); only the ``covar_factor`` shrink is real, and that is
what ``init`` replicates.
"""

from __future__ import annotations

import flax.struct as struct
import jax
import jax.numpy as jnp

from ..gp.kronecker import kron_kl, kron_mvn_log_prob, kron_posterior
from ..kernels import BMKernel, FBMKernel, IndexKernel
from ..likelihoods import MultitaskGaussianLikelihood
from ..ops.chol import cholesky_solve, psd_safe_cholesky
from ..ops.mvn import sample_mvn
from ..utils.static import ConfigEq

__all__ = ["MultitaskBMGP", "MultitaskBMGPState", "MultitaskVariationalGP"]

_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HIGHEST)


@struct.dataclass
class MultitaskBMGPState:
    module: "MultitaskBMGP" = struct.field(pytree_node=False)
    params: dict
    train_x: jax.Array  # (N,)
    train_y: jax.Array  # (N, T) log-vol per task

    def posterior(self, test_x):
        return self.module.posterior(self.params, self.train_x, self.train_y,
                                     test_x)

    def sample(self, key, test_x, sample_shape=()):
        mean, cov = self.posterior(test_x)
        m, t = mean.shape[-2], mean.shape[-1]
        flat = sample_mvn(key, mean.reshape(*mean.shape[:-2], m * t), cov,
                          sample_shape)
        return flat.reshape(*flat.shape[:-1], m, t)

    def sample_forecast(self, key, test_x, sample_shape=()):
        """Matheron-rule joint posterior samples at strictly-future points
        (BM data kernel only) — never materializes the (M T, M T)
        posterior covariance ``sample`` builds, which at the 505-ticker
        north star with a 100-step horizon would be a 10 GB matrix."""
        return self.module.sample_forecast(key, self.params, self.train_x,
                                           self.train_y, test_x,
                                           sample_shape)


class MultitaskBMGP(ConfigEq):
    """Exact Kronecker multitask GP over log-volatility."""

    def __init__(self, num_tasks: int, kernel: str = "bm", rank: int = 1):
        self.num_tasks = num_tasks
        self.data_kernel = BMKernel() if kernel == "bm" else FBMKernel()
        self.task_kernel = IndexKernel(num_tasks=num_tasks, rank=rank)
        self.likelihood = MultitaskGaussianLikelihood(num_tasks=num_tasks)

    def init(self, dtype=jnp.float32, key=None, noise: float = 1e-3):
        if key is None:
            key = jax.random.key(0)
        task = self.task_kernel.init(dtype, key=key)
        # reference shrinks the factor init by 10 (BMGP.py:38-40)
        task = {**task, "covar_factor": task["covar_factor"] / 10.0}
        return {
            "data_kernel": self.data_kernel.init(dtype),
            "task_kernel": task,
            # vol_lh.noise = 1e-3 via the *working* setter (VoltronGP.py:48)
            "likelihood": self.likelihood.init_with_noise(noise, dtype),
        }

    def task_covar(self, params):
        return self.task_kernel.covar_matrix(params["task_kernel"])

    def mean(self, params, x):
        """Per-task drift ``-0.5 vol^2 x * diag(B)`` (BMGP.py:44-51)."""
        vol = self.data_kernel.vol(params["data_kernel"])
        base = -0.5 * vol**2.0 * x  # (..., N)
        diag = jnp.diagonal(self.task_covar(params), axis1=-2, axis2=-1)
        return base[..., :, None] * diag[..., None, :]

    def mll(self, params, x, y):
        """Exact multitask MLL / (N*T)."""
        k_data = self.data_kernel(params["data_kernel"], x)
        k_task = self.task_covar(params)
        noise = self.likelihood.noise(params["likelihood"])[..., 0]
        lp = kron_mvn_log_prob(y, self.mean(params, x), k_data, k_task, noise)
        return lp / (y.shape[-2] * y.shape[-1])

    def spectral_cache(self, x, y):
        """Closed-form data-side eigenbasis on an equispaced grid.

        Same DST-like ``min(x)`` eigensystem as ``BMGP.spectral_cache``
        (see there for the formulas); projects ``y`` (N, T) and ``x``
        once so :meth:`mll_spectral` needs no ``eigh`` of the N x N data
        kernel per Adam step.  BM kernel + equispaced ``x`` only (the
        grid check lives at the callers; the kernel family is guarded
        here like :meth:`sample_forecast`, since the min-kernel spectrum
        is silently wrong for FBM rather than failing).
        """
        if not isinstance(self.data_kernel, BMKernel):
            raise ValueError(
                "spectral_cache/mll_spectral require the BM data kernel; "
                "use mll for FBM"
            )
        from ..ops.brownian import min_kernel_eigenvalues, min_kernel_project

        n = x.shape[-1]
        dx = x[..., 1] - x[..., 0]
        x0 = x[..., 0]
        mu = min_kernel_eigenvalues(n, x.dtype)
        p_y = min_kernel_project(y, axis=-2)
        p_x = min_kernel_project(x)
        w = min_kernel_project(jnp.ones((n,), x.dtype))
        return {"mu": mu, "dx": dx, "x0": x0, "p_y": p_y, "p_x": p_x,
                "w": w}

    def mll_spectral(self, params, cache, n, t):
        """Exact multitask MLL / (N*T) with no factorization of the data
        kernel — and, through the IndexKernel's ``F F^T + diag(v)``
        structure, no T x T factorization either
        (:func:`volt_tpu.gp.kronecker.kron_mvn_log_prob_blockdiag_lowrank`:
        O(N T r^2 + N T^2 r) per step instead of the batched-Cholesky
        O(N T^3), which walls at the 505-ticker scale).  Pinned against
        :meth:`mll` and the dense-block form in tests."""
        from ..gp.kronecker import kron_mvn_log_prob_blockdiag_lowrank

        vol = self.data_kernel.vol(params["data_kernel"])[..., 0]
        factor, task_diag = self.task_kernel.factor_and_diag(
            params["task_kernel"]
        )
        diag_b = jnp.sum(factor * factor, axis=-1) + task_diag
        noise = self.likelihood.noise(params["likelihood"])[..., 0]
        # U^T mean = (-0.5 vol^2 p_x) outer diag(B)
        r_tilde = cache["p_y"] + (
            0.5 * vol**2.0 * cache["p_x"]
        )[..., :, None] * diag_b[..., None, :]
        ld = vol * cache["dx"] * cache["mu"]
        c = vol * (cache["x0"] - cache["dx"])
        lp = kron_mvn_log_prob_blockdiag_lowrank(r_tilde, ld, c, factor,
                                                 task_diag, noise,
                                                 cache["w"])
        return lp / (n * t)

    def posterior(self, params, train_x, train_y, test_x):
        k_tr = self.data_kernel(params["data_kernel"], train_x)
        k_cross = self.data_kernel(params["data_kernel"], train_x, test_x)
        k_te = self.data_kernel(params["data_kernel"], test_x)
        k_task = self.task_covar(params)
        noise = self.likelihood.noise(params["likelihood"])[..., 0]
        resid = train_y - self.mean(params, train_x)
        mean, cov = kron_posterior(k_tr, k_cross, k_te, k_task, resid, noise)
        return mean + self.mean(params, test_x), cov

    def sample_forecast(self, key, params, train_x, train_y, test_x,
                        sample_shape=()):
        """Joint posterior samples at strictly-future test points by
        Matheron's rule — O(S(N + M)T + N^2 T) per call, no (M T, M T)
        covariance.

        Write the posterior sample as

            ``f* = prior*(w) + K_*^T (K + s I)^{-1} (y - prior(w) - eps)``

        with one joint prior draw ``prior = mean + BM-path x Lt^T`` over
        the concatenated ``[train; test]`` grid (the BM path is a cumsum
        of scaled normals — O(N + M) per path per task) and
        ``eps ~ N(0, s I)``.  Two structural facts make this cheap:

        * the Kronecker solve diagonalizes in the ``eigh`` bases of the
          two factors — ONE N x N ``eigh`` per call (not per sample, not
          per step);
        * for strictly-future test points the BM cross-covariance is
          rank one in the data dimension (``min(x_n, x*_m) = x_n``), so
          the correction ``K_*^T alpha`` is a single ``(T,)`` vector per
          sample, broadcast across the horizon — the forecast is the
          filtered boundary state plus fresh Brownian motion, exactly as
          in the single-task ``BMGP.sample_forecast``.

        Distribution matches :meth:`posterior` /
        :meth:`MultitaskBMGPState.sample` (pinned in tests: exact mean
        via the zero-noise reduction, covariance statistically).
        """
        if not isinstance(self.data_kernel, BMKernel):
            raise ValueError(
                "sample_forecast requires the BM data kernel; use "
                "MultitaskBMGPState.sample for FBM"
            )
        vol = self.data_kernel.vol(params["data_kernel"])[..., 0]
        k_task = self.task_covar(params)
        noise = self.likelihood.noise(params["likelihood"])[..., 0]
        n = train_x.shape[-1]
        m = test_x.shape[-1]
        t = self.num_tasks
        dtype = train_y.dtype

        lt_root = psd_safe_cholesky(k_task)
        joint_x = jnp.concatenate([train_x, test_x], axis=-1)
        dx = jnp.diff(joint_x, axis=-1,
                      prepend=jnp.zeros_like(joint_x[..., :1]))
        sd = jnp.sqrt(jnp.maximum(vol * dx, 0.0))  # (N+M,)

        k0, k1 = jax.random.split(key)
        shape = (*tuple(sample_shape), n + m, t)
        z = jax.random.normal(k0, shape, dtype)
        b = jnp.cumsum(sd[..., :, None] * z, axis=-2)   # BM paths per task col
        w_paths = _mm(b, jnp.swapaxes(lt_root, -1, -2))  # cov: vol·min (x) Kt
        eps = jnp.sqrt(noise) * jax.random.normal(
            k1, (*tuple(sample_shape), n, t), dtype
        )

        mean_train = self.mean(params, train_x)
        mean_test = self.mean(params, test_x)
        u = (train_y - mean_train) - w_paths[..., :n, :] - eps

        # Kronecker solve in the factor eigenbases (one eigh per call).
        lam, qd = jnp.linalg.eigh(
            jnp.minimum(train_x[..., :, None], train_x[..., None, :])
        )
        ld = vol * jnp.maximum(lam, 0.0)
        lt, qt = jnp.linalg.eigh(k_task)
        lt = jnp.maximum(lt, 0.0)
        denom = ld[..., :, None] * lt[..., None, :] + noise
        rot = _mm(jnp.swapaxes(qd, -1, -2), _mm(u, qt)) / denom

        # rank-one cross block: correction = vol * (x^T alpha) Kt per sample,
        # constant across the horizon; contract in the eigenbases.
        xr = jnp.einsum("...nk,...n->...k", qd, train_x, precision=_HIGHEST)
        xa_tilde = jnp.einsum("...k,...kt->...t", xr, rot,
                              precision=_HIGHEST)
        xa = jnp.einsum("...t,...at->...a", xa_tilde, qt,
                        precision=_HIGHEST)
        corr = vol * jnp.einsum("...t,...ta->...a", xa, k_task,
                                precision=_HIGHEST)  # (..., T)

        # strictly-future contract guard: the rank-one cross block above
        # assumed min(x_n, x*_m) = x_n, which is simply false on an
        # overlapping/interpolating grid — the result would be finite but
        # wrong.  NaN-poison instead (ops.brownian.future_grid_ok).
        from ..ops.brownian import future_grid_ok, nan_poison

        ok = future_grid_ok(test_x, train_x)
        return nan_poison(
            mean_test + w_paths[..., n:, :] + corr[..., None, :],
            ok[..., None, None],
        )

    def fit_state(self, params, train_x, train_y) -> MultitaskBMGPState:
        return MultitaskBMGPState(module=self, params=params, train_x=train_x,
                                  train_y=train_y)


class MultitaskVariationalGP(ConfigEq):
    """Kronecker-structured variational GP (multitask GPCV engine).

    Variational family ``q(vec(U)) = N(vec(M), Sx (x) St)`` with explicit
    lower-triangular roots; inducing points fixed at the train inputs.

    ``q`` selects the data-factor family:

    * ``"full"`` — explicit ``N x N`` lower-triangular root, the
      reference's parameterization (``multi_task_variational_gp.py:15-30``).
    * ``"tridiag"`` — tridiagonal-*precision* ``Sx`` (bidiagonal Cholesky
      ``(q_d, q_e)``, O(n) parameters).  The BM data prior's precision is
      tridiagonal, so the per-factor ELBO optimum lives in this family —
      the same TPU-native replacement the single-task GPCV uses
      (``models/gpcv.py``, ``ops/bidiag.py``); it removes the last O(n^2)
      parameter object (and its Adam traffic) from the multitask path.
      The ``T x T`` task root stays dense (tiny).  BM kernel only.
    """

    def __init__(self, num_tasks: int, rank: int = 1, kernel: str = "bm",
                 q: str = "full"):
        if q not in ("full", "tridiag"):
            raise ValueError("q must be 'full' or 'tridiag'")
        if q == "tridiag" and kernel != "bm":
            raise ValueError("q='tridiag' requires the BM kernel")
        self.num_tasks = num_tasks
        self.data_kernel = BMKernel() if kernel == "bm" else FBMKernel()
        self.index_kernel = IndexKernel(num_tasks=num_tasks, rank=rank)
        self.q = q

    def init(self, train_x, dtype=jnp.float32, key=None):
        if key is None:
            key = jax.random.key(0)
        k1, k2 = jax.random.split(key)
        n = train_x.shape[-1]
        t = self.num_tasks
        params = {
            "data_kernel": self.data_kernel.init(dtype),
            "index_kernel": self.index_kernel.init(dtype, key=k1),
            "mean_constants": jnp.zeros((t,), dtype),
            "variational_mean": 0.01 * jax.random.normal(k2, (n, t), dtype),
            "variational_task_covar_root": jnp.eye(t, dtype=dtype),
        }
        if self.q == "tridiag":
            # identity precision: d = 1, e = 0
            params["q_log_d"] = jnp.zeros((n,), dtype)
            params["q_e"] = jnp.zeros((n - 1,), dtype)
        else:
            params["variational_covar_root"] = jnp.eye(n, dtype=dtype)
        return params

    def _q_chol(self, params):
        """Bidiagonal precision-Cholesky ``(d, e)`` of the tridiag ``Sx``."""
        return jnp.exp(params["q_log_d"]), params["q_e"]

    def initialize_variational_parameters(self, params, likelihood,
                                          lik_params, x, y):
        """Laplace-style init (reference
        ``multi_task_variational_gp.py:38-91``): per-task running-std
        latent, task-averaged inverse Hessian,
        ``S_root = chol(Kuu) inner^{-1/2} * 10``.

        For the exp likelihood this is the reference's closed-form
        inverse Hessian; for cv the latent comes from inverting the
        softplus-mixture scale and the curvature from the exact autodiff
        Hessian (same fix-by-design as the single-task init,
        ``models/gpcv.py:_cv_laplace_pieces``)."""
        from ..gp.variational import running_std_latent_init

        if getattr(likelihood, "param", "exp") == "cv":
            _, rs = running_std_latent_init(y.T)          # (T, N)
            f = likelihood.latent_from_scale(lik_params, rs).T  # (N, T)
            inv_hess = likelihood.laplace_inv_hessian(
                lik_params, y.T, f.T
            )                                             # (T, N)
        else:
            f, rs = running_std_latent_init(y.T)  # per task: (T, N)
            f = f.T  # (N, T)
            from ..gp.variational import exp_laplace_inv_hessian

            inv_hess = exp_laplace_inv_hessian(y.T, f.T)  # (T, N)
        mean_inv_hess = jnp.mean(inv_hess, axis=0)  # task-averaged diagonal

        if self.q == "tridiag":
            # Laplace precision K^{-1}/vol + diag(curvature) — directly in
            # the family, no root inflation (same measured precedent as
            # the single-task init, models/gpcv.py:_init_tridiag).  The
            # exp branch's dense 1e-4 clamp-after-diag_embed quirk (full
            # family below) is not representable in a tridiagonal
            # precision; its effect is an O(1e-4) init perturbation only.
            from ..ops.bidiag import bidiag_chol_from_tridiag, min_precision

            vol = self.data_kernel.vol(params["data_kernel"])[..., 0]
            a_diag, a_off, _ = min_precision(x, 1e-6 / vol)
            d, e = bidiag_chol_from_tridiag(a_diag / vol + mean_inv_hess,
                                            a_off / vol)
            mean_rs = jnp.mean(jnp.clip(rs, min=1e-4), axis=-1)  # (T,)
            if getattr(likelihood, "param", "exp") == "cv":
                log_means = likelihood.latent_from_scale(lik_params, mean_rs)
            else:
                log_means = jnp.log(mean_rs)
            index = {
                **params["index_kernel"],
                "covar_factor": params["index_kernel"]["covar_factor"] / 10.0,
            }
            return {
                **params,
                "index_kernel": index,
                "mean_constants": params["mean_constants"] + log_means,
                "variational_mean": f,
                "q_log_d": jnp.log(d),
                "q_e": e,
            }

        # init runs eagerly (no jit DCE): build the dense Gram only when
        # no structure-aware factor covers it.
        chol = self._data_chol(params, x)
        if chol is None:
            chol = psd_safe_cholesky(self.data_kernel(params["data_kernel"],
                                                      x))
        if getattr(likelihood, "param", "exp") == "cv":
            inner = _mm(
                jnp.swapaxes(chol, -1, -2) * mean_inv_hess[None, :], chol
            )
        else:
            # Reference parity quirk (multi_task_variational_gp.py:54-57):
            # the exp branch clamps AFTER diag_embed, so every per-task
            # diagonal matrix gets its off-diagonal ZEROS raised to 1e-4
            # and the task-averaged inverse Hessian is the dense
            # ``diag(mean) + 1e-4 (11^T - I)``, not a diagonal.  (The cv
            # branch above has no clamp in the reference — diag only.)
            n_pts = mean_inv_hess.shape[-1]
            m = jnp.full((n_pts, n_pts), 1e-4, mean_inv_hess.dtype)
            m = m + jnp.diag(mean_inv_hess - 1e-4)
            inner = _mm(jnp.swapaxes(chol, -1, -2), _mm(m, chol))
        inner = inner + jnp.eye(inner.shape[-1], dtype=inner.dtype)
        # inner^{-1/2} via its Cholesky: inner = C C^T  =>  root = L C^{-T}.
        # Deliberate root-choice deviation: the reference takes
        # ``root_inv_decomposition().root`` (an eigh-based symmetric
        # root, multi_task_variational_gp.py:78); both are exact roots of
        # inner^{-1}, but consumers ``tril`` the variational root, so the
        # trilled starting points differ between the two choices (and
        # from the un-trilled Laplace covariance) — an optimizer init
        # detail, not a model-semantics one.
        c = psd_safe_cholesky(inner)
        inner_inv_root = jnp.linalg.solve(
            jnp.swapaxes(c, -1, -2), jnp.eye(c.shape[-1], dtype=c.dtype)
        )
        s_root = _mm(chol, inner_inv_root) * 10.0

        mean_rs = jnp.mean(jnp.clip(rs, min=1e-4), axis=-1)  # (T,)
        if getattr(likelihood, "param", "exp") == "cv":
            log_means = likelihood.latent_from_scale(lik_params, mean_rs)
        else:
            log_means = jnp.log(mean_rs)
        index = {
            **params["index_kernel"],
            "covar_factor": params["index_kernel"]["covar_factor"] / 10.0,
        }
        return {
            **params,
            "index_kernel": index,
            "mean_constants": params["mean_constants"] + log_means,
            "variational_mean": f,
            "variational_covar_root": s_root,
        }

    def prior_mean(self, params, x):
        n = x.shape[-1]
        return jnp.broadcast_to(params["mean_constants"],
                                (n, self.num_tasks))

    def _data_chol(self, params, x):
        """Structure-aware data-prior Cholesky (FBM increment-domain
        factor, ``ops/fbm.py``) or ``None`` for the default ladder."""
        if isinstance(self.data_kernel, FBMKernel):
            return self.data_kernel.prior_cholesky(params["data_kernel"], x)
        return None

    def kl_divergence(self, params, x):
        """KL(q || p) with both sides Kronecker (reference ``:95-111``).

        BM data prior: the analytic diff-and-scale Cholesky replaces the
        per-step N x N factorization (``kron_kl_bm_prior``, matching
        ``kron_kl`` to float precision — pinned in tests)."""
        k_task = self.index_kernel.covar_matrix(params["index_kernel"])
        if self.q == "tridiag":
            from ..gp.kronecker import kron_kl_bm_prior_tridiag

            d, e = self._q_chol(params)
            return kron_kl_bm_prior_tridiag(
                params["variational_mean"], d, e,
                params["variational_task_covar_root"],
                self.prior_mean(params, x), x,
                self.data_kernel.vol(params["data_kernel"]), k_task,
            )
        if isinstance(self.data_kernel, BMKernel):
            from ..gp.kronecker import kron_kl_bm_prior

            return kron_kl_bm_prior(
                params["variational_mean"],
                params["variational_covar_root"],
                params["variational_task_covar_root"],
                self.prior_mean(params, x),
                x,
                self.data_kernel.vol(params["data_kernel"]),
                k_task,
            )
        kuu = self.data_kernel(params["data_kernel"], x)
        return kron_kl(
            params["variational_mean"],
            params["variational_covar_root"],
            params["variational_task_covar_root"],
            self.prior_mean(params, x),
            kuu,
            k_task,
            chol_data=self._data_chol(params, x),
        )

    def marginal_variances(self, params):
        """diag(Sx (x) St) at the inducing points: outer(diag Sx, diag St)."""
        rt = jnp.tril(params["variational_task_covar_root"])
        dt = jnp.sum(rt * rt, axis=-1)
        if self.q == "tridiag":
            from ..ops.bidiag import takahashi_band

            dx = takahashi_band(*self._q_chol(params))[0]
        else:
            rx = jnp.tril(params["variational_covar_root"])
            dx = jnp.sum(rx * rx, axis=-1)
        return dx[..., :, None] * dt[..., None, :]

    def elbo(self, params, x, y, likelihood, lik_params, num_locs: int = 75):
        """GH-quadrature ELBO at inducing == train (exp/cv likelihood)."""
        mean = params["variational_mean"]
        var = self.marginal_variances(params)
        ell = likelihood.expected_log_prob(lik_params, y, mean, var,
                                           num_locs=num_locs)
        n_total = y.shape[-2] * y.shape[-1]
        return jnp.mean(ell, axis=(-2, -1)) - self.kl_divergence(
            params, x
        ) / n_total

    def predict(self, params, train_x, test_x):
        """Unwhitened Kronecker predictive (reference ``:113-145``).

        Returns ``(mean (M, T), cov (M*T, M*T))`` assembled from the two
        Kronecker terms ``(Kxx - Q) (x) B + (A S A^T) (x) St``.
        """
        kuu = self.data_kernel(params["data_kernel"], train_x)
        kux = self.data_kernel(params["data_kernel"], train_x, test_x)
        kxx = self.data_kernel(params["data_kernel"], test_x)
        b = self.index_kernel.covar_matrix(params["index_kernel"])

        chol = self._data_chol(params, train_x)
        if chol is None:
            chol = psd_safe_cholesky(kuu)
        kuu_inv_kux = cholesky_solve(chol, kux)  # (N, M)
        inner_mean = params["variational_mean"] - self.prior_mean(
            params, train_x
        )
        mean = _mm(jnp.swapaxes(kuu_inv_kux, -1, -2), inner_mean)
        mean = mean + jnp.broadcast_to(
            params["mean_constants"], mean.shape
        )

        data_onto = _mm(jnp.swapaxes(kux, -1, -2), kuu_inv_kux)
        first = kxx - data_onto  # (M, M)

        rt = jnp.tril(params["variational_task_covar_root"])
        if self.q == "tridiag":
            # A^T Sx A with Sx = (Lx Lx^T)^{-1}: one bidiagonal solve per
            # column — rows of half are (Lx^{-1} a_col)^T, O(n M).
            from ..ops.bidiag import bidiag_solve_lower

            d, e = self._q_chol(params)
            bt = jnp.swapaxes(kuu_inv_kux, -1, -2)  # (M, N)
            half = bidiag_solve_lower(
                jnp.broadcast_to(d[..., None, :], bt.shape),
                jnp.broadcast_to(e[..., None, :],
                                 (*bt.shape[:-1], bt.shape[-1] - 1)),
                bt,
            )
        else:
            rx = jnp.tril(params["variational_covar_root"])
            half = _mm(jnp.swapaxes(kuu_inv_kux, -1, -2), rx)  # (M, N)
        third = _mm(half, jnp.swapaxes(half, -1, -2))  # A Sx A^T
        st = _mm(rt, jnp.swapaxes(rt, -1, -2))

        m = test_x.shape[-1]
        t = self.num_tasks
        cov = (
            jnp.einsum("...ij,...ab->...iajb", first, b,
                       precision=_HIGHEST)
            + jnp.einsum("...ij,...ab->...iajb", third, st,
                         precision=_HIGHEST)
        ).reshape(*first.shape[:-2], m * t, m * t)
        return mean, cov

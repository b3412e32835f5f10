"""Training entry points — the five pipelines of ``train_utils.py``.

Every fit is an ``optax.adam`` loop rolled into a single jitted
``lax.scan`` (one XLA program per fit, zero host round-trips); hyper-
parameters (learning rates, iteration counts, noise inits, which parameters
train) follow the reference exactly:

* ``learn_gpcv``       — Adam(0.01) on the 75-node GH variational ELBO
                         (reference ``train_utils.py:15-67``)
* ``train_vol_model``  — Adam(0.01) on the exact MLL of the BM vol GP
                         (``train_utils.py:69-95``)
* ``train_data_model`` — Adam(0.1) on the Volt exact MLL, log-linear mean
                         (``train_utils.py:98-144``)
* ``train_volt_magpie``— Adam(0.1), mean selected by name
                         (``train_utils.py:192-257``)
* ``train_basic_model``— Adam(0.1), Matérn / spectral-mixture baselines
                         (``train_utils.py:146-189``)

The reference freezes parameters positionally (``grad_flags``,
``train_utils.py:111-114`` — a documented fragility).  Here freezing is
structural: each loss simply closes over the frozen state (the vol path and
vol-GP parameters are data to the price-model loss), so there is nothing to
mask.

TPU fast paths: no training stage pays a per-iteration factorization.
The GPCV KL uses the Brownian prior's closed-form bidiagonal inverse
(O(n^2)/step, zero factorizations); the vol GP re-uses one eigh of the
fixed min(x) grid matrix (O(n^2)/step); the Volt data model exploits the
min-kernel's *tridiagonal precision* — logdet and solves through
associative scans at O(n) work per MLL+grad step (``ops/tridiag.py``).
For EWMA-family means the whole mean vector is also hoisted out of the
loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax


from .kernels import SpectralMixtureKernel
from .ops.tridiag import brownian_noise_mll_kalman
from .models.basic import BasicGP, MaternGP, SMGP, BasicGPState
from .models.bmgp import BMGP, BMGPState
from .models.gpcv import GPCVModel, GPCVState
from .models.volt import VoltGP, VoltState, make_mean
from .means import LogLinearMean

__all__ = [
    "learn_gpcv",
    "learn_gpcv_sparse",
    "learn_gpcv_multitask",
    "train_vol_model",
    "train_data_model",
    "train_volt_magpie",
    "train_basic_model",
    "train_volt_multitask",
    "scaled_returns",
    # reference-style aliases
    "LearnGPCV",
    "TrainVolModel",
    "TrainDataModel",
    "TrainVoltMagpieModel",
    "TrainBasicModel",
]


def scaled_returns(train_x, train_y):
    """``(y[t+1] - y[t]) / y[t] / sqrt(dt)`` (reference ``train_utils.py:16-17``).

    ``train_y`` holds prices on a grid one point longer than ``train_x``.
    """
    train_x = jnp.asarray(train_x)
    train_y = jnp.asarray(train_y)
    if train_y.shape[-1] != train_x.shape[-1] + 1:
        raise ValueError(
            f"expected len(train_y) == len(train_x) + 1 (prices vs. return "
            f"grid), got {train_y.shape[-1]} vs {train_x.shape[-1]}"
        )
    dt = train_x[..., 1] - train_x[..., 0]
    diffs = train_y[..., 1:] - train_y[..., :-1]
    return diffs / train_y[..., :-1] / jnp.sqrt(dt)[..., None]


def _adam_scan(loss_fn, params, train_iters: int, lr: float):
    opt = optax.adam(lr)

    def step(carry, _):
        p, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = opt.update(grads, opt_state)
        p = optax.apply_updates(p, updates)
        return (p, opt_state), loss

    (params, _), losses = lax.scan(
        step, (params, opt.init(params)), None, length=train_iters
    )
    return params, losses


# ---------------------------------------------------------------------------
# Stage 1: GPCV
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("module", "train_iters", "lr", "opt"))
def _fit_gpcv(module: GPCVModel, params, train_x, yy, train_iters, lr,
              opt: str = "adam"):
    if opt == "ngvi":
        from .gp.natural import ngvi_tridiag_fit

        return ngvi_tridiag_fit(module, params, train_x, yy, train_iters, lr)
    return _adam_scan(
        lambda p: -module.elbo(p, train_x, yy), params, train_iters, lr
    )


def learn_gpcv(train_x, train_y, train_iters: int = 1000, printing: bool = False,
               kernel: str = "bm", lr: float = 0.01, return_model: bool = False,
               key=None, mc_scale_samples=None, q: str | None = None,
               param: str = "exp", opt: str | None = None):
    """Infer the volatility path from prices.  Returns ``pred_scale``
    (and the fitted :class:`GPCVState` when ``return_model=True`` — the
    reference's ``return_model`` call site was broken; fixed by design,
    SURVEY.md preamble).

    ``q`` selects the variational family: ``"tridiag"`` (the default for
    the BM kernel, matching the batched pipeline) is the O(n)
    tridiagonal-precision family — it contains the dense family's
    optimum exactly, trains 4-5x faster at n~1000, and does not share
    the full-rank init's divergence on edge assets (PERFORMANCE.md);
    ``q="full"`` keeps the reference's dense n x n variational
    covariance for strict trajectory parity.  FBM requires ``"full"``
    (no Markov prior).

    ``param`` selects the likelihood parameterization (``"exp"`` — the
    reference pipelines' choice, ``train_utils.py:20`` — or ``"cv"``,
    the Wilson-Ghahramani copula form with its exact-Hessian Laplace
    init, ``models/gpcv.py``).

    ``opt`` selects the optimizer: ``"ngvi"`` (the default for the
    tridiag family) runs natural-gradient VI on the variational state
    with per-iteration Adam on the hyperparameters — it reaches the
    family optimum in tens of iterations independent of n, where plain
    Adam needs thousands at n~2000 (:mod:`volt_tpu.gp.natural`);
    ``"adam"`` is the reference's single-Adam loop
    (``train_utils.py:40``), the only choice for ``q="full"``.
    """
    if q is None:
        q = "tridiag" if kernel == "bm" else "full"
    if opt is None:
        opt = "ngvi" if q == "tridiag" else "adam"
    if opt == "ngvi" and q != "tridiag":
        raise ValueError("opt='ngvi' requires the tridiag family")
    train_x = jnp.asarray(train_x)
    yy = scaled_returns(train_x, train_y)
    module = GPCVModel(kernel=kernel, q=q, param=param)
    params = module.init(train_x, yy, key=key)
    params, losses = _fit_gpcv(module, params, train_x, yy, train_iters, lr,
                               opt)
    if printing:
        for i in range(0, train_iters, 50):
            print(f"Iter {i + 1}/{train_iters} - Loss: {float(losses[i]):.3f}")
    state = GPCVState(module=module, params=params, train_x=train_x,
                      targets=yy)
    pred_scale = state.predicted_scale(mc_samples=mc_scale_samples, key=key)
    if return_model:
        return pred_scale, state
    return pred_scale


@partial(jax.jit, static_argnames=("module", "train_iters", "lr"))
def _fit_gpcv_sparse(module: GPCVModel, params, train_x, inducing_x, yy,
                     train_iters, lr):
    return _adam_scan(
        lambda p: -module.elbo_sparse(p, train_x, inducing_x, yy),
        params, train_iters, lr,
    )


def learn_gpcv_sparse(train_x, train_y, num_inducing: int = 256,
                      train_iters: int = 1000, kernel: str = "bm",
                      lr: float = 0.01, return_model: bool = False,
                      key=None):
    """Sparse-GPCV volatility inference for long series.

    The reference's exact-GP machinery caps n at ~2000; with m inducing
    points this stage is O(n m^2) per step and the rest of the pipeline is
    already O(n)-capable, so series of 10^4-10^5 points fit end-to-end.
    Returns the predicted scale on the full train grid.
    """
    train_x = jnp.asarray(train_x)
    yy = scaled_returns(train_x, train_y)
    n = train_x.shape[-1]
    m = min(num_inducing, n)
    idx = jnp.asarray(
        np.unique(np.round(np.linspace(0, n - 1, m)).astype(np.int64))
    )
    inducing_x = train_x[..., idx]
    module = GPCVModel(kernel=kernel)
    params = module.init_sparse(train_x, inducing_x, yy, key=key)
    params, _ = _fit_gpcv_sparse(module, params, train_x, inducing_x, yy,
                                 train_iters, lr)
    mean, var = module.latent_marginals(params, inducing_x, train_x)
    pred_scale = module.likelihood.expected_scale(
        params["likelihood"], mean, jnp.maximum(var, 1e-8)
    )
    if return_model:
        # full grid + inducing grid kept distinct: the state's methods
        # predict from the inducing posterior onto train_x, matching the
        # pred_scale returned here (same grid, same values)
        state = GPCVState(module=module, params=params, train_x=train_x,
                          targets=yy, inducing_x=inducing_x)
        return pred_scale, state
    return pred_scale


def learn_gpcv_multitask(train_x, train_ys, train_iters: int = 1000,
                         rank: int = 1, lr: float = 0.01,
                         num_locs: int = 75, return_model: bool = False,
                         key=None, param: str = "exp", q: str = "full"):
    """Kronecker multitask GPCV: one variational vol model coupling T
    assets/stations (reference ``models/multi_task_variational_gp.py``,
    which ships without a training driver — provided here).

    ``train_ys``: ``(T, n+1)`` prices.  Returns per-task predicted scales
    ``(T, n)``.  ``param`` selects the likelihood parameterization
    (``"cv"`` trains the K=5 mixture parameters jointly with the
    variational state and uses its exact-Hessian Laplace init).  ``q``
    selects the data-factor variational family (``"tridiag"`` = O(n)
    tridiagonal-precision parameters instead of the reference's N x N
    root; see :class:`volt_tpu.models.multitask.MultitaskVariationalGP`).
    """
    from .likelihoods import VolatilityGaussianLikelihood
    from .models.multitask import MultitaskVariationalGP

    train_x = jnp.asarray(train_x)
    train_ys = jnp.asarray(train_ys)
    num_tasks = train_ys.shape[0]
    yy = scaled_returns(train_x, train_ys).T  # (n, T)

    lik = VolatilityGaussianLikelihood(param=param)
    lik_params = lik.init(key=key if key is not None else jax.random.key(0))
    module = MultitaskVariationalGP(num_tasks=num_tasks, rank=rank, q=q)
    params = module.init(train_x, key=key)
    params = module.initialize_variational_parameters(params, lik,
                                                      lik_params,
                                                      train_x, yy)

    @partial(jax.jit, static_argnames=())
    def fit(p):
        return _adam_scan(
            lambda q: -module.elbo(q["model"], train_x, yy, lik, q["lik"],
                                   num_locs=num_locs),
            p, train_iters, lr,
        )

    packed, losses = fit({"model": params, "lik": lik_params})
    params, lik_params = packed["model"], packed["lik"]
    mean = params["variational_mean"]          # (n, T)
    var = module.marginal_variances(params)    # (n, T)
    pred_scale = lik.expected_scale(lik_params, mean, var).T  # (T, n)
    if return_model:
        return pred_scale, (module, params)
    return pred_scale


# ---------------------------------------------------------------------------
# Stage 2: vol GP
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("module", "train_iters", "lr",
                                   "equispaced"))
def _fit_bmgp(module: BMGP, params, train_x, log_vol, train_iters, lr,
              equispaced: bool = False):
    from .kernels import BMKernel

    if isinstance(module.kernel, BMKernel):
        if equispaced:
            # closed-form min(x) eigensystem: the whole fit performs two
            # basis projections, then every MLL+grad step is elementwise
            # O(n) with no sequential scan (models/bmgp.py).
            cache = module.spectral_cache(train_x, log_vol)
            loss = lambda p: -module.mll_spectral(p, cache)
        else:
            # O(n) Kalman-filter MLL per Adam step; no factorization.
            loss = lambda p: -module.mll_kalman(p, train_x, log_vol)
    else:
        loss = lambda p: -module.mll(p, train_x, log_vol)
    return _adam_scan(loss, params, train_iters, lr)


def _is_equispaced(x) -> bool:
    """Host-side check (concrete arrays only) for a uniform grid.

    Tolerance: ``max(1e-3 relative, 4 eps_f32 max|x|)`` — a conceptually
    uniform ``arange(n) * dt`` grid stored in float32 accumulates
    rounding in its diffs that grows with ``|x|`` (up to ``~2 eps |x|``
    per endpoint), and must still qualify at any n; a grid whose spacing
    genuinely wobbles at the ~1% level (lightly irregular real
    timestamps) must NOT be silently modeled as exactly uniform — it
    gets the Kalman MLL, which is exact on any grid.  Degenerate grids
    (< 3 points) also route to Kalman: the spectral cache's ``dx``
    gather is ill-defined at n=1.
    """
    import numpy as np

    try:
        xv = np.asarray(x)
    except Exception:
        return False
    if xv.ndim != 1 or xv.shape[0] < 3:
        return False
    d = np.diff(np.asarray(xv, np.float64))
    med = float(np.median(d))
    tol = max(
        1e-3 * abs(med),
        4.0 * float(np.finfo(np.float32).eps) * float(np.max(np.abs(xv))),
    )
    return bool(np.all(np.abs(d - med) <= tol))


def train_vol_model(train_x, vol_path, train_iters: int = 1000,
                    printing: bool = False, kernel: str = "bm",
                    lr: float = 0.01,
                    vol_mll: str | None = None) -> BMGPState:
    """Fit the exact BM GP to ``log(vol_path)``.

    ``vol_mll`` overrides the MLL-path auto-selection: ``"spectral"``
    forces the closed-form equispaced eigensystem (caller asserts the
    grid is uniform), ``"kalman"`` forces the any-grid O(n) filter,
    ``None`` auto-selects (spectral iff the grid checks equispaced —
    valid at any ``n``: past the materialized basis' bound the cache
    projects via FFT, ``ops/brownian.min_kernel_project``).
    """
    train_x = jnp.asarray(train_x)
    log_vol = jnp.log(jnp.asarray(vol_path))
    module = BMGP(kernel=kernel)
    params = module.init()
    if vol_mll is None:
        # equispaced is the only gate: past the materialized basis'
        # int32 bound the spectral cache projects via FFT (any n).
        spectral = _is_equispaced(train_x)
    elif vol_mll == "spectral":
        spectral = True
    elif vol_mll == "kalman":
        spectral = False
    else:
        raise ValueError("vol_mll must be None, 'spectral' or 'kalman'")
    params, losses = _fit_bmgp(module, params, train_x, log_vol, train_iters,
                               lr, equispaced=spectral)
    if printing:
        for i in range(0, train_iters, 50):
            print(f"Iter {i + 1}/{train_iters} - Loss: {float(losses[i]):.3f}")
    return module.fit_state(params, train_x, log_vol)


# ---------------------------------------------------------------------------
# Stage 3: Volt data model
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("module", "train_iters", "lr"))
def _fit_volt(module: VoltGP, params, train_x, log_y, vol_path, train_iters,
              lr):
    # The Volt covariance is a min-kernel with a frozen vol path — a
    # random-walk-plus-noise state-space model — so every MLL+grad step is
    # an O(n) Kalman-filter scan: no eigendecomposition, no Cholesky, ever,
    # and all-positive recursions (ops/tridiag.py; the reference pays a
    # dense factorization per Adam step, SURVEY.md §3.2).
    v = module.kernel.integral(train_x, vol_path)
    if module.mean.is_history_dependent:
        # mean vector is independent of trainable params: hoist it.
        mean_vec = module.train_mean(params, train_x, log_y)

        def loss(p):
            noise = module.likelihood.noise(p["likelihood"])[..., 0]
            return -brownian_noise_mll_kalman(v, noise, log_y - mean_vec)

    else:
        def loss(p):
            noise = module.likelihood.noise(p["likelihood"])[..., 0]
            mean_vec = module.train_mean(p, train_x, log_y)
            return -brownian_noise_mll_kalman(v, noise, log_y - mean_vec)

    return _adam_scan(loss, params, train_iters, lr)


def _fit_volt_state(module, train_x, train_y_log, vol_path, vol_state,
                    train_iters, lr, printing, init_mean_from_data=False,
                    key=None):
    params = module.init(key=key)
    if init_mean_from_data and isinstance(module.mean, LogLinearMean):
        params["mean"] = module.mean.initialize_from_data(
            params["mean"], train_x, train_y_log
        )
    params, losses = _fit_volt(module, params, train_x, train_y_log, vol_path,
                               train_iters, lr)
    if printing:
        for i in range(0, train_iters, 50):
            print(f"Iter {i + 1}/{train_iters} - Loss: {float(losses[i]):.3f}")
    return module.fit_state(params, train_x, train_y_log, vol_path, vol_state)


def train_data_model(train_x, train_y, vol_state: BMGPState, vol_path,
                     train_iters: int = 1000, printing: bool = False,
                     lr: float = 0.1, key=None) -> VoltState:
    """Volt with a log-linear mean initialized from the data
    (reference ``train_utils.py:98-144``; ``train_y`` holds prices)."""
    train_x = jnp.asarray(train_x)
    log_y = jnp.log(jnp.asarray(train_y))
    module = VoltGP(mean=LogLinearMean(1))
    return _fit_volt_state(module, train_x, log_y, jnp.asarray(vol_path),
                           vol_state, train_iters, lr, printing,
                           init_mean_from_data=True, key=key)


def train_volt_magpie(train_x, train_y, vol_state: BMGPState, vol_path,
                      train_iters: int = 1000, printing: bool = False,
                      k: int = 25, theta: float = 0.5,
                      mean_func: str = "ewma", lr: float = 0.1,
                      key=None,
                      integral_rule: str = "reference") -> VoltState:
    """Volt with a mean selected by name (reference
    ``train_utils.py:192-257``; ``train_y`` holds prices, already sliced to
    the return grid by the caller as in the reference call sites).

    ``integral_rule`` selects the vol-integral quadrature
    (:class:`~volt_tpu.kernels.VolatilityKernel`): ``"reference"`` keeps
    the CumTrapz endpoint quirk, ``"trapezoid"`` the exact rule.
    """
    train_x = jnp.asarray(train_x)
    log_y = jnp.log(jnp.asarray(train_y))
    module = VoltGP(mean=make_mean(mean_func, k=k, theta=theta),
                    integral_rule=integral_rule)
    return _fit_volt_state(module, train_x, log_y, jnp.asarray(vol_path),
                           vol_state, train_iters, lr, printing,
                           init_mean_from_data=(mean_func == "loglinear"),
                           key=key)


# ---------------------------------------------------------------------------
# Baselines
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("module", "train_iters", "lr"))
def _fit_basic(module: BasicGP, params, train_x, log_y, train_iters, lr):
    return _adam_scan(
        lambda p: -module.mll(p, train_x, log_y), params, train_iters, lr
    )


def train_basic_model(train_x, train_y, train_iters: int = 1000,
                      printing: bool = False, model_type: str = "matern",
                      num_mixtures: int = 10, mean_func: str = "loglinear",
                      lr: float = 0.1, key=None) -> BasicGPState:
    """Matérn / spectral-mixture baselines on log prices."""
    train_x = jnp.asarray(train_x)
    log_y = jnp.log(jnp.asarray(train_y))
    mean = LogLinearMean(1) if mean_func == "loglinear" else None
    module = MaternGP(mean) if model_type == "matern" else SMGP(num_mixtures,
                                                               mean)
    params = module.init(key=key)
    if isinstance(module.kernel, SpectralMixtureKernel):
        params["kernel"] = module.kernel.initialize_from_data(
            params["kernel"], train_x, log_y, key=key
        )
    if mean_func == "loglinear":
        params["mean"] = module.mean.initialize_from_data(
            params["mean"], train_x, log_y
        )
    params["likelihood"] = module.likelihood.init(raw_noise_init=1e-5)
    params, losses = _fit_basic(module, params, train_x, log_y, train_iters,
                                lr)
    if printing:
        for i in range(0, train_iters, 50):
            print(f"Iter {i + 1}/{train_iters} - Loss: {float(losses[i]):.3f}")
    return module.fit_state(params, train_x, log_y)


# Reference-style aliases
LearnGPCV = learn_gpcv
TrainVolModel = train_vol_model
TrainDataModel = train_data_model
TrainVoltMagpieModel = train_volt_magpie
TrainBasicModel = train_basic_model


# ---------------------------------------------------------------------------
# Correlated multi-asset Volt (the reference's batched VoltronGP path)
# ---------------------------------------------------------------------------


def train_volt_multitask(train_x, train_ys, vol_paths, train_iters: int = 400,
                         vol_iters: int = 400, k: int = 25,
                         theta: float = 0.5, mean_func: str = "ewma",
                         lr: float = 0.1, vol_lr: float = 0.01,
                         rank: int = 1, printing: bool = False, key=None):
    """Batched price GPs + a Kronecker multitask vol GP.

    The reference's batched ``VoltronGP`` keeps per-asset exact price GPs
    (conditionally independent given their vol paths) and couples assets
    through a ``MultitaskBMGP`` over the log-vol paths
    (``VoltronGP.py:43-50``).  Returns ``(volt_state, mt_vol_state)`` where
    ``volt_state`` carries leading task dims on every array.

    ``train_ys``: ``(T, n)`` prices on the return grid; ``vol_paths``:
    ``(T, n)``.
    """
    from .models.multitask import MultitaskBMGP

    train_x = jnp.asarray(train_x)
    train_ys = jnp.asarray(train_ys)
    vol_paths = jnp.asarray(vol_paths)
    num_tasks = train_ys.shape[0]
    log_ys = jnp.log(train_ys)

    module = VoltGP(mean=make_mean(mean_func, k=k, theta=theta))

    def fit_one(log_y, vol):
        params, losses = _fit_volt(module, module.init(), train_x, log_y,
                                   vol, train_iters, lr)
        return params, losses

    params_b, losses_b = jax.vmap(fit_one)(log_ys, vol_paths)
    if printing:
        print("data-model final losses:",
              np.asarray(losses_b[:, -1]) if train_iters else "(no iters)")

    mt = MultitaskBMGP(num_tasks=num_tasks, rank=rank)
    log_vols_nt = jnp.log(vol_paths).T  # (n, T)
    n = log_vols_nt.shape[-2]
    if _is_equispaced(train_x):
        # factorization-free: closed-form data spectrum + T x T blocks
        # (models/multitask.py mll_spectral) instead of an N x N eigh
        # per Adam step.
        def _mt_fit(p):
            cache = mt.spectral_cache(train_x, log_vols_nt)
            return _adam_scan(
                lambda q: -mt.mll_spectral(q, cache, n, num_tasks),
                p, vol_iters, vol_lr,
            )
    else:
        def _mt_fit(p):
            return _adam_scan(
                lambda q: -mt.mll(q, train_x, log_vols_nt), p, vol_iters,
                vol_lr,
            )
    mt_params, mt_losses = jax.jit(_mt_fit)(mt.init(key=key))
    mt_state = mt.fit_state(mt_params, train_x, log_vols_nt)

    volt_state = VoltState(
        module=module,
        params=params_b,
        train_x=jnp.broadcast_to(train_x, (num_tasks, train_x.shape[-1])),
        train_y=log_ys,
        log_vol_path=jnp.log(vol_paths),
        vol_state=None,
    )
    return volt_state, mt_state

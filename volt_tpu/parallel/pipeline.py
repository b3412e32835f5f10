"""The whole Volt pipeline as one compiled program, batched over assets.

``fit_forecast`` runs GPCV -> vol GP -> Volt fit -> MC rollout for a single
asset entirely inside ``jit`` (three fused optax/lax.scan loops + the Markov
rollout scan — zero host round-trips per asset).  ``fit_forecast_batch``
``vmap``s it over an asset axis and shards that axis (and the Monte-Carlo
path axis) over a device mesh with ``NamedSharding`` — the TPU-native
replacement for the reference's sequential per-ticker loop
(``experiments/stocks/ForecastGenerator.py:27-41``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.gpcv import GPCVModel
from ..models.bmgp import BMGP
from ..models.volt import VoltGP, make_mean
from ..ops.tridiag import brownian_noise_mll_kalman
from ..rollouts import _rollout_volt_scan, sample_vol_paths
from ..train import _adam_scan, scaled_returns

__all__ = ["PipelineConfig", "fit_forecast", "fit_forecast_batch",
           "shard_batch", "warm_start"]


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static configuration for the full two-stage pipeline.

    Defaults follow the reference stock backtest (``ForecastGenerator.py``
    flags: train_iters=300, k/mean per flag; Adam lr split 0.01/0.01/0.1,
    ``train_utils.py:40,77,124,237``).
    """

    gpcv_iters: int = 300
    vol_iters: int = 300
    data_iters: int = 300
    kernel: str = "bm"
    mean_func: str = "ewma"
    k: int = 300
    theta: Optional[float] = None
    nsample: int = 1000
    gpcv_lr: float = 0.01
    vol_lr: float = 0.01
    data_lr: float = 0.1
    num_locs: int = 75
    # variational family for the GPCV stage: "tridiag" (O(n) params/step,
    # contains the full-rank optimum for the BM prior) or "full" (the
    # reference's dense n x n Cholesky).  See models/gpcv.py.
    gpcv_q: str = "tridiag"
    # GPCV optimizer: "adam" (the reference's loop, train_utils.py:40;
    # the only choice for gpcv_q="full") or "ngvi" (natural-gradient VI
    # on the tridiag family — n-independent convergence in tens of
    # iterations, gp/natural.py).  Adam is the default because it is the
    # reference's protocol and ~4.7x cheaper per iteration on TPU (the
    # NGVI step adds ~2x the sequential-scan count; measured at
    # B=16/n=999: 0.323 s vs 0.068 s per 300-iter stage — BENCH_SCALING
    # round 5).  Past n ~ 2000 Adam at fixed iters under-converges
    # (BENCH_SCALING round-4/5 tables); there the better config on BOTH
    # axes is gpcv_opt="ngvi" with gpcv_iters~30 (reaches the family
    # optimum n-independently, costing LESS than 300 Adam iters).
    gpcv_opt: str = "adam"
    # vol-GP MLL path: "spectral" (closed-form min(x) eigensystem,
    # elementwise O(n)/step — REQUIRES an equispaced train_x, which
    # fit_forecast_batch validates when the grid is concrete) or
    # "kalman" (O(n) sequential scan, any grid).
    vol_mll: str = "spectral"
    # What the pipeline returns (and transfers to the host):
    #   "samples"   — raw MC paths (nsample, H), the reference's product
    #                 (torch.save'd tensors, GenerateMultiMeanPreds.py:124)
    #   "quantiles" — an on-device quantile fan + mean/std over the MC
    #                 paths, (len(quantile_levels), H) per asset.  The
    #                 backtest/calibration consumers (option_utils.py:26-51,
    #                 calib_plotter) reduce the paths to exactly these
    #                 statistics anyway; reducing on-device shrinks the
    #                 device->host fetch by ~nsample/len(levels) (~125x at
    #                 the north-star shape), which is 70% of the end-to-end
    #                 cost on this image's tunnel (PERFORMANCE.md).
    output: str = "samples"
    quantile_levels: tuple = (0.025, 0.05, 0.25, 0.5, 0.75, 0.95, 0.975)
    # quadrature for the Volt kernel's running vol integral: "reference"
    # replicates the CumTrapz endpoint quirk (one-step forecast std
    # /sqrt(2) — PARITY.md); "trapezoid" is the exact rule, the
    # fix-by-design opt-out (kernels.VolatilityKernel).
    integral_rule: str = "reference"


def _resolve_config(config: PipelineConfig) -> PipelineConfig:
    """Downgrade BM-only defaults for non-BM kernels (mirrors
    ``learn_gpcv``'s family auto-selection): the tridiagonal-precision q
    and the spectral vol MLL both rely on the Markov min-kernel."""
    if config.kernel != "bm":
        repl = {}
        if config.gpcv_q == "tridiag":
            repl["gpcv_q"] = "full"
        if config.vol_mll == "spectral":
            repl["vol_mll"] = "kalman"
        if repl:
            config = dataclasses.replace(config, **repl)
    if config.gpcv_opt == "ngvi" and (config.kernel != "bm"
                                      or config.gpcv_q != "tridiag"):
        config = dataclasses.replace(config, gpcv_opt="adam")
    return config


def _check_spectral_grid(train_x, config: PipelineConfig):
    """Host-side guard: the spectral vol path assumes an equispaced grid.
    Only possible when ``train_x`` is concrete (skipped under tracing).
    ``_check_min_length`` (n >= 11) has already run at every caller, so
    no degenerate-grid case arises here."""
    if config.vol_mll != "spectral" or config.kernel != "bm":
        return
    from ..train import _is_equispaced

    try:
        concrete = not isinstance(jnp.asarray(train_x), jax.core.Tracer)
    except Exception:
        concrete = False
    if concrete and not _is_equispaced(train_x):
        raise ValueError(
            "vol_mll='spectral' requires an equispaced train_x; use "
            "PipelineConfig(vol_mll='kalman') for irregular grids"
        )


def _check_min_length(train_x):
    """The GPCV running-std Laplace init pins its first 10 entries to the
    11th (reference ``single_task_variational_gp.py:213-216`` — which
    IndexErrors below that); reject shorter series with a clear message
    instead of a shape error from inside the init."""
    n = jnp.asarray(train_x).shape[-1]
    if n < 11:
        raise ValueError(
            f"the pipeline needs at least 11 train points (the GPCV "
            f"running-std init uses the 11th entry), got n={n}"
        )


def _volt_data_fit(volt: VoltGP, train_x, log_y, vol, volt_params, iters,
                   lr):
    """Stage-3 core: fit the Volt data model's noise/mean hyperparameters
    with the O(n) Kalman MLL over the Brownian-bridge increments (shared
    by the single-asset and multitask pipelines).  History-dependent means
    (EWMA family) are parameter-free in their train values, so the mean
    vector is computed once outside the loss."""
    v_integral = volt.kernel.integral(train_x, vol)
    if volt.mean.is_history_dependent:
        mean_vec = volt.train_mean(volt_params, train_x, log_y)

        def data_loss(p):
            noise = volt.likelihood.noise(p["likelihood"])[..., 0]
            return -brownian_noise_mll_kalman(v_integral, noise,
                                              log_y - mean_vec)
    else:
        def data_loss(p):
            noise = volt.likelihood.noise(p["likelihood"])[..., 0]
            mv = volt.train_mean(p, train_x, log_y)
            return -brownian_noise_mll_kalman(v_integral, noise, log_y - mv)

    return _adam_scan(data_loss, volt_params, iters, lr)


def fit_forecast(key, train_x, train_y, test_x, config: PipelineConfig,
                 init_params=None):
    """Fit + forecast one asset.

    ``train_y``: prices, one longer than ``train_x`` (the return grid).
    Returns ``(out, aux)``: ``out`` is the MC samples ``(nsample, H)``
    or, with ``config.output="quantiles"``, the on-device quantile fan
    ``(len(quantile_levels), H)`` (``aux`` then also carries
    ``forecast_mean``/``forecast_std``); ``aux`` carries the inferred vol
    path and fitted parameters.

    ``init_params``: optional warm start — a ``{"gpcv", "vol", "volt"}``
    pytree (from :func:`warm_start` on a previous fit's ``aux``) that
    seeds the three Adam scans instead of the cold Laplace/default inits,
    so a live system can re-fit each new tick with an order of magnitude
    fewer iterations.  Same compiled program shape — only the initial
    parameter values change.
    """
    config = _resolve_config(config)
    _check_min_length(train_x)
    _check_spectral_grid(train_x, config)
    return _fit_forecast_jit(key, train_x, train_y, test_x, config,
                             init_params)


@partial(jax.jit, static_argnames=("config",))
def _fit_forecast_jit(key, train_x, train_y, test_x,
                      config: PipelineConfig, init_params=None):
    k_lik, k_roll = jax.random.split(key)

    # ---- stage 1: GPCV ----------------------------------------------------
    yy = scaled_returns(train_x, train_y)
    gpcv = GPCVModel(kernel=config.kernel, num_locs=config.num_locs,
                     q=config.gpcv_q)
    gpcv_params = (gpcv.init(train_x, yy, key=k_lik)
                   if init_params is None else init_params["gpcv"])
    if config.gpcv_opt == "ngvi":
        from ..gp.natural import ngvi_tridiag_fit

        gpcv_params, gpcv_losses = ngvi_tridiag_fit(
            gpcv, gpcv_params, train_x, yy, config.gpcv_iters,
            config.gpcv_lr,
        )
    else:
        gpcv_params, gpcv_losses = _adam_scan(
            lambda p: -gpcv.elbo(p, train_x, yy),
            gpcv_params, config.gpcv_iters, config.gpcv_lr,
        )
    vol = gpcv.predicted_scale(gpcv_params, train_x)

    # ---- stage 2: vol GP (factorization-free MLL per Adam step) -----------
    log_vol = jnp.log(vol)
    bm = BMGP(kernel=config.kernel)
    # n >= 11 is guaranteed by _check_min_length at both public entries;
    # no upper bound — past the materialized basis' int32 bound the
    # spectral cache projects via FFT (ops/brownian.min_kernel_project).
    if config.kernel == "bm" and config.vol_mll == "spectral":
        # closed-form min(x) eigensystem (equispaced grids): two basis
        # projections per fit, elementwise O(n) per step, no scan.
        vol_cache = bm.spectral_cache(train_x, log_vol)
        vol_loss_fn = lambda p: -bm.mll_spectral(p, vol_cache)
    elif config.kernel == "bm":
        vol_loss_fn = lambda p: -bm.mll_kalman(p, train_x, log_vol)
    else:
        vol_loss_fn = lambda p: -bm.mll(p, train_x, log_vol)
    vol_init = (bm.init() if init_params is None else init_params["vol"])
    vol_params, vol_losses = _adam_scan(
        vol_loss_fn, vol_init, config.vol_iters, config.vol_lr
    )
    vol_state = bm.fit_state(vol_params, train_x, log_vol)

    # ---- stage 3: Volt data model (tridiagonal-precision MLL; O(n)/step) --
    log_y = jnp.log(train_y[..., 1:])
    volt = VoltGP(mean=make_mean(config.mean_func, k=config.k),
                  integral_rule=config.integral_rule)
    volt_params = (volt.init() if init_params is None
                   else init_params["volt"])
    volt_params, data_losses = _volt_data_fit(
        volt, train_x, log_y, vol, volt_params, config.data_iters,
        config.data_lr,
    )
    model = volt.fit_state(volt_params, train_x, log_y, vol, vol_state)

    # ---- stage 4: Monte-Carlo rollout ------------------------------------
    use_theta = config.theta is not None
    latent_mean = jnp.mean(jnp.log(train_y)) if use_theta else jnp.float32(0)
    k_vol, k_z = jax.random.split(k_roll)
    pred_vol = sample_vol_paths(k_vol, vol_state, test_x, config.nsample)
    zs = jax.random.normal(k_z, (config.nsample, test_x.shape[-1]),
                           log_y.dtype)
    samples = _rollout_volt_scan(
        model, latent_mean, test_x, pred_vol, zs, use_theta,
        jnp.float32(config.theta if use_theta else 0.0),
    )

    # Per-asset failure flag: the structural replacement for the
    # reference's per-ticker try/except skip-and-continue
    # (LSTMGenerator.py:35,67-68 and the NaN-placeholder saves commented
    # at GenerateMultiMeanPreds.py:129-134).  Inside one vmapped program a
    # diverged asset stays confined to its own lanes; `ok` tells the
    # caller which lanes to keep without a host round-trip per asset.
    ok = (
        jnp.all(jnp.isfinite(samples))
        & jnp.isfinite(gpcv_losses[-1])
        & jnp.isfinite(vol_losses[-1])
        & jnp.isfinite(data_losses[-1])
    )

    if config.output == "quantiles":
        levels = jnp.asarray(config.quantile_levels, samples.dtype)
        fan = jnp.quantile(samples, levels, axis=-2)  # (L, H)
        out = fan
    elif config.output == "samples":
        out = samples
    else:
        raise ValueError(
            f"PipelineConfig.output must be 'samples' or 'quantiles', "
            f"got {config.output!r}"
        )

    aux = {
        "ok": ok,
        "vol": vol,
        "gpcv_loss": gpcv_losses[-1],
        "vol_loss": vol_losses[-1],
        "data_loss": data_losses[-1],
        # full per-step trajectories: the structured metrics stream the
        # reference only exposes as prints every 50 iters (SURVEY.md §5)
        "gpcv_losses": gpcv_losses,
        "vol_losses": vol_losses,
        "data_losses": data_losses,
        "volt_params": volt_params,
        "vol_params": vol_params,
        "gpcv_params": gpcv_params,
    }
    if config.output == "quantiles":
        aux["forecast_mean"] = jnp.mean(samples, axis=-2)
        aux["forecast_std"] = jnp.std(samples, axis=-2)
    return out, aux


def _batched(key, train_x, train_ys, test_x, config: PipelineConfig,
             init_params=None):
    keys = jax.random.split(key, train_ys.shape[0])
    if init_params is None:
        return jax.vmap(
            lambda k, ty: _fit_forecast_jit(k, train_x, ty, test_x, config)
        )(keys, train_ys)
    return jax.vmap(
        lambda k, ty, ip: _fit_forecast_jit(k, train_x, ty, test_x, config,
                                            ip)
    )(keys, train_ys, init_params)


def shard_batch(mesh, output: str = "samples"):
    """(in, out) shardings for the batched pipeline on an (asset, path) mesh.

    Sample outputs shard (asset, path); quantile fans carry no path axis
    (the MC reduction happened on-device) and shard over assets only.
    """
    asset = NamedSharding(mesh, P("asset"))
    if output == "quantiles":
        return asset, NamedSharding(mesh, P("asset"))
    out_samples = NamedSharding(mesh, P("asset", "path"))
    return asset, out_samples


def _shift_tail(a, shift: int):
    """Roll the last axis left by ``shift``, replicating the final entry.

    A train window sliding forward by ``shift`` ticks drops the oldest
    ``shift`` data points and appends ``shift`` new ones; per-datum
    variational parameters stay aligned by shifting with the window, and
    the new tail points start from the latest filtered estimate (the
    previous final entry) — the natural warm start for a Markov prior.
    """
    pad = jnp.repeat(a[..., -1:], shift, axis=-1)
    return jnp.concatenate([a[..., shift:], pad], axis=-1)


def warm_start(aux, shift: int = 0, n: int | None = None):
    """``init_params`` for :func:`fit_forecast` / :func:`fit_forecast_batch`
    from a previous fit's ``aux``.

    ``shift=0`` re-seeds a fit of the SAME window (e.g. continuing with
    more iterations).  ``shift>0`` is the rolling-backtest / live-serving
    case — the new window slides forward ``shift`` ticks at the same
    length: per-datum GPCV variational leaves are shifted with the window
    (``n`` = the return-grid length ``train_x.shape[-1]`` must be given so
    per-datum leaves are recognized); scalar hyperparameters and the
    vol/data-model parameters carry over unchanged.  Sparse-GPCV inducing
    leaves (length m < n) live on window-relative positions and correctly
    carry over as-is.

    The reference has no warm path — every backtest window refits from
    scratch (``GenerateMultiMeanPreds.py:63-137``).  Here a warm refit
    reuses the already-compiled program (the pytree shapes are identical)
    and needs ~10x fewer iterations for the same fit quality
    (``tests/test_parallel.py::TestWarmStart``, ``tools/bench_refit.py``).
    """
    gpcv = dict(aux["gpcv_params"])
    if shift:
        if n is None:
            raise ValueError("warm_start(shift>0) needs n (the return-grid "
                             "length train_x.shape[-1])")
        for k, v in gpcv.items():
            if not hasattr(v, "ndim") or v.ndim == 0:
                continue
            if k == "chol_variational_covar":
                # dense variational Cholesky: shift both data axes; the
                # re-tril'd replicated tail keeps a nonzero diagonal —
                # a valid (if crude) starting root for q's covariance.
                # (Dispatch by NAME: its trailing dim is also n, so a
                # shape test would mis-route it to the vector branch.)
                cols = _shift_tail(v, shift)
                rows = jnp.moveaxis(
                    _shift_tail(jnp.moveaxis(cols, -1, -2), shift), -1, -2
                )
                gpcv[k] = jnp.tril(rows)
            elif k == "q_log_d" and v.shape[-1] == n:
                # diagonal of the tridiagonal family's bidiagonal
                # PRECISION factor: its final entry is the boundary row
                # (no subdiagonal after it — distinctly smaller than the
                # interior's near-cancelling (d, e) pairs).  Replicating
                # it onto interior rows leaves those rows of the factor
                # nearly singular (huge marginal variance -> the exp
                # likelihood explodes), so shift the interior and keep
                # the boundary entry at the boundary.
                interior = _shift_tail(v[..., :-1], shift)
                gpcv[k] = jnp.concatenate([interior, v[..., -1:]], axis=-1)
            elif v.shape[-1] in (n, n - 1):        # per-datum vectors
                gpcv[k] = _shift_tail(v, shift)
    return {"gpcv": gpcv, "vol": aux["vol_params"],
            "volt": aux["volt_params"]}


def fit_forecast_batch(key, train_x, train_ys, test_x,
                       config: PipelineConfig, mesh=None, init_params=None):
    """Fit + forecast a batch of assets, sharded over the mesh.

    ``train_ys``: ``(B, n+1)`` prices.  Returns ``(out (B, S, H), aux)``
    with ``B`` sharded over the ``asset`` axis and ``S`` over ``path``
    (``config.output="quantiles"``: ``out (B, L, H)``, asset-sharded).

    ``init_params``: optional batched warm start (leading asset axis on
    every leaf) — :func:`warm_start` on a previous batch's ``aux``.
    """
    train_ys = jnp.asarray(train_ys)
    config = _resolve_config(config)
    _check_min_length(train_x)
    _check_spectral_grid(train_x, config)
    if mesh is None:
        return jax.jit(_batched, static_argnames=("config",))(
            key, train_x, train_ys, test_x, config, init_params
        )
    asset_sh, samples_sh = shard_batch(mesh, config.output)
    train_ys = jax.device_put(train_ys, asset_sh)
    if init_params is not None:
        # every warm-start leaf is per-asset (leading B) — co-shard them
        # with the price batch so the refit stays communication-free
        init_params = jax.device_put(init_params, asset_sh)
    fn = jax.jit(
        _batched,
        static_argnames=("config",),
        out_shardings=(samples_sh, None),
    )
    return fn(key, train_x, train_ys, test_x, config, init_params)

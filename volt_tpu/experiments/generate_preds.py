"""Stock backtest generators (reference
``experiments/stocks/GenerateMultiMeanPreds.py``).

The reference loops backtest windows sequentially on one device
(``:69-137``); here each generator exposes a ``batch_windows`` switch that
runs every rolling window as one batched, device-sharded pipeline call —
the windows are independent, which is exactly the asset/window data
parallelism of ``volt_tpu.parallel``.

Outputs are ``.npy`` sample tensors keyed ``<model>_<date>.npy`` under
``saved-outputs/<ticker>/`` — the reference's on-disk backtest layout.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.pipeline import PipelineConfig, fit_forecast_batch
from ..rollouts import generate_prediction, rollouts, sample_vol_paths
from ..train import learn_gpcv, train_vol_model, train_volt_magpie
from .basic_wind import make_basic_model
from ..rollouts import nonvol_rollouts

__all__ = [
    "rolling_windows",
    "generate_stock_predictions",
    "generate_one_day_predictions",
    "generate_basic_predictions",
    "generate_gpcv_predictions",
]

DT = 1.0 / 252


def rolling_windows(prices, ntrain: int, ntimes: int):
    """End indices of the rolling backtest windows (reference ``:69-73``)."""
    n = len(prices)
    if ntimes == -1:
        return list(range(ntrain, n))
    step = max(int((n - ntrain) / ntimes), 1)
    return list(range(ntrain, n, step))


def _grids(ntrain: int, ntest: int):
    train_x = jnp.arange(ntrain - 1, dtype=jnp.float32) * DT
    test_x = jnp.arange(ntest, dtype=jnp.float32) * DT + train_x[-1] + DT
    return train_x, test_x


def _save(savepath, name, samples):
    os.makedirs(savepath, exist_ok=True)
    np.save(os.path.join(savepath, name + ".npy"), np.asarray(samples))


def generate_stock_predictions(ticker, prices, dates=None,
                               forecast_horizon: int = 20,
                               train_iters: int = 400, nsample: int = 1000,
                               ntrain: int = 400, mean: str = "ewma",
                               kernel: str = "volt", save: bool = False,
                               k: int = 300, ntimes: int = -1,
                               outdir: str = "./saved-outputs",
                               batch_windows: bool = True, key=None):
    """Rolling-window Volt backtest (reference ``:63-137``).

    ``prices``: 1-D close-price array; ``dates``: optional parallel list of
    date labels for filenames.  Returns ``{date_or_idx: samples (S, H)}``.
    """
    if key is None:
        key = jax.random.key(0)
    prices = np.asarray(prices, np.float32)
    ends = rolling_windows(prices, ntrain, ntimes)
    train_x, test_x = _grids(ntrain, forecast_horizon)
    savepath = os.path.join(outdir, str(ticker))
    model_name = f"{kernel}_{mean}{k}_"
    labels = [
        str(dates[e]) if dates is not None else str(e) for e in ends
    ]
    results = {}

    if batch_windows and kernel == "volt":
        cfg = PipelineConfig(
            gpcv_iters=train_iters, vol_iters=train_iters,
            data_iters=train_iters, mean_func=mean, k=k, nsample=nsample,
        )
        train_ys = jnp.asarray(
            np.stack([prices[e - ntrain:e] for e in ends])
        )
        samples, _ = fit_forecast_batch(key, train_x, train_ys, test_x, cfg)
        samples = np.asarray(samples)
        for label, s in zip(labels, samples):
            results[label] = s
            if save:
                _save(savepath, model_name + label, s)
        return results

    for label, e in zip(labels, ends):
        train_y = jnp.asarray(prices[e - ntrain:e])
        key, k_fit = jax.random.split(key)
        vol = learn_gpcv(train_x, train_y, train_iters=train_iters)
        vol_state = train_vol_model(train_x, vol, train_iters=train_iters)
        model = train_volt_magpie(train_x, train_y[1:], vol_state, vol,
                                  train_iters=train_iters, k=k,
                                  mean_func=mean)
        if mean in ("ewma", "dewma", "tewma"):
            s = rollouts(k_fit, model, train_x, train_y, test_x,
                         nsample=nsample)
        else:
            k_vol, k_px = jax.random.split(k_fit)
            pred_vol = sample_vol_paths(k_vol, vol_state, test_x, nsample)
            s = generate_prediction(k_px, model, test_x, pred_vol)[..., 0, :]
        results[label] = np.asarray(s)
        if save:
            _save(savepath, model_name + label, s)
    return results


def generate_one_day_predictions(ticker, train_y, date,
                                 forecast_horizon: int = 20,
                                 train_iters: int = 400, nsample: int = 1000,
                                 ntrain: int = 400, save: bool = False,
                                 mean=None, outdir: str = "./saved-outputs",
                                 key=None,
                                 ks=(25, 50, 100, 200, 300, 400)):
    """Mean-family x k sweep for one window (reference ``:141-206``).

    Shares one GPCV + vol fit across the whole {ewma, dewma, tewma} x
    ``ks`` grid (default = the reference's k grid,
    ``GenerateMultiMeanPreds.py:183-190``; the reference refits nothing
    either: data-model train_iters=0 for the sweep)."""
    if key is None:
        key = jax.random.key(0)
    train_y = jnp.asarray(train_y, jnp.float32)
    train_x, test_x = _grids(train_y.shape[-1], forecast_horizon)
    savepath = os.path.join(outdir, str(ticker))
    vol = learn_gpcv(train_x, train_y, train_iters=train_iters)
    vol_state = train_vol_model(train_x, vol, train_iters=train_iters)
    results = {}
    if mean == "constant":
        model = train_volt_magpie(train_x, train_y[1:], vol_state, vol,
                                  train_iters=200, mean_func="constant")
        s = rollouts(key, model, train_x, train_y, test_x, nsample=nsample)
        results["volt_constant"] = np.asarray(s)
        if save:
            _save(savepath, f"volt_constant_{date}", s)
        return results
    for mean_name in ("ewma", "dewma", "tewma"):
        for k in ks:
            key, k_s = jax.random.split(key)
            model = train_volt_magpie(train_x, train_y[1:], vol_state, vol,
                                      train_iters=0, k=k,
                                      mean_func=mean_name)
            s = rollouts(k_s, model, train_x, train_y, test_x,
                         nsample=nsample)
            results[f"volt_{mean_name}{k}"] = np.asarray(s)
            if save:
                _save(savepath, f"volt_{mean_name}{k}_{date}", s)
    return results


def generate_basic_predictions(ticker, prices, kernel_name, dates=None,
                               mean_name: str = "ewma", k: int = 400,
                               forecast_horizon: int = 100,
                               train_iters: int = 600, nsample: int = 1000,
                               ntrain: int = 400, save: bool = False,
                               ntimes: int = -1,
                               outdir: str = "./saved-outputs", key=None):
    """Baseline-model backtest (reference ``:210-298``)."""
    if key is None:
        key = jax.random.key(0)
    prices = np.asarray(prices, np.float32)
    ends = rolling_windows(prices, ntrain, ntimes)
    train_x, test_x = _grids(ntrain, forecast_horizon)
    savepath = os.path.join(outdir, str(ticker))
    results = {}
    for e in ends:
        label = str(dates[e]) if dates is not None else str(e)
        train_y = jnp.asarray(prices[e - ntrain:e])[1:]
        log_y = jnp.log(train_y)
        key, k_fit, k_s = jax.random.split(key, 3)
        model = make_basic_model(train_x, log_y, kernel_name, mean_name, k,
                                 train_iters, num_mixtures=15, key=k_fit)
        if mean_name.lower() in ("loglinear", "constant", "linear"):
            s = model.sample(k_s, test_x, (nsample,))
        else:
            s = nonvol_rollouts(k_s, model, train_x, train_y, test_x,
                                nsample=nsample)
        results[label] = np.asarray(s)
        if save:
            _save(savepath, f"{kernel_name}_{mean_name}{k}_{label}", s)
    return results


def generate_gpcv_predictions(ticker, prices, dates=None,
                              forecast_horizon: int = 20, ntimes: int = 25,
                              train_iters: int = 400, nsample: int = 1000,
                              ntrain: int = 400, save: bool = False,
                              outdir: str = "./saved-outputs", key=None):
    """GPCV-only forecasts: cumulative sampled scaled returns
    (reference ``:26-61`` — whose ``LearnGPCV(..., return_model=True)`` call
    was broken; fixed by design here)."""
    if key is None:
        key = jax.random.key(0)
    prices = np.asarray(prices, np.float32)
    ends = rolling_windows(prices, ntrain, ntimes)
    train_x, test_x = _grids(ntrain, forecast_horizon)
    savepath = os.path.join(outdir, str(ticker))
    results = {}
    for e in ends:
        label = str(dates[e]) if dates is not None else str(e)
        train_y = jnp.asarray(prices[e - ntrain:e])
        key, k_f, k_s = jax.random.split(key, 3)
        _, gpcv_state = learn_gpcv(train_x, train_y,
                                   train_iters=train_iters,
                                   return_model=True)
        mean, var = gpcv_state.module.latent_marginals(
            gpcv_state.params, train_x, test_x
        )
        scale = gpcv_state.module.likelihood.scale(
            gpcv_state.params["likelihood"],
            mean + jnp.sqrt(var) * jax.random.normal(
                k_f, (nsample, *mean.shape)
            ),
        )
        returns = scale * jax.random.normal(k_s, scale.shape)
        log_samples = (
            jnp.cumsum(returns, -1) * jnp.sqrt(DT) + jnp.log(train_y[-1])
        )
        results[label] = np.asarray(log_samples)
        if save:
            _save(savepath, f"gpcv_{label}", log_samples)
    return results

"""Baseline wind forecasters (reference ``experiments/weather/BasicWind.py``).

Kernel family {sm, matern, rbf} x mean family {ewma, dewma, tewma,
loglinear, linear, constant}; deterministic means sample the joint
posterior one-shot, Magpie means go through the autoregressive
``nonvol_rollouts``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..kernels import MaternKernel, RBFKernel, ScaleKernel, SpectralMixtureKernel
from ..means import (
    ConstantMean,
    DEWMAMean,
    EWMAMean,
    LinearMean,
    LogLinearMean,
    TEWMAMean,
)
from ..models.basic import BasicGP
from ..rollouts import nonvol_rollouts
from ..train import _fit_basic

__all__ = ["basic_wind_rollouts", "make_basic_model"]

_KERNELS = {"sm": SpectralMixtureKernel, "matern": MaternKernel,
            "rbf": RBFKernel}


def _make_mean(mean_name: str, k: int):
    mean_name = mean_name.lower()
    if mean_name == "loglinear":
        return LogLinearMean(1)
    if mean_name == "linear":
        return LinearMean(1)
    if mean_name == "constant":
        return ConstantMean()
    if mean_name == "ewma":
        return EWMAMean(k)
    if mean_name == "dewma":
        return DEWMAMean(k)
    if mean_name == "tewma":
        return TEWMAMean(k)
    raise ValueError(f"unknown mean {mean_name!r}")


def make_basic_model(train_x, log_y, kernel_name: str, mean_name: str = "ewma",
                     k: int = 20, train_iters: int = 600,
                     num_mixtures: int = 20, key=None):
    """Build + fit the baseline exact GP (reference ``BasicWind.py:26-69``)."""
    if key is None:
        key = jax.random.key(0)
    kname = kernel_name.lower()
    if kname == "sm":
        kernel = SpectralMixtureKernel(num_mixtures=num_mixtures)
    else:
        kernel = ScaleKernel(_KERNELS[kname]())
    module = BasicGP(kernel, _make_mean(mean_name, k))
    params = module.init(key=key)
    if kname == "sm":
        params["kernel"] = kernel.initialize_from_data(
            params["kernel"], train_x, log_y, key=key
        )
    if mean_name.lower() == "loglinear":
        params["mean"] = module.mean.initialize_from_data(params["mean"],
                                                          train_x, log_y)
    params, _ = _fit_basic(module, params, train_x, log_y, train_iters, 0.1)
    return module.fit_state(params, train_x, log_y)


def basic_wind_rollouts(train_x, train_y, test_x, kernel_name: str,
                        mean_name: str = "ewma", k: int = 20,
                        train_iters: int = 600, nsample: int = 1000,
                        key=None):
    """Fit + forecast (reference ``BasicWindRollouts``); returns log samples
    ``(nsample, H)``."""
    if key is None:
        key = jax.random.key(0)
    k_fit, k_sample = jax.random.split(key)
    train_x = jnp.asarray(train_x)
    log_y = jnp.log(jnp.asarray(train_y))
    model = make_basic_model(train_x, log_y, kernel_name, mean_name, k,
                             train_iters, key=k_fit)
    if mean_name.lower() in ("loglinear", "constant", "linear"):
        return model.sample(k_sample, jnp.asarray(test_x), (nsample,))
    return nonvol_rollouts(k_sample, model, train_x, train_y, test_x,
                           nsample=nsample)

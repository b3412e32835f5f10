"""The Volt price model: exact GP with the volatility kernel.

Unifies the reference's ``VoltronGP`` / ``VoltMagpie`` / ``Volt`` triplet
(structurally identical models differing only in the mean function,
reference ``models/VoltronGP.py`` / ``VoltMagpie.py`` / ``Volt.py``) into a
single model parameterized by a mean module.  The fitted state carries the
frozen vol path and the nested vol GP; forecasting lives in
:mod:`volt_tpu.rollouts`.

TPU design notes:

* the train covariance is *fixed* during data-model fitting (the vol path
  is frozen); the production fit exploits this through the O(n)-per-step
  Kalman MLL (``ops/tridiag.brownian_noise_mll_kalman``, dispatched by
  ``train._fit_volt`` / the pipeline).  The eigendecomposition fast path
  (:meth:`VoltGP.make_cov_cache` / :meth:`VoltGP.mll_fixed_cov`) is kept
  as an independent O(n^2)-per-step cross-check of the Kalman values —
  exercised by tests only, no production callers;
* the min-index structure of the volatility kernel gives the rollout a
  closed-form Markov conditional — the model deliberately exposes its
  running integral rather than a materialized covariance.
"""

from __future__ import annotations

from typing import Optional

import flax.struct as struct
import jax
import jax.numpy as jnp

from ..gp.exact import exact_mll, make_fixed_cov_cache, exact_mll_fixed_cov
from ..kernels import VolatilityKernel
from ..likelihoods import GaussianLikelihood
from ..means import (
    ConstantMean,
    DEWMAMean,
    EWMAMean,
    LinearMean,
    LogLinearMean,
    MeanRevertingEMAMean,
    TEWMAMean,
)
from ..utils.static import ConfigEq
from .bmgp import BMGPState

__all__ = ["VoltGP", "VoltState", "make_mean"]


def make_mean(name: str, k: int = 25, theta: float = 0.5):
    """Mean selection by name (reference ``train_utils.py:196-220`` /
    ``Volt.py:35-44``)."""
    name = name.lower()
    if name == "ewma":
        return EWMAMean(k)
    if name == "dewma":
        return DEWMAMean(k)
    if name == "tewma":
        return TEWMAMean(k)
    if name == "meanrevert":
        return MeanRevertingEMAMean(k, theta)
    if name == "constant":
        return ConstantMean()
    if name == "loglinear":
        return LogLinearMean(1)
    if name == "linear":
        return LinearMean(1)
    raise ValueError(f"unknown mean function {name!r}")


@struct.dataclass
class VoltState:
    """A fitted Volt model: everything a forecast needs."""

    module: "VoltGP" = struct.field(pytree_node=False)
    params: dict            # {"mean": ..., "likelihood": ...}
    train_x: jax.Array      # (..., n) uniform time grid
    train_y: jax.Array      # (..., n) log prices
    log_vol_path: jax.Array  # (..., n)
    vol_state: Optional[BMGPState] = None  # fitted nested vol GP

    def update_vol_path(self, vol_path):
        """Reference ``UpdateVolPath`` (VoltronGP.py:52-55)."""
        return self.replace(log_vol_path=jnp.log(vol_path))

    def train_mean(self):
        return self.module.train_mean(self.params, self.train_x, self.train_y)

    def mll(self):
        return self.module.mll(self.params, self.train_x, self.train_y,
                               jnp.exp(self.log_vol_path))

    def vol_mll(self):
        """Exact MLL of the nested vol GP on the stored log-vol path
        (reference ``VolMLL``, VoltronGP.py:57-60)."""
        if self.vol_state is None:
            raise ValueError("no fitted vol GP attached")
        return self.vol_state.module.mll(
            self.vol_state.params, self.vol_state.train_x,
            self.vol_state.train_y,
        )


class VoltGP(ConfigEq):
    """Static configuration + pure functions for the Volt exact GP."""

    def __init__(self, mean=None, batch_shape: tuple = (),
                 integral_rule: str = "reference"):
        self.mean = mean if mean is not None else LinearMean(1)
        self.kernel = VolatilityKernel(integral_rule=integral_rule)
        self.likelihood = GaussianLikelihood(batch_shape=batch_shape)
        self.batch_shape = tuple(batch_shape)

    def init(self, dtype=jnp.float32, key=None):
        # raw_noise init 1e-5 — the reference's "noise pin"
        # (train_utils.py:107,222); the transformed noise starts at ~0.6932
        # and trains from there.
        return {
            "mean": self.mean.init(dtype, key=key),
            "likelihood": self.likelihood.init(dtype, raw_noise_init=1e-5),
        }

    def train_mean(self, params, x, y):
        """Mean over the train grid (the reference's x == train_x branch)."""
        if self.mean.is_history_dependent:
            return self.mean.train_values(params["mean"], y)
        return self.mean(params["mean"], x)

    def train_cov(self, x, vol_path):
        return self.kernel({}, x, vol_path)

    def mll(self, params, x, y, vol_path):
        cov = self.train_cov(x, vol_path)
        noise = self.likelihood.noise(params["likelihood"])
        return exact_mll(y, self.train_mean(params, x, y), cov, noise)

    def mll_fixed_cov(self, params, cache, x, y):
        """MLL against a pre-factorized covariance.

        Cross-check twin of the production Kalman path (see module
        docstring): tests pin the O(n) scan against this independent
        O(n^2)-per-step eigendecomposition form."""
        noise = self.likelihood.noise(params["likelihood"])
        return exact_mll_fixed_cov(y, self.train_mean(params, x, y), cache,
                                   noise)

    def make_cov_cache(self, x, vol_path):
        return make_fixed_cov_cache(self.train_cov(x, vol_path))

    def fit_state(self, params, train_x, train_y, vol_path,
                  vol_state: Optional[BMGPState] = None) -> VoltState:
        return VoltState(
            module=self,
            params=params,
            train_x=train_x,
            train_y=train_y,
            log_vol_path=jnp.log(vol_path),
            vol_state=vol_state,
        )

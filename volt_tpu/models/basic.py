"""Baseline exact GPs: scaled-Matérn and spectral-mixture.

Reference ``models/BasicGPModels.py`` (``MaternGP``, ``SMGP``) plus the
mean-function overrides applied by ``train_utils.TrainBasicModel:146-189``.
"""

from __future__ import annotations


import flax.struct as struct
import jax
import jax.numpy as jnp

from ..gp.exact import exact_mll, posterior
from ..kernels import MaternKernel, ScaleKernel, SpectralMixtureKernel
from ..likelihoods import GaussianLikelihood
from ..means import ConstantMean
from ..ops.mvn import sample_mvn
from ..utils.static import ConfigEq

__all__ = ["BasicGP", "BasicGPState", "MaternGP", "SMGP"]


@struct.dataclass
class BasicGPState:
    module: "BasicGP" = struct.field(pytree_node=False)
    params: dict
    train_x: jax.Array
    train_y: jax.Array

    def posterior(self, test_x):
        return self.module.posterior(self.params, self.train_x, self.train_y,
                                     test_x)

    def sample(self, key, test_x, sample_shape=()):
        mean, cov = self.posterior(test_x)
        return sample_mvn(key, mean, cov, sample_shape)


class BasicGP(ConfigEq):
    """Exact GP with a pluggable kernel and mean."""

    def __init__(self, kernel, mean=None):
        self.kernel = kernel
        self.mean = mean if mean is not None else ConstantMean()
        self.likelihood = GaussianLikelihood()

    def init(self, dtype=jnp.float32, key=None):
        if key is None:
            key = jax.random.key(0)
        k1, k2 = jax.random.split(key)
        kernel_params = (
            self.kernel.init(dtype, key=k1)
            if isinstance(self.kernel, SpectralMixtureKernel)
            else self.kernel.init(dtype)
        )
        return {
            "kernel": kernel_params,
            "mean": self.mean.init(dtype, key=k2),
            "likelihood": self.likelihood.init(dtype),
        }

    def train_mean(self, params, x, y):
        """Mean over the train grid (Magpie means use the train branch)."""
        if self.mean.is_history_dependent:
            return self.mean.train_values(params["mean"], y)
        return self.mean(params["mean"], x)

    def mll(self, params, x, y):
        cov = self.kernel(params["kernel"], x)
        noise = self.likelihood.noise(params["likelihood"])
        return exact_mll(y, self.train_mean(params, x, y), cov, noise)

    def posterior(self, params, train_x, train_y, test_x):
        if self.mean.is_history_dependent:
            raise ValueError(
                "joint posteriors need a deterministic mean; Magpie-mean "
                "baselines forecast through nonvol_rollouts (reference "
                "BasicWind.py:70-76)"
            )
        k_tr = self.kernel(params["kernel"], train_x)
        k_tr_te = self.kernel(params["kernel"], train_x, test_x)
        k_te = self.kernel(params["kernel"], test_x)
        resid = train_y - self.mean(params["mean"], train_x)
        noise = self.likelihood.noise(params["likelihood"])
        mean, cov = posterior(k_tr, k_tr_te, k_te, resid, noise)
        return mean + self.mean(params["mean"], test_x), cov

    def fit_state(self, params, train_x, train_y) -> BasicGPState:
        return BasicGPState(module=self, params=params, train_x=train_x,
                            train_y=train_y)


def MaternGP(mean=None) -> BasicGP:
    """Scaled Matérn baseline (reference ``BasicGPModels.py:7-16``)."""
    return BasicGP(ScaleKernel(MaternKernel()), mean)


def SMGP(num_mixtures: int = 10, mean=None) -> BasicGP:
    """Spectral-mixture baseline (reference ``BasicGPModels.py:18-27``)."""
    return BasicGP(SpectralMixtureKernel(num_mixtures=num_mixtures), mean)

"""volt_tpu — a TPU-native Gaussian-process forecasting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Volt
reference library (volatility-based kernels and moving-average means for
stochastic time-series forecasting): a two-stage hierarchical GP —

1. **GPCV**: a variational GP with a Brownian-motion kernel and a
   heteroscedastic volatility likelihood infers a latent volatility path
   from observed returns.
2. **Volt**: an exact GP over log-prices whose covariance is the time
   integral of the squared volatility path, with optional "Magpie"
   moving-average mean functions, forecast by Monte-Carlo rollouts that
   can feed option pricing.

Design stance (SURVEY.md §7): kernels/means/likelihoods are pure functions
over pytrees of unconstrained parameters; models are immutable parameter
structs plus pure ``mll`` / ``posterior`` / ``sample`` functions; training is
``optax`` under ``jit``; batching is ``vmap``; scale-out is sharding
annotations over a device mesh, not hand-written communication.
"""

__version__ = "0.1.0"

from . import (
    calibration,
    kernels,
    likelihoods,
    means,
    models,
    ops,
    options,
    parallel,
    rollouts,
    train,
)
from .kernels import BMKernel, VolatilityKernel
from .models import BMGP, MultitaskBMGP, VoltGP, VoltronGP
from .models.volt_api import Volt
from .options import ECDF, Pricer, ecdf, pricer
from .rollouts import (
    generate_prediction,
    generate_prediction as GeneratePrediction,
    mean_prediction,
    nonvol_rollouts,
    rollouts as Rollouts,
    rollouts_multitask,
    sample_prediction,
    sample_vol_paths,
)
from .train import (
    LearnGPCV,
    TrainBasicModel,
    TrainDataModel,
    TrainVolModel,
    TrainVoltMagpieModel,
    learn_gpcv,
    learn_gpcv_sparse,
    train_basic_model,
    train_data_model,
    train_vol_model,
    train_volt_magpie,
    train_volt_multitask,
)

__all__ = [
    "ops",
    "kernels",
    "means",
    "likelihoods",
    "models",
    "train",
    "rollouts",
    "options",
    "calibration",
    "parallel",
    "Volt",
    "learn_gpcv",
    "learn_gpcv_sparse",
    "train_vol_model",
    "train_data_model",
    "train_volt_magpie",
    "train_basic_model",
    "train_volt_multitask",
    "generate_prediction",
    "sample_prediction",
    "mean_prediction",
    "sample_vol_paths",
    "nonvol_rollouts",
    "rollouts_multitask",
    "Rollouts",
    "ecdf",
    "pricer",
    "ECDF",
    "Pricer",
    # reference-style aliases (voltron/__init__.py:1-12)
    "BMKernel",
    "VolatilityKernel",
    "BMGP",
    "VoltGP",
    "VoltronGP",
    "MultitaskBMGP",
    "GeneratePrediction",
    "LearnGPCV",
    "TrainVolModel",
    "TrainDataModel",
    "TrainVoltMagpieModel",
    "TrainBasicModel",
    "__version__",
]

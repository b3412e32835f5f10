"""Model layer: the two-stage Volt pipeline plus baselines."""

from .basic import BasicGP, BasicGPState, MaternGP, SMGP
from .bmgp import BMGP, BMGPState
from .gpcv import GPCVModel, GPCVState
from .volt import VoltGP, VoltState, make_mean

__all__ = [
    "BMGP",
    "BMGPState",
    "GPCVModel",
    "GPCVState",
    "VoltGP",
    "VoltState",
    "make_mean",
    "BasicGP",
    "BasicGPState",
    "MaternGP",
    "SMGP",
]

"""Model layer: the two-stage Volt pipeline plus baselines.

Mirrors the reference's ``voltron/models/__init__.py:1-6`` surface: every
name a reference user imports from ``voltron.models`` resolves here, with
the unified-by-design classes exposed under their reference names too
(``VoltronGP``/``VoltMagpie`` are one mean-parameterized ``VoltGP``;
``SingleTaskVariationalGP``'s role is played by ``GPCVModel``).
"""

from .basic import BasicGP, BasicGPState, MaternGP, SMGP
from .bmgp import BMGP, BMGPState
from .gpcv import GPCVModel, GPCVState
from .lstm import LSTMModel, train_lstm
from .multitask import MultitaskBMGP, MultitaskBMGPState, MultitaskVariationalGP
from .volt import VoltGP, VoltState, make_mean

# Reference-name aliases (voltron/models/__init__.py:1-6)
VoltronGP = VoltGP
VoltMagpie = VoltGP
SingleTaskVariationalGP = GPCVModel
LSTM = LSTMModel

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
    "MultitaskBMGP",
    "MultitaskBMGPState",
    "MultitaskVariationalGP",
    "LSTMModel",
    "train_lstm",
    "VoltronGP",
    "VoltMagpie",
    "SingleTaskVariationalGP",
    "LSTM",
]

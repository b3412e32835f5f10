"""LSTM forecasting baseline (flax).

Reference ``models/LSTM.py``: sliding-window sequences (left-padded with the
first value), a stacked LSTM whose *entire window* is fed as the feature
vector of a single timestep (reference quirk, ``LSTM.py:43-46`` — the
window is the ``input_size``), two heads (mean, softplus-std), Gaussian NLL
training with Adam(0.01), and autoregressive sampling forecasts.

TPU-native: windows are built as one gather (no DataLoader), the epoch loop
is a jitted ``lax.scan`` over shuffled minibatches, and the forecast is a
``lax.scan`` over the horizon vectorized across sample paths.
"""

from __future__ import annotations

import math
from functools import partial

import flax.linen as nn
import flax.struct as struct
import jax
import jax.numpy as jnp
import optax
from jax import lax

__all__ = ["LSTMModel", "LSTMState", "make_windows", "train_lstm"]


def make_windows(y, seq_len: int):
    """Sliding windows ending at each index (left-padded with ``y[0]``).

    Returns ``(windows (N-1, seq_len), targets (N-1,))`` — window ``i`` ends
    at ``y[i]`` and predicts ``y[i+1]`` (reference ``SequenceDataset``,
    ``LSTM.py:8-25``).
    """
    y = jnp.asarray(y)
    n = y.shape[-1]
    padded = jnp.concatenate(
        [jnp.broadcast_to(y[..., :1], (*y.shape[:-1], seq_len - 1)), y], -1
    )
    idx = jnp.arange(n - 1)[:, None] + jnp.arange(seq_len)[None, :]
    windows = padded[..., idx]  # (..., N-1, seq_len)
    targets = y[..., 1:]
    return windows, targets


class _Net(nn.Module):
    hidden_size: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        # x: (B, seq_len) — the whole window is one timestep's features
        # (reference LSTM.py:43-46).
        h = x[:, None, :]  # (B, 1, F)
        for _ in range(self.num_layers):
            h = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size))(h)
        h = h[:, -1, :]
        h = nn.relu(h)
        h = nn.Dense(128)(h)
        h = nn.relu(h)
        out = nn.Dense(2)(h)
        return jnp.stack([out[:, 0], nn.softplus(out[:, 1])], axis=-1)


@struct.dataclass
class LSTMState:
    params: dict
    train_mean: jax.Array
    train_std: jax.Array
    last_window: jax.Array  # (seq_len,) normalized, ending at y[-1]
    config: tuple = struct.field(pytree_node=False)

    def forecast(self, key, rollout_len: int, nsample: int = 50):
        """Autoregressive sampling forecast (reference ``LSTM.Forecast``,
        ``LSTM.py:99-112``); returns de-normalized samples
        ``(nsample, rollout_len)``."""
        seq_len, hidden, layers = self.config
        net = _Net(hidden, layers)
        win0 = jnp.broadcast_to(self.last_window, (nsample, seq_len))
        keys = jax.random.split(key, rollout_len)

        def body(win, k):
            out = net.apply({"params": self.params}, win)
            smpl = out[:, 0] + out[:, 1] * jax.random.normal(k, (nsample,))
            win = jnp.concatenate([win[:, 1:], smpl[:, None]], axis=-1)
            return win, smpl

        _, samples = lax.scan(body, win0, keys)
        return samples.T * self.train_std + self.train_mean


def _nll_vec(out, targets):
    """Per-window Gaussian NLL terms (reference ``LSTM.py:72-74`` sums
    these over the batch)."""
    mean, std = out[:, 0], out[:, 1]
    return (0.5 * ((targets - mean) / std) ** 2 + jnp.log(std)
            + 0.5 * math.log(2 * math.pi))


@partial(jax.jit, static_argnames=("seq_len", "hidden_size", "num_layers",
                                   "epochs", "batch_size", "lr"))
def _train(key, y, seq_len, hidden_size, num_layers, epochs, batch_size, lr):
    # ddof=1: the reference normalizes by torch.Tensor.std() (Bessel-
    # corrected); the biased jnp default mis-scaled targets/forecasts by
    # sqrt((n-1)/n) vs the module's stated parity
    mean, std = jnp.mean(y), jnp.std(y, ddof=1)
    norm = (y - mean) / std
    windows, targets = make_windows(norm, seq_len)
    n = windows.shape[0]
    batch_size = min(batch_size, n)
    # ceil, not floor: the reference DataLoader (drop_last=False) trains
    # on the n % batch_size remainder windows too; static shapes are
    # kept by padding the permutation with -1 and masking the loss
    nbatch = -(-n // batch_size)
    pad = nbatch * batch_size - n

    net = _Net(hidden_size, num_layers)
    k_init, key = jax.random.split(key)
    params = net.init(k_init, windows[:2])["params"]
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def epoch(carry, k):
        params, opt_state = carry
        perm = jax.random.permutation(k, n)
        perm = jnp.concatenate(
            [perm, jnp.full((pad,), -1, perm.dtype)]
        )
        batches = perm.reshape(nbatch, batch_size)

        def bstep(c, bidx):
            p, s = c
            mask = (bidx >= 0).astype(jnp.float32)
            safe = jnp.maximum(bidx, 0)
            bw, bt = windows[safe], targets[safe]
            loss, g = jax.value_and_grad(
                lambda q: jnp.sum(
                    _nll_vec(net.apply({"params": q}, bw), bt) * mask
                )
            )(p)
            updates, s = opt.update(g, s)
            return (optax.apply_updates(p, updates), s), loss

        (params, opt_state), losses = lax.scan(bstep, (params, opt_state),
                                               batches)
        return (params, opt_state), jnp.mean(losses)

    (params, _), losses = lax.scan(epoch, (params, opt_state),
                                   jax.random.split(key, epochs))
    # forecast seed: the window shifted to end at the last observation
    # (reference LSTM.py:100-102: cat(xin[1:], xout)).
    last_window = jnp.concatenate([windows[-1][1:], targets[-1:]], -1)
    return params, mean, std, last_window, losses


def train_lstm(y, seq_len: int = 20, hidden_size: int = 64,
               num_layers: int = 2, epochs: int = 100, batch_size: int = 128,
               lr: float = 0.01, key=None) -> LSTMState:
    """Fit the LSTM baseline on a price/level series."""
    if key is None:
        key = jax.random.key(0)
    y = jnp.asarray(y, jnp.float32)
    params, mean, std, last_window, _ = _train(
        key, y, seq_len, hidden_size, num_layers, epochs, batch_size, lr
    )
    return LSTMState(params=params, train_mean=mean, train_std=std,
                     last_window=last_window,
                     config=(seq_len, hidden_size, num_layers))


class LSTMModel:
    """Reference-style convenience wrapper (``LSTM(...)`` then
    ``Train`` / ``Forecast``)."""

    def __init__(self, train_x, train_y, seq_len: int = 20,
                 hidden_size: int = 64, num_layers: int = 2,
                 batch_size: int = 128):
        self.train_y = jnp.asarray(train_y, jnp.float32)
        self.seq_len = seq_len
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.batch_size = batch_size
        self.state = None

    def Train(self, epochs: int, display: bool = False, key=None):
        self.state = train_lstm(
            self.train_y, self.seq_len, self.hidden_size, self.num_layers,
            epochs, self.batch_size, key=key,
        )
        return self.state

    def Forecast(self, test_x, nsample: int = 50, key=None):
        if self.state is None:
            raise RuntimeError("call Train first")
        if key is None:
            key = jax.random.key(1)
        h = jnp.asarray(test_x).shape[-1]
        return self.state.forecast(key, h, nsample)

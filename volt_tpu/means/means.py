"""Mean function implementations.  See package docstring for the protocol."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.ewma import (ewma, ewma_weights, rolling_append, rolling_coeffs,
                        window_append, window_init, window_value)

from ..utils.static import ConfigEq

__all__ = [
    "ConstantMean",
    "LinearMean",
    "LogLinearMean",
    "MulIdentityMean",
    "EWMAMean",
    "HEWMAMean",
    "DEWMAMean",
    "TEWMAMean",
    "MeanRevertingEMAMean",
]


def _as_grid(x):
    x = jnp.asarray(x)
    if x.ndim >= 2 and x.shape[-1] == 1:
        x = x[..., 0]
    return x


# ---------------------------------------------------------------------------
# Deterministic means
# ---------------------------------------------------------------------------


class ConstantMean(ConfigEq):
    """Learnable constant (init 0, matching gpytorch's ``ConstantMean``)."""

    is_history_dependent = False

    def __init__(self, batch_shape: tuple = ()):
        self.batch_shape = tuple(batch_shape)

    def init(self, dtype=jnp.float32, key=None):
        del key
        return {"constant": jnp.zeros((*self.batch_shape, 1), dtype)}

    def __call__(self, params, x):
        x = _as_grid(x)
        return jnp.broadcast_to(
            params["constant"],
            jnp.broadcast_shapes(params["constant"].shape[:-1] + x.shape[-1:],
                                 x.shape),
        )


class LinearMean(ConfigEq):
    """``m(x) = x @ w + b`` with randn init (gpytorch ``LinearMean`` parity)."""

    is_history_dependent = False

    def __init__(self, input_size: int = 1, batch_shape: tuple = (),
                 bias: bool = True):
        self.input_size = input_size
        self.batch_shape = tuple(batch_shape)
        self.bias = bias

    def init(self, dtype=jnp.float32, key=None):
        if key is None:
            key = jax.random.key(0)
        k1, k2 = jax.random.split(key)
        params = {
            "weights": jax.random.normal(
                k1, (*self.batch_shape, self.input_size, 1), dtype
            )
        }
        if self.bias:
            params["bias"] = jax.random.normal(k2, (*self.batch_shape, 1), dtype)
        return params

    def _linear(self, params, x):
        x = jnp.asarray(x)
        if x.ndim == 0 or (self.input_size == 1 and (x.ndim == 1 or x.shape[-1] != 1)):
            x = x[..., None]  # (..., n) -> (..., n, 1)
        res = jnp.matmul(x, params["weights"],
                         precision=jax.lax.Precision.HIGHEST)[..., 0]
        if self.bias:
            res = res + params["bias"]
        return res

    def __call__(self, params, x):
        return self._linear(params, x)


class LogLinearMean(LinearMean):
    """``log(clamp(x @ w + b, 1e-6))`` (reference ``means/loglinear_mean.py``).

    ``initialize_from_data`` sets the bias to ``mean(exp(y))`` — the data is
    assumed to be on log scale (reference ``loglinear_mean.py:12-21``).
    """

    def initialize_from_data(self, params, x, y):
        del x
        bias = jnp.mean(jnp.exp(jnp.asarray(y)), axis=-1, keepdims=True)
        return {**params, "bias": bias}

    def __call__(self, params, x):
        return jnp.log(jnp.clip(self._linear(params, x), min=1e-6))


class MulIdentityMean(ConfigEq):
    """``m(x) = c * x`` with learnable scalar ``c`` (init 0)."""

    is_history_dependent = False

    def __init__(self, batch_shape: tuple = ()):
        self.batch_shape = tuple(batch_shape)

    def init(self, dtype=jnp.float32, key=None):
        del key
        return {"constant": jnp.zeros((*self.batch_shape, 1), dtype)}

    def __call__(self, params, x):
        return params["constant"] * _as_grid(x)


# ---------------------------------------------------------------------------
# History (Magpie) means
# ---------------------------------------------------------------------------


class EWMAMean(ConfigEq):
    """Truncated EWMA mean (reference ``means/EWMA.py:40-54``)."""

    is_history_dependent = True

    def __init__(self, k: int = 20):
        self.k = k

    def init(self, dtype=jnp.float32, key=None):
        del dtype, key
        return {}

    # --- full-filter forms (fitting) ---
    def full_values(self, params, y):
        del params
        return ewma(y, self.k)

    def train_values(self, params, y):
        return self.full_values(params, y)[..., :-1]

    def last_value(self, params, y):
        return self.full_values(params, y)[..., -1]

    # --- scan protocol (rollouts) ---
    def scan_init(self, params, y):
        del params
        return {"buf": window_init(y, self.k)}

    def scan_value(self, params, state):
        del params
        return window_value(state["buf"], ewma_weights(self.k, state["buf"].dtype))

    def scan_append(self, params, state, y_new):
        del params
        return {"buf": window_append(state["buf"], y_new)}

    # --- O(1) scan protocol (rollouts with horizon <= k) ---
    #
    # Same filter, scalar state: the windowed sum updates in O(1) per
    # step (ops/ewma.rolling_append) and — because every element that
    # expires within the first k steps comes from the *train-side* init
    # window — the expiry sequence is precomputed and fed through the
    # scan inputs.  At production shapes this removes the (S, k) buffer
    # whose per-step shift+dot dominated the rollout (PERFORMANCE.md
    # round 3).  Exact up to float reassociation (pinned against the
    # window protocol in tests).

    def scan_fast_supported(self, horizon: int) -> bool:
        return horizon <= self.k

    def scan_fast_init(self, params, y, horizon: int):
        del params
        buf = window_init(y, self.k)
        w = ewma_weights(self.k, buf.dtype)
        carry = {"s1": window_value(buf, w)}
        xs = {"exp1": jnp.moveaxis(buf[..., :horizon], -1, 0)}
        return carry, xs

    def scan_fast_value(self, params, carry):
        del params
        return carry["s1"]

    def scan_fast_append(self, params, carry, x_t, y_new):
        del params
        c = rolling_coeffs(self.k, y_new.dtype)
        return {"s1": rolling_append(carry["s1"], y_new, x_t["exp1"], c)}


class DEWMAMean(EWMAMean):
    """Double EWMA: ``2 * ema - ema(ema)`` (reference ``EWMA.py:85-98``)."""

    def full_values(self, params, y):
        del params
        e = ewma(y, self.k)
        ee = ewma(e, self.k)[..., :-1]
        return 2.0 * e - ee

    def scan_init(self, params, y):
        del params
        e = ewma(y, self.k)
        return {
            "buf": window_init(y, self.k),
            # window over the ema series, ending one entry before its last
            # (the second-level filter's causal window).
            "buf_e": window_init(e[..., :-1], self.k),
        }

    def scan_value(self, params, state):
        del params
        w = ewma_weights(self.k, state["buf"].dtype)
        return 2.0 * window_value(state["buf"], w) - window_value(state["buf_e"], w)

    def scan_fast_init(self, params, y, horizon: int):
        del params
        e = ewma(y, self.k)
        buf = window_init(y, self.k)
        buf_e = window_init(e[..., :-1], self.k)
        w = ewma_weights(self.k, buf.dtype)
        carry = {"s1": window_value(buf, w), "s2": window_value(buf_e, w)}
        xs = {"exp1": jnp.moveaxis(buf[..., :horizon], -1, 0),
              "exp2": jnp.moveaxis(buf_e[..., :horizon], -1, 0)}
        return carry, xs

    def scan_fast_value(self, params, carry):
        del params
        return 2.0 * carry["s1"] - carry["s2"]

    def scan_fast_append(self, params, carry, x_t, y_new):
        del params
        c = rolling_coeffs(self.k, y_new.dtype)
        e_cur = carry["s1"]  # pre-append level-1 value (scan_append parity)
        return {
            "s1": rolling_append(carry["s1"], y_new, x_t["exp1"], c),
            "s2": rolling_append(carry["s2"], e_cur, x_t["exp2"], c),
        }

    def scan_append(self, params, state, y_new):
        del params
        w = ewma_weights(self.k, state["buf"].dtype)
        e_cur = window_value(state["buf"], w)
        return {
            "buf": window_append(state["buf"], y_new),
            "buf_e": window_append(state["buf_e"], e_cur),
        }


class TEWMAMean(EWMAMean):
    """Triple EWMA: ``3 ema - 3 ema^2 + ema^3`` (reference ``EWMA.py:101-113``)."""

    def full_values(self, params, y):
        del params
        e = ewma(y, self.k)
        ee = ewma(e, self.k)[..., :-1]
        eee = ewma(ee, self.k)[..., :-1]
        return 3.0 * e - 3.0 * ee + eee

    def scan_init(self, params, y):
        del params
        e = ewma(y, self.k)
        ee = ewma(e, self.k)[..., :-1]
        return {
            "buf": window_init(y, self.k),
            "buf_e": window_init(e[..., :-1], self.k),
            "buf_ee": window_init(ee[..., :-1], self.k),
        }

    def scan_value(self, params, state):
        del params
        w = ewma_weights(self.k, state["buf"].dtype)
        return (
            3.0 * window_value(state["buf"], w)
            - 3.0 * window_value(state["buf_e"], w)
            + window_value(state["buf_ee"], w)
        )

    def scan_append(self, params, state, y_new):
        del params
        w = ewma_weights(self.k, state["buf"].dtype)
        e_cur = window_value(state["buf"], w)
        ee_cur = window_value(state["buf_e"], w)
        return {
            "buf": window_append(state["buf"], y_new),
            "buf_e": window_append(state["buf_e"], e_cur),
            "buf_ee": window_append(state["buf_ee"], ee_cur),
        }

    def scan_fast_init(self, params, y, horizon: int):
        del params
        e = ewma(y, self.k)
        ee = ewma(e, self.k)[..., :-1]
        buf = window_init(y, self.k)
        buf_e = window_init(e[..., :-1], self.k)
        buf_ee = window_init(ee[..., :-1], self.k)
        w = ewma_weights(self.k, buf.dtype)
        carry = {"s1": window_value(buf, w), "s2": window_value(buf_e, w),
                 "s3": window_value(buf_ee, w)}
        xs = {"exp1": jnp.moveaxis(buf[..., :horizon], -1, 0),
              "exp2": jnp.moveaxis(buf_e[..., :horizon], -1, 0),
              "exp3": jnp.moveaxis(buf_ee[..., :horizon], -1, 0)}
        return carry, xs

    def scan_fast_value(self, params, carry):
        del params
        return 3.0 * carry["s1"] - 3.0 * carry["s2"] + carry["s3"]

    def scan_fast_append(self, params, carry, x_t, y_new):
        del params
        c = rolling_coeffs(self.k, y_new.dtype)
        e_cur = carry["s1"]
        ee_cur = carry["s2"]  # pre-append level values (scan_append parity)
        return {
            "s1": rolling_append(carry["s1"], y_new, x_t["exp1"], c),
            "s2": rolling_append(carry["s2"], e_cur, x_t["exp2"], c),
            "s3": rolling_append(carry["s3"], ee_cur, x_t["exp3"], c),
        }


class HEWMAMean(EWMAMean):
    """Hull-style EWMA (reference ``EWMA.py:57-71``).

    ``hma = EWMA(2*EWMA(y, k/2)[:-1] - EWMA(y, k)[:-1], sqrt(k))``.
    The reference's single-query branch is missing for this mean (it would
    return a full-length vector), so it cannot drive autoregressive
    rollouts — we preserve that scoping and raise if the scan protocol is
    requested.
    """

    def full_values(self, params, y):
        del params
        wk = ewma(y, self.k)
        wk2 = ewma(y, int(self.k / 2))
        inner = 2.0 * wk2[..., :-1] - wk[..., :-1]
        return ewma(inner, int(math.isqrt(self.k)))

    def scan_init(self, params, y):
        raise NotImplementedError(
            "HEWMAMean has no single-query semantics in the reference "
            "(means/EWMA.py:57-71) and cannot drive rollouts."
        )

    def scan_fast_supported(self, horizon: int) -> bool:
        return False  # same scoping as scan_init


class MeanRevertingEMAMean(EWMAMean):
    """EWMA with mean-reversion ``ema[t] -= theta * (ema[t-1] - mean(y0))``
    (reference ``EWMA.py:116-135``; the latent mean is frozen at the
    *construction-time* series mean)."""

    def __init__(self, k: int = 20, theta: float = 0.5):
        super().__init__(k)
        self.theta = theta

    def full_values(self, params, y, latent_mean=None):
        del params
        e = ewma(y, self.k)
        if latent_mean is None:
            latent_mean = jnp.mean(y, axis=-1, keepdims=True)
        adj = e.at[..., 1:].add(-self.theta * (e[..., :-1] - latent_mean))
        return adj

    def train_values(self, params, y, latent_mean=None):
        return self.full_values(params, y, latent_mean)[..., :-1]

    def last_value(self, params, y, latent_mean=None):
        return self.full_values(params, y, latent_mean)[..., -1]

    def scan_init(self, params, y):
        del params
        e = ewma(y, self.k)
        return {
            "buf": window_init(y, self.k),
            "prev_e": e[..., -2],
            "latent_mean": jnp.mean(y, axis=-1),
        }

    def scan_value(self, params, state):
        del params
        w = ewma_weights(self.k, state["buf"].dtype)
        e = window_value(state["buf"], w)
        return e - self.theta * (state["prev_e"] - state["latent_mean"])

    def scan_append(self, params, state, y_new):
        del params
        w = ewma_weights(self.k, state["buf"].dtype)
        return {
            "buf": window_append(state["buf"], y_new),
            "prev_e": window_value(state["buf"], w),
            "latent_mean": state["latent_mean"],
        }

    def scan_fast_init(self, params, y, horizon: int):
        del params
        e = ewma(y, self.k)
        buf = window_init(y, self.k)
        w = ewma_weights(self.k, buf.dtype)
        carry = {"s1": window_value(buf, w), "prev_e": e[..., -2],
                 "latent_mean": jnp.mean(y, axis=-1)}
        xs = {"exp1": jnp.moveaxis(buf[..., :horizon], -1, 0)}
        return carry, xs

    def scan_fast_value(self, params, carry):
        del params
        return carry["s1"] - self.theta * (carry["prev_e"]
                                           - carry["latent_mean"])

    def scan_fast_append(self, params, carry, x_t, y_new):
        del params
        c = rolling_coeffs(self.k, y_new.dtype)
        return {
            "s1": rolling_append(carry["s1"], y_new, x_t["exp1"], c),
            "prev_e": carry["s1"],  # pre-append value (scan_append parity)
            "latent_mean": carry["latent_mean"],
        }

"""High-level convenience API: construct, ``Train()``, ``Forecast()``.

Mirrors the reference's ``Volt`` class (``models/Volt.py``): the
constructor takes the full log-price series and a mean name; ``Train`` runs
the entire pipeline (GPCV -> vol model -> data model); ``Forecast``
delegates to the rollout sampler.  The reference's ``Forecast`` passes
kwargs its own ``Rollouts`` does not accept and raises ``TypeError``
(SURVEY.md preamble) — fixed by design here.

Batched construction: ``log_data`` of shape ``(T, n)`` (the reference's
``TRAIN_Y: T X N`` convention, ``Volt.py:20-33``) routes the vol stage to
the Kronecker :class:`~volt_tpu.models.multitask.MultitaskBMGP` and
``Forecast`` to :func:`~volt_tpu.rollouts.rollouts_multitask`, exactly as
the reference constructor selects ``MultitaskBMGP`` for 2-D data
(``Volt.py:64-71``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..rollouts import rollouts, rollouts_multitask
from ..train import (learn_gpcv, learn_gpcv_multitask, train_vol_model,
                     train_volt_magpie, train_volt_multitask)

__all__ = ["Volt"]


class Volt:
    def __init__(self, train_x, log_data, mean: str = "constant",
                 vol_path=None, k: int = 25, rank: int = 1):
        """``vol_path`` (``(n-1,)`` or ``(T, n-1)``) optionally supplies an
        externally-estimated volatility path (reference ``Volt.py:18-19``).
        The reference stores it but ``Train`` unconditionally re-runs
        ``LearnGPCV`` over it (``Volt.py:102-105``), making the argument
        dead; fixed by design here — a supplied path IS used, skipping the
        GPCV stage in :meth:`Train`."""
        self.train_x = jnp.asarray(train_x)    # full grid, length n
        self.log_data = jnp.asarray(log_data)  # (n,) or (T, n) log prices
        self.mean_name = mean
        self.k = k
        self.rank = rank
        self.vol_path = None if vol_path is None else jnp.asarray(vol_path)
        self.batched = self.log_data.ndim > 1
        self.model = None
        self.vol_model = None

    def Train(self, gpcv_iters: int = 400, vol_mod_iters: int = 1000,
              data_mod_iters: int = 400, display: bool = False, key=None):
        """GPCV -> vol GP -> data model (reference ``Volt.Train``,
        ``Volt.py:95-146``); the batched case couples assets through the
        multitask vol GP."""
        x = self.train_x
        data = jnp.exp(self.log_data)
        # one user key seeds every randomness-consuming stage, split so
        # the stages never share a key
        k_gpcv, k_fit = jax.random.split(
            key if key is not None else jax.random.key(0)
        )
        if self.batched:
            if self.vol_path is not None:
                scales = self.vol_path
            else:
                scales = learn_gpcv_multitask(x[1:], data, gpcv_iters,
                                              rank=self.rank, key=k_gpcv)
            self.model, self.vol_model = train_volt_multitask(
                x[1:], data[:, 1:], scales, train_iters=data_mod_iters,
                vol_iters=vol_mod_iters, k=self.k,
                mean_func=self.mean_name, rank=self.rank,
                printing=display, key=k_fit,
            )
            return self.model
        if self.vol_path is not None:
            vol = self.vol_path
        else:
            vol = learn_gpcv(x[1:], data, gpcv_iters, printing=display,
                             key=k_gpcv)
        vol_state = train_vol_model(x[1:], vol, vol_mod_iters,
                                    printing=display)
        self.model = train_volt_magpie(
            x[1:], data[1:], vol_state, vol, train_iters=data_mod_iters,
            printing=display, k=self.k, mean_func=self.mean_name, key=k_fit,
        )
        return self.model

    def Forecast(self, test_x, nsample: int = 50, mean_revert: bool = False,
                 theta: float = 0.05, key=None):
        """MC forecast samples of log prices: ``(nsample, H)``, or
        ``(T, nsample, H)`` for batched construction."""
        if self.model is None:
            raise RuntimeError("call Train() first")
        if key is None:
            key = jax.random.key(0)
        if self.batched:
            # full price series for the mean-reversion latent mean — the
            # same convention as the unbatched branch / `rollouts`
            return rollouts_multitask(
                key, self.model, self.vol_model,
                jnp.exp(self.log_data), jnp.asarray(test_x),
                nsample=nsample, theta=theta if mean_revert else None,
            )
        return rollouts(
            key, self.model, self.train_x[1:], jnp.exp(self.log_data),
            jnp.asarray(test_x), nsample=nsample,
            theta=theta if mean_revert else None,
        )

"""Option pricing at scale: fit -> rollout -> payoff grid, all on-device.

The BASELINE "option pricing at scale" configuration (500 tickers x 10k MC
paths feeding ``option_utils`` pricing): the batched pipeline produces
``(B, S, H)`` log-price paths sharded over the ``(asset, path)`` mesh, and
the call-valuation grid reduces them on-device — only the tiny
``(B, strikes, expiries)`` value tensor ever reaches the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pipeline import PipelineConfig, fit_forecast_batch

__all__ = ["price_options_batch"]


def price_options_batch(key, train_x, train_ys, test_x, strikes,
                        expiry_steps, config: PipelineConfig, mesh=None,
                        realized=None):
    """MC call values over a ``(asset, strike, expiry)`` grid.

    ``strikes``: ``(K,)`` absolute strike prices; ``expiry_steps``: ``(E,)``
    integer horizon offsets into ``test_x``; ``realized``: optional
    ``(B, E)`` realized prices for sample-percentile calibration
    (reference ``option_utils.Pricer``'s percentile column).

    Returns a dict with ``values (B, K, E)``, ``forwards (B, E)`` and
    optionally ``percentiles (B, E)``.
    """
    if config.output != "samples":
        # a quantile fan is (B, L, H) — averaging payoffs over the L
        # levels as if they were MC paths would be finite, plausible
        # garbage; the payoff expectation needs the raw paths
        raise ValueError(
            "price_options_batch needs raw MC paths; use "
            "PipelineConfig(output='samples'), got "
            f"output={config.output!r}"
        )
    samples, aux = fit_forecast_batch(key, train_x, jnp.asarray(train_ys),
                                      test_x, config, mesh=mesh)
    expiry_steps = jnp.asarray(expiry_steps)
    strikes = jnp.asarray(strikes, jnp.float32)

    @jax.jit
    def grid(log_paths):
        log_px = log_paths[..., expiry_steps]  # (B, S, E)
        px = jnp.exp(log_px)
        payoff = jnp.maximum(
            px[:, None, :, :] - strikes[None, :, None, None], 0.0
        )
        values = jnp.mean(payoff, axis=2)  # (B, K, E)
        forwards = jnp.mean(px, axis=1)    # (B, E)
        return values, forwards, log_px

    values, forwards, log_px = grid(samples)
    out = {"values": values, "forwards": forwards, "samples": samples,
           "aux": aux}
    if realized is not None:
        realized = jnp.asarray(realized, jnp.float32)
        # compare in log space directly (the paths ARE log prices) — no
        # exp/log round-trip, no float32 flip of the strict < at ties
        out["percentiles"] = jnp.mean(
            (log_px < jnp.log(realized)[:, None, :]).astype(jnp.float32),
            axis=1,
        )
    return out

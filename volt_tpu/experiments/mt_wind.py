"""Multitask (correlated-station) wind forecasting.

The reference's multitask wind analysis consumes saved rollout dicts
(``full_ewma400_theta005_.pt`` with ``x_paths`` / ``names_list``,
``mtwind_plotting-checkpoint.ipynb``) produced with the batched
VoltronGP + MultitaskBMGP path.  This driver is that producer: per-station
GPCV, a Kronecker multitask vol GP coupling the stations, and jointly
correlated rollouts.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..rollouts import rollouts_multitask
from ..train import learn_gpcv, train_volt_multitask

__all__ = ["run_multitask_wind"]


def run_multitask_wind(names, station_data, ntrain: int = 400,
                       forecast_horizon: int = 126, nsample: int = 1000,
                       gpcv_iters: int = 200, vol_iters: int = 400,
                       k: int = 400, theta: float = 0.05,
                       mean_func: str = "ewma", out_path=None, key=None,
                       lonlat=None, conus_only: bool = False):
    """Joint forecast for all stations; returns (and optionally pickles)
    ``{"x_paths": (T, S, H), "names_list": [...]}``.

    ``station_data``: list/array of per-station wind series; preprocessing
    parity with the weather CLI (``-99 -> 0``, ``+1`` level shift).
    ``conus_only`` drops stations with longitude <= -128 (the notebook's
    CONUS filter).
    """
    if key is None:
        key = jax.random.key(0)
    keep = []
    for idx in range(len(station_data)):
        if conus_only and lonlat is not None and lonlat[idx][0] <= -128:
            continue
        # dead-station test runs AFTER the -99 -> 0 replacement (same
        # order as gp_generator.py:69-71): an all-missing station would
        # otherwise pass (mean == -99 != 0) and feed a constant series
        # into the joint Kronecker fit, damaging every coupled station
        s = np.asarray(station_data[idx], np.float32).copy()
        s[s == -99.0] = 0.0
        if s.mean() != 0:
            keep.append(idx)
    names_list = [names[i] for i in keep]

    train_x = jnp.arange(ntrain - 1, dtype=jnp.float32) / 365
    test_x = jnp.arange(ntrain, ntrain + forecast_horizon,
                        dtype=jnp.float32) / 365

    prices = []
    vols = []
    for i in keep:
        raw = np.asarray(station_data[i], np.float32).copy()
        raw[raw == -99.0] = 0.0
        y = jnp.asarray(raw[:ntrain] + 1.0)
        prices.append(y)
        vols.append(learn_gpcv(train_x, y, train_iters=gpcv_iters))
    prices = jnp.stack(prices)      # (T, ntrain)
    vols = jnp.stack(vols)          # (T, ntrain - 1)

    volt_state, mt_state = train_volt_multitask(
        train_x, prices[:, 1:], vols, train_iters=0 if
        mean_func in ("ewma", "dewma", "tewma") else 200,
        vol_iters=vol_iters, k=k, mean_func=mean_func,
    )
    x_paths = rollouts_multitask(key, volt_state, mt_state, prices, test_x,
                                 nsample=nsample, theta=theta)
    result = {"x_paths": np.asarray(x_paths), "names_list": names_list}
    if out_path:
        with open(out_path, "wb") as fh:
            pickle.dump(result, fh)
    return result

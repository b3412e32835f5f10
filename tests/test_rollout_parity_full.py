"""Full-horizon fast-vs-dense rollout parity for every Magpie mean.

The Markov O(1)/step scan (``rollouts``) must reproduce the reference's
dense autoregressive algebra — ``rollouts_dense`` is a literal restatement
of ``rollout_utils.py:57-93`` — at EVERY step of a 10-step horizon, for
each history-dependent mean (EWMA, DEWMA, TEWMA, MeanRevert) and with the
mean-reversion knob ``theta`` switched on.

Both paths are handed the same top-level key: each splits it once and uses
the first half for ``sample_vol_paths``, so they condition on *identical*
vol draws and only the z-draw Monte-Carlo error separates the per-step
moment estimates.  ``nonvol_rollouts`` gets the same treatment for the
spectral-mixture kernel paired with a Magpie mean (the reference's
``nonvol_rollouts``, ``rollout_utils.py:95-115``, as driven by
``BasicWindRollouts``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.data import sabr_paths
from volt_tpu.means import EWMAMean
from volt_tpu.models.basic import SMGP
from volt_tpu.rollouts import (
    nonvol_rollouts,
    nonvol_rollouts_dense,
    rollouts,
    rollouts_dense,
)
from volt_tpu.train import learn_gpcv, train_vol_model, train_volt_magpie

N, H = 90, 10
DT = 1.0 / 252
NSAMPLE = 1500


@pytest.fixture(scope="module")
def base():
    f, _ = sabr_paths(steps=N + 1, seed=77)
    train_y = jnp.asarray(f)
    train_x = jnp.arange(N, dtype=jnp.float32) * DT
    test_x = jnp.arange(H, dtype=jnp.float32) * DT + train_x[-1] + DT
    vol = learn_gpcv(train_x, train_y, train_iters=60)
    vol_state = train_vol_model(train_x, vol, train_iters=60)
    return train_x, train_y, test_x, vol, vol_state


@pytest.mark.parametrize(
    "mean_func,theta",
    [
        ("ewma", None),
        ("dewma", None),
        ("tewma", None),
        ("meanrevert", None),
        ("ewma", 0.05),  # theta-on exercises the extra reversion term
    ],
    ids=["ewma", "dewma", "tewma", "meanrevert", "ewma-theta"],
)
def test_volt_rollout_matches_dense_every_step(base, mean_func, theta):
    train_x, train_y, test_x, vol, vol_state = base
    model = train_volt_magpie(train_x, train_y[1:], vol_state, vol,
                              train_iters=40, k=20, mean_func=mean_func)

    key = jax.random.key(1234)
    fast = np.asarray(rollouts(key, model, train_x, train_y, test_x,
                               nsample=NSAMPLE, theta=theta))
    dense = np.asarray(rollouts_dense(key, model, train_x, train_y, test_x,
                                      nsample=NSAMPLE, theta=theta))
    assert fast.shape == dense.shape == (NSAMPLE, H)

    # Per-step marginal moments, every step of the horizon.  Shared vol
    # draws leave only z-draw MC error: mean ~ sd_t/sqrt(S) per path set.
    f_mean, d_mean = fast.mean(0), dense.mean(0)
    f_std, d_std = fast.std(0), dense.std(0)
    np.testing.assert_allclose(f_mean, d_mean, atol=8e-3,
                               err_msg=f"{mean_func} theta={theta} mean")
    np.testing.assert_allclose(f_std, d_std, rtol=0.15, atol=2e-3,
                               err_msg=f"{mean_func} theta={theta} std")
    # Paths must actually diffuse (guard against degenerate agreement).
    assert f_std[-1] > f_std[0] > 0


def test_nonvol_sm_magpie_matches_dense_every_step(base):
    from volt_tpu.train import _fit_basic

    train_x, train_y, test_x, _, _ = base
    log_y = jnp.log(train_y[1:])
    module = SMGP(num_mixtures=4, mean=EWMAMean(20))
    params = module.init(key=jax.random.key(0))
    params["kernel"] = module.kernel.initialize_from_data(
        params["kernel"], train_x, log_y, key=jax.random.key(0)
    )
    params, _ = _fit_basic(module, params, train_x, log_y, 80, 0.1)
    model = module.fit_state(params, train_x, log_y)

    nsample = 1200
    fast = np.asarray(
        nonvol_rollouts(jax.random.key(5), model, None, None, test_x,
                        nsample=nsample)
    )
    dense = np.asarray(
        nonvol_rollouts_dense(jax.random.key(6), model, test_x,
                              nsample=nsample)
    )
    assert fast.shape == dense.shape == (nsample, H)
    np.testing.assert_allclose(fast.mean(0), dense.mean(0), atol=8e-3)
    np.testing.assert_allclose(fast.std(0), dense.std(0), rtol=0.15,
                               atol=2e-3)
    assert fast.std(0)[-1] > 0

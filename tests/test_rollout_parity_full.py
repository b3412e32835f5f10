"""Full-horizon fast-vs-dense rollout parity for every Magpie mean.

The Markov O(1)/step scan (``rollouts``) must reproduce the reference's
dense autoregressive algebra — ``rollouts_dense`` is a literal restatement
of ``rollout_utils.py:57-93`` — at EVERY step of a 10-step horizon, for
each history-dependent mean (EWMA, DEWMA, TEWMA, MeanRevert) and with the
mean-reversion knob ``theta`` switched on.

Common random numbers make the check exact rather than statistical: both
paths are handed the *same* vol draws and the same per-step standard
normals, so if the conditional laws agree the sampled paths must agree
per-path, per-step, to float32 precision — a far stronger assertion than
moment matching (which let a trend-follower's MC error masquerade as
bias).  ``nonvol_rollouts`` gets the same treatment for the
spectral-mixture kernel paired with a Magpie mean (the reference's
``nonvol_rollouts``, ``rollout_utils.py:95-115``, as driven by
``BasicWindRollouts``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.means import EWMAMean
from volt_tpu.models.basic import SMGP
from volt_tpu.rollouts import (
    _nonvol_scan,
    _rollout_volt_scan,
    nonvol_rollouts_dense,
    rollouts_dense,
    sample_vol_paths,
)
from volt_tpu.train import train_volt_magpie

N, H = 72, 10
DT = 1.0 / 252
NSAMPLE = 64


@pytest.fixture(scope="module")
def base(std_fitted):
    return std_fitted  # (train_x, train_y, test_x, vol, vol_state, model)


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
def test_volt_rollout_matches_dense_per_path(base, mean_func, theta):
    train_x, train_y, test_x, vol, vol_state, std_model = base
    if mean_func == "ewma":
        # exact std_fitted config (iters=40, k=20, ewma): reuse the
        # session fit instead of refitting (CLAUDE.md reuse rule) —
        # covers both the plain and the theta-on ewma cases
        model = std_model
    else:
        model = train_volt_magpie(train_x, train_y[1:], vol_state, vol,
                                  train_iters=40, k=20,
                                  mean_func=mean_func)

    key = jax.random.key(1234)
    k_vol, k_z = jax.random.split(key)
    pred_vol = sample_vol_paths(k_vol, vol_state, test_x, NSAMPLE)
    zs = jax.random.normal(k_z, (NSAMPLE, H), jnp.float32)

    use_theta = theta is not None
    latent = jnp.mean(jnp.log(train_y)) if use_theta else jnp.float32(0)
    fast = np.asarray(_rollout_volt_scan(
        model, latent, test_x, pred_vol, zs, use_theta,
        jnp.float32(theta if use_theta else 0.0),
    ))
    dense = np.asarray(rollouts_dense(
        key, model, train_x, train_y, test_x, nsample=NSAMPLE, theta=theta,
        pred_vol=pred_vol, zs=zs,
    ))
    assert fast.shape == dense.shape == (NSAMPLE, H)
    # Same conditional law + same draws => per-path agreement at every step.
    np.testing.assert_allclose(fast, dense, atol=5e-4,
                               err_msg=f"{mean_func} theta={theta}")
    # Paths must actually diffuse (guard against degenerate agreement).
    std = fast.std(0)
    assert std[-1] > std[0] > 0


def test_nonvol_sm_magpie_matches_dense_per_path(base):
    from volt_tpu.train import _fit_basic

    train_x, train_y, test_x, _, _, _ = base
    log_y = jnp.log(train_y[1:])
    module = SMGP(num_mixtures=4, mean=EWMAMean(20))
    params = module.init(key=jax.random.key(0))
    params["kernel"] = module.kernel.initialize_from_data(
        params["kernel"], train_x, log_y, key=jax.random.key(0)
    )
    params, _ = _fit_basic(module, params, train_x, log_y, 50, 0.1)
    model = module.fit_state(params, train_x, log_y)

    nsample = 64
    key = jax.random.key(5)
    fast = np.asarray(_nonvol_scan(key, model, test_x, nsample))
    # _nonvol_scan draws normal(key, (H, S)); hand the dense oracle the
    # same numbers, transposed to its (S, H) convention.
    zs = jax.random.normal(key, (H, nsample), jnp.float32).T
    dense = np.asarray(
        nonvol_rollouts_dense(key, model, test_x, nsample=nsample, zs=zs)
    )
    assert fast.shape == dense.shape == (nsample, H)
    np.testing.assert_allclose(fast, dense, atol=2e-3)
    assert fast.std(0)[-1] > 0

"""Does gpytorch's KL-prior jitter move the trained model? (argmin study)

PARITY.md records the one restated-not-executed gpytorch detail:
``UnwhitenedVariationalStrategy.prior_distribution`` wraps ``Kuu`` in
``add_jitter()`` (source default 1e-3) before the KL, so the reference's
GPCV optimizes a slightly different objective than the shipped closed-form
BM KL (measured offset ~0.21 nats/datum at the converged parameters).
An objective offset alone says nothing about the *argmin* — this harness
runs the executed-torch GPCV lane (the trajectory-parity restatement of
``train_utils.py:15-67`` + ``single_task_variational_gp.py:204-254``)
through FULL training twice from the bit-identical shipped init — once
with the jittered prior KL, once without — and compares what a user
actually consumes:

* the converged vol path (GH-75 expected scale at the train points, the
  stage's product, ``train_utils.py:62-67``),
* the fitted kernel/mean hyperparameters,
* downstream forecast quantiles after feeding each vol path through the
  SAME shipped vol-GP + data-model + CRN rollout chain.

Usage:
    JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu python tools/jitter_argmin.py \
        [--n 400] [--iters 1000] [--jitter 1e-3] [--horizon 40] [--seed 3]

Prints one JSON object (consumed by PARITY.md's KL-prior-jitter section).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

if os.environ.get("JAX_ENABLE_X64", "").lower() in ("1", "true"):
    import jax

    jax.config.update("jax_enable_x64", True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()

import parity_trajectories as pt  # noqa: E402  (the executed-torch lane)


def torch_expected_scale(p, locs, w):
    """GH-75 E_q[clamp(exp(f), 1e-3)] at the train points — the stage
    output (reference ``train_utils.py:62-67`` uses a 10-sample MC of the
    same expectation)."""
    chol_q = torch.tril(p["chol_variational_covar"])
    marg_var = (chol_q ** 2).sum(-1)
    mean = p["variational_mean"]
    f = torch.sqrt(2.0 * marg_var) * locs.view(-1, 1) + mean
    scale = f.clamp(max=80.0).exp().clamp(min=1e-3)
    return (w[:, None] * scale).sum(0)


def run_torch_lane(params0, x, yy, iters, lr, prior_jitter, locs, w):
    x_t, yy_t = pt.t(x), pt.t(np.asarray(yy))
    p = {
        "raw_vol": torch.nn.Parameter(pt.t(params0["kernel"]["raw_vol"])),
        "constant": torch.nn.Parameter(pt.t(params0["mean"]["constant"])),
        "variational_mean": torch.nn.Parameter(
            pt.t(params0["variational_mean"])),
        "chol_variational_covar": torch.nn.Parameter(
            pt.t(params0["chol_variational_covar"])),
    }
    opt = torch.optim.Adam(list(p.values()), lr=lr)
    for _ in range(iters):
        opt.zero_grad()
        loss = pt.torch_gpcv_loss(p, x_t, yy_t, locs, w, prior_jitter)
        loss.backward()
        opt.step()
    with torch.no_grad():
        vol_path = torch_expected_scale(p, locs, w).numpy()
        final_loss = pt.torch_gpcv_loss(p, x_t, yy_t, locs, w,
                                        prior_jitter).item()
    return {
        "vol_path": vol_path,
        "raw_vol": float(p["raw_vol"].detach().numpy()[0]),
        "vol": float(torch.sigmoid(p["raw_vol"].detach())[0]),
        "constant": float(p["constant"].detach().numpy()[0]),
        "final_loss": final_loss,
    }


def downstream_quantiles(key, x, prices, vol_path, horizon, levels):
    """vol path -> shipped vol-GP + data-model + CRN rollout quantiles."""
    from volt_tpu import rollouts as ro
    from volt_tpu.train import train_data_model, train_vol_model

    x_j = jnp.asarray(x)
    vol_j = jnp.asarray(vol_path, x_j.dtype)
    vol_state = train_vol_model(x_j, vol_j, train_iters=300,
                                vol_mll="kalman")
    volt_state = train_data_model(x_j, jnp.asarray(prices[1:], x_j.dtype),
                                  vol_state, vol_j, train_iters=300)
    dt = float(x[1] - x[0])
    test_x = x_j[-1] + dt * jnp.arange(1, horizon + 1, dtype=x_j.dtype)
    samples = ro.rollouts(key, volt_state, x_j, jnp.asarray(prices[1:]),
                          test_x, nsample=1000)
    fan = jnp.quantile(samples, jnp.asarray(levels, samples.dtype), axis=-2)
    return np.asarray(fan)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--jitter", type=float, default=1e-3)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    from volt_tpu.models.gpcv import GPCVModel
    from volt_tpu.train import scaled_returns

    x, prices, true_vol = pt.make_data(args.n, args.seed)
    x_j = jnp.asarray(x, pt.JDT)
    yy = scaled_returns(x_j, jnp.asarray(prices, pt.JDT))
    module = GPCVModel(q="full", ell_method="quadrature")
    params0 = module.init(x_j, yy, dtype=pt.JDT)

    locs_np, w_np = np.polynomial.hermite.hermgauss(module.num_locs)
    locs, w = pt.t(locs_np), pt.t(w_np / math.sqrt(math.pi))

    plain = run_torch_lane(params0, x, yy, args.iters, 0.01, 0.0, locs, w)
    jit = run_torch_lane(params0, x, yy, args.iters, 0.01, args.jitter,
                         locs, w)

    vp, vj = plain["vol_path"], jit["vol_path"]
    tv = true_vol[1:]
    out = {
        "n": args.n, "iters": args.iters, "jitter": args.jitter,
        "x64": bool(pt.F64),
        "vol_path_max_rel_diff": float(np.max(np.abs(vj - vp) / vp)),
        "vol_path_mean_rel_diff": float(np.mean(np.abs(vj - vp) / vp)),
        "rel_err_vs_truth_plain": float(np.mean(np.abs(vp - tv) / tv)),
        "rel_err_vs_truth_jittered": float(np.mean(np.abs(vj - tv) / tv)),
        "kernel_vol_plain": plain["vol"],
        "kernel_vol_jittered": jit["vol"],
        "constant_plain": plain["constant"],
        "constant_jittered": jit["constant"],
        "final_loss_plain": plain["final_loss"],
        "final_loss_jittered": jit["final_loss"],
    }

    levels = (0.025, 0.25, 0.5, 0.75, 0.975)
    key = jax.random.key(0)
    fan_p = downstream_quantiles(key, x, prices, vp, args.horizon, levels)
    fan_j = downstream_quantiles(key, x, prices, vj, args.horizon, levels)
    # price-quantile deltas, relative to the last observed price
    p_last = float(prices[-1])
    out["forecast_quantile_max_rel_diff"] = float(
        np.max(np.abs(fan_j - fan_p)) / p_last)
    out["forecast_quantile_mean_rel_diff"] = float(
        np.mean(np.abs(fan_j - fan_p)) / p_last)
    # interval width at the horizon (the calibration-relevant statistic)
    w_p = fan_p[-1, -1] - fan_p[0, -1]
    w_j = fan_j[-1, -1] - fan_j[0, -1]
    out["h_step_95_width_rel_diff"] = float(abs(w_j - w_p) / w_p)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

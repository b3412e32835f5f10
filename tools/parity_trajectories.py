"""Full-objective optimization-trajectory parity against executed torch.

The last north-star clause ("MLL matching GPyTorch to 1e-5",
BASELINE.json) pinned per-component forwards only, because gpytorch is
not installable on this image.  torch itself IS installed, and the
reference's three training objectives are small enough to restate in
pure torch — same math, same constraint transforms, same GH-75 node
placement, same Adam hyperparameters — with torch autodiff + torch.optim
.Adam as a fully independent execution.  This harness runs the shipped
optax ``lax.scan`` fits beside those torch loops from bit-identical
inits and reports per-iteration loss agreement:

* **GPCV ELBO** — unwhitened variational strategy, inducing == train,
  dense Cholesky q, exp likelihood, GH-75 expected log-prob, Laplace
  init with the x10 root inflation and the clamp-after-diag_embed
  quirk, Adam(0.01) (reference ``train_utils.py:15-67``,
  ``single_task_variational_gp.py:204-254``).
* **Vol-GP exact MLL** — BM kernel, -0.5 vol^2 t drift mean, the
  raw-noise no-op trap, Adam(0.01) (``train_utils.py:69-95``,
  ``models/BMGP.py:9-28``).  Both shipped O(n) forms (closed-form
  spectrum and Kalman scan) are compared against the torch dense MLL.
* **Volt data-model exact MLL** — frozen CumTrapz covariance,
  log-linear mean initialized from data, raw_noise=1e-5 pin, Adam(0.1)
  (``train_utils.py:98-144``).

The torch restatements are *dense* (explicit Cholesky factorizations,
``torch.distributions``-style log probs) where the shipped JAX paths are
closed-form/O(n) — so agreement also re-verifies the factorization-free
algebra end-to-end under an optimizer, not just at fixed parameters.

KL-prior jitter note: gpytorch's ``UnwhitenedVariationalStrategy
.prior_distribution`` wraps ``Kuu`` in ``add_jitter()`` (source default
1e-3) before the KL.  gpytorch cannot be executed here to pin that
constant, so the headline lanes compare against the un-jittered prior
(= the shipped closed-form KL; the increment floor 1e-6 never engages on
these grids), and ``--prior-jitter`` measures the sensitivity: the
objective delta at init is reported either way (see PARITY.md).

Usage:
    JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu python tools/parity_trajectories.py \
        --n 60 --iters 300 [--objective all|gpcv|vol|volt] [--prior-jitter 0]

Prints one JSON object with per-objective trajectory / matched-params /
init diffs.  Float64 end to end when JAX_ENABLE_X64=1 (the intended
mode: isolates objective/optimizer parity from float32 rounding).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_ENABLE_X64", "").lower() in ("1", "true"):
    import jax

    jax.config.update("jax_enable_x64", True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()

F64 = jax.config.jax_enable_x64
JDT = jnp.float64 if F64 else jnp.float32
TDT = torch.float64 if F64 else torch.float32
LOG_2PI = math.log(2.0 * math.pi)


def t(x):
    return torch.as_tensor(np.asarray(x), dtype=TDT)


def make_data(n: int, seed: int = 3):
    """Synthetic stochastic-vol price series (example.ipynb-style)."""
    rng = np.random.default_rng(seed)
    dt = 1.0 / 252.0
    m = n + 1
    log_vol = np.log(0.2) + 0.25 * np.sin(np.linspace(0.0, 3.0, m)) \
        + 0.05 * rng.standard_normal(m).cumsum() * math.sqrt(dt)
    vol = np.exp(log_vol)
    px = np.empty(m)
    px[0] = 100.0
    z = rng.standard_normal(m - 1)
    for i in range(m - 1):
        px[i + 1] = px[i] * (1.0 + vol[i] * math.sqrt(dt) * z[i])
    x = (np.arange(n) + 1) * dt  # the reference's train_x[1:] grid
    return x.astype(np.float64), px.astype(np.float64), vol.astype(np.float64)


def mvn_nll_per_point(y, mean, cov):
    """-log N(y; mean, cov) / n via dense torch Cholesky."""
    n = y.shape[-1]
    chol = torch.linalg.cholesky(cov)
    sol = torch.linalg.solve_triangular(chol, (y - mean)[:, None],
                                        upper=False)
    ll = -0.5 * (sol ** 2).sum() - chol.diagonal().log().sum() \
        - 0.5 * n * LOG_2PI
    return -ll / n


# ---------------------------------------------------------------------------
# GPCV — variational ELBO (reference train_utils.py:15-67)
# ---------------------------------------------------------------------------


def torch_gpcv_init(x, yy):
    """Pure-torch restatement of the Laplace init
    (single_task_variational_gp.py:204-254)."""
    x_t, y = t(x), t(yy)
    n = y.shape[0]
    rs = torch.stack(
        [y[:i].std() if i >= 2 else torch.tensor(float("nan"), dtype=TDT)
         for i in range(n)]
    )
    rs[:10] = rs[10]
    f = rs.clamp(min=1e-4).log()
    raw_vol = torch.logit(torch.tensor(0.2, dtype=TDT))  # Interval(0,1)
    vol = torch.sigmoid(raw_vol)
    kuu = vol * torch.minimum(x_t[:, None], x_t[None, :])
    # clamp AFTER diag_embed: off-diagonal zeros rise to 1e-4 (the quirk,
    # single_task_variational_gp.py:221-225)
    inv_h = torch.diag_embed(0.5 * y.pow(-2.0) * (2.0 * f).exp()).clamp(
        min=1e-4, max=1000.0
    )
    chol = torch.linalg.cholesky(kuu)
    inner = chol.T @ inv_h @ chol + torch.eye(n, dtype=TDT)
    s = chol @ torch.linalg.solve(inner, chol.T)
    # torch.linalg.cholesky reads the lower triangle only, same as
    # lax.linalg.cholesky — no symmetrization, matching the shipped init
    s_root = torch.tril(torch.linalg.cholesky(s)) * 10.0
    return {
        "raw_vol": raw_vol.reshape(1),
        "constant": rs.mean().log().reshape(1),
        "variational_mean": f,
        "chol_variational_covar": s_root,
    }


def torch_gpcv_loss(p, x_t, yy_t, locs, w, prior_jitter: float):
    n = yy_t.shape[0]
    vol = torch.sigmoid(p["raw_vol"])
    kuu = vol * torch.minimum(x_t[:, None], x_t[None, :])
    chol_q = torch.tril(p["chol_variational_covar"])
    marg_var = (chol_q ** 2).sum(-1)
    mean = p["variational_mean"]
    # GH-75 expected log-prob of N(0, clamp(exp(f), 1e-3))
    f = torch.sqrt(2.0 * marg_var) * locs.view(-1, 1) + mean
    scale = f.clamp(max=80.0).exp().clamp(min=1e-3)
    lp = -0.5 * (yy_t / scale) ** 2 - scale.log() - 0.5 * LOG_2PI
    ell = (w[:, None] * lp).sum(0)
    # KL(q || N(const 1, Kuu [+ jitter I]))
    kuu_j = kuu + prior_jitter * torch.eye(n, dtype=TDT)
    chol_p = torch.linalg.cholesky(kuu_j)
    diff = (p["constant"].expand(n) - mean)[:, None]
    sol_m = torch.linalg.solve_triangular(chol_p, diff, upper=False)
    sol_q = torch.linalg.solve_triangular(chol_p, chol_q, upper=False)
    kl = 0.5 * (
        (sol_q ** 2).sum() + (sol_m ** 2).sum() - n
        + 2.0 * chol_p.diagonal().log().sum()
        # |diag|: covariance-invariant, matches ops/mvn.mvn_kl
        - 2.0 * chol_q.diagonal().abs().log().sum()
    )
    return -(ell.mean() - kl / n)


def run_gpcv(x, prices, iters, lr, prior_jitter):
    from volt_tpu.models.gpcv import GPCVModel
    from volt_tpu.train import _fit_gpcv, scaled_returns

    x_j = jnp.asarray(x, JDT)
    yy = scaled_returns(x_j, jnp.asarray(prices, JDT))
    module = GPCVModel(q="full", ell_method="quadrature")
    params0 = module.init(x_j, yy, dtype=JDT)

    # init parity: independent torch restatement vs the shipped init
    tinit = torch_gpcv_init(x, np.asarray(yy))
    init_diffs = {
        "raw_vol": float(np.max(np.abs(
            np.asarray(params0["kernel"]["raw_vol"]) - tinit["raw_vol"].numpy()
        ))),
        "constant": float(np.max(np.abs(
            np.asarray(params0["mean"]["constant"]) - tinit["constant"].numpy()
        ))),
        "variational_mean": float(np.max(np.abs(
            np.asarray(params0["variational_mean"])
            - tinit["variational_mean"].numpy()
        ))),
        "chol_variational_covar": float(np.max(np.abs(
            np.tril(np.asarray(params0["chol_variational_covar"]))
            - tinit["chol_variational_covar"].numpy()
        ))),
    }

    params_fit, losses = _fit_gpcv(module, params0, x_j, yy, iters, lr)
    ours = np.asarray(losses)

    # torch trajectory from the SAME (shipped) init values
    x_t, yy_t = t(x), t(np.asarray(yy))
    locs_np, w_np = np.polynomial.hermite.hermgauss(module.num_locs)
    locs, w = t(locs_np), t(w_np / math.sqrt(math.pi))
    p = {
        "raw_vol": torch.nn.Parameter(t(params0["kernel"]["raw_vol"])),
        "constant": torch.nn.Parameter(t(params0["mean"]["constant"])),
        "variational_mean": torch.nn.Parameter(
            t(params0["variational_mean"])),
        "chol_variational_covar": torch.nn.Parameter(
            t(params0["chol_variational_covar"])),
    }
    opt = torch.optim.Adam(list(p.values()), lr=lr)
    theirs = np.empty(iters)
    for i in range(iters):
        opt.zero_grad()
        loss = torch_gpcv_loss(p, x_t, yy_t, locs, w, prior_jitter)
        loss.backward()
        theirs[i] = loss.item()
        opt.step()

    # matched-params cross-evaluations (each side's loss at the other's
    # final parameters)
    loss_ours = jax.jit(
        lambda q: -module.elbo(q, x_j, yy), static_argnums=()
    )
    with torch.no_grad():
        torch_at_ours = torch_gpcv_loss(
            {
                "raw_vol": t(params_fit["kernel"]["raw_vol"]),
                "constant": t(params_fit["mean"]["constant"]),
                "variational_mean": t(params_fit["variational_mean"]),
                "chol_variational_covar": t(
                    params_fit["chol_variational_covar"]),
            },
            x_t, yy_t, locs, w, prior_jitter,
        ).item()
        torch_at_torch = torch_gpcv_loss(p, x_t, yy_t, locs, w,
                                         prior_jitter).item()
        jitter_delta = (
            torch_gpcv_loss(p, x_t, yy_t, locs, w, 1e-3).item()
            - torch_gpcv_loss(p, x_t, yy_t, locs, w, 0.0).item()
        )
    ours_at_ours = float(loss_ours(params_fit))
    ours_at_torch = float(loss_ours({
        "kernel": {"raw_vol": jnp.asarray(p["raw_vol"].detach().numpy())},
        "mean": {"constant": jnp.asarray(p["constant"].detach().numpy())},
        "likelihood": {},
        "variational_mean": jnp.asarray(
            p["variational_mean"].detach().numpy()),
        "chol_variational_covar": jnp.asarray(
            p["chol_variational_covar"].detach().numpy()),
    }))
    return {
        "init_max_diff": max(init_diffs.values()),
        "init_diffs": init_diffs,
        "traj_max_abs_diff": float(np.max(np.abs(ours - theirs))),
        "final_ours": float(ours[-1]),
        "final_torch": float(theirs[-1]),
        "matched_at_ours": abs(ours_at_ours - torch_at_ours),
        "matched_at_torch": abs(ours_at_torch - torch_at_torch),
        "prior_jitter_1e3_delta_at_final": jitter_delta,
    }


# ---------------------------------------------------------------------------
# Vol GP — exact MLL (reference train_utils.py:69-95)
# ---------------------------------------------------------------------------


def torch_vol_loss(p, x_t, y_t):
    vol = torch.sigmoid(p["raw_vol"])
    noise = torch.nn.functional.softplus(p["raw_noise"]) + 1e-4
    mean = -0.5 * vol.pow(2.0) * x_t
    cov = vol * torch.minimum(x_t[:, None], x_t[None, :]) \
        + noise * torch.eye(x_t.shape[0], dtype=TDT)
    return mvn_nll_per_point(y_t, mean, cov)


def run_vol(x, log_vol, iters, lr):
    from volt_tpu.models.bmgp import BMGP
    from volt_tpu.train import _fit_bmgp

    x_j = jnp.asarray(x, JDT)
    y_j = jnp.asarray(log_vol, JDT)
    module = BMGP()
    params0 = module.init(JDT)
    out = {}
    fitted = {}
    for name, equispaced in (("spectral", True), ("kalman", False)):
        params_fit, losses = _fit_bmgp(module, params0, x_j, y_j, iters, lr,
                                       equispaced=equispaced)
        fitted[name] = params_fit
        out[name] = np.asarray(losses)

    p = {
        "raw_vol": torch.nn.Parameter(t(params0["kernel"]["raw_vol"])),
        "raw_noise": torch.nn.Parameter(
            t(params0["likelihood"]["raw_noise"])),
    }
    x_t, y_t = t(x), t(log_vol)
    opt = torch.optim.Adam(list(p.values()), lr=lr)
    theirs = np.empty(iters)
    for i in range(iters):
        opt.zero_grad()
        loss = torch_vol_loss(p, x_t, y_t)
        loss.backward()
        theirs[i] = loss.item()
        opt.step()

    kal = jax.jit(lambda q: -module.mll_kalman(q, x_j, y_j))
    with torch.no_grad():
        torch_at_ours = torch_vol_loss(
            {
                "raw_vol": t(fitted["kalman"]["kernel"]["raw_vol"]),
                "raw_noise": t(fitted["kalman"]["likelihood"]["raw_noise"]),
            },
            x_t, y_t,
        ).item()
        torch_at_torch = torch_vol_loss(p, x_t, y_t).item()
    ours_at_ours = float(kal(fitted["kalman"]))
    ours_at_torch = float(kal({
        "kernel": {"raw_vol": jnp.asarray(p["raw_vol"].detach().numpy())},
        "likelihood": {"raw_noise": jnp.asarray(
            p["raw_noise"].detach().numpy())},
    }))
    return {
        "traj_max_abs_diff_spectral": float(
            np.max(np.abs(out["spectral"] - theirs))),
        "traj_max_abs_diff_kalman": float(
            np.max(np.abs(out["kalman"] - theirs))),
        "final_ours": float(out["kalman"][-1]),
        "final_torch": float(theirs[-1]),
        "matched_at_ours": abs(ours_at_ours - torch_at_ours),
        "matched_at_torch": abs(ours_at_torch - torch_at_torch),
    }


# ---------------------------------------------------------------------------
# Volt data model — exact MLL with frozen vol covariance
# (reference train_utils.py:98-144)
# ---------------------------------------------------------------------------


def torch_cumtrapz_sq(x_t, vol_t):
    """CumTrapz of vol^2 with halved endpoint weights (VolKernel.py:4-10)."""
    dx = x_t[1] - x_t[0]
    w = dx * torch.ones_like(x_t)
    w[0] *= 0.5
    w[-1] *= 0.5
    return torch.cumsum(w * vol_t * vol_t, -1)


def torch_volt_loss(p, x_t, y_t, k0):
    noise = torch.nn.functional.softplus(p["raw_noise"]) + 1e-4
    lin = (x_t[:, None] @ p["weights"])[:, 0] + p["bias"]
    mean = lin.clamp(min=1e-6).log()
    cov = k0 + noise * torch.eye(x_t.shape[0], dtype=TDT)
    return mvn_nll_per_point(y_t, mean, cov)


def run_volt(x, prices, vol_path, iters, lr):
    from volt_tpu.means import LogLinearMean
    from volt_tpu.models.volt import VoltGP
    from volt_tpu.train import _fit_volt

    x_j = jnp.asarray(x, JDT)
    log_y = jnp.log(jnp.asarray(prices[1:], JDT))  # prices on the return grid
    vol_j = jnp.asarray(vol_path, JDT)
    module = VoltGP(mean=LogLinearMean(1))
    params0 = module.init(dtype=JDT, key=jax.random.key(0))
    params0["mean"] = module.mean.initialize_from_data(
        params0["mean"], x_j, log_y
    )
    params_fit, losses = _fit_volt(module, params0, x_j, log_y, vol_j,
                                   iters, lr)
    ours = np.asarray(losses)

    x_t, y_t = t(x), t(np.asarray(log_y))
    vi = torch_cumtrapz_sq(x_t, t(vol_path))
    idx = torch.arange(x_t.shape[0])
    k0 = vi[torch.minimum(idx[:, None], idx[None, :])]
    p = {
        "raw_noise": torch.nn.Parameter(
            t(params0["likelihood"]["raw_noise"])),
        "weights": torch.nn.Parameter(t(params0["mean"]["weights"])),
        "bias": torch.nn.Parameter(t(params0["mean"]["bias"])),
    }
    # initialize_from_data parity: bias == mean(exp(log prices))
    bias_init_diff = float(np.max(np.abs(
        np.asarray(params0["mean"]["bias"])
        - np.mean(np.exp(np.asarray(log_y)))
    )))
    opt = torch.optim.Adam(list(p.values()), lr=lr)
    theirs = np.empty(iters)
    for i in range(iters):
        opt.zero_grad()
        loss = torch_volt_loss(p, x_t, y_t, k0)
        loss.backward()
        theirs[i] = loss.item()
        opt.step()

    with torch.no_grad():
        torch_at_ours = torch_volt_loss(
            {
                "raw_noise": t(params_fit["likelihood"]["raw_noise"]),
                "weights": t(params_fit["mean"]["weights"]),
                "bias": t(params_fit["mean"]["bias"]),
            },
            x_t, y_t, k0,
        ).item()
        torch_at_torch = torch_volt_loss(p, x_t, y_t, k0).item()
    v = module.kernel.integral(x_j, vol_j)

    def ours_loss(q):
        noise = module.likelihood.noise(q["likelihood"])[..., 0]
        mean_vec = module.train_mean(q, x_j, log_y)
        from volt_tpu.ops.tridiag import brownian_noise_mll_kalman

        return -brownian_noise_mll_kalman(v, noise, log_y - mean_vec)

    ours_loss_j = jax.jit(ours_loss)
    ours_at_ours = float(ours_loss_j(params_fit))
    ours_at_torch = float(ours_loss_j({
        "likelihood": {"raw_noise": jnp.asarray(
            p["raw_noise"].detach().numpy())},
        "mean": {"weights": jnp.asarray(p["weights"].detach().numpy()),
                 "bias": jnp.asarray(p["bias"].detach().numpy())},
    }))
    return {
        "bias_init_diff": bias_init_diff,
        "traj_max_abs_diff": float(np.max(np.abs(ours - theirs))),
        "final_ours": float(ours[-1]),
        "final_torch": float(theirs[-1]),
        "matched_at_ours": abs(ours_at_ours - torch_at_ours),
        "matched_at_torch": abs(ours_at_torch - torch_at_torch),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--objective", default="all",
                    choices=["all", "gpcv", "vol", "volt"])
    ap.add_argument("--prior-jitter", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    x, prices, vol = make_data(args.n, args.seed)
    result = {"n": args.n, "iters": args.iters, "x64": bool(F64)}
    if args.objective in ("all", "gpcv"):
        result["gpcv"] = run_gpcv(x, prices, args.iters, 0.01,
                                  args.prior_jitter)
    if args.objective in ("all", "vol"):
        result["vol"] = run_vol(x, np.log(vol[1:]), args.iters, 0.01)
    if args.objective in ("all", "volt"):
        result["volt"] = run_volt(x, prices, vol[1:], args.iters, 0.1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""The Kronecker multitask Volt pipeline as one compiled program.

``fit_forecast_multitask`` runs the three multitask stages —
joint (Kronecker) GPCV over T tasks -> per-task Volt data fits + one
multitask vol GP -> correlated Matheron vol forecast + per-task Markov
rollouts — entirely inside ``jit``, with the same product surface the
single-task :func:`volt_tpu.parallel.pipeline.fit_forecast_batch` has:
a static :class:`MultitaskPipelineConfig`, on-device quantile delivery,
per-task ``ok`` lanes, mesh sharding over a ``(task=asset, path)`` mesh,
and :func:`warm_start_multitask` for live refits.

The reference's multitask model (``models/multi_task_variational_gp.py``,
``BMGP.py:30-56``, the mtwind notebook) ships with no training driver at
all — the library chain here (``learn_gpcv_multitask`` ->
``train_volt_multitask`` -> ``rollouts_multitask``) provided one, and this
module productizes it (round-4 verdict item 3: the Kronecker chain had to
be hand-assembled, refit cold every window, and returned raw samples
only).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.multitask import MultitaskBMGP, MultitaskVariationalGP
from ..models.volt import VoltGP, VoltState, make_mean
from ..likelihoods import VolatilityGaussianLikelihood
from ..rollouts import _rollout_volt_scan
from ..train import _adam_scan, scaled_returns
from .pipeline import (
    _check_min_length,
    _check_spectral_grid,
    _shift_tail,
    _volt_data_fit,
    shard_batch,
)

__all__ = ["MultitaskPipelineConfig", "fit_forecast_multitask",
           "warm_start_multitask"]


@dataclasses.dataclass(frozen=True)
class MultitaskPipelineConfig:
    """Static configuration for the multitask (Kronecker) pipeline.

    Defaults follow the mtwind experiment's knobs (k=25, theta=0.5 —
    ``train_volt_multitask``'s reference-parity defaults) with the same
    iteration/lr split as the single-task pipeline.
    """

    gpcv_iters: int = 300
    vol_iters: int = 300
    data_iters: int = 300
    rank: int = 1
    mean_func: str = "ewma"
    k: int = 25
    theta: Optional[float] = 0.5
    nsample: int = 1000
    gpcv_lr: float = 0.01
    vol_lr: float = 0.01
    data_lr: float = 0.1
    num_locs: int = 75
    # data-factor variational family for the joint GPCV: "tridiag" (O(n)
    # parameters; see models/multitask.py) or "full" (the reference's
    # N x N root, multi_task_variational_gp.py:15-30).
    gpcv_q: str = "tridiag"
    # likelihood parameterization ("exp" or "cv"), shared across tasks.
    gpcv_param: str = "exp"
    vol_mll: str = "spectral"
    output: str = "samples"
    quantile_levels: tuple = (0.025, 0.05, 0.25, 0.5, 0.75, 0.95, 0.975)
    # Volt-kernel quadrature ("reference" endpoint quirk / exact
    # "trapezoid") — see PipelineConfig.integral_rule.
    integral_rule: str = "reference"
    # kernel is fixed to "bm": the Kronecker vol GP's Matheron forecast
    # sampler and the tridiag family both rely on the Markov min kernel
    # (the reference's multitask model is likewise BM-only, BMGP.py:30).


def fit_forecast_multitask(key, train_x, train_ys, test_x,
                           config: MultitaskPipelineConfig, mesh=None,
                           init_params=None):
    """Fit + forecast T correlated assets/stations as one compiled program.

    ``train_ys``: ``(T, n+1)`` prices (or wind speeds) — one longer than
    ``train_x``, the shared return grid.  Returns ``(out, aux)``:

    * ``out`` — ``(T, nsample, H)`` correlated MC paths, or with
      ``config.output="quantiles"`` the on-device per-task fan
      ``(T, L, H)`` (``aux`` then also carries ``forecast_mean`` /
      ``forecast_std``, each ``(T, H)``).
    * ``aux`` — per-task ``ok`` lanes, the inferred vol paths ``(T, n)``,
      per-stage loss trajectories, and the fitted parameter blocks
      (feed to :func:`warm_start_multitask` for live refits).

    With ``mesh`` (axes ``("asset", "path")``), tasks shard over the
    ``asset`` axis and MC paths over ``path`` — the T x T task coupling
    is tiny (rank-r Woodbury blocks) and XLA inserts the few collectives
    the joint stages need.
    """
    train_ys = jnp.asarray(train_ys)
    _check_min_length(train_x)
    _check_spectral_grid(train_x, _SpectralShim(config))
    if mesh is None:
        return _fit_forecast_mt_jit(key, train_x, train_ys, test_x, config,
                                    init_params)
    asset_sh, out_sh = shard_batch(mesh, config.output)
    train_ys = jax.device_put(train_ys, asset_sh)
    if init_params is not None and "volt" in init_params:
        # only the per-task Volt block carries a leading task axis; the
        # joint GPCV/vol blocks are shared and stay replicated
        init_params = dict(init_params)
        init_params["volt"] = jax.device_put(init_params["volt"], asset_sh)
    fn = jax.jit(
        _fit_forecast_mt_jit,
        static_argnames=("config",),
        out_shardings=(out_sh, None),
    )
    return fn(key, train_x, train_ys, test_x, config, init_params)


class _SpectralShim:
    """Adapts MultitaskPipelineConfig to the single-task grid check
    (which reads only ``vol_mll`` and ``kernel``)."""

    def __init__(self, config):
        self.vol_mll = config.vol_mll
        self.kernel = "bm"


@partial(jax.jit, static_argnames=("config",))
def _fit_forecast_mt_jit(key, train_x, train_ys, test_x,
                         config: MultitaskPipelineConfig, init_params=None):
    num_tasks = train_ys.shape[0]
    k_lik, k_roll = jax.random.split(key)

    # ---- stage 1: joint (Kronecker) GPCV over all T tasks ------------------
    yy = scaled_returns(train_x, train_ys).T  # (n, T)
    lik = VolatilityGaussianLikelihood(param=config.gpcv_param)
    gpcv = MultitaskVariationalGP(num_tasks=num_tasks, rank=config.rank,
                                  q=config.gpcv_q)
    if init_params is None:
        lik_params = lik.init(key=k_lik)
        gp_params = gpcv.init(train_x, key=k_lik)
        gp_params = gpcv.initialize_variational_parameters(
            gp_params, lik, lik_params, train_x, yy
        )
        packed = {"model": gp_params, "lik": lik_params}
    else:
        packed = init_params["gpcv"]
    packed, gpcv_losses = _adam_scan(
        lambda p: -gpcv.elbo(p["model"], train_x, yy, lik, p["lik"],
                             num_locs=config.num_locs),
        packed, config.gpcv_iters, config.gpcv_lr,
    )
    mean = packed["model"]["variational_mean"]          # (n, T)
    var = gpcv.marginal_variances(packed["model"])      # (n, T)
    vols = lik.expected_scale(packed["lik"], mean, var).T  # (T, n)

    # ---- stage 2: multitask vol GP (Kronecker MLL over log vols) ----------
    mt_vol = MultitaskBMGP(num_tasks=num_tasks, rank=config.rank)
    log_vols_nt = jnp.log(vols).T  # (n, T)
    n = log_vols_nt.shape[-2]
    vol_init = (mt_vol.init(key=k_lik) if init_params is None
                else init_params["vol"])
    # no n bound: the spectral cache projects via FFT past the
    # materialized basis' limit (ops/brownian.min_kernel_project)
    if config.vol_mll == "spectral":
        cache = mt_vol.spectral_cache(train_x, log_vols_nt)
        vol_loss_fn = lambda p: -mt_vol.mll_spectral(p, cache, n, num_tasks)
    else:
        vol_loss_fn = lambda p: -mt_vol.mll(p, train_x, log_vols_nt)
    vol_params, vol_losses = _adam_scan(
        vol_loss_fn, vol_init, config.vol_iters, config.vol_lr
    )
    mt_state = mt_vol.fit_state(vol_params, train_x, log_vols_nt)

    # ---- stage 3: per-task Volt data models (vmapped O(n) Kalman MLL) -----
    log_ys = jnp.log(train_ys[..., 1:])  # (T, n)
    volt = VoltGP(mean=make_mean(
        config.mean_func, k=config.k,
        theta=config.theta if config.theta is not None else 0.5,
    ), integral_rule=config.integral_rule)
    if init_params is None:
        volt_init = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (num_tasks, *jnp.shape(a))),
            volt.init(),
        )
    else:
        volt_init = init_params["volt"]
    volt_params_b, data_losses_b = jax.vmap(
        lambda ly, v, p0: _volt_data_fit(volt, train_x, ly, v, p0,
                                         config.data_iters, config.data_lr)
    )(log_ys, vols, volt_init)

    # ---- stage 4: correlated vol forecast + per-task Markov rollouts ------
    h = test_x.shape[-1]
    k_vol, k_z = jax.random.split(k_roll)
    # (S, H, T) jointly-correlated log-vol draws through the Kronecker
    # task covariance (Matheron; runtime-guarded against non-future grids
    # like the single-task fast path — ops.brownian.future_grid_ok).
    log_vol_draws = mt_state.sample_forecast(k_vol, test_x,
                                             (config.nsample,))
    pred_vol = jnp.exp(jnp.moveaxis(log_vol_draws, -1, 0))  # (T, S, H)
    zs = jax.random.normal(k_z, (num_tasks, config.nsample, h),
                           log_ys.dtype)

    use_theta = config.theta is not None
    if use_theta:
        latent = jnp.mean(jnp.log(train_ys), axis=-1)
    else:
        latent = jnp.zeros((num_tasks,), log_ys.dtype)
    theta_val = jnp.asarray(config.theta if use_theta else 0.0, log_ys.dtype)

    volt_state = VoltState(
        module=volt,
        params=volt_params_b,
        train_x=jnp.broadcast_to(train_x, (num_tasks, train_x.shape[-1])),
        train_y=log_ys,
        log_vol_path=jnp.log(vols),
        vol_state=None,
    )
    samples = jax.vmap(
        lambda st, lat, pv, z: _rollout_volt_scan(st, lat, test_x, pv, z,
                                                  use_theta, theta_val)
    )(volt_state, latent, pred_vol, zs)  # (T, S, H) log prices

    # per-task ok lanes; a non-finite JOINT stage (gpcv / vol) correctly
    # poisons every task
    ok = (
        jnp.all(jnp.isfinite(samples), axis=(-2, -1))
        & jnp.isfinite(data_losses_b[..., -1])
        & jnp.isfinite(gpcv_losses[-1])
        & jnp.isfinite(vol_losses[-1])
    )

    if config.output == "quantiles":
        levels = jnp.asarray(config.quantile_levels, samples.dtype)
        out = jnp.moveaxis(jnp.quantile(samples, levels, axis=-2), 0, -2)
    elif config.output == "samples":
        out = samples
    else:
        raise ValueError(
            f"MultitaskPipelineConfig.output must be 'samples' or "
            f"'quantiles', got {config.output!r}"
        )

    aux = {
        "ok": ok,
        "vols": vols,
        "gpcv_loss": gpcv_losses[-1],
        "vol_loss": vol_losses[-1],
        "data_losses": data_losses_b[..., -1],
        "gpcv_losses": gpcv_losses,
        "vol_losses": vol_losses,
        "data_loss_trajs": data_losses_b,
        "gpcv_params": packed,
        "vol_params": vol_params,
        "volt_params": volt_params_b,
    }
    if config.output == "quantiles":
        aux["forecast_mean"] = jnp.mean(samples, axis=-2)
        aux["forecast_std"] = jnp.std(samples, axis=-2)
    return out, aux


def warm_start_multitask(aux, shift: int = 0, n: int | None = None):
    """``init_params`` for :func:`fit_forecast_multitask` from a previous
    fit's ``aux`` — the multitask analog of
    :func:`volt_tpu.parallel.pipeline.warm_start`.

    ``shift=0`` re-seeds the SAME window; ``shift>0`` slides the window
    forward ``shift`` ticks at the same length ``n`` (the return-grid
    length): per-datum GPCV leaves shift with the window (the ``(n, T)``
    variational mean along its datum axis; the tridiag precision factor
    with the boundary-row care the single-task version documents; the
    dense ``(n, n)`` root along both axes), while task-level blocks
    (index kernel, task covar root, mean constants, likelihood mixture)
    and the vol/data-model hyperparameters carry over unchanged.
    """
    packed = aux["gpcv_params"]
    model = dict(packed["model"])
    if shift:
        if n is None:
            raise ValueError("warm_start_multitask(shift>0) needs n (the "
                             "return-grid length train_x.shape[-1])")
        vm = model["variational_mean"]  # (n, T)
        model["variational_mean"] = jnp.moveaxis(
            _shift_tail(jnp.moveaxis(vm, -2, -1), shift), -1, -2
        )
        if "q_log_d" in model:
            v = model["q_log_d"]
            interior = _shift_tail(v[..., :-1], shift)
            model["q_log_d"] = jnp.concatenate(
                [interior, v[..., -1:]], axis=-1
            )
            model["q_e"] = _shift_tail(model["q_e"], shift)
        if "variational_covar_root" in model:
            cols = _shift_tail(model["variational_covar_root"], shift)
            rows = jnp.moveaxis(
                _shift_tail(jnp.moveaxis(cols, -1, -2), shift), -1, -2
            )
            model["variational_covar_root"] = jnp.tril(rows)
    return {
        "gpcv": {"model": model, "lik": packed["lik"]},
        "vol": aux["vol_params"],
        "volt": aux["volt_params"],
    }

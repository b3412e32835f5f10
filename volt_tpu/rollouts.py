"""Monte-Carlo forecasting: autoregressive rollouts and one-shot sampling.

This is the reference's hot loop (``rollout_utils.py``): at every step of
the horizon it concatenates the sampled history onto the train set, builds
the full joint covariance, and re-factorizes it — O((n + t)^3) per step,
per path (``rollout_utils.py:26,35``).

The TPU-native path exploits the *min-index* structure of the volatility
kernel: ``K[i, j] = v[min(i, j)]`` is the covariance of a time-changed
Brownian motion, so conditioning on the past collapses to the Markov
property — the conditional of the next point given the entire sampled
history is

    ``mean = m(test_t) + (y_last - m_train_last)``
    ``var  = v[t] - v[t-1]``  (the *endpoint-halved* increment
    ``dx/2 * vol_t^2``, reproducing the reference's ``CumTrapz``
    last-weight rule on the growing grid)

exactly — the same Gaussian the reference's dense solve produces, at O(1)
per step per path.  The whole rollout becomes a single ``lax.scan`` over
the horizon, vectorized over sample paths, with the Magpie means updated
through their O(k) rolling-window scan states.  ``*_dense`` variants
replicate the reference's dense algebra and back the parity tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .kernels import VolatilityKernel
from .means import MeanRevertingEMAMean
from .models.volt import VoltState
from .ops.chol import psd_safe_cholesky, solve_lower_triangular
from .ops.mvn import conditional, sample_mvn

__all__ = [
    "sample_vol_paths",
    "rollouts",
    "generate_prediction",
    "sample_prediction",
    "mean_prediction",
    "volt_posterior",
    "nonvol_rollouts",
    "rollouts_multitask",
    "generate_prediction_dense",
    "rollouts_dense",
    "nonvol_rollouts_dense",
]


def sample_vol_paths(key, vol_state, test_x, nsample: int,
                     assume_future: bool | None = None):
    """``nsample`` joint vol forecasts: ``exp`` of posterior samples of the
    log-vol GP at ``test_x`` (reference ``rollout_utils.py:66``).

    Forecast grids are strictly future (the rollout contract, as in every
    reference call site), so for the Markov BM kernel the sampler uses
    the O(n + S*H) filtered-state closed form instead of materializing
    the n x n joint posterior — same distribution (pinned in tests),
    and the vol stage stays O(n) at n in the tens of thousands.

    ``assume_future`` controls the dispatch:

    * ``None`` (default) — when the grids are concrete, the contract
      (``test_x`` increasing, strictly after the train grid) is checked
      host-side and a violating query falls back to the dense posterior
      sampler, which handles any grid.  Under tracing (inside a user's
      ``jit``) the fast path is taken, but it is *runtime-guarded*: the
      closed forms ``jnp.where`` their outputs against
      :func:`volt_tpu.ops.brownian.future_grid_ok`, so a violating
      traced grid returns all-NaN (a loud failure) instead of a silently
      wrong distribution.
    * ``False`` — force the dense sampler (jit-safe for any grid; use
      this to jit over overlapping/interpolating queries).
    * ``True`` — the CALLER asserts the contract: the fast path is taken
      without the host-side probe.  No Python-level check runs; a
      violating concrete grid NaN-poisons through the runtime guard
      (loud, not silently wrong).
    """
    from .kernels import BMKernel

    fast = (isinstance(getattr(vol_state.module, "kernel", None), BMKernel)
            and assume_future is not False
            and (assume_future is True
                 or _strictly_future(test_x, vol_state.train_x)))
    if fast:
        log_paths = vol_state.sample_forecast(key, test_x, (nsample,))
    else:
        log_paths = vol_state.sample(key, test_x, (nsample,))
    return jnp.exp(log_paths)


def _strictly_future(test_x, train_x) -> bool:
    """Host-side probe of the forecast-sampler contract: ``test_x``
    increasing and strictly after the train grid.  Under tracing (either
    array abstract) the answer is True — the fast samplers then rely on
    their built-in runtime guard (``ops.brownian.future_grid_ok``), which
    NaN-poisons outputs for violating grids; callers that legitimately
    jit over non-future grids pass ``assume_future=False`` instead."""
    try:
        import numpy as np

        tx = np.asarray(test_x)
        tr_last = np.asarray(train_x)[..., -1]
        return bool(np.all(np.diff(tx, axis=-1) > 0)
                    and np.all(tx[..., 0] > tr_last))
    except (jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        return True  # tracers: the runtime guard takes over
    # anything else (empty grids, ragged inputs) is a real caller error —
    # let it propagate instead of silently selecting the fast sampler


# ---------------------------------------------------------------------------
# Autoregressive rollout — Markov fast path
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("use_theta",))
def _rollout_volt_scan(model: VoltState, latent_mean, test_x, pred_vol, zs,
                       use_theta, theta):
    """The Markov rollout core; ``pred_vol``/``zs`` are ``(S, H)``."""
    mean_mod = model.module.mean
    mean_params = model.params["mean"]
    y = model.train_y  # (L,) log prices on the model grid
    dx = model.train_x[..., 1] - model.train_x[..., 0]
    h = test_x.shape[-1]
    nsample = pred_vol.shape[0]

    # (S, H) conditional std devs: the per-step increment of the running
    # vol integral under the module's quadrature rule.
    rule = getattr(model.module.kernel, "integral_rule", "reference")
    if rule == "trapezoid":
        # exact trapezoid: inc_t = dx (v_t^2 + v_{t-1}^2) / 2 with v_{-1}
        # the last train-grid vol — grid-growth stable (no endpoint
        # effect), so the dense joint build gives the same increments.
        pv2 = pred_vol * pred_vol
        v_last2 = jnp.exp(2.0 * model.log_vol_path[..., -1])
        prev2 = jnp.concatenate(
            [jnp.broadcast_to(v_last2, (*pv2.shape[:-1], 1)),
             pv2[..., :-1]], axis=-1,
        )
        sds = jnp.sqrt(0.5 * dx * (pv2 + prev2))
    else:
        # reference CumTrapz: each appended point is the (halved) endpoint
        # of its own grid, so every step's increment is 0.5 dx v_t^2.
        sds = jnp.sqrt(0.5 * dx) * pred_vol

    hist = mean_mod.is_history_dependent
    # O(1)-state mean protocol: at horizon <= k the Magpie state is a few
    # scalars per path instead of an (S, k) window whose per-step
    # shift+dot dominated the rollout at production batch sizes
    # (PERFORMANCE.md round 3; exact up to float reassociation).
    fast = (hist and hasattr(mean_mod, "scan_fast_supported")
            and mean_mod.scan_fast_supported(h))
    mean_xs = {"_": jnp.zeros((h,), y.dtype)}  # placeholder scan input
    if hist:
        if fast:
            state0, mean_xs = mean_mod.scan_fast_init(mean_params, y, h)
        else:
            state0 = mean_mod.scan_init(mean_params, y)
        state0 = jax.tree.map(
            lambda b: jnp.broadcast_to(b, (nsample, *b.shape)), state0
        )
        m_prev0 = mean_mod.train_values(mean_params, y)[..., -1]
        m_det = jnp.zeros((h,), y.dtype)  # unused
    else:
        state0 = {}
        m_prev0 = mean_mod(mean_params, model.train_x)[..., -1]
        m_det = mean_mod(mean_params, test_x)

    y_prev0 = y[..., -1]
    carry0 = (
        state0,
        jnp.broadcast_to(y_prev0, (nsample,)),
        jnp.broadcast_to(m_prev0, (nsample,)),
    )

    def body(carry, inp):
        state, y_prev, m_prev = carry
        sd_t, z_t, m_det_t, mean_x = inp
        if fast:
            m_t = mean_mod.scan_fast_value(mean_params, state)
        elif hist:
            m_t = mean_mod.scan_value(mean_params, state)
        else:
            m_t = jnp.broadcast_to(m_det_t, y_prev.shape)
        pred_mean = m_t + (y_prev - m_prev)
        if use_theta:
            pred_mean = pred_mean - theta * (pred_mean - latent_mean)
        y_t = pred_mean + sd_t * z_t
        if fast:
            state = mean_mod.scan_fast_append(mean_params, state, mean_x,
                                              y_t)
        elif hist:
            state = mean_mod.scan_append(mean_params, state, y_t)
        return (state, y_t, m_t), y_t

    # With the O(1) mean state the step body is a few elementwise ops —
    # dispatch-bound, so unroll (see brownian_noise_mll_kalman; TPU only,
    # CPU pays the compile for no benefit; VOLT_TPU_SCAN_UNROLL overrides).
    from .utils.platform import scan_unroll

    unroll = scan_unroll(8) if (fast or not hist) else 1
    _, samples = lax.scan(body, carry0, (sds.T, zs.T, m_det, mean_xs),
                          unroll=unroll)
    return samples.T  # (S, H)


def _rollout_volt(key, model: VoltState, latent_mean, test_x, nsample,
                  use_theta, theta, assume_future=None):
    k_vol, k_z = jax.random.split(key)
    pred_vol = sample_vol_paths(k_vol, model.vol_state, test_x, nsample,
                                assume_future=assume_future)
    zs = jax.random.normal(
        k_z, (nsample, test_x.shape[-1]), model.train_y.dtype
    )
    return _rollout_volt_scan(model, latent_mean, test_x, pred_vol, zs,
                              use_theta, theta)


def rollouts(key, model: VoltState, train_x, train_y, test_x,
             nsample: int = 50, method: str = "volt", theta=None,
             assume_future: bool | None = None):
    """Autoregressive MC forecast (reference ``Rollouts``,
    ``rollout_utils.py:57-93``).

    ``train_y`` is the *full* price series (one longer than the model grid,
    exactly like the reference call sites); it is used only for the
    mean-reversion latent mean ``mean(log(train_y))``.  Returns log-price
    samples ``(nsample, H)``.  ``assume_future`` follows
    :func:`sample_vol_paths` (the rollout itself also requires a
    strictly-future increasing horizon — it evolves forward from the last
    train point).
    """
    del train_x  # the model state carries its grid; kept for API parity
    if method != "volt":
        raise NotImplementedError(
            "non-volt rollouts live in volt_tpu.rollouts.nonvol_rollouts"
        )
    use_theta = theta is not None
    dtype = model.train_y.dtype  # dtype-polymorphic (float64 mode works)
    latent_mean = (
        jnp.mean(jnp.log(jnp.asarray(train_y, dtype)))
        if use_theta else jnp.zeros((), dtype)
    )
    return _rollout_volt(key, model, latent_mean, jnp.asarray(test_x),
                         int(nsample), use_theta,
                         jnp.asarray(theta if use_theta else 0.0, dtype),
                         assume_future=assume_future)


# ---------------------------------------------------------------------------
# One-shot prediction (non-autoregressive), deterministic means
# ---------------------------------------------------------------------------


def _joint_integral_increments(model: VoltState, test_x, pred_vol):
    """Per-test-point increments of the vol integral on the joint grid.

    Under the reference rule: full weight ``dx`` everywhere except the
    joint grid's last point, which is halved (the endpoint quirk,
    ``VolKernel.py:4-10``, on the ``[train; test]`` grid).  Under the
    trapezoid rule: the exact ``dx (v_t^2 + v_{t-1}^2) / 2`` increments
    (``v_{-1}`` = the last train-grid vol).
    """
    dx = model.train_x[..., 1] - model.train_x[..., 0]
    h = test_x.shape[-1]
    rule = getattr(model.module.kernel, "integral_rule", "reference")
    if rule == "trapezoid":
        pv2 = pred_vol * pred_vol
        v_last2 = jnp.exp(2.0 * model.log_vol_path[..., -1])
        prev2 = jnp.concatenate(
            [jnp.broadcast_to(v_last2, (*pv2.shape[:-1], 1)),
             pv2[..., :-1]], axis=-1,
        )
        return 0.5 * dx * (pv2 + prev2)
    w = jnp.full((h,), dx, pred_vol.dtype).at[-1].set(0.5 * dx)
    return w * pred_vol * pred_vol


@partial(jax.jit, static_argnames=("n_sample", "use_theta"))
def _generate_prediction(key, model: VoltState, test_x, pred_vol, n_sample,
                         latent_mean, use_theta, theta):
    mean_mod = model.module.mean
    if mean_mod.is_history_dependent:
        raise ValueError(
            "one-shot prediction requires a deterministic mean (the "
            "reference routes Magpie means through Rollouts; "
            "GenerateMultiMeanPreds.py:110-119)"
        )
    mean_params = model.params["mean"]
    m_train_last = mean_mod(mean_params, model.train_x)[..., -1]
    r_last = model.train_y[..., -1] - m_train_last
    m_test = mean_mod(mean_params, test_x)

    pred_mean = m_test + r_last  # Markov conditional mean, all test points
    if use_theta:
        pred_mean = pred_mean - theta * (pred_mean - latent_mean)

    incs = _joint_integral_increments(model, test_x, pred_vol)
    batch = jnp.broadcast_shapes(pred_vol.shape[:-1], pred_mean.shape[:-1])
    h = test_x.shape[-1]
    z = jax.random.normal(key, (*batch, n_sample, h), model.train_y.dtype)
    noise = jnp.cumsum(jnp.sqrt(incs)[..., None, :] * z, axis=-1)
    return pred_mean[..., None, :] + noise


def generate_prediction(key, model: VoltState, test_x, pred_vol,
                        n_sample: int = 1, latent_mean=None, theta: float = 0.5):
    """One-shot conditional sampling over the whole horizon (reference
    ``GeneratePrediction``, ``rollout_utils.py:6-53``).

    ``pred_vol``: ``(..., H)`` vol paths.  Returns ``(..., n_sample, H)``
    log-price samples (time-changed Brownian increments around the Markov
    conditional mean — identical in distribution to the reference's dense
    conditional, computed in O(H) per path).
    """
    use_theta = latent_mean is not None
    dtype = model.train_y.dtype
    lm = jnp.asarray(latent_mean, dtype) if use_theta else jnp.zeros((), dtype)
    return _generate_prediction(key, model, jnp.asarray(test_x),
                                jnp.asarray(pred_vol), int(n_sample), lm,
                                use_theta, jnp.asarray(theta, dtype))


def sample_prediction(key, model: VoltState, test_x, n_sample: int = 1,
                      return_vol: bool = False):
    """Draw one vol path, then ``n_sample`` price paths (reference
    ``VoltronGP.SamplePrediction``, ``VoltronGP.py:97-106``)."""
    k1, k2 = jax.random.split(key)
    pred_vol = jnp.exp(model.vol_state.sample(k1, test_x))
    pred = generate_prediction(k2, model, test_x, pred_vol, n_sample)
    return (pred, pred_vol) if return_vol else pred


def mean_prediction(key, model: VoltState, test_x, n_sample: int = 1,
                    return_vol: bool = False):
    """Like :func:`sample_prediction` but with the posterior-mean vol path
    (reference ``VoltronGP.MeanPrediction``, ``VoltronGP.py:108-114``)."""
    mean, _ = model.vol_state.posterior(test_x)
    pred_vol = jnp.exp(mean)
    pred = generate_prediction(key, model, test_x, pred_vol, n_sample)
    return (pred, pred_vol) if return_vol else pred


# ---------------------------------------------------------------------------
# Dense reference-parity paths (used by tests; O(n^3) like the reference)
# ---------------------------------------------------------------------------


def generate_prediction_dense(key, model: VoltState, test_x, pred_vol,
                              n_sample: int = 1, latent_mean=None,
                              theta: float = 0.5):
    """Literal dense restatement of ``rollout_utils.GeneratePrediction``:
    joint covariance build, slice, psd-safe Cholesky (jitter 1e-4),
    conditional mean/cov, Cholesky sampling.  Uses the model's own kernel,
    so the quadrature rule (reference/trapezoid) follows the module."""
    kernel = model.module.kernel
    mean_mod = model.module.mean
    mean_params = model.params["mean"]
    test_x = jnp.asarray(test_x)
    pred_vol = jnp.asarray(pred_vol)

    full_x = jnp.concatenate([model.train_x, test_x], -1)
    vol = jnp.exp(model.log_vol_path)
    batch = pred_vol.shape[:-1]
    vol_b = jnp.broadcast_to(vol, (*batch, vol.shape[-1]))
    full_vol = jnp.concatenate([vol_b, pred_vol], -1)

    n = model.train_x.shape[-1]
    cov = kernel({}, full_x, full_vol)
    k_tr = cov[..., :n, :n]
    k_tr_te = cov[..., :n, n:]
    k_te = cov[..., n:, n:]

    if mean_mod.is_history_dependent:
        if test_x.shape[-1] != 1:
            raise ValueError("dense path supports Magpie means only for "
                             "single-point queries (as in Rollouts)")
        train_mean = mean_mod.train_values(mean_params, model.train_y)
        m_test = mean_mod.last_value(mean_params, model.train_y)[..., None]
    else:
        train_mean = mean_mod(mean_params, model.train_x)
        m_test = mean_mod(mean_params, test_x)

    resid = jnp.broadcast_to(
        model.train_y - train_mean, (*batch, n)
    )
    cond_mean, cond_cov = conditional(k_tr, k_tr_te, k_te, resid, jitter=1e-4)
    pred_mean = cond_mean + m_test
    if latent_mean is not None:
        pred_mean = pred_mean - theta * (pred_mean - latent_mean)
    samples = sample_mvn(key, jnp.zeros_like(pred_mean), cond_cov,
                         (n_sample,), jitter=1e-4)
    samples = jnp.moveaxis(samples, 0, -2)  # (..., n_sample, H)
    return samples + pred_mean[..., None, :]


def rollouts_dense(key, model: VoltState, train_x, train_y, test_x,
                   nsample: int = 50, theta=None, pred_vol=None, zs=None):
    """Literal dense restatement of the reference's autoregressive loop
    (python loop; test oracle only).

    ``pred_vol`` (S, H) and ``zs`` (S, H) optionally pin the vol draws and
    per-step standard normals, enabling common-random-number comparisons
    against the Markov fast path: with both supplied, the two paths sample
    the *same* conditional law at the same points, so they must agree
    per-path to float precision, not just in moments.
    """
    # the model's own kernel: the quadrature rule follows the module
    kernel = model.module.kernel
    mean_mod = model.module.mean
    mean_params = model.params["mean"]
    use_theta = theta is not None
    latent = jnp.mean(jnp.log(jnp.asarray(train_y))) if use_theta else None
    # The meanrevert module's internal latent mean is frozen at the
    # construction-time series mean (reference EWMA.py:124), even as the
    # module's series is mutated during the rollout loop.
    mr_latent = (
        jnp.mean(model.train_y, axis=-1, keepdims=True)
        if isinstance(model.module.mean, MeanRevertingEMAMean)
        else None
    )

    test_x = jnp.asarray(test_x)
    h = test_x.shape[-1]
    k_vol, key = jax.random.split(key)
    if pred_vol is None:
        pred_vol = sample_vol_paths(k_vol, model.vol_state, test_x, nsample)

    xs = model.train_x
    ys = jnp.broadcast_to(model.train_y, (nsample, model.train_y.shape[-1]))
    vols = jnp.broadcast_to(
        jnp.exp(model.log_vol_path), (nsample, model.log_vol_path.shape[-1])
    )
    out = []
    for t in range(h):
        n = xs.shape[-1]
        full_x = jnp.concatenate([xs, test_x[t][None]], -1)
        full_vol = jnp.concatenate([vols, pred_vol[:, t][:, None]], -1)
        cov = kernel({}, full_x, full_vol)
        k_tr = cov[..., :n, :n]
        k_tr_te = cov[..., :n, n:]
        k_te = cov[..., n:, n:]
        if mean_mod.is_history_dependent:
            if mr_latent is not None:
                train_mean = mean_mod.train_values(mean_params, ys, mr_latent)
                m_test = mean_mod.last_value(mean_params, ys, mr_latent)[..., None]
            else:
                train_mean = mean_mod.train_values(mean_params, ys)
                m_test = mean_mod.last_value(mean_params, ys)[..., None]
        else:
            train_mean = mean_mod(mean_params, xs)
            m_test = mean_mod(mean_params, test_x[t][None])
        resid = ys - train_mean
        cond_mean, cond_cov = conditional(k_tr, k_tr_te, k_te, resid,
                                          jitter=1e-4)
        pred_mean = cond_mean + m_test
        if use_theta:
            pred_mean = pred_mean - theta * (pred_mean - latent)
        if zs is None:
            key, k_s = jax.random.split(key)
            y_t = sample_mvn(k_s, pred_mean, cond_cov, jitter=1e-4)[..., 0]
        else:
            sd = jnp.sqrt(jnp.maximum(cond_cov[..., 0, 0], 0.0))
            y_t = pred_mean[..., 0] + sd * zs[:, t]
        out.append(y_t)
        xs = full_x
        ys = jnp.concatenate([ys, y_t[:, None]], -1)
        vols = full_vol
    return jnp.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# Non-volatility autoregressive rollouts (baseline exact GPs)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("nsample",))
def _nonvol_scan(key, model, test_x, nsample):
    """Autoregressive sampling for arbitrary stationary kernels.

    The reference re-fits the conditioning cache from scratch each step
    (``rollout_utils.py:95-115``, O((n+t)^3) per step).  Here the kernel
    matrix over the *joint* grid is built once (hyperparameters are fixed
    during forecasting), and the growing Cholesky factor of
    ``K + sigma^2 I`` is extended by one row per step — a single shared
    O(M^2) triangular solve per step plus O(S M) per-path work, all inside
    one ``lax.scan`` over fixed-size padded buffers.
    """
    mean_mod = model.module.mean
    mean_params = model.params["mean"]
    kern = model.module.kernel
    kern_params = model.params["kernel"]
    noise = model.module.likelihood.noise(model.params["likelihood"])[..., 0]

    train_x, train_y = model.train_x, model.train_y
    l = train_x.shape[-1]
    h = test_x.shape[-1]
    m = l + h
    dtype = train_y.dtype

    joint_x = jnp.concatenate([train_x, test_x], -1)
    k_joint = kern(kern_params, joint_x)  # (M, M), shared across paths
    a_diag = jnp.diagonal(k_joint) + noise

    # mean setup
    hist = mean_mod.is_history_dependent
    if hist:
        mstate0 = mean_mod.scan_init(mean_params, train_y)
        mstate0 = jax.tree.map(
            lambda b: jnp.broadcast_to(b, (nsample, *b.shape)), mstate0
        )
        m_train = mean_mod.train_values(mean_params, train_y)
        m_det = jnp.zeros((h,), dtype)
    else:
        mstate0 = {}
        m_train = mean_mod(mean_params, train_x)
        m_det = mean_mod(mean_params, test_x)

    # Cholesky of the train block, embedded in an identity-padded buffer.
    a_tr = k_joint[:l, :l] + noise * jnp.eye(l, dtype=dtype)
    chol_tr = psd_safe_cholesky(a_tr)
    l_buf = jnp.eye(m, dtype=dtype).at[:l, :l].set(chol_tr)

    # u = L^{-1} r, maintained incrementally per path.
    r_train = jnp.broadcast_to(train_y - m_train, (nsample, l))
    u0 = solve_lower_triangular(chol_tr, r_train.T).T  # (S, L)
    u_buf = jnp.zeros((nsample, m), dtype).at[:, :l].set(u0)

    zs = jax.random.normal(key, (h, nsample), dtype)
    idx_grid = jnp.arange(m)

    def body(carry, inp):
        l_buf, u_buf, mstate, t = carry
        k_col, z_t, m_det_t = inp  # k_col: (M,) column of the joint kernel
        n_t = l + t
        mask = idx_grid < n_t
        k_masked = jnp.where(mask, k_col, 0.0)
        w = solve_lower_triangular(l_buf, k_masked[:, None])[:, 0]
        w = jnp.where(mask, w, 0.0)

        # HIGHEST: the conditional variance is a cancellation of two
        # near-equal numbers and the mean a long contraction — bf16
        # accumulation (the TPU matmul default) is far outside the
        # sampler's parity budget.
        hp = jax.lax.Precision.HIGHEST
        latent_var = jnp.maximum(
            k_col[n_t] - jnp.dot(w, w, precision=hp), 1e-12
        )
        cond_mean_resid = jnp.matmul(u_buf, w, precision=hp)  # (S,)
        if hist:
            m_t = mean_mod.scan_value(mean_params, mstate)
        else:
            m_t = m_det_t
        y_t = m_t + cond_mean_resid + jnp.sqrt(latent_var) * z_t

        # extend the Cholesky: new row = [w, sqrt(A_tt - w.w)]
        diag_new = jnp.sqrt(jnp.maximum(
            a_diag[n_t] - jnp.dot(w, w, precision=hp), 1e-12
        ))
        new_row = w.at[n_t].set(diag_new)
        l_buf = l_buf.at[n_t, :].set(new_row)
        # extend u per path: u_new = (r_new - row . u) / diag, where
        # row . u is exactly the cond_mean_resid contraction above
        r_new = y_t - m_t
        u_new = (r_new - cond_mean_resid) / diag_new
        u_buf = u_buf.at[:, n_t].set(u_new)

        if hist:
            mstate = mean_mod.scan_append(mean_params, mstate, y_t)
        return (l_buf, u_buf, mstate, t + 1), y_t

    cols = k_joint[:, l:].T  # (H, M)
    carry0 = (l_buf, u_buf, mstate0, jnp.int32(0))
    _, samples = lax.scan(body, carry0, (cols, zs, m_det))
    return samples.T  # (S, H)


def nonvol_rollouts(key, model, train_x, train_y, test_x, nsample: int = 50):
    """Autoregressive MC forecast for baseline GPs (reference
    ``nonvol_rollouts``, ``rollout_utils.py:95-115``).

    ``model`` is a fitted :class:`volt_tpu.models.basic.BasicGPState` whose
    ``train_y`` holds *log* prices; ``train_y`` here is the raw price series
    (kept for reference API parity, unused beyond validation).  Returns log
    samples ``(nsample, H)``.
    """
    del train_x, train_y
    return _nonvol_scan(key, model, jnp.asarray(test_x), int(nsample))


def nonvol_rollouts_dense(key, model, test_x, nsample: int = 50, zs=None):
    """Dense per-step restatement of the reference loop (test oracle).

    ``zs`` (S, H) optionally pins the per-step standard normals for
    common-random-number parity against :func:`nonvol_rollouts` (which
    draws ``normal(key, (H, S))`` — pass its transpose).
    """
    mean_mod = model.module.mean
    mean_params = model.params["mean"]
    kern = model.module.kernel
    kern_params = model.params["kernel"]
    noise = model.module.likelihood.noise(model.params["likelihood"])[..., 0]

    xs = model.train_x
    ys = jnp.broadcast_to(model.train_y, (nsample, model.train_y.shape[-1]))
    test_x = jnp.asarray(test_x)
    out = []
    for t in range(test_x.shape[-1]):
        n = xs.shape[-1]
        k_tr = kern(kern_params, xs) + noise * jnp.eye(n)
        k_tr_te = kern(kern_params, xs, test_x[t][None])
        k_te = kern(kern_params, test_x[t][None])
        if mean_mod.is_history_dependent:
            train_mean = mean_mod.train_values(mean_params, ys)
            m_test = mean_mod.last_value(mean_params, ys)[..., None]
        else:
            train_mean = mean_mod(mean_params, xs)
            m_test = mean_mod(mean_params, test_x[t][None])
        resid = ys - train_mean
        cond_mean, cond_cov = conditional(k_tr, k_tr_te, k_te, resid)
        if zs is None:
            key, k_s = jax.random.split(key)
            y_t = sample_mvn(k_s, cond_mean + m_test, cond_cov)[..., 0]
        else:
            sd = jnp.sqrt(jnp.maximum(cond_cov[..., 0, 0], 0.0))
            y_t = (cond_mean + m_test)[..., 0] + sd * zs[:, t]
        out.append(y_t)
        xs = jnp.concatenate([xs, test_x[t][None]], -1)
        ys = jnp.concatenate([ys, y_t[:, None]], -1)
    return jnp.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# Correlated multi-asset rollouts (multitask vol GP)
# ---------------------------------------------------------------------------


def rollouts_multitask(key, volt_state: VoltState, mt_vol_state, train_ys,
                       test_x, nsample: int = 50, theta=None,
                       assume_future: bool | None = None):
    """Autoregressive rollouts for T correlated assets.

    ``volt_state`` carries leading task dims (from
    :func:`volt_tpu.train.train_volt_multitask`); ``mt_vol_state`` is the
    fitted :class:`~volt_tpu.models.multitask.MultitaskBMGPState`.  Vol
    forecasts are *jointly correlated across assets* through the Kronecker
    task covariance; price paths then evolve per asset via the Markov scan.
    Returns ``(T, nsample, H)`` log-price samples.

    ``train_ys`` is used only for the mean-reversion latent mean (when
    ``theta`` is set) and should be the *full* ``(T, n+1)`` price series,
    like :func:`rollouts`' ``train_y``.  ``assume_future`` follows
    :func:`sample_vol_paths`.
    """
    from .kernels import BMKernel

    test_x = jnp.asarray(test_x)
    h = test_x.shape[-1]
    num_tasks = volt_state.train_y.shape[0]
    k_vol, k_z = jax.random.split(key)

    # (S, H, T) correlated log-vol draws -> (T, S, H) vol paths.  Same
    # fast-path contract as sample_vol_paths: strictly-future grids take
    # the Matheron sampler (no (H*T)^2 covariance — mandatory at the
    # 505-ticker scale); anything else falls back to the dense posterior,
    # and a violating grid under tracing NaN-poisons through the
    # sampler's runtime guard (ops.brownian.future_grid_ok).
    fast = (isinstance(mt_vol_state.module.data_kernel, BMKernel)
            and assume_future is not False
            and (assume_future is True
                 or _strictly_future(test_x, mt_vol_state.train_x)))
    if fast:
        log_vols = mt_vol_state.sample_forecast(k_vol, test_x, (nsample,))
    else:
        log_vols = mt_vol_state.sample(k_vol, test_x, (nsample,))
    pred_vol = jnp.exp(jnp.moveaxis(log_vols, -1, 0))
    zs = jax.random.normal(k_z, (num_tasks, nsample, h),
                           volt_state.train_y.dtype)

    use_theta = theta is not None
    if use_theta:
        latent = jnp.mean(jnp.log(jnp.asarray(train_ys)), axis=-1)
    else:
        latent = jnp.zeros((num_tasks,), volt_state.train_y.dtype)
    theta_val = jnp.asarray(theta if use_theta else 0.0,
                            volt_state.train_y.dtype)

    def one(task_state, lat, pv, z):
        return _rollout_volt_scan(task_state, lat, test_x, pv, z, use_theta,
                                  theta_val)

    return jax.vmap(one, in_axes=(0, 0, 0, 0))(
        volt_state, latent, pred_vol, zs
    )


def volt_posterior(model: VoltState, test_x, pred_vol, latent_mean=None,
                   theta: float = 0.5):
    """Closed-form conditional distribution over the horizon.

    What :func:`generate_prediction` samples from, exposed as
    ``(mean (..., H), cov (..., H, H))``: Markov conditional mean
    ``m(test) + r_last`` and Brownian covariance
    ``cov[s, t] = sum of integral increments up to min(s, t)`` (deterministic
    means only, like the reference's one-shot path).
    """
    mean_mod = model.module.mean
    if mean_mod.is_history_dependent:
        raise ValueError("closed-form posterior requires a deterministic mean")
    mean_params = model.params["mean"]
    test_x = jnp.asarray(test_x)
    pred_vol = jnp.asarray(pred_vol)

    m_train_last = mean_mod(mean_params, model.train_x)[..., -1]
    r_last = model.train_y[..., -1] - m_train_last
    pred_mean = mean_mod(mean_params, test_x) + r_last
    if latent_mean is not None:
        pred_mean = pred_mean - theta * (pred_mean - latent_mean)

    incs = _joint_integral_increments(model, test_x, pred_vol)
    cum = jnp.cumsum(incs, axis=-1)
    h = test_x.shape[-1]
    ii = jnp.arange(h)[:, None]
    jj = jnp.arange(h)[None, :]
    cov = jnp.where(ii <= jj, cum[..., :, None], cum[..., None, :])
    return pred_mean, cov

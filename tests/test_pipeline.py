"""End-to-end pipeline tests on the synthetic SDE oracle (the reference's
example.ipynb correctness protocol) and fast-vs-dense rollout parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu import (
    learn_gpcv,
    train_vol_model,
    train_volt_magpie,
    train_data_model,
    generate_prediction,
)
from volt_tpu.data import sabr_paths
from volt_tpu.rollouts import (
    _rollout_volt_scan,
    generate_prediction_dense,
    rollouts,
    sample_vol_paths,
)


# Shape and fit budget shared with conftest.std_fitted (one fit per
# session, compiled programs reused across files).
N = 72
HORIZON = 10
DT = 1.0 / 252


@pytest.fixture(scope="module")
def sde(std_fitted):
    train_x, train_y, test_x, _, _, _ = std_fitted
    _, v = sabr_paths(steps=N + 1, seed=77)       # true latent vol path
    return train_x, train_y, test_x, v


@pytest.fixture(scope="module")
def fitted(std_fitted):
    _, _, _, vol, vol_state, model = std_fitted
    return vol, vol_state, model


class TestGPCV:
    def test_recovers_volatility_scale(self, sde):
        # The de-facto oracle: GPCV on SDE data with known V(t) should
        # track it (loose tolerance — 100 iters, small n).
        train_x, train_y, _, v_true = sde
        vol = np.asarray(learn_gpcv(train_x, train_y, train_iters=300))
        assert vol.shape == (N,)
        assert np.isfinite(vol).all() and (vol > 0).all()
        # order-of-magnitude recovery on the short 72-point series (the
        # strict quality pin — rel err < 0.30, corr > 0.80 at the
        # reference's own 400-step config — is TestNotebookConfigRecovery)
        ratio = np.median(vol) / np.median(v_true[1:])
        assert 0.3 < ratio < 3.5, ratio

    def test_elbo_improves(self, sde):
        train_x, train_y, _, _ = sde
        from volt_tpu.models.gpcv import GPCVModel
        from volt_tpu.train import scaled_returns, _fit_gpcv

        yy = scaled_returns(train_x, train_y)
        module = GPCVModel()
        params = module.init(train_x, yy)
        _, losses = _fit_gpcv(module, params, train_x, yy, 100, 0.01)
        assert float(losses[-1]) < float(losses[0])


class TestVolModel:
    def test_mll_improves_and_state_usable(self, sde, fitted):
        train_x, train_y, test_x, _ = sde
        vol, vol_state, _ = fitted
        mean, cov = vol_state.posterior(test_x)
        assert mean.shape == (HORIZON,)
        assert cov.shape == (HORIZON, HORIZON)
        # posterior variance grows with horizon for a BM kernel
        var = np.diag(np.asarray(cov))
        assert var[-1] > var[0]

    def test_vol_sampling_shapes(self, sde, fitted):
        _, _, test_x, _ = sde
        _, vol_state, _ = fitted
        paths = sample_vol_paths(jax.random.key(1), vol_state, test_x, 7)
        assert paths.shape == (7, HORIZON)
        assert bool(jnp.all(paths > 0))


class TestDataModel:
    def test_magpie_loss_improves(self, sde, fitted):
        train_x, train_y, _, _ = sde
        from volt_tpu.models.volt import VoltGP, make_mean
        from volt_tpu.train import _fit_volt

        vol, _, _ = fitted
        module = VoltGP(mean=make_mean("ewma", k=25))
        params = module.init()
        log_y = jnp.log(train_y[1:])
        params2, losses = _fit_volt(module, params, train_x, log_y, vol, 50,
                                    0.1)
        assert float(losses[-1]) < float(losses[0])

    def test_fixed_cov_mll_matches_direct(self, sde, fitted):
        # The eigendecomposition fast path must equal the dense MLL.
        _, _, model = fitted
        direct = float(model.mll())
        cache = model.module.make_cov_cache(model.train_x,
                                            jnp.exp(model.log_vol_path))
        fast = float(model.module.mll_fixed_cov(model.params, cache,
                                                model.train_x, model.train_y))
        assert fast == pytest.approx(direct, rel=1e-3)

    def test_loglinear_data_model(self, sde, fitted):
        train_x, train_y, _, _ = sde
        vol, vol_state, _ = fitted
        model = train_data_model(train_x, train_y[1:], vol_state, vol,
                                 train_iters=50)
        assert bool(jnp.all(jnp.isfinite(model.train_mean())))


class TestRolloutParity:
    """The Markov fast path vs the reference's dense algebra."""

    def test_one_shot_matches_dense_conditional(self, fitted, sde):
        # Same key => same samples only if the *distributions* match; here
        # we compare means and covariances implied by each path.
        _, _, test_x, _ = sde
        _, _, model = fitted
        # switch to a deterministic (constant) mean for one-shot support
        from volt_tpu.models.volt import VoltGP
        from volt_tpu.means import ConstantMean

        module = VoltGP(mean=ConstantMean())
        params = {"mean": {"constant": jnp.asarray([2.0])},
                  "likelihood": model.params["likelihood"]}
        det_model = module.fit_state(params, model.train_x, model.train_y,
                                     jnp.exp(model.log_vol_path),
                                     model.vol_state)

        pred_vol = sample_vol_paths(jax.random.key(5), model.vol_state,
                                    test_x, 3)

        # dense conditional oracle
        dense = generate_prediction_dense(jax.random.key(7), det_model,
                                          test_x, pred_vol, n_sample=4000)
        fast = generate_prediction(jax.random.key(11), det_model, test_x,
                                   pred_vol, n_sample=4000)
        # moments over the sample axis must agree
        np.testing.assert_allclose(
            np.mean(np.asarray(dense), axis=-2),
            np.mean(np.asarray(fast), axis=-2),
            atol=5e-3,
        )
        np.testing.assert_allclose(
            np.std(np.asarray(dense), axis=-2),
            np.std(np.asarray(fast), axis=-2),
            rtol=0.15, atol=2e-3,
        )

    # NOTE: the 3-step EWMA-only fast-vs-dense comparison that lived here
    # is superseded by tests/test_rollout_parity_full.py, which pins every
    # step of a 10-step horizon for all four Magpie means and theta-on.

    def test_rollout_with_theta(self, fitted, sde):
        train_x, train_y, test_x, _ = sde
        _, _, model = fitted
        samples = rollouts(jax.random.key(0), model, train_x, train_y,
                           test_x, nsample=64, theta=0.05)
        assert samples.shape == (64, HORIZON)
        assert bool(jnp.all(jnp.isfinite(samples)))

    def test_rollout_constant_mean(self, sde, fitted):
        train_x, train_y, test_x, _ = sde
        vol, vol_state, _ = fitted
        model = train_volt_magpie(train_x, train_y[1:], vol_state, vol,
                                  train_iters=50, mean_func="constant")
        samples = rollouts(jax.random.key(0), model, train_x, train_y,
                           test_x, nsample=32, theta=0.01)
        assert samples.shape == (32, HORIZON)
        assert bool(jnp.all(jnp.isfinite(samples)))

    def test_forecasts_start_near_last_price(self, fitted, sde):
        # Log-price forecasts should continue from the end of the series.
        train_x, train_y, test_x, _ = sde
        _, _, model = fitted
        samples = rollouts(jax.random.key(3), model, train_x, train_y,
                           test_x, nsample=400)
        first = np.asarray(samples)[:, 0]
        last_log = float(jnp.log(train_y[-1]))
        assert abs(first.mean() - last_log) < 0.05


class TestRolloutClosedForm:
    """With a constant mean, the Markov rollout is exactly a random walk
    from the last observation: y_t ~ N(y_L, sum_{s<=t} (dx/2) vol_s^2)
    (pred_mean telescopes: m + (y_prev - m) = y_prev).  Fixing the vol
    paths makes the whole sampler's distribution analytic."""

    def test_distribution_matches_closed_form(self, sde):
        train_x, train_y, test_x, _ = sde
        from volt_tpu.models.bmgp import BMGP
        from volt_tpu.models.volt import VoltGP
        from volt_tpu.means import ConstantMean
        from volt_tpu.rollouts import _rollout_volt_scan

        vol_const = 0.3
        nsample = 40_000
        bm = BMGP()
        vol_state = bm.fit_state(bm.init(), train_x,
                                 jnp.log(vol_const * jnp.ones(N)))
        volt = VoltGP(mean=ConstantMean())
        params = {"mean": {"constant": jnp.asarray([1.0])},
                  "likelihood": volt.likelihood.init()}
        model = volt.fit_state(params, train_x, jnp.log(train_y[1:]),
                               vol_const * jnp.ones(N), vol_state)

        pred_vol = vol_const * jnp.ones((nsample, HORIZON))
        zs = jax.random.normal(jax.random.key(9), (nsample, HORIZON))
        samples = np.asarray(
            _rollout_volt_scan(model, jnp.float32(0), test_x, pred_vol, zs,
                               False, jnp.float32(0))
        )
        y_last = float(jnp.log(train_y[-1]))
        var_step = 0.5 * DT * vol_const**2
        for t in range(HORIZON):
            mu, sd = samples[:, t].mean(), samples[:, t].std()
            assert mu == pytest.approx(y_last, abs=4 * sd / np.sqrt(nsample)
                                       + 1e-4)
            expected_sd = np.sqrt(var_step * (t + 1))
            assert sd == pytest.approx(expected_sd, rel=0.03), t

    def test_theta_shrinks_toward_latent(self, sde):
        # with theta=1 the predictive mean IS the latent mean at every step
        train_x, train_y, test_x, _ = sde
        from volt_tpu.models.bmgp import BMGP
        from volt_tpu.models.volt import VoltGP
        from volt_tpu.means import ConstantMean
        from volt_tpu.rollouts import _rollout_volt_scan

        bm = BMGP()
        vol_state = bm.fit_state(bm.init(), train_x,
                                 jnp.log(0.2 * jnp.ones(N)))
        volt = VoltGP(mean=ConstantMean())
        params = {"mean": {"constant": jnp.asarray([0.0])},
                  "likelihood": volt.likelihood.init()}
        model = volt.fit_state(params, train_x, jnp.log(train_y[1:]),
                               0.2 * jnp.ones(N), vol_state)
        latent = jnp.float32(5.0)
        pred_vol = 1e-5 * jnp.ones((2000, HORIZON))
        zs = jax.random.normal(jax.random.key(1), (2000, HORIZON))
        samples = np.asarray(
            _rollout_volt_scan(model, latent, test_x, pred_vol, zs, True,
                               jnp.float32(1.0))
        )
        np.testing.assert_allclose(samples, 5.0, atol=1e-3)


class TestNotebookConfigRecovery:
    """The reference tutorial's exact configuration (example.ipynb cells
    2-8: 400-step SABR sim, seed 2019, GPCV 500 iters): the learned vol
    path must track the true latent volatility closely."""

    def test_gpcv_quality_at_reference_config(self):
        f, v = sabr_paths(steps=400, seed=2019)
        steps, t_max = 400, 1.0
        dt = t_max / steps
        train_x = jnp.linspace(0, t_max, steps - 1) + dt
        vol = np.asarray(learn_gpcv(train_x, jnp.asarray(f),
                                    train_iters=500))
        rel_err = np.mean(np.abs(vol - v[1:]) / v[1:])
        corr = np.corrcoef(vol, v[1:])[0, 1]
        assert rel_err < 0.30, rel_err   # measured: ~0.195
        assert corr > 0.80, corr         # measured: ~0.93

    def test_gpcv_quality_cv_parameterization(self):
        """The cv likelihood with its exact-Hessian Laplace init
        (``models/gpcv.py:_cv_laplace_pieces`` — the reference's cv
        branch is broken, fixed by design) must recover the SABR vol
        path within ~1.5x of the exp parameterization's error on the
        same oracle (measured: rel_err ~0.205 vs exp's ~0.195, corr
        ~0.94)."""
        f, v = sabr_paths(steps=400, seed=2019)
        steps, t_max = 400, 1.0
        dt = t_max / steps
        train_x = jnp.linspace(0, t_max, steps - 1) + dt
        vol = np.asarray(learn_gpcv(train_x, jnp.asarray(f),
                                    train_iters=500, param="cv",
                                    key=jax.random.key(0)))
        rel_err = np.mean(np.abs(vol - v[1:]) / v[1:])
        corr = np.corrcoef(vol, v[1:])[0, 1]
        assert rel_err < 0.30, rel_err   # measured: ~0.205
        assert corr > 0.80, corr         # measured: ~0.94

    def test_gpcv_quality_fbm_kernel(self):
        """FBM GPCV must actually converge: with the reference's x10
        root inflation the fit diverges against the near-singular FBM
        prior (loss ~1e8 -> NaN); the uninflated Laplace init recovers
        the vol path (measured rel_err ~0.18 at n=149, 300 iters —
        ``models/gpcv.py:init``)."""
        f, v = sabr_paths(steps=150, seed=0)
        n = 149
        dt = 1.0 / 252
        train_x = jnp.arange(n, dtype=jnp.float32) * dt
        vol = np.asarray(learn_gpcv(train_x, jnp.asarray(f),
                                    train_iters=300, kernel="fbm"))
        assert np.isfinite(vol).all()
        rel_err = np.mean(np.abs(vol - v[1:]) / v[1:])
        assert rel_err < 0.40, rel_err   # measured: ~0.179


class TestVoltPosterior:
    def test_matches_dense_conditional(self, fitted, sde):
        from volt_tpu.models.volt import VoltGP
        from volt_tpu.means import ConstantMean
        from volt_tpu.rollouts import volt_posterior
        from volt_tpu.kernels import VolatilityKernel
        from volt_tpu.ops import conditional

        _, _, test_x, _ = sde
        _, _, model = fitted
        module = VoltGP(mean=ConstantMean())
        params = {"mean": {"constant": jnp.asarray([2.0])},
                  "likelihood": model.params["likelihood"]}
        det = module.fit_state(params, model.train_x, model.train_y,
                               jnp.exp(model.log_vol_path), model.vol_state)
        pred_vol = 0.2 * jnp.ones(HORIZON)

        mean, cov = volt_posterior(det, test_x, pred_vol)

        # dense oracle
        kern = VolatilityKernel()
        full_x = jnp.concatenate([det.train_x, test_x])
        full_vol = jnp.concatenate([jnp.exp(det.log_vol_path), pred_vol])
        k_full = kern({}, full_x, full_vol)
        n = det.train_x.shape[-1]
        resid = det.train_y - 2.0
        cm, cc = conditional(k_full[:n, :n], k_full[:n, n:],
                             k_full[n:, n:], resid, jitter=1e-4)
        np.testing.assert_allclose(mean, cm + 2.0, atol=5e-4)
        np.testing.assert_allclose(cov, cc, atol=5e-5)

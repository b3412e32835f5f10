"""Mean-function tests: conv forms against literal reference restatements,
and the O(k) scan protocol against full recomputation (the property the
rollout correctness rests on)."""

import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu import means as M


from reference_oracles import ewma_reference as _ewma_np


class TestDeterministicMeans:
    def test_constant(self):
        m = M.ConstantMean()
        params = {"constant": jnp.asarray([1.7])}
        out = m(params, jnp.linspace(0, 1, 9))
        np.testing.assert_allclose(out, np.full(9, 1.7), rtol=1e-6)

    def test_linear(self, rng):
        m = M.LinearMean()
        params = {
            "weights": jnp.asarray([[2.0]]),
            "bias": jnp.asarray([0.5]),
        }
        x = rng.random(7).astype(np.float32)
        np.testing.assert_allclose(
            m(params, jnp.asarray(x)), 2.0 * x + 0.5, rtol=1e-5
        )

    def test_loglinear_clamps(self, rng):
        # log(clamp(linear, 1e-6))  [loglinear_mean.py:17-21]
        m = M.LogLinearMean()
        params = {"weights": jnp.asarray([[1.0]]), "bias": jnp.asarray([0.0])}
        x = jnp.asarray([-5.0, 0.5])
        out = np.asarray(m(params, x))
        assert out[0] == pytest.approx(np.log(1e-6), rel=1e-5)
        assert out[1] == pytest.approx(np.log(0.5), rel=1e-4)

    def test_loglinear_init_from_data(self, rng):
        m = M.LogLinearMean()
        y = jnp.asarray(rng.random(20).astype(np.float32) + 1.0)
        params = m.initialize_from_data(m.init(), None, jnp.log(y))
        assert float(params["bias"][0]) == pytest.approx(
            float(jnp.mean(y)), rel=1e-5
        )

    def test_mulidentity(self, rng):
        m = M.MulIdentityMean()
        params = {"constant": jnp.asarray([3.0])}
        x = rng.random(5).astype(np.float32)
        np.testing.assert_allclose(m(params, jnp.asarray(x)), 3.0 * x, rtol=1e-5)


class TestMagpieConvForms:
    @pytest.mark.parametrize("k", [10, 50])
    def test_ewma_three_cases(self, rng, k):
        y = rng.standard_normal(120).astype(np.float32) + 4.0
        m = M.EWMAMean(k)
        full = _ewma_np(y, k)
        np.testing.assert_allclose(m.full_values({}, jnp.asarray(y)), full,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(m.train_values({}, jnp.asarray(y)),
                                   full[:-1], rtol=1e-4, atol=1e-5)
        assert float(m.last_value({}, jnp.asarray(y))) == pytest.approx(
            full[-1], abs=1e-5
        )

    def test_dewma(self, rng):
        # dema = 2*ema - ema(ema)[:-1]  [EWMA.py:85-92]
        k = 15
        y = rng.standard_normal(80).astype(np.float32)
        e = _ewma_np(y, k)
        ee = _ewma_np(e, k)[:-1]
        expected = 2 * e - ee
        got = M.DEWMAMean(k).full_values({}, jnp.asarray(y))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_tewma(self, rng):
        # tema = 3*ema - 3*ema_ema + ema_ema_ema  [EWMA.py:101-113]
        k = 15
        y = rng.standard_normal(80).astype(np.float32)
        e = _ewma_np(y, k)
        ee = _ewma_np(e, k)[:-1]
        eee = _ewma_np(ee, k)[:-1]
        expected = 3 * e - 3 * ee + eee
        got = M.TEWMAMean(k).full_values({}, jnp.asarray(y))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_hewma(self, rng):
        # hma = EWMA(2*EWMA(y,k/2)[:-1] - EWMA(y,k)[:-1], sqrt(k))  [EWMA.py:57-71]
        k = 16
        y = rng.standard_normal(60).astype(np.float32)
        wk = _ewma_np(y, k)
        wk2 = _ewma_np(y, k // 2)
        expected = _ewma_np(2 * wk2[:-1] - wk[:-1], 4)
        got = M.HEWMAMean(k).full_values({}, jnp.asarray(y))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_meanrevert(self, rng):
        # ema[1:] -= theta*(ema[:-1] - mean(y))  [EWMA.py:116-135]
        k, theta = 12, 0.3
        y = rng.standard_normal(50).astype(np.float32)
        e = _ewma_np(y, k)
        expected = e.copy()
        expected[1:] -= theta * (e[:-1] - y.astype(np.float64).mean())
        got = M.MeanRevertingEMAMean(k, theta).full_values({}, jnp.asarray(y))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_hewma_no_rollout(self, rng):
        with pytest.raises(NotImplementedError):
            M.HEWMAMean(8).scan_init({}, jnp.zeros(10))


class TestMagpieScanProtocol:
    """The property the fast rollout depends on: appending values through
    the scan state reproduces full recomputation's last value exactly."""

    @pytest.mark.parametrize(
        "mean_cls,kwargs",
        [
            (M.EWMAMean, {}),
            (M.DEWMAMean, {}),
            (M.TEWMAMean, {}),
            (M.MeanRevertingEMAMean, {"theta": 0.25}),
        ],
    )
    @pytest.mark.parametrize("k", [7, 40])
    def test_scan_matches_full(self, rng, mean_cls, kwargs, k):
        mean = mean_cls(k=k, **kwargs)
        y = rng.standard_normal(112).astype(np.float32)
        n0 = 100
        state = mean.scan_init({}, jnp.asarray(y[:n0]))
        for t in range(n0, 112):
            history = jnp.asarray(y[:t])
            if isinstance(mean, M.MeanRevertingEMAMean):
                # latent mean frozen at scan_init's series mean
                latent = jnp.mean(jnp.asarray(y[:n0]))
                expected = float(mean.last_value({}, history, latent))
            else:
                expected = float(mean.last_value({}, history))
            got = float(mean.scan_value({}, state))
            assert got == pytest.approx(expected, abs=2e-4), (t, mean_cls)
            state = mean.scan_append({}, state, jnp.asarray(y[t]))

    def test_scan_batched(self, rng):
        mean = M.DEWMAMean(k=9)
        y = rng.standard_normal((5, 60)).astype(np.float32)
        state = mean.scan_init({}, jnp.asarray(y[:, :50]))
        got = np.asarray(mean.scan_value({}, state))
        for b in range(5):
            expected = float(mean.last_value({}, jnp.asarray(y[b, :50])))
            assert got[b] == pytest.approx(expected, abs=2e-4)


class TestFastScanProtocol:
    """O(1) rolling-register rollout state vs the windowed protocol.

    The CRN dense-oracle parity tests already pin the fast path (they run
    at horizon <= k); these pin the two protocols directly at the h = k
    boundary and check the h > k fallback routes through the window form.
    """

    def _roll_both(self, mean_mod, y, h, nsample=6):
        import jax
        from jax import lax

        params = mean_mod.init()
        w_state = mean_mod.scan_init(params, y)
        w_state = jax.tree.map(
            lambda b: jnp.broadcast_to(b, (nsample, *b.shape)), w_state)
        f_state, xs = mean_mod.scan_fast_init(params, y, h)
        f_state = jax.tree.map(
            lambda b: jnp.broadcast_to(b, (nsample, *b.shape)), f_state)
        ys = 100.0 + np.random.default_rng(0).standard_normal((h, nsample))
        ys = jnp.asarray(ys, jnp.float32)

        def w_body(state, y_t):
            m = mean_mod.scan_value(params, state)
            return mean_mod.scan_append(params, state, y_t), m

        def f_body(state, inp):
            x_t, y_t = inp
            m = mean_mod.scan_fast_value(params, state)
            return mean_mod.scan_fast_append(params, state, x_t, y_t), m

        _, m_w = lax.scan(w_body, w_state, ys)
        _, m_f = lax.scan(f_body, f_state, (xs, ys))
        return np.asarray(m_w), np.asarray(m_f)

    @pytest.mark.parametrize("mean_cls,kwargs", [
        (M.EWMAMean, {}), (M.DEWMAMean, {}), (M.TEWMAMean, {}),
        (M.MeanRevertingEMAMean, {"theta": 0.3}),
    ])
    def test_matches_window_protocol_at_boundary(self, mean_cls, kwargs):
        k = 12
        mean_mod = mean_cls(k=k, **kwargs)
        y = jnp.asarray(
            100.0 + np.cumsum(np.random.default_rng(1).standard_normal(40)),
            jnp.float32)
        m_w, m_f = self._roll_both(mean_mod, y, h=k)  # h == k boundary
        np.testing.assert_allclose(m_f, m_w, rtol=2e-5, atol=2e-3)

    def test_fallback_above_k(self):
        assert not M.EWMAMean(k=5).scan_fast_supported(6)
        assert M.EWMAMean(k=5).scan_fast_supported(5)
        assert not M.HEWMAMean(k=16).scan_fast_supported(4)

    def test_rollout_dispatch_above_k_still_correct(self, std_fitted):
        # h > k forces the window path inside _rollout_volt_scan; the
        # result must still match the dense oracle in distribution terms
        # (finite + plausible); exactness for h <= k is covered by the
        # CRN parity suite.
        import jax
        from volt_tpu.rollouts import rollouts

        train_x, train_y, _, vol, vol_state, _ = std_fitted
        from volt_tpu.train import train_volt_magpie

        model = train_volt_magpie(train_x, train_y[1:], vol_state, vol,
                                  train_iters=10, k=4, mean_func="ewma")
        dt = 1.0 / 252
        test_x = train_x[-1] + dt * jnp.arange(1, 9, dtype=jnp.float32)
        s = rollouts(jax.random.key(0), model, train_x, train_y, test_x,
                     nsample=5)
        assert s.shape == (5, 8)
        assert bool(jnp.all(jnp.isfinite(s)))

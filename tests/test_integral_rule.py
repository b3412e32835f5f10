"""The vol-integral quadrature rule (reference quirk vs exact trapezoid).

The reference's ``CumTrapz`` (``VolKernel.py:4-10``) halves the grid's
first AND last weights, so each autoregressively appended point enters at
half weight — the documented one-step-forecast-std / sqrt(2) quirk
(PARITY.md).  ``integral_rule="trapezoid"`` is the wired fix-by-design
opt-out; these tests pin both quadratures, the rollout step variances
under each, and the dense-vs-Markov CRN parity under the new rule.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.kernels import VolatilityKernel
from volt_tpu.ops.volint import vol_integral
from volt_tpu.rollouts import (
    _joint_integral_increments,
    _rollout_volt_scan,
    rollouts_dense,
    sample_vol_paths,
)
from volt_tpu.train import train_volt_magpie

DT = 1.0 / 252.0


class TestQuadrature:
    @pytest.mark.parametrize("n", [2, 3, 17, 64])
    def test_trapezoid_matches_numpy_restatement(self, n):
        """Property check against an independent numpy cumulative
        trapezoid (the ADVICE r4 item: the branch previously had no
        caller and no oracle)."""
        rng = np.random.default_rng(n)
        dx = 0.004
        x = (np.arange(n, dtype=np.float32) + 1) * dx
        v = (0.1 + rng.random(n)).astype(np.float32)
        got = np.asarray(vol_integral(jnp.asarray(x), jnp.asarray(v),
                                      "trapezoid"))
        v2 = (v * v).astype(np.float64)
        want = np.zeros(n)
        want[0] = x[0] * v2[0]  # time-from-zero mass (see volint.py)
        want[1:] = want[0] + np.cumsum(dx * 0.5 * (v2[1:] + v2[:-1]))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-7)
        # strictly positive and nondecreasing: the Gram stays nonsingular
        assert got[0] > 0.0
        assert (np.diff(got) >= 0).all()

    def test_reference_vs_trapezoid_increments(self):
        """With constant vol the reference prefix increments are
        dx*v^2 but the FINAL grid point's increment is halved; the
        trapezoid increments are dx*v^2 uniformly after the first."""
        n, v, dx = 8, 0.3, 0.01
        x = jnp.arange(1, n + 1, dtype=jnp.float32) * dx
        vol = jnp.full((n,), v, jnp.float32)
        ref = np.diff(np.asarray(vol_integral(x, vol, "reference")))
        trap = np.diff(np.asarray(vol_integral(x, vol, "trapezoid")))
        np.testing.assert_allclose(ref[:-1], dx * v * v, rtol=1e-5)
        np.testing.assert_allclose(ref[-1], 0.5 * dx * v * v, rtol=1e-5)
        np.testing.assert_allclose(trap, dx * v * v, rtol=1e-5)

    def test_invalid_rule_raises(self):
        with pytest.raises(ValueError, match="rule"):
            vol_integral(jnp.arange(4.0), jnp.ones(4), "simpson")
        with pytest.raises(ValueError, match="integral_rule"):
            VolatilityKernel(integral_rule="simpson")


class TestRolloutVariances:
    def test_one_step_std_sqrt2_ratio(self, std_fitted):
        """The quantified quirk: at matched vol the trapezoid one-step
        increment carries FULL weight — std exactly sqrt(2) times the
        reference rule's half-weight step."""
        train_x, train_y, test_x, vol, vol_state, model = std_fitted
        trap_model = train_volt_magpie(train_x, train_y[1:], vol_state, vol,
                                       train_iters=0, k=20,
                                       integral_rule="trapezoid")
        # pred vol pinned to the train-grid's last vol so v_t = v_{t-1}
        pv = jnp.broadcast_to(vol[-1], (1, 1))
        inc_ref = _joint_integral_increments(model, test_x[:1], pv)
        inc_trap = _joint_integral_increments(trap_model, test_x[:1], pv)
        np.testing.assert_allclose(np.asarray(inc_trap),
                                   2.0 * np.asarray(inc_ref), rtol=1e-6)

    def test_dense_markov_crn_parity_trapezoid(self, std_fitted):
        """Same conditional law + same draws => per-path agreement —
        the gate VERDICT r4 asked for before wiring the rule."""
        train_x, train_y, _, vol, vol_state, _ = std_fitted
        # a dt-starting grid (the pipeline convention): the trapezoid
        # Gram's I_0 = x_0 v_0^2 > 0 keeps the dense oracle's Cholesky
        # jitterless, so CRN parity holds at float tolerance (std_fitted's
        # own grid starts at 0, where the trapezoid Gram is singular by
        # construction and the dense twin's jitter ladder would engage).
        train_x = train_x + DT
        test_x = train_x[-1] + DT * jnp.arange(1, 11)
        h = test_x.shape[-1]
        nsample = 32
        model = train_volt_magpie(train_x, train_y[1:], vol_state, vol,
                                  train_iters=40, k=20,
                                  integral_rule="trapezoid")
        key = jax.random.key(99)
        k_vol, k_z = jax.random.split(key)
        pred_vol = sample_vol_paths(k_vol, vol_state, test_x, nsample)
        zs = jax.random.normal(k_z, (nsample, h), jnp.float32)
        fast = np.asarray(_rollout_volt_scan(
            model, jnp.float32(0), test_x, pred_vol, zs, False,
            jnp.float32(0),
        ))
        dense = np.asarray(rollouts_dense(
            key, model, train_x, train_y, test_x, nsample=nsample,
            pred_vol=pred_vol, zs=zs,
        ))
        np.testing.assert_allclose(fast, dense, atol=5e-4)
        std = fast.std(0)
        assert std[-1] > std[0] > 0

    def test_pipeline_trapezoid_end_to_end(self):
        from volt_tpu.parallel import PipelineConfig, fit_forecast

        rng = np.random.default_rng(3)
        n = 60
        rets = 0.2 * np.sqrt(DT) * rng.standard_normal(n)
        prices = 100.0 * np.exp(np.cumsum(rets)).astype(np.float32)
        x = jnp.arange(n - 1, dtype=jnp.float32) * DT + DT
        tx = x[-1] + DT * jnp.arange(1, 6)
        cfg = PipelineConfig(gpcv_iters=15, vol_iters=15, data_iters=15,
                             nsample=64, integral_rule="trapezoid", k=10)
        out, aux = fit_forecast(jax.random.key(0), x, jnp.asarray(prices),
                                tx, cfg)
        assert bool(aux["ok"])
        assert bool(jnp.all(jnp.isfinite(out)))
        # the first-step dispersion is wider than the reference rule's
        # (the /sqrt(2) quirk removed) at the same draws
        ref_cfg = PipelineConfig(gpcv_iters=15, vol_iters=15, data_iters=15,
                                 nsample=64, k=10)
        out_ref, _ = fit_forecast(jax.random.key(0), x, jnp.asarray(prices),
                                  tx, ref_cfg)
        s_trap = float(np.std(np.asarray(out)[:, 0]))
        s_ref = float(np.std(np.asarray(out_ref)[:, 0]))
        assert s_trap > 1.2 * s_ref, (s_trap, s_ref)

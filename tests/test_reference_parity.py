"""Parity against the reference's own runnable torch code.

The reference's §2.1-2.3 components (kernels, means, likelihood) plus the
LSTM windowing are pure torch — executable on this image's CPU torch without
gpytorch.  Each oracle below *executes the reference's computation* (same
conv, same meshgrid gather, same constraint transforms, same quadrature node
placement) so that a shared misreading between volt_tpu and a hand-written
restatement is impossible.  volt_tpu is pinned to <=1e-5.

Oracle provenance (reference file:line for each computation):

* EWMA conv filter            — ``voltron/means/EWMA.py:20-37``
* DEWMA / TEWMA / MeanRevert  — ``voltron/means/EWMA.py:74-135``
* CumTrapz + VolatilityKernel — ``voltron/kernels/VolKernel.py:4-42``
* BMKernel forward            — ``voltron/kernels/BMKernel.py:38-52``
* FBMKernel forward           — ``voltron/kernels/FBMKernel.py:38-59``
* OUKernel forward            — ``voltron/kernels/OUKernel.py:5-23``
* cv / exp likelihood scale   — ``voltron/likelihoods/volatility_likelihood.py:44-51``
* GH expected log prob        — gpytorch ``_OneDimensionalLikelihood`` +
                                ``num_gauss_hermite_locs(75)`` (``train_utils.py:52``)
* LSTM sliding windows        — ``voltron/models/LSTM.py:8-25``
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from volt_tpu.kernels import (
    BMKernel,
    FBMKernel,
    OUKernel,
    VolatilityKernel,
)
from volt_tpu.likelihoods import VolatilityGaussianLikelihood
from volt_tpu.means import DEWMAMean, MeanRevertingEMAMean, TEWMAMean
from volt_tpu.models.lstm import make_windows
from volt_tpu.ops.ewma import ewma
from volt_tpu.ops.volint import min_index_covariance, vol_integral

RTOL = 1e-5
ATOL = 1e-6


def assert_parity(ours, oracle, rtol=RTOL, atol=ATOL):
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(oracle), rtol=rtol, atol=atol
    )


# ---------------------------------------------------------------------------
# torch oracles: the reference's computations, executed
# ---------------------------------------------------------------------------


def torch_ewma(y, k):
    """Reference ``EWMA`` (``means/EWMA.py:20-37``): k-tap Conv1d with
    normalized ``alpha*(1-alpha)**i`` weights over the y[0]-left-padded
    series."""
    y = torch.as_tensor(y, dtype=torch.float32)
    alpha = 2.0 / (k + 1)
    conv = torch.nn.Conv1d(1, 1, kernel_size=k)
    wghts = alpha * (1 - alpha) ** (torch.arange(k - 1, -1, -1))
    conv.weight.data = wghts.unsqueeze(0).unsqueeze(0) / wghts.sum()
    conv.bias.data = torch.zeros(1)
    res = y[..., 0].unsqueeze(-1) * torch.ones(*y.shape[:-1], k)
    padded_px = torch.cat((res, y), dim=-1)
    batch_dim = y.shape[-2] if y.ndim > 1 else 1
    padded_px = padded_px.reshape(batch_dim, 1, -1)
    with torch.no_grad():
        ma = conv(padded_px).squeeze()
    return ma.numpy()


def torch_cumtrapz(y, x):
    """Reference ``CumTrapz`` (``kernels/VolKernel.py:4-10``)."""
    y = torch.as_tensor(y, dtype=torch.float32)
    x = torch.as_tensor(x, dtype=torch.float32)
    dx = x[..., 1] - x[..., 0]
    dx = dx if x.ndim == 1 else dx.unsqueeze(-1)
    wghts = dx * torch.ones_like(x)
    wghts[..., 0] *= 0.5
    wghts[..., -1] *= 0.5
    return torch.cumsum(wghts * y, -1).numpy()


def torch_vol_kernel(x, vol_path):
    """Reference ``VolatilityKernel.forward`` (``VolKernel.py:18-42``):
    min-index meshgrid gather into the CumTrapz integral."""
    x_t = torch.as_tensor(x, dtype=torch.float32)
    vol_t = torch.as_tensor(vol_path, dtype=torch.float32)
    vol_int = torch.as_tensor(torch_cumtrapz((vol_t * vol_t).numpy(), x))
    idx = torch.arange(x_t.shape[-1])
    idx1, idx2 = torch.meshgrid(idx, idx, indexing="ij")
    idx = torch.minimum(idx1, idx2)
    return vol_int[..., idx].numpy()


def torch_interval(raw, lower, upper):
    """gpytorch ``Interval`` transform: ``lower + (u - l) * sigmoid(raw)``."""
    return lower + (upper - lower) * torch.sigmoid(raw)


def torch_bm_kernel(x1, x2, raw_vol, batch=False):
    """Reference ``BMKernel.forward`` (``BMKernel.py:38-52``), inputs
    gpytorch-style ``(n, 1)`` columns."""
    x1 = torch.as_tensor(x1, dtype=torch.float32).reshape(-1, 1)
    x2 = torch.as_tensor(x2, dtype=torch.float32).reshape(-1, 1)
    raw = torch.as_tensor(raw_vol, dtype=torch.float32)
    vol = torch_interval(raw, 0.0, 1.0)
    if not batch:
        X1, X2 = torch.meshgrid(x1[:, 0], x2[:, 0], indexing="ij")
        return (vol * torch.minimum(X1, X2)).numpy()
    X1, X2 = torch.meshgrid(x1[:, 0], x2[:, 0], indexing="ij")
    b = vol.shape[0]
    X1 = X1.unsqueeze(0).repeat(b, 1, 1)
    X2 = X2.unsqueeze(0).repeat(b, 1, 1)
    return (vol.unsqueeze(-1) * torch.minimum(X1, X2)).numpy()


def torch_fbm_kernel(x1, x2, raw_vol):
    """Reference ``FBMKernel.forward`` (``FBMKernel.py:38-59``)."""
    x1 = torch.as_tensor(x1, dtype=torch.float32).reshape(-1, 1).unsqueeze(1)
    x2 = torch.as_tensor(x2, dtype=torch.float32).reshape(-1, 1).unsqueeze(0)
    raw = torch.as_tensor(raw_vol, dtype=torch.float32)
    double_vol = 2.0 * torch_interval(raw, 0.0, 1.0)
    dist = (
        x1.abs().pow(double_vol)
        + x2.abs().pow(double_vol)
        - (x1 - x2).abs().pow(double_vol)
    )
    return (dist.squeeze() / 2.0).numpy()


def torch_ou_kernel(x1, x2, raw_lengthscale):
    """Reference ``OUKernel.forward`` (``OUKernel.py:5-23``): non-squared
    distance of lengthscale-divided inputs, then ``exp(-d / 2)``
    (gpytorch ``covar_dist`` + ``postprocess_rbf``; lengthscale through
    gpytorch's default softplus-positive constraint)."""
    ell = torch.nn.functional.softplus(
        torch.as_tensor(raw_lengthscale, dtype=torch.float32)
    )
    x1 = torch.as_tensor(x1, dtype=torch.float32).reshape(-1, 1) / ell
    x2 = torch.as_tensor(x2, dtype=torch.float32).reshape(-1, 1) / ell
    d = torch.cdist(x1, x2, p=2.0)
    return d.div(-2).exp().numpy()


def torch_cv_scale(f, raw_a, raw_b, raw_c):
    """Reference cv scale (``volatility_likelihood.py:44-48``) with the
    gpytorch constraint transforms (a Positive-softplus, b Interval(0,3),
    c Interval(-3,3))."""
    f = torch.as_tensor(f, dtype=torch.float32)
    a = torch.nn.functional.softplus(
        torch.as_tensor(raw_a, dtype=torch.float32)
    )
    b = torch_interval(torch.as_tensor(raw_b, dtype=torch.float32), 0.0, 3.0)
    c = torch_interval(torch.as_tensor(raw_c, dtype=torch.float32), -3.0, 3.0)
    transform = ((b * f.unsqueeze(-1) + c).exp() + 1).log() * a
    return transform.sum(-1).clamp(min=1e-3).numpy()


def torch_gh_expected_log_prob(y, mu, var, num_locs):
    """gpytorch ``GaussHermiteQuadrature1D`` + the exp-parameterization
    ``Normal(0, clamp(exp(f), 1e-3))`` log prob (``train_utils.py:52``,
    ``volatility_likelihood.py:49-51``)."""
    locs, weights = np.polynomial.hermite.hermgauss(num_locs)
    locs_t = torch.as_tensor(locs, dtype=torch.float32)
    w_t = torch.as_tensor(weights / math.sqrt(math.pi), dtype=torch.float32)
    y = torch.as_tensor(y, dtype=torch.float32)
    mu = torch.as_tensor(mu, dtype=torch.float32)
    var = torch.as_tensor(var, dtype=torch.float32)
    shape = (num_locs,) + (1,) * mu.ndim
    f = torch.sqrt(2.0 * var) * locs_t.reshape(shape) + mu
    scale = f.exp().clamp(min=1e-3)
    lp = torch.distributions.Normal(torch.zeros_like(scale), scale).log_prob(y)
    return torch.tensordot(w_t, lp, dims=([0], [0])).numpy()


def torch_lstm_windows(y, seq_len):
    """Reference ``SequenceDataset.__getitem__`` (``models/LSTM.py:8-25``)."""
    y = torch.as_tensor(y, dtype=torch.float32).reshape(-1, 1)
    xs, targets = [], []
    for i in range(y.shape[0] - 1):
        if i >= seq_len - 1:
            x = y[i - seq_len + 1 : i + 1]
        else:
            padding = y[0].repeat(seq_len - i - 1, 1).squeeze(-1)
            x = torch.cat((padding.unsqueeze(-1), y[0 : i + 1]), 0)
        xs.append(x.squeeze(-1))
        targets.append(y[i + 1, 0])
    return torch.stack(xs).numpy(), torch.stack(targets).numpy()


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


# ---------------------------------------------------------------------------
# EWMA family
# ---------------------------------------------------------------------------


class TestEWMAParity:
    @pytest.mark.parametrize("k", [5, 20, 100])
    def test_filter_1d(self, rng, k):
        y = (4.0 + 0.1 * rng.standard_normal(163)).astype(np.float32)
        assert_parity(ewma(y, k), torch_ewma(y, k))

    @pytest.mark.parametrize("k", [5, 20])
    def test_filter_batched(self, rng, k):
        y = (4.0 + 0.1 * rng.standard_normal((3, 90))).astype(np.float32)
        assert_parity(ewma(y, k), torch_ewma(y, k))

    def test_filter_pallas(self, rng):
        from volt_tpu.ops.pallas import ewma_pallas

        y = (4.0 + 0.1 * rng.standard_normal((2, 130))).astype(np.float32)
        assert_parity(ewma_pallas(y, 20), torch_ewma(y, 20))

    def test_dewma(self, rng):
        """``2*ema - ema(ema)[:-1]`` (``EWMA.py:74-91``)."""
        y = (4.0 + 0.1 * rng.standard_normal(80)).astype(np.float32)
        ema = torch_ewma(y, 20)
        ema_ema = torch_ewma(ema, 20)[..., :-1]
        oracle = 2 * ema - ema_ema
        assert_parity(DEWMAMean(k=20).full_values({}, jnp.asarray(y)), oracle)

    def test_tewma(self, rng):
        """``3*ema - 3*ema^2 + ema^3`` (``EWMA.py:94-113``)."""
        y = (4.0 + 0.1 * rng.standard_normal(80)).astype(np.float32)
        ema = torch_ewma(y, 20)
        ema_ema = torch_ewma(ema, 20)[..., :-1]
        ema3 = torch_ewma(ema_ema, 20)[..., :-1]
        oracle = 3 * ema - 3 * ema_ema + ema3
        assert_parity(TEWMAMean(k=20).full_values({}, jnp.asarray(y)), oracle)

    def test_mean_revert(self, rng):
        """``ema[1:] -= theta * (ema[:-1] - mean(y))`` (``EWMA.py:116-135``)."""
        y = (4.0 + 0.1 * rng.standard_normal(80)).astype(np.float32)
        theta = 0.3
        ema = torch.as_tensor(torch_ewma(y, 20)).clone()
        latent = torch.as_tensor(y).mean()
        ema[..., 1:] -= theta * (ema[..., :-1] - latent)
        assert_parity(
            MeanRevertingEMAMean(k=20, theta=theta).full_values(
                {}, jnp.asarray(y)
            ),
            ema.numpy(),
        )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


class TestKernelParity:
    def test_cumtrapz(self, rng):
        x = (np.arange(50, dtype=np.float32)) / 252.0
        vol = (0.2 + 0.05 * rng.standard_normal(50)).astype(np.float32)
        assert_parity(vol_integral(x, vol), torch_cumtrapz(vol * vol, x))

    def test_cumtrapz_batched(self, rng):
        x = np.broadcast_to(
            np.arange(40, dtype=np.float32) / 252.0, (3, 40)
        ).copy()
        vol = (0.2 + 0.05 * rng.standard_normal((3, 40))).astype(np.float32)
        assert_parity(vol_integral(x, vol), torch_cumtrapz(vol * vol, x))

    def test_vol_kernel_forward(self, rng):
        x = np.arange(60, dtype=np.float32) / 252.0
        vol = (0.2 + 0.05 * rng.standard_normal(60)).astype(np.float32)
        oracle = torch_vol_kernel(x, vol)
        kernel = VolatilityKernel()
        assert_parity(kernel({}, x, vol), oracle)
        assert_parity(min_index_covariance(vol_integral(x, vol)), oracle)

    def test_vol_kernel_pallas(self, rng):
        from volt_tpu.ops.pallas import volt_covariance

        x = np.arange(60, dtype=np.float32) / 252.0
        vol = (0.2 + 0.05 * rng.standard_normal((2, 60))).astype(np.float32)
        assert_parity(volt_covariance(x, vol), torch_vol_kernel(x, vol))

    def test_bm_forward(self):
        x = np.linspace(0.01, 1.0, 40, dtype=np.float32)
        raw = np.float32(-0.7)
        kernel = BMKernel()
        ours = kernel({"raw_vol": jnp.asarray([raw])}, x)
        assert_parity(ours, torch_bm_kernel(x, x, raw))

    def test_bm_forward_batched(self):
        x = np.linspace(0.01, 1.0, 30, dtype=np.float32)
        raws = np.asarray([[-0.7], [0.3], [1.1]], np.float32)
        kernel = BMKernel(batch_shape=(3,))
        ours = kernel({"raw_vol": jnp.asarray(raws)}, x)
        assert_parity(ours, torch_bm_kernel(x, x, raws, batch=True))

    def test_fbm_forward(self):
        x = np.linspace(0.01, 1.0, 35, dtype=np.float32)
        raw = np.float32(0.4)
        kernel = FBMKernel()
        ours = kernel({"raw_vol": jnp.asarray([raw])}, x)
        assert_parity(ours, torch_fbm_kernel(x, x, raw), atol=1e-5)

    def test_ou_forward(self):
        x1 = np.linspace(0.0, 2.0, 25, dtype=np.float32)
        x2 = np.linspace(0.1, 1.9, 30, dtype=np.float32)
        raw = np.float32(0.25)
        kernel = OUKernel()
        ours = kernel({"raw_lengthscale": jnp.asarray([raw])}, x1, x2)
        # torch.cdist's float32 sqrt((x1-x2)^2) loses ~2e-5 on a handful of
        # entries vs the exact |x1-x2|; oracle-side noise, not a mismatch.
        assert_parity(ours, torch_ou_kernel(x1, x2, raw), atol=5e-5)


# ---------------------------------------------------------------------------
# Likelihood
# ---------------------------------------------------------------------------


class TestLikelihoodParity:
    def test_cv_scale(self, rng):
        f = rng.standard_normal(64).astype(np.float32)
        raw_a = rng.uniform(0, 1, 5).astype(np.float32)
        raw_b = (0.1 * rng.uniform(0, 1, 5)).astype(np.float32)
        raw_c = rng.uniform(0, 1, 5).astype(np.float32)
        lik = VolatilityGaussianLikelihood(param="cv")
        params = {
            "raw_a": jnp.asarray(raw_a),
            "raw_b": jnp.asarray(raw_b),
            "raw_c": jnp.asarray(raw_c),
        }
        assert_parity(
            lik.scale(params, jnp.asarray(f)),
            torch_cv_scale(f, raw_a, raw_b, raw_c),
        )

    def test_exp_scale(self, rng):
        f = rng.standard_normal(64).astype(np.float32) - 3.0  # hits the clamp
        lik = VolatilityGaussianLikelihood(param="exp")
        oracle = (
            torch.as_tensor(f).exp().clamp(min=1e-3).numpy()
        )
        assert_parity(lik.scale({}, jnp.asarray(f)), oracle)

    @pytest.mark.parametrize("num_locs", [20, 75])
    def test_gh_expected_log_prob(self, rng, num_locs):
        y = (0.05 * rng.standard_normal(48)).astype(np.float32)
        mu = (np.log(0.2) + 0.3 * rng.standard_normal(48)).astype(np.float32)
        var = (0.05 + 0.1 * rng.uniform(0, 1, 48)).astype(np.float32)
        lik = VolatilityGaussianLikelihood(param="exp")
        ours = lik.expected_log_prob({}, jnp.asarray(y), jnp.asarray(mu),
                                     jnp.asarray(var), num_locs=num_locs)
        oracle = torch_gh_expected_log_prob(y, mu, var, num_locs)
        assert_parity(ours, oracle, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("num_locs", [20, 75])
    def test_gh_expected_log_prob_pallas(self, rng, num_locs):
        from volt_tpu.ops.pallas import gh_expected_log_prob

        y = (0.05 * rng.standard_normal(48)).astype(np.float32)
        mu = (np.log(0.2) + 0.3 * rng.standard_normal(48)).astype(np.float32)
        var = (0.05 + 0.1 * rng.uniform(0, 1, 48)).astype(np.float32)
        ours = gh_expected_log_prob(jnp.asarray(y), jnp.asarray(mu),
                                    jnp.asarray(var), num_locs=num_locs)
        oracle = torch_gh_expected_log_prob(y, mu, var, num_locs)
        assert_parity(ours, oracle, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# LSTM windowing
# ---------------------------------------------------------------------------


class TestLSTMWindowParity:
    @pytest.mark.parametrize("seq_len", [3, 10])
    def test_windows(self, rng, seq_len):
        y = (100.0 + rng.standard_normal(40).cumsum()).astype(np.float32)
        wins, targets = make_windows(jnp.asarray(y), seq_len)
        oracle_wins, oracle_targets = torch_lstm_windows(y, seq_len)
        assert_parity(wins, oracle_wins)
        assert_parity(targets, oracle_targets)

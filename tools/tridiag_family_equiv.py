"""Multitask tridiag-vs-dense family equivalence at float64.

The in-suite equivalence tests (`tests/test_multitask.py::TestTridiagFamily`)
run at the suite's float32 with float32-noise-floor tolerances; this payload
re-runs the same algebraic identities under ``JAX_ENABLE_X64=1`` (set by the
caller BEFORE interpreter start — the trajectory-parity subprocess pattern),
where the two parameterizations of one distribution must agree to ~1e-8.

Prints one JSON object with the max deviations.  Run via
``tests/test_multitask.py::TestTridiagFamily::test_equivalence_float64``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()


def main():
    from volt_tpu.likelihoods import VolatilityGaussianLikelihood
    from volt_tpu.models.multitask import MultitaskVariationalGP

    x64 = bool(jax.config.jax_enable_x64)
    rng = np.random.default_rng(11)
    n, t = 14, 3

    x = jnp.asarray(np.sort(rng.uniform(0.01, 1.0, n)))
    d = jnp.asarray(rng.uniform(0.5, 2.0, n))
    e = jnp.asarray(rng.uniform(-0.3, 0.3, n - 1))
    low = np.diag(np.asarray(d)) + np.diag(np.asarray(e), -1)
    s_x = np.linalg.inv(low @ low.T)
    rx = np.linalg.cholesky(s_x)
    rt = np.tril(rng.uniform(0.2, 1.0, (t, t))) + np.eye(t)

    dtype = jnp.float64 if x64 else jnp.float32
    mod_f = MultitaskVariationalGP(num_tasks=t)
    mod_q = MultitaskVariationalGP(num_tasks=t, q="tridiag")
    shared = {
        "variational_mean": jnp.asarray(rng.normal(0, 1, (n, t))),
        "variational_task_covar_root": jnp.asarray(rt),
        "mean_constants": jnp.asarray(rng.normal(0, 0.5, t)),
    }
    pf = {**mod_f.init(x, dtype=dtype), **shared,
          "variational_covar_root": jnp.asarray(rx)}
    pq = {**mod_q.init(x, dtype=dtype), **shared,
          "data_kernel": pf["data_kernel"],
          "index_kernel": pf["index_kernel"],
          "q_log_d": jnp.log(d), "q_e": e}

    out = {"x64": x64}
    kl_f = float(mod_f.kl_divergence(pf, x))
    kl_q = float(mod_q.kl_divergence(pq, x))
    out["kl_rel_diff"] = abs(kl_q - kl_f) / max(abs(kl_f), 1e-30)

    mv_f = np.asarray(mod_f.marginal_variances(pf))
    mv_q = np.asarray(mod_q.marginal_variances(pq))
    out["marginals_max_rel_diff"] = float(
        np.max(np.abs(mv_q - mv_f) / np.abs(mv_f))
    )

    test_x = x[-1] + jnp.asarray([0.05, 0.11, 0.2])
    m_f, c_f = mod_f.predict(pf, x, test_x)
    m_q, c_q = mod_q.predict(pq, x, test_x)
    out["pred_mean_max_diff"] = float(np.max(np.abs(
        np.asarray(m_q) - np.asarray(m_f))))
    out["pred_cov_max_diff"] = float(np.max(np.abs(
        np.asarray(c_q) - np.asarray(c_f))))

    lik = VolatilityGaussianLikelihood()
    lik_params = lik.init(dtype=dtype)
    y = jnp.asarray(rng.normal(0, 0.3, (n, t)))
    ef = float(mod_f.elbo(pf, x, y, lik, lik_params))
    eq = float(mod_q.elbo(pq, x, y, lik, lik_params))
    out["elbo_rel_diff"] = abs(eq - ef) / max(abs(ef), 1e-30)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

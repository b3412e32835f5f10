"""Full-objective optimization-trajectory parity vs executed torch.

The north-star clause "MLL matching GPyTorch to 1e-5" (BASELINE.json) is
pinned here at the strongest level this image allows: the reference's
three training objectives (GPCV GH-75 ELBO, BM-vol exact MLL, Volt
data-model exact MLL — ``train_utils.py:15-144``) restated in pure torch
(dense Cholesky linear algebra, torch autodiff, ``torch.optim.Adam``)
and run beside the shipped optax ``lax.scan`` fits from bit-identical
inits.  ``tools/parity_trajectories.py`` is the harness; these tests run
it in subprocesses (float64 needs ``JAX_ENABLE_X64`` before backend
init) and assert:

* Laplace-init parity (incl. the x10 root and clamp-after-diag_embed
  quirks) to ~1e-12 in float64;
* per-iteration loss agreement over full Adam trajectories — float64
  isolates objective+optimizer parity from rounding (measured ~1e-10),
  and the shipped O(n) forms (closed-form spectrum, Kalman scan,
  closed-form BM KL) are thereby re-verified against dense
  factorizations *under an optimizer*, not just at fixed params;
* matched-params agreement at the reference's own float32 to <=1e-5 —
  the literal north-star tolerance.
"""

import json
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_ROOT, "tools", "parity_trajectories.py")


def _run(n, iters, x64):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if x64:
        env["JAX_ENABLE_X64"] = "1"
    else:
        env.pop("JAX_ENABLE_X64", None)
    out = subprocess.run(
        [sys.executable, _SCRIPT, "--n", str(n), "--iters", str(iters)],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.parametrize("n,iters", [(60, 300), (400, 150)])
def test_float64_trajectories(n, iters):
    r = _run(n, iters, x64=True)
    assert r["x64"]
    g, v, d = r["gpcv"], r["vol"], r["volt"]
    # independent torch Laplace-init restatement reproduces the shipped init
    assert g["init_max_diff"] < 1e-12, g
    assert d["bias_init_diff"] < 1e-12, d
    # full Adam trajectories agree per iteration
    assert g["traj_max_abs_diff"] < 1e-8, g
    assert v["traj_max_abs_diff_spectral"] < 1e-10, v
    assert v["traj_max_abs_diff_kalman"] < 1e-10, v
    assert d["traj_max_abs_diff"] < 1e-10, d
    # objectives agree at matched (final) parameters on both sides
    for lane in (g, v, d):
        assert lane["matched_at_ours"] < 1e-12, lane
        assert lane["matched_at_torch"] < 1e-12, lane


def test_float32_matched_params():
    """At the reference's own dtype the objectives agree to <=1e-5 at
    matched parameters (the BASELINE.json tolerance); trajectories track
    within float32 rounding accumulation."""
    r = _run(60, 100, x64=False)
    assert not r["x64"]
    g, v, d = r["gpcv"], r["vol"], r["volt"]
    for lane in (g, v, d):
        assert lane["matched_at_ours"] <= 1e-5, lane
        assert lane["matched_at_torch"] <= 1e-5, lane
    assert v["traj_max_abs_diff_spectral"] < 1e-4, v
    assert v["traj_max_abs_diff_kalman"] < 1e-4, v
    assert d["traj_max_abs_diff"] < 1e-4, d
    # the ELBO's f32 trajectory accumulates rounding chaos faster (dense
    # n x n variational root under Adam); the final losses still agree
    assert g["traj_max_abs_diff"] < 2e-2, g
    assert abs(g["final_ours"] - g["final_torch"]) < 1e-3, g

"""CPU smoke lane for the measurement harnesses (``bench.py``, ``tools/``).

These scripts are the provenance of every number in PERFORMANCE.md and
BENCH_SCALING.md but normally only execute on the real chip; this lane
runs each of them at toy shapes on the CPU backend (they honor
``JAX_PLATFORMS=cpu`` via ``utils.platform.configure_backend``) so
breakage — import errors, unpack-order slips, config drift against
``PipelineConfig`` — surfaces in-suite rather than at measurement time
on the chip.  Shapes are minimal: these assert the harnesses *run and
report*, not performance.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(argv, env_extra=None, timeout=540):
    env = {**os.environ, "JAX_PLATFORMS": "cpu", **(env_extra or {})}
    proc = subprocess.run(
        [sys.executable, *argv], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{argv} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    )
    return proc.stdout


@pytest.mark.slow
class TestHarnessSmoke:
    def test_bench_emits_json_line(self):
        out = _run(["bench.py"], env_extra={
            "BENCH_ASSETS": "2", "BENCH_NTRAIN": "64", "BENCH_ITERS": "3",
            "BENCH_NSAMPLE": "8", "BENCH_HORIZON": "8",
            "BENCH_REPEATS": "1",
        })
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["metric"] == "volt_fit_plus_1000path_rollout_throughput"
        assert rec["value"] > 0 and rec["vs_baseline"] > 0
        assert "quantiles" in rec["unit"]
        # the companion raw-path-delivery measurement keeps the driver's
        # bench series apples-to-apples across rounds (r02 recorded
        # samples mode, r03+ quantiles mode)
        assert rec["value_samples"] > 0
        assert "raw-path delivery" in rec["unit_samples"]

    def test_scaling_study_rows(self):
        out = _run(["tools/scaling_study.py"], env_extra={
            "SCALE_ASSETS": "2", "SCALE_NTRAIN": "64", "SCALE_ITERS": "2",
            "SCALE_NSAMPLE": "8",
        })
        assert "| 64 |" in out

    def test_ablate_stages(self):
        out = _run(["tools/ablate_stages.py", "2", "64"], env_extra={
            "ABLATE_ITERS": "2", "ABLATE_NSAMPLE": "8",
        })
        for name in ("full", "gpcv_1", "vol_1", "data_1", "mc_1path"):
            assert name in out, name

    def test_bench_voltcov(self):
        out = _run(["tools/bench_voltcov.py", "--batch", "2", "--n", "64",
                    "--reps", "2"])
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["stage"] == "volt_cov_build" and rec["bit_identical"]

    def test_bench_fbm(self):
        out = _run(["tools/bench_fbm.py", "--ntrain", "64", "--assets",
                    "2", "--horizon", "8", "--nsample", "8", "--iters",
                    "2", "--repeats", "1"])
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["kernel"] == "fbm" and rec["finite"]

    def test_bench_multitask(self):
        out = _run(["tools/bench_multitask.py", "--tasks", "3", "--n",
                    "64", "--iters", "2", "--nsample", "4", "--horizon",
                    "8", "--repeats", "1"])
        stages = {json.loads(l)["stage"]
                  for l in out.strip().splitlines() if l.startswith("{")}
        assert stages == {"mt_vol_fit", "mt_gpcv_fit", "mt_vol_forecast"}

    def test_bench_compile(self):
        out = _run(["tools/bench_compile.py", "--unrolls", "1", "--assets",
                    "2", "--ntrain", "64", "--horizon", "8", "--iters",
                    "2", "--nsample", "8", "--reps", "1"])
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["backend"] == "cpu" and rec["unroll"] == "1"
        assert rec["first_s"] > 0 and rec["steady_ms"] > 0

    def test_bench_refit(self):
        out = _run(["tools/bench_refit.py", "--assets", "2", "--ntrain",
                    "64", "--horizon", "8", "--iters", "30",
                    "--warm-iters", "3", "--nsample", "8", "--reps", "1"])
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["stage"] == "warm_refit" and rec["ok"]
        assert rec["warm_ms"] > 0 and rec["vol_rel_err_mean"] < 1.0

    def test_robustness_sweep(self):
        out = _run(["tools/robustness_sweep.py", "--seeds", "1",
                    "--assets", "2", "--ntrain", "64", "--iters", "2",
                    "--nsample", "8"])
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["total"] == 2 and rec["ok_rate"] == 1.0

    def test_bench_refit_multitask(self):
        out = _run(["tools/bench_refit_multitask.py", "--tasks", "3",
                    "--ntrain", "96", "--iters", "5", "--warm-iters", "2",
                    "--nsample", "8", "--horizon", "6", "--reps", "1"])
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["stage"] == "warm_refit_multitask" and rec["ok"]
        assert rec["warm_ms"] > 0 and rec["cold_ms"] > 0

    def test_gpcv_convergence(self):
        out = _run(["tools/gpcv_convergence.py", "--ns", "64", "--lrs",
                    "0.01", "--chunks", "3,3", "--opt", "ngvi"])
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["opt"] == "ngvi"
        assert rec["runs"][0]["trace"][-1]["iters"] == 6

    def test_eval_integral_rule(self):
        out = _run(["tools/eval_integral_rule.py", "--assets", "3",
                    "--ntrain", "80", "--horizon", "5", "--iters", "5",
                    "--nsample", "40"])
        rec = json.loads(out.strip().splitlines()[-1])
        assert "verdict" in rec
        assert rec["verdict"]["crps_all_trapezoid"] > 0

    def test_tridiag_family_equiv_tool(self):
        # the x64 lane runs in test_multitask.py; this smokes the f32 path
        out = _run(["tools/tridiag_family_equiv.py"])
        rec = json.loads(out.strip().splitlines()[-1])
        assert not rec["x64"]
        assert rec["kl_rel_diff"] < 1e-4

    def test_sparse_quality(self):
        out = _run(["tools/sparse_quality.py", "--n", "96", "--ms", "24",
                    "--iters", "3", "--spot-n", "128"])
        rec = json.loads(out.strip().splitlines()[-1])
        assert np.isfinite(rec["dense"]["rel_err"])
        assert np.isfinite(rec["sparse"]["24"]["rel_err"])
        assert rec["spot"]["n"] == 128

    def test_jitter_argmin(self):
        # the KL-prior-jitter argmin study (PARITY.md round 5): smoke the
        # dual-lane torch training + downstream CRN forecast comparison
        out = _run(["tools/jitter_argmin.py", "--n", "30", "--iters", "5",
                    "--horizon", "6"], env_extra={"JAX_ENABLE_X64": "1"})
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["x64"] and rec["jitter"] == 1e-3
        assert np.isfinite(rec["vol_path_max_rel_diff"])
        assert np.isfinite(rec["forecast_quantile_max_rel_diff"])

    def test_wind_sweep(self):
        out = _run(["tools/wind_sweep.py", "--windows", "2", "--ntrain",
                    "64", "--horizon", "6", "--nsample", "16", "--iters",
                    "3", "--ks", "20", "--thetas", "0.05,none"])
        recs = [json.loads(l) for l in out.strip().splitlines()
                if l.startswith("{")]
        assert [(r["k"], r["theta"]) for r in recs] == [(20, 0.05),
                                                        (20, None)]
        assert all(np.isfinite(r["crps"]) for r in recs)
        assert "| 20 | 0.05 |" in out

    def test_eval_multitask(self):
        out = _run(["tools/eval_multitask.py", "--windows", "2", "--tasks",
                    "2", "--ntrain", "64", "--horizon", "6", "--nsample",
                    "16", "--iters", "3"])
        recs = [json.loads(l) for l in out.strip().splitlines()
                if l.startswith("{")]
        lanes = {r["lane"]: r for r in recs if "lane" in r}
        assert set(lanes) == {"independent", "multitask"}
        for r in lanes.values():
            assert np.isfinite(r["marginal"]["crps"])
            assert np.isfinite(r["gust_energy"]["ens_std_x1e4"])
        assert any("verdict" in r for r in recs)

    @pytest.mark.parametrize("script,argv,expect", [
        ("examples/example.py",
         ["--steps", "64", "--gpcv_iters", "3", "--vol_iters", "3",
          "--data_iters", "3"],
         "forecast fan"),
        ("examples/option_pricing.py",
         ["--ntrain", "64", "--horizon", "8", "--iters", "3",
          "--nsample", "32"],
         "realized-price percentile"),
        ("examples/live_serving.py",
         ["--assets", "2", "--steps", "64", "--ticks", "2", "--horizon",
          "6", "--iters", "3", "--warm-iters", "2", "--nsample", "16"],
         "warm call includes its compile"),
        ("examples/multi_asset.py",
         ["--assets", "2", "--steps", "64", "--iters", "3"],
         "cross-asset forecast correlation"),
        ("examples/long_series.py",
         ["--steps", "96", "--horizon", "6", "--iters", "3",
          "--nsample", "16"],
         "long-series quantile fan"),
    ], ids=["example", "option_pricing", "live_serving", "multi_asset",
            "long_series"])
    def test_example_scripts(self, script, argv, expect):
        """Every user-facing example runs end-to-end at toy shapes (the
        mtwind fan and calibration study have dedicated tests)."""
        out = _run([script, "--cpu", *argv])
        assert expect in out

    def test_calibration_study_example(self, tmp_path):
        out_png = tmp_path / "calib.png"
        out = _run(["examples/calibration_study.py", "--cpu", "--windows",
                    "2", "--ntrain", "64", "--horizon", "6", "--iters",
                    "3", "--nsample", "16", "--out", str(out_png)])
        assert out_png.exists() and out_png.stat().st_size > 10_000
        assert "halving prediction" in out

    def test_mtwind_fan_example(self, tmp_path):
        """The mtwind quantile-fan figure (the reference's
        ``mtwind_plotting`` analog) renders end-to-end at toy shapes."""
        out_png = tmp_path / "fan.png"
        out = _run(["examples/mtwind_fan.py", "--cpu", "--stations", "2",
                    "--ntrain", "64", "--horizon", "8", "--nsample", "16",
                    "--gpcv-iters", "3", "--vol-iters", "3", "--k", "20",
                    "--out", str(out_png)])
        assert out_png.exists() and out_png.stat().st_size > 10_000
        assert "empirical coverage" in out

    def test_eval_compare(self, tmp_path):
        out_md = tmp_path / "eval.md"
        out = _run(["tools/eval_compare.py", "--windows", "2", "--ntrain",
                    "64", "--horizon", "6", "--nsample", "16", "--iters",
                    "3", "--basic_iters", "3", "--lstm_epochs", "2",
                    "--k", "20", "--out", str(out_md)])
        recs = [json.loads(l) for l in out.strip().splitlines()
                if l.startswith("{")]
        assert {r["model"] for r in recs} == {
            "volt-ewma", "matern-ewma", "sm-ewma", "lstm"}
        assert all(np.isfinite(r["crps"]) for r in recs)
        assert "| volt-ewma |" in out_md.read_text()

    def test_eval_options(self):
        """The option-valuation harness: oracle-mc lane must sit at the
        MC noise floor (unbiased, small bps error) and a fitted lane must
        produce finite prices through the production pricer surface."""
        out = _run(["tools/eval_options.py", "--windows", "2", "--ntrain",
                    "64", "--horizon", "8", "--nsample", "512", "--iters",
                    "5", "--expiries", "3,7", "--k", "20",
                    "--lanes", "oracle-mc,volt-ewma"])
        recs = [json.loads(l) for l in out.strip().splitlines()
                if l.startswith("{")]
        lanes = {r["lane"]: r for r in recs}
        assert set(lanes) == {"oracle-mc", "volt-ewma"}
        for r in lanes.values():
            assert np.isfinite(r["mae_bps"]) and np.isfinite(r["bias_bps"])
            assert np.isfinite(r["fwd_bps"])
            assert np.isfinite(r["straddle_rel"])
        # true-law MC at S=512: |bias| well under the pooled MAE, both tiny
        assert abs(lanes["oracle-mc"]["bias_bps"]) < 20
        assert lanes["oracle-mc"]["mae_bps"] < 50
        # the ATM straddle is delta-neutral: the oracle lane's relative
        # error there is pure MC width noise, well under 1
        assert lanes["oracle-mc"]["straddle_rel"] < 0.2

    def test_eval_options_sabr_oracle(self):
        """The SABR leg's SDE-continuation oracle: the oracle-mc lane
        (true dynamics, true latent vol) must price near the big-MC
        grid; a fitted lane must stay finite."""
        out = _run(["tools/eval_options.py", "--universe", "SABR",
                    "--windows", "2", "--ntrain", "64", "--horizon", "8",
                    "--nsample", "512", "--oracle-paths", "4096",
                    "--iters", "5", "--expiries", "3,7", "--k", "20",
                    "--lanes", "oracle-mc,volt-ewma"])
        recs = [json.loads(l) for l in out.strip().splitlines()
                if l.startswith("{")]
        lanes = {r["lane"]: r for r in recs}
        assert {r["universe"] for r in recs} == {"SABR"}
        assert lanes["oracle-mc"]["mae_bps"] < 60
        assert np.isfinite(lanes["volt-ewma"]["mae_bps"])

    def test_bench_supervisor_cpu_fallback(self):
        # No JAX_PLATFORMS in the env: bench.py takes the supervisor
        # path; BENCH_FORCE_FALLBACK skips the (slow, tunnel-touching)
        # probe and must still deliver an honest, labeled CPU number.
        env = {**os.environ, "BENCH_FORCE_FALLBACK": "1",
               "BENCH_ASSETS": "2", "BENCH_NTRAIN": "64",
               "BENCH_ITERS": "3", "BENCH_NSAMPLE": "8",
               "BENCH_HORIZON": "8"}
        env.pop("JAX_PLATFORMS", None)
        proc = subprocess.run(
            [sys.executable, "bench.py"], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=540,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        assert rec["value"] > 0
        assert "CPU FALLBACK" in rec["unit"]

    def test_bench_json_line_extraction(self):
        import bench

        noisy = ('WARNING: platform axon\n{"not": "it"}\n'
                 '{"metric": "m", "value": 1.5, "unit": "u",'
                 ' "vs_baseline": 2.0}\ntrailing\n')
        line = bench._extract_json_line(noisy)
        assert json.loads(line)["value"] == 1.5
        assert bench._extract_json_line("no json here") is None

    def test_tpu_probe_timeout_is_dead(self, monkeypatch):
        from volt_tpu.utils import platform as vplat

        def raise_timeout(*a, **k):
            raise subprocess.TimeoutExpired(cmd="probe", timeout=0.1)

        monkeypatch.setattr(vplat.subprocess, "run", raise_timeout)
        assert vplat.tpu_probe(0.1) == "timeout"
        assert vplat.tpu_probe_alive(0.1) is False

        class R:
            returncode = 0

        monkeypatch.setattr(vplat.subprocess, "run", lambda *a, **k: R())
        assert vplat.tpu_probe(0.1) == "tpu"
        assert vplat.tpu_probe_alive(0.1) is True

        R.returncode = 1
        assert vplat.tpu_probe(0.1) == "cpu-only"

    def test_scan_unroll_env_override(self, monkeypatch):
        from volt_tpu.utils import platform as vplat

        # non-TPU backends always scan at unroll=1 (the suite runs on CPU)
        monkeypatch.setenv("VOLT_TPU_SCAN_UNROLL", "16")
        assert vplat.scan_unroll(32) == 1
        # on TPU: per-site default unless the env var overrides
        monkeypatch.setattr(vplat.jax, "default_backend", lambda: "tpu")
        assert vplat.scan_unroll(32) == 16
        monkeypatch.delenv("VOLT_TPU_SCAN_UNROLL")
        assert vplat.scan_unroll(32) == 32
        monkeypatch.setenv("VOLT_TPU_SCAN_UNROLL", "0")   # clamped
        assert vplat.scan_unroll(32) == 1
        monkeypatch.setenv("VOLT_TPU_SCAN_UNROLL", "junk")
        assert vplat.scan_unroll(8) == 8

    def test_cpu_requested_parses_platform_lists(self, monkeypatch):
        from volt_tpu.utils import platform as vplat

        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        assert vplat.cpu_requested() is True
        # a TPU-first priority list is NOT an explicit CPU request (a
        # dead tunnel hangs the first entry; the cpu entry never engages)
        monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
        assert vplat.cpu_requested() is False
        monkeypatch.delenv("JAX_PLATFORMS")
        assert vplat.cpu_requested() is False

    def test_bench_scaling_writes_table(self, tmp_path):
        out_md = tmp_path / "scaling.md"
        _run(["tools/bench_scaling.py", "--sizes", "64", "--iters", "2",
              "--nsample", "8", "--reps", "1", "--out", str(out_md)])
        text = out_md.read_text()
        assert "| 64 |" in text and "full GPCV" in text
        # the repo-root table must be untouched by --out runs
        assert "sequence-length scaling" in open(
            os.path.join(REPO, "BENCH_SCALING.md")).read()

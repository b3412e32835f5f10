"""Benchmark: fit + 1000-path rollout throughput, assets/sec on one chip.

Workload per asset: ntrain prices (ntrain-1-point return grid), 300 GPCV
ELBO iters, 300 vol-GP MLL iters, 300 Volt MLL iters, then a 1000-path x
100-step autoregressive Monte-Carlo rollout with an EWMA mean.

The default shape IS the north-star shape (BASELINE.json): n~1000-point
series, 64 assets (~ one chip's share of 500 tickers over 8 chips); the
target rate is 500 tickers / 60 s / 8 chips ~= 1.042 assets/sec/chip and
``vs_baseline`` is measured assets/sec/chip divided by it.  Set
``BENCH_NTRAIN=400`` for the reference stock-backtest shape
(``ForecastGenerator.py:53-101`` / BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache (TPU path): repeated bench invocations
# skip the (tunnel-bound) compile entirely.  JAX_PLATFORMS=cpu is
# honored for off-chip smoke runs (tests/test_tools.py).
from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()


def main():
    from volt_tpu.data import sabr_paths
    from volt_tpu.parallel import PipelineConfig, fit_forecast_batch

    n_assets = int(os.environ.get("BENCH_ASSETS", "64"))
    ntrain = int(os.environ.get("BENCH_NTRAIN", "1000"))
    horizon = int(os.environ.get("BENCH_HORIZON", "100"))
    # The default delivery is the on-device quantile fan (+mean/std): the
    # host fetch is O(levels x H) instead of O(nsample x H).  The MC
    # workload is identical (the full 1000x100 rollout runs either way;
    # tests pin fan == host-side quantiles of the samples output) — this
    # changes WHERE the backtest consumers' statistics are computed, not
    # what is computed.  BENCH_OUTPUT=samples delivers raw paths like the
    # reference's torch.save tensors (round-2 figure: ~102 assets/sec,
    # 70% of it the 25.6 MB/batch fetch over the ~35 MB/s tunnel).
    output = os.environ.get("BENCH_OUTPUT", "quantiles")
    iters = int(os.environ.get("BENCH_ITERS", "300"))
    nsample = int(os.environ.get("BENCH_NSAMPLE", "1000"))
    cfg = PipelineConfig(
        gpcv_iters=iters, vol_iters=iters, data_iters=iters,
        mean_func="ewma", k=100, nsample=nsample, output=output,
    )

    dt = 1.0 / 252
    n = ntrain - 1
    f, _ = sabr_paths(steps=ntrain, seed=0, n_paths=n_assets)
    train_x = jnp.arange(n, dtype=jnp.float32) * dt
    test_x = jnp.arange(horizon, dtype=jnp.float32) * dt + train_x[-1] + dt
    train_ys = jnp.asarray(f)

    # BENCH_STREAMS > 1 splits the batch into independently-dispatched
    # chunks so chunk i+1 computes while chunk i's samples stream to the
    # host (dispatch is async; the fetch is the only sync point).  Clamp
    # to the asset count and spread any remainder so every asset is
    # measured regardless of divisibility.
    streams = min(max(int(os.environ.get("BENCH_STREAMS", "1")), 1),
                  n_assets)
    bounds = [round(i * n_assets / streams) for i in range(streams + 1)]
    ys_chunks = [train_ys[bounds[i]:bounds[i + 1]] for i in range(streams)]

    def run(key):
        keys = jax.random.split(key, streams)
        # On this image's TPU tunnel, block_until_ready does not actually
        # synchronize; a host fetch is the only reliable barrier, and its
        # transfer cost (nsample x horizon floats) is part of delivering
        # the forecast anyway.
        pending = [
            fit_forecast_batch(k, train_x, ys, test_x, cfg)[0]
            for k, ys in zip(keys, ys_chunks)
        ]
        import numpy as np

        return np.concatenate([jax.device_get(s) for s in pending], axis=0)

    # warmup / compile (fetch forces completion)
    t_warm = time.perf_counter()
    run(jax.random.key(0))
    warm_elapsed = time.perf_counter() - t_warm

    # The TPU tunnel on this image adds multi-second jitter sporadically;
    # take the best of a few repeats for a stable throughput figure —
    # but don't multiply the pain when the tunnel is badly degraded.
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    if warm_elapsed > 180.0:
        repeats = 1
    elapsed = float("inf")
    out = None
    for r in range(repeats):
        t0 = time.perf_counter()
        out = run(jax.random.key(r + 1))
        elapsed = min(elapsed, time.perf_counter() - t0)

    import numpy as np

    assert np.isfinite(out).all(), "non-finite forecasts"
    assets_per_sec = n_assets / elapsed
    north_star = 500.0 / 60.0 / 8.0  # assets/sec/chip
    delivery = "" if output == "samples" else f", {output} delivery"
    note = os.environ.get("BENCH_NOTE", "")
    record = {
        "metric": "volt_fit_plus_1000path_rollout_throughput",
        "value": round(assets_per_sec, 4),
        "unit": (f"assets/sec/chip (ntrain={ntrain}, 3x{iters} iters, "
                 f"{cfg.nsample}x{horizon} MC{delivery})"
                 + (f" [{note}]" if note else "")),
        "vs_baseline": round(assets_per_sec / north_star, 4),
    }

    # Tunnel-health indicator (round-4 verdict item 6): a fetch-bound
    # measurement (samples mode) reads tunnel bandwidth more than code;
    # record the measured device->host rate so cross-round comparisons of
    # value_samples can be normalized for tunnel state.
    if jax.default_backend() != "cpu":
        # one warm fetch, then time a FRESH buffer: device_get of the same
        # Array twice hits jax's host-side _npy_value cache and measures
        # nothing (observed ~1e5 "MB/s")
        junk = jnp.arange(2 * 1024 * 1024, dtype=jnp.float32)  # 8 MiB
        jax.device_get(junk + 0.0)  # warm (compile + tunnel wake)
        fresh = junk + 1.0
        t0 = time.perf_counter()
        jax.device_get(fresh)
        record["tunnel_MBps"] = round(8.0 / (time.perf_counter() - t0), 1)

    # Print the primary record NOW: a tunnel hiccup, non-finite assert, or
    # parent-deadline kill during the companion run below must not lose a
    # completed TPU measurement (the supervisor takes the LAST parseable
    # line, so the enriched record supersedes this one when it lands).
    print(json.dumps(record), flush=True)

    # Companion raw-path-delivery measurement so the driver's bench series
    # stays apples-to-apples across rounds (r02 recorded samples mode,
    # r03+ records quantiles mode): same fits + MC workload, but the full
    # (B, nsample, H) tensor crosses the tunnel like the reference's
    # torch.save outputs.  One warm + one timed run; skipped in CPU
    # fallback (BENCH_NOTE set) where the extra run just burns deadline.
    if (output == "quantiles" and not note
            and os.environ.get("BENCH_BOTH", "1") != "0"):
        import dataclasses
        import sys

        cfg_s = dataclasses.replace(cfg, output="samples")

        def run_samples(key):
            keys = jax.random.split(key, streams)
            pending = [
                fit_forecast_batch(k, train_x, ys, test_x, cfg_s)[0]
                for k, ys in zip(keys, ys_chunks)
            ]
            return np.concatenate([jax.device_get(s) for s in pending],
                                  axis=0)

        try:
            run_samples(jax.random.key(0))  # warm/compile
            t0 = time.perf_counter()
            out_s = run_samples(jax.random.key(1))
            elapsed_s = time.perf_counter() - t0
            assert np.isfinite(out_s).all(), "non-finite forecasts (samples)"
        except Exception as e:  # keep the already-printed primary record
            print(f"companion samples-mode run failed: {e!r}",
                  file=sys.stderr)
            return
        record["value_samples"] = round(n_assets / elapsed_s, 4)
        record["unit_samples"] = (
            f"assets/sec/chip (same workload, raw-path delivery: "
            f"{cfg.nsample}x{horizon} samples fetched)"
        )
        print(json.dumps(record), flush=True)


def _extract_json_line(text: str):
    """Last stdout line that parses as the bench metric dict, or None."""
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and {"metric", "value"} <= d.keys():
            return line
    return None


def _run_child(extra_env, timeout_s):
    """Run this script as a BENCH_CHILD subprocess; return its JSON line
    (None on timeout/missing)."""
    import subprocess
    import sys

    env = dict(os.environ, _BENCH_SUPERVISED_CHILD="1", **extra_env)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            timeout=timeout_s, env=env, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired as e:
        print(f"bench child exceeded {timeout_s:.0f}s deadline; killed",
              file=sys.stderr)
        for s in (e.stdout, e.stderr):
            if s:
                print(s if isinstance(s, str) else s.decode(errors="replace"),
                      file=sys.stderr)
        return None
    if r.stderr:
        print(r.stderr, file=sys.stderr, end="")
    return _extract_json_line(r.stdout or "")


def supervise():
    """Dead-tunnel-proof wrapper around :func:`main`.

    The axon TPU tunnel on this image dies for hours at a stretch, and a
    dead tunnel HANGS jax device init (no error) — which would leave the
    driver's bench capture with no JSON line at all.  So the parent
    process (a) probes the TPU backend in a subprocess with a hard
    timeout, retrying briefly, (b) runs the actual workload as a
    deadline-bounded child, and (c) on a dead tunnel or a blown deadline
    re-runs the child on CPU at a reduced batch, labeling the result —
    an honest, much-slower number beats a hang.
    """
    import sys
    import time as _time

    from volt_tpu.utils.platform import cpu_requested, tpu_probe

    if (cpu_requested()
            or os.environ.get("_BENCH_SUPERVISED_CHILD") == "1"):
        return main()  # explicit all-cpu smoke run, or we ARE the child

    probe_timeout = float(os.environ.get("BENCH_TPU_PROBE_TIMEOUT", "120"))
    attempts = int(os.environ.get("BENCH_TPU_PROBE_ATTEMPTS", "3"))
    alive = False
    if os.environ.get("BENCH_FORCE_FALLBACK") != "1":
        for i in range(attempts):
            verdict = tpu_probe(probe_timeout)
            alive = verdict == "tpu"
            if alive or verdict == "cpu-only":
                # "cpu-only" is definitive (no TPU registered here at
                # all) — retrying cannot change it.
                break
            print(f"TPU probe {i + 1}/{attempts} failed ({verdict})",
                  file=sys.stderr)
            if i + 1 < attempts:
                _time.sleep(float(os.environ.get("BENCH_TPU_PROBE_SLEEP",
                                                 "60")))

    if alive:
        deadline = float(os.environ.get("BENCH_DEADLINE_S", "2700"))
        line = _run_child({}, deadline)
        if line is not None:
            print(line)
            return
        print("TPU bench produced no metric; falling back to CPU",
              file=sys.stderr)

    # CPU fallback: same per-asset workload, reduced batch (single-core
    # host), labeled so the record can't be mistaken for a chip number.
    fb_assets = min(int(os.environ.get("BENCH_ASSETS", "64")),
                    int(os.environ.get("BENCH_CPU_ASSETS", "8")))
    line = _run_child(
        {"JAX_PLATFORMS": "cpu", "BENCH_ASSETS": str(fb_assets),
         "BENCH_REPEATS": "1", "BENCH_STREAMS": "1",
         "BENCH_NOTE": "CPU FALLBACK - TPU tunnel unreachable"},
        float(os.environ.get("BENCH_CPU_DEADLINE_S", "5400")),
    )
    if line is None:
        print(json.dumps({
            "metric": "volt_fit_plus_1000path_rollout_throughput",
            "value": 0.0,
            "unit": "NO MEASUREMENT - TPU tunnel dead and CPU fallback "
                    "failed; see driver stderr",
            "vs_baseline": 0.0,
        }))
        sys.exit(3)
    print(line)


if __name__ == "__main__":
    supervise()

"""Warm-cache serving latency: first call vs second call on one process.

VERDICT r4 item 8: the walkthrough re-execution took ~61 s including compiles
vs ~2.6 s steady-state, and ``docs/operations.md`` describes the serving
pattern (persistent XLA compilation cache + long-lived process) without a
committed artifact measuring it.  This study runs the walkthrough / README
configuration (1-year daily ratcheted storage, 3-factor seasonal model,
reference ``samples/python/readme_example.py``) at a serving-scale path count
and records:

* ``first_call_s``  — cold-process latency: trace + compile (or persistent-
  cache load) + execute.  Run the script twice to see both flavours: the
  first invocation populates ``--cache-dir``, the second invocation's
  ``first_call_s`` is the restart-with-warm-disk-cache number that a serving
  deployment actually pays.
* ``warm_call_s``   — steady-state latency: the SAME process re-pricing with
  a different seed (so nothing short-circuits) — the per-request cost of a
  long-lived valuation service.

Run (TPU chip):  timeout 1800 python benchmarks/serving_latency.py [num_sims]
Writes ``benchmarks/results/serving_latency_<stamp>.json``.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd

DEFAULT_CACHE = os.path.expanduser("~/.cache/storage_tpu/xla_cache")


def build_case():
    from storage_tpu import CmdtyStorage, RatchetInterp

    storage = CmdtyStorage(
        freq="D",
        storage_start="2021-04-01",
        storage_end="2022-04-01",
        injection_cost=0.01,
        withdrawal_cost=0.025,
        ratchets=[
            ("2021-04-01",
             [(0.0, -150.0, 250.0), (2000.0, -200.0, 175.0),
              (5000.0, -260.0, 155.0), (7000.0, -275.0, 132.0)]),
            ("2022-10-01",
             [(0.0, -130.0, 260.0), (2000.0, -190.0, 190.0),
              (5000.0, -230.0, 165.0), (7000.0, -245.0, 148.0)]),
        ],
        ratchet_interp=RatchetInterp.LINEAR,
    )
    monthly_index = pd.period_range(start="2021-04-25", periods=25, freq="M")
    monthly_fwd = [
        16.61, 15.68, 15.42, 15.31, 15.27, 15.13, 15.96, 17.22, 17.32, 17.66,
        17.59, 16.81, 15.36, 14.49, 14.28, 14.25, 14.32, 14.33, 15.30, 16.58,
        16.64, 16.79, 16.64, 15.90, 14.63,
    ]
    fwd_curve = pd.Series(monthly_fwd, index=monthly_index).resample("D").ffill()
    rates = pd.Series(
        [0.005, 0.006, 0.0072, 0.0087, 0.0101, 0.0115, 0.0126],
        index=pd.PeriodIndex(
            freq="D",
            data=["2021-04-25", "2021-06-01", "2021-08-01", "2021-12-01",
                  "2022-04-01", "2022-12-01", "2023-12-01"],
        ),
    )
    ir_curve = rates.resample("D").asfreq().interpolate(method="linear")

    def settlement_rule(delivery_date):
        return delivery_date.asfreq("M").asfreq("D", "end") + 20

    return storage, fwd_curve, ir_curve, settlement_rule


def price_once(storage, fwd_curve, ir_curve, settlement_rule, num_sims, seed):
    from storage_tpu import three_factor_seasonal_value

    res = three_factor_seasonal_value(
        cmdty_storage=storage,
        val_date="2021-04-25",
        inventory=1500.0,
        fwd_curve=fwd_curve,
        interest_rates=ir_curve,
        settlement_rule=settlement_rule,
        num_sims=num_sims,
        seed=seed,
        spot_mean_reversion=91.0,
        spot_vol=0.85,
        long_term_vol=0.30,
        seasonal_vol=0.19,
        basis_funcs=(
            "1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 "
            "+ s * x_st"
        ),
        discount_deltas=True,
        # A pricing service returns NPV + deltas + triggers; the per-sim
        # panels are [n+1, 6, S] x 2 path sets (~4.4 GB at 250k paths) and
        # fetching them device->host is a data-export concern, not serving
        # latency.  bench.py excludes them for the same reason.  The first
        # clean on-chip run WITH the default (2026-08-19) measured 577 s/call
        # of pure panel fetch over the axon host link — all transfer, no
        # compute — which is the artifact's cautionary tale: keep panels on
        # device unless the caller actually wants them.
        return_sim_panels=False,
    )
    return float(res.npv)


def main() -> None:
    import logging

    # INFO so each call's Stopwatches phase report (storage_tpu.valuation)
    # lands in the captured stderr — a slow "warm" call must be attributable.
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    num_sims = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    cache_dir = os.environ.get("STORAGE_TPU_XLA_CACHE", DEFAULT_CACHE)
    os.makedirs(cache_dir, exist_ok=True)
    cache_was_populated = bool(os.listdir(cache_dir))

    import jax

    # The documented serving pattern (docs/operations.md "Serving"): persist
    # compiled executables across process restarts.
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    backend = jax.default_backend()

    storage, fwd_curve, ir_curve, settlement_rule = build_case()

    t0 = time.perf_counter()
    npv1 = price_once(storage, fwd_curve, ir_curve, settlement_rule,
                      num_sims, seed=12)
    first_call = time.perf_counter() - t0
    print(f"# first call (cold process, disk cache "
          f"{'WARM' if cache_was_populated else 'COLD'}): {first_call:.2f}s "
          f"npv={npv1:,.0f}", file=sys.stderr, flush=True)

    warm_calls = []
    for i, seed in enumerate((13, 14, 15)):
        t0 = time.perf_counter()
        npv = price_once(storage, fwd_curve, ir_curve, settlement_rule,
                         num_sims, seed=seed)
        warm_calls.append(time.perf_counter() - t0)
        print(f"# warm call #{i + 1} (seed {seed}): {warm_calls[-1]:.2f}s "
              f"npv={npv:,.0f}", file=sys.stderr, flush=True)

    line = {
        "metric": (
            f"serving latency, walkthrough config (1y daily ratcheted, "
            f"3-factor seasonal, full deltas+triggers), {num_sims:,} paths, "
            f"backend={backend}"
        ),
        "num_sims": num_sims,
        "first_call_s": round(first_call, 3),
        "disk_cache_warm_at_start": cache_was_populated,
        "warm_calls_s": [round(w, 3) for w in warm_calls],
        "warm_call_best_s": round(min(warm_calls), 3),
        "backend": backend,
        "cache_dir": cache_dir,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S+00:00", time.gmtime()),
    }
    print(json.dumps(line))
    outdir = os.path.join(os.path.dirname(__file__), "results")
    os.makedirs(outdir, exist_ok=True)
    stamp = time.strftime("%Y%m%dT%H%M%S")
    with open(os.path.join(outdir, f"serving_latency_{stamp}.json"), "w") as f:
        json.dump(line, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()

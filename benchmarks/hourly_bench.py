"""Pod-scale hourly benchmark (BASELINE.json configs[4]).

Multi-year HOURLY storage (17,520 decision steps) x 250k ANTITHETIC paths —
the one-chip pro-rata share of the pod-scale config's 1M paths / v5e-8 (2x
past it, in fact: 1M / 8 chips = 125k per chip) — 3-factor seasonal, ratchets,
full deltas + triggers, STREAMING (checkpoint-rematerialised) factor paths
(the full [n, F, S] factor array would be ~52 GB; peak streamed span is
~0.77 GB).  VERDICT r3 item 8: the round-3 measurements (37.2 s warm,
ROUND3_NOTES.md) promoted from notes to a reproducible JSON-emitting artifact.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} like
bench.py; vs_baseline scales the 10 s x 8-chip north-star budget by chip
fraction, path fraction AND horizon (the north star is 365 daily steps; this
config runs 48x the steps, so the pro-rata budget is 10 s * 8 * 0.25 * 48).

Run:  timeout 5400 python benchmarks/hourly_bench.py [num_sims] [years]
Writes BENCH_hourly_<stamp>.json next to the repo root as a durable record.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd


def build_case(years: int):
    from storage_tpu import CmdtyStorage, RatchetInterp

    end = f"{2021 + years}-01-01"
    storage = CmdtyStorage(
        freq="h",
        storage_start="2021-01-01",
        storage_end=end,
        injection_cost=0.01,
        withdrawal_cost=0.025,
        ratchets=[
            (
                "2021-01-01",
                [
                    (0.0, -150.0 / 24, 250.0 / 24),
                    (2000.0, -200.0 / 24, 175.0 / 24),
                    (5000.0, -260.0 / 24, 155.0 / 24),
                    (7000.0, -275.0 / 24, 132.0 / 24),
                ],
            ),
        ],
        ratchet_interp=RatchetInterp.LINEAR,
    )
    idx = pd.period_range("2021-01-01", end, freq="h")
    i = np.arange(len(idx))
    fwd = pd.Series(
        16.0
        + 2.0 * np.sin(2 * np.pi * i / 8760.0)  # seasonal shape
        + 0.8 * np.sin(2 * np.pi * i / 24.0),  # intraday shape
        index=idx,
    )
    return storage, fwd, idx


def main() -> None:
    num_sims = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    years = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from bench import wait_for_backend

    if not wait_for_backend():
        print(json.dumps({"metric": "hourly bench failed (backend init)",
                          "value": 0, "unit": "s", "vs_baseline": 0.0}))
        return

    # Force streaming at a span budget that keeps the peak span well under
    # co-tenant-squeezed HBM (the engine would stream anyway at these sizes).
    os.environ.setdefault("STORAGE_TPU_MAX_PATH_BYTES", "1.5e9")

    import jax

    from storage_tpu import three_factor_seasonal_value

    num_chips = jax.device_count()
    storage, fwd, idx = build_case(years)
    n_steps = len(idx) - 1

    def once(seed):
        return three_factor_seasonal_value(
            cmdty_storage=storage,
            val_date="2021-01-01",
            inventory=1500.0,
            fwd_curve=fwd,
            interest_rates=0.01,
            settlement_rule=None,
            num_sims=num_sims,
            seed=seed,
            antithetic=True,
            spot_mean_reversion=91.0,
            spot_vol=0.85,
            long_term_vol=0.30,
            seasonal_vol=0.19,
            basis_funcs="1 + x_st + x_sw + x_lt + s + x_st**2 + s**2",
            discount_deltas=True,
            return_sim_panels=False,
        )

    t0 = time.perf_counter()
    warm = once(seed=12)
    print(f"# warm (incl. compiles): {time.perf_counter() - t0:.1f}s "
          f"npv={warm.npv:,.0f}", file=sys.stderr)

    t0 = time.perf_counter()
    res = once(seed=13)
    wall = time.perf_counter() - t0
    assert np.isfinite(res.npv) and np.isfinite(res.deltas).all()

    budget_s = 10.0 * (8 / max(num_chips, 1)) * (num_sims / 1_000_000) * (n_steps / 365.0)
    backend = jax.default_backend()
    # Label honestly: a CPU smoke run must not read as a TPU measurement
    # (an early artifact said "1 TPU chip(s)" for a CPU-backend run).
    device_desc = (
        f"{num_chips} TPU chip(s)" if backend == "tpu"
        else f"{num_chips} {backend} device(s) [NOT TPU — smoke run]"
    )
    line = {
        "metric": (
            f"pod-scale hourly LSMC (BASELINE configs[4]): {years}-yr hourly "
            f"({n_steps:,} steps) x {num_sims:,} antithetic paths, streamed factor "
            f"source, full deltas+triggers, {device_desc}; pro-rata "
            f"budget {budget_s:.0f}s"
        ),
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(budget_s / wall, 3),
        "npv": round(float(res.npv), 1),
        "steps_per_ms": round(n_steps / wall / 1000.0, 3),
        "backend": backend,
    }
    print(json.dumps(line))
    stamp = time.strftime("%Y%m%dT%H%M%S")
    with open(os.path.join(os.path.dirname(__file__), "..",
                           f"BENCH_hourly_{stamp}.json"), "w") as f:
        json.dump(line, f)
        f.write("\n")


if __name__ == "__main__":
    main()

"""VERDICT r2 #3: the hourly/pod-scale BASELINE config on one chip.

1 year of HOURLY granularity (8,760 decision steps) x 250k+ paths, 3-factor
seasonal, full deltas + triggers.  The full [n, F, S] factor array would be
26 GB at 250k paths — far past HBM — so this exercises the streaming
(checkpoint-rematerialised) path source end-to-end on the real chip
(see models/simulation.py StreamingFactorSource).

Run:  timeout 3600 python benchmarks/probes/hourly_probe.py [num_sims]
Records: ROUND3_NOTES.md "Hourly scale".
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import pandas as pd


def main() -> None:
    num_sims = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000

    import jax

    from storage_tpu import CmdtyStorage, RatchetInterp, three_factor_seasonal_value
    from storage_tpu.utils.profiling import Stopwatches

    print(f"backend={jax.default_backend()} sims={num_sims}", flush=True)

    storage = CmdtyStorage(
        freq="h",
        storage_start="2021-01-01",
        storage_end="2022-01-01",
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
    idx = pd.period_range("2021-01-01", "2022-01-01", freq="h")
    i = np.arange(len(idx))
    fwd = pd.Series(
        16.0
        + 2.0 * np.sin(2 * np.pi * i / 8760.0)  # seasonal shape
        + 0.8 * np.sin(2 * np.pi * i / 24.0),  # intraday shape
        index=idx,
    )

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
    compile_wall = time.perf_counter() - t0
    print(f"warm (incl. compiles): {compile_wall:.1f}s npv={warm.npv:,.0f}", flush=True)

    t0 = time.perf_counter()
    res = once(seed=13)
    wall = time.perf_counter() - t0
    print(
        f"hourly 8760 x {num_sims:,}: wall={wall:.2f}s "
        f"paths/s={num_sims / wall:,.0f} npv={res.npv:,.0f} "
        f"intrinsic={res.intrinsic_npv:,.0f} "
        f"deltas[n={len(res.deltas)}] finite={np.isfinite(res.deltas).all()}",
        flush=True,
    )
    assert np.isfinite(res.npv)
    assert np.isfinite(res.deltas).all()
    assert len(res.deltas) == len(idx)


if __name__ == "__main__":
    main()

"""TPU: 1M-path phase breakdown via Stopwatches for round-2 targeting."""
import logging
import numpy as np
import pandas as pd

logging.basicConfig(level=logging.INFO)

from storage_tpu import CmdtyStorage, three_factor_seasonal_value

idx = pd.period_range("2021-04-01", "2022-04-01", freq="D")
storage = CmdtyStorage(
    "D", "2021-04-01", "2022-04-01",
    injection_cost=0.01, withdrawal_cost=0.025,
    min_inventory=0.0, max_inventory=1500.0,
    max_injection_rate=25.5, max_withdrawal_rate=30.9,
)
fwd = pd.Series(25.0 + 8.0 * np.sin(2 * np.pi * (np.arange(len(idx)) - 300) / 365.0), index=idx)

for trial in range(2):
    r = three_factor_seasonal_value(
        storage, "2021-04-01", 300.0, fwd, None, None,
        spot_mean_reversion=16.2, spot_vol=1.15,
        long_term_vol=0.21, seasonal_vol=0.39,
        num_sims=1_000_000,
        basis_funcs="1 + x_st + x_st**2 + x_lt + x_lt**2 + x_sw + x_sw**2 + s + s**2",
        discount_deltas=False, seed=11, fwd_sim_seed=12,
        return_sim_panels=False,
    )
    print(f"trial {trial}: npv={r.npv:,.0f}", flush=True)

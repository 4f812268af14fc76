"""Chunked (progress-callback) driver vs single-program Pallas forward on TPU."""
import time
import numpy as np
import pandas as pd

from storage_tpu import CmdtyStorage, three_factor_seasonal_value

idx = pd.period_range("2021-04-01", "2022-04-01", freq="D")
storage = CmdtyStorage(
    "D", "2021-04-01", "2022-04-01",
    injection_cost=0.01, withdrawal_cost=0.025,
    min_inventory=0.0, max_inventory=1500.0,
    max_injection_rate=25.5, max_withdrawal_rate=30.9,
)
fwd = pd.Series(25.0 + 8.0 * np.sin(2 * np.pi * (np.arange(len(idx)) - 300) / 365.0), index=idx)
rates = pd.Series(0.03, index=pd.period_range("2021-04-01", "2023-01-01", freq="D"))

kw = dict(
    cmdty_storage=storage, val_date="2021-04-01", inventory=300.0,
    fwd_curve=fwd, interest_rates=rates, settlement_rule=None,
    spot_mean_reversion=16.2, spot_vol=1.15,
    long_term_vol=0.21, seasonal_vol=0.39,
    num_sims=200_000, basis_funcs="1 + x_st + x_st**2 + x_lt + x_lt**2 + x_sw + x_sw**2 + s + s**2",
    discount_deltas=False, seed=11, fwd_sim_seed=12,
)

t0 = time.time()
single = three_factor_seasonal_value(**kw)
t_single = time.time() - t0

progress = []
t0 = time.time()
chunked = three_factor_seasonal_value(**kw, on_progress_update=progress.append)
t_chunked = time.time() - t0

print(f"single : npv={single.npv:,.1f} wall={t_single:.2f}s")
print(f"chunked: npv={chunked.npv:,.1f} wall={t_chunked:.2f}s progress_calls={len(progress)} final={progress[-1]}")
print(f"npv rel diff: {abs(single.npv - chunked.npv) / abs(single.npv):.2e}")
np.testing.assert_allclose(chunked.npv, single.npv, rtol=1e-5)
# The chunked backward pass is separate jit programs per span, so f32
# accumulation order differs slightly from the single program; a few paths
# flip decisions at exercise boundaries -> deltas agree to ~1e-3, not bitwise.
np.testing.assert_allclose(
    chunked.deltas.to_numpy(), single.deltas.to_numpy(), rtol=5e-3, atol=0.05)
np.testing.assert_allclose(
    chunked.trigger_prices.to_numpy().astype(float),
    single.trigger_prices.to_numpy().astype(float), rtol=5e-3, atol=0.05)
assert progress == sorted(progress) and progress[-1] == 1.0
print("PARITY OK")

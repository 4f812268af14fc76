"""End-to-end TPU check of the pallas-forward fast path inside the API."""
import sys, time

sys.path.insert(0, "/root/repo")
import jax

print("backend:", jax.default_backend(), flush=True)
from bench import build_case
from storage_tpu import three_factor_seasonal_value

storage, fwd_curve, ir_curve, settle = build_case()


def run(sims, seed):
    return three_factor_seasonal_value(
        cmdty_storage=storage, val_date="2021-04-25", inventory=1500.0,
        fwd_curve=fwd_curve, interest_rates=ir_curve, settlement_rule=settle,
        num_sims=sims, seed=seed, spot_mean_reversion=91.0, spot_vol=0.85,
        long_term_vol=0.30, seasonal_vol=0.19,
        basis_funcs="1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st",
        discount_deltas=True, return_sim_panels=False,
    )


res = run(20_000, 12)
print(f"20k seed12 npv={res.npv:,.1f} (expect ~78,345)", flush=True)
print("deltas head:", res.deltas.head(3).to_list(),
      "triggers:", res.trigger_prices.dropna().shape, flush=True)
t0 = time.time()
res = run(1_000_000, 13)
print(f"1M wall={time.time()-t0:.2f}s npv={res.npv:,.0f}", flush=True)

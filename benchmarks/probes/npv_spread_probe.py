import sys

sys.path.insert(0, "/root/repo")
from bench import build_case
from storage_tpu import three_factor_seasonal_value

storage, fwd_curve, ir_curve, settle = build_case()


def npv(sims, seed):
    res = three_factor_seasonal_value(
        cmdty_storage=storage, val_date="2021-04-25", inventory=1500.0,
        fwd_curve=fwd_curve, interest_rates=ir_curve, settlement_rule=settle,
        num_sims=sims, seed=seed, spot_mean_reversion=91.0, spot_vol=0.85,
        long_term_vol=0.30, seasonal_vol=0.19,
        basis_funcs="1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st",
        discount_deltas=True, return_sim_panels=False,
    )
    return res.npv


for seed in (1, 2, 3, 4, 5, 6):
    print(f"20k seed={seed}: {npv(20_000, seed):,.0f}", flush=True)
for seed in (99, 7):
    print(f"1M seed={seed}: {npv(1_000_000, seed):,.0f}", flush=True)

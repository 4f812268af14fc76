import sys, time

sys.path.insert(0, "/root/repo")
from bench import build_case
from storage_tpu import three_factor_seasonal_value

storage, fwd_curve, ir_curve, settle = build_case()
for sims, seed in ((20_000, 12), (100_000, 12), (1_000_000, 12)):
    t0 = time.time()
    res = three_factor_seasonal_value(
        cmdty_storage=storage, val_date="2021-04-25", inventory=1500.0,
        fwd_curve=fwd_curve, interest_rates=ir_curve, settlement_rule=settle,
        num_sims=sims, seed=seed, spot_mean_reversion=91.0, spot_vol=0.85,
        long_term_vol=0.30, seasonal_vol=0.19,
        basis_funcs="1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st",
        discount_deltas=True, return_sim_panels=False,
    )
    print(
        f"sims={sims} seed={seed} npv={res.npv:,.0f} "
        f"backward-vs-forward check; took {time.time()-t0:.1f}s",
        flush=True,
    )

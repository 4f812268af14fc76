import time, sys, logging

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)


sys.path.insert(0, "/root/repo")
import jax

log(f"devices={jax.devices()}")

class FlushHandler(logging.StreamHandler):
    def emit(self, record):
        super().emit(record)
        self.flush()

h = FlushHandler(sys.stdout)
h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(message)s"))
logging.getLogger("storage_tpu").addHandler(h)
logging.getLogger("storage_tpu").setLevel(logging.INFO)
logging.getLogger("storage_tpu.multi_factor").addHandler(h)
logging.getLogger("storage_tpu.multi_factor").setLevel(logging.INFO)

from bench import build_case

storage, fwd_curve, ir_curve, settle = build_case()
from storage_tpu import three_factor_seasonal_value

res = three_factor_seasonal_value(
    cmdty_storage=storage, val_date="2021-04-25", inventory=1500.0,
    fwd_curve=fwd_curve, interest_rates=ir_curve, settlement_rule=settle,
    num_sims=1000, seed=12, spot_mean_reversion=91.0, spot_vol=0.85,
    long_term_vol=0.30, seasonal_vol=0.19,
    basis_funcs="1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st",
    discount_deltas=True,
)
log(f"valuation done npv={res.npv:,.0f}")

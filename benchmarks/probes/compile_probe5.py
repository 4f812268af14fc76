import time, sys

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)


sys.path.insert(0, "/root/repo")
import jax

log(f"devices={jax.devices()}")
from bench import build_case

storage, fwd_curve, ir_curve, settle = build_case()
log("case built")

from storage_tpu.compile import build_valuation_context

ctx = build_valuation_context(storage, "2021-04-25", 1500.0, fwd_curve, ir_curve, settle, 100)
log("context built")

from storage_tpu import intrinsic_value

r = intrinsic_value(storage, "2021-04-25", 1500.0, fwd_curve, ir_curve, settle)
log(f"intrinsic done npv={r.npv:,.1f}")

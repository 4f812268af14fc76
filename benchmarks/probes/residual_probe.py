"""Where do the non-phase seconds of the headline run go?

phase_split_probe accounts for sim+backward+sim+forward (~2.32 s at 1M);
bench.py measures ~2.88 s end-to-end.  This probe times a warm full
three_factor_seasonal_value with per-log-line timestamps so the residual
(context build, intrinsic, health-check readbacks, result assembly) is
attributed line by line.

    timeout 1800 python benchmarks/probes/residual_probe.py [num_sims]
"""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
from _scenario import maybe_pin_cpu  # noqa: E402  (also inserts repo root)


class DeltaFormatter(logging.Formatter):
    t_prev = None

    def format(self, record):
        now = time.perf_counter()
        dt = 0.0 if DeltaFormatter.t_prev is None else now - DeltaFormatter.t_prev
        DeltaFormatter.t_prev = now
        return f"+{dt:7.3f}s  {record.getMessage()}"


def main() -> None:
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    maybe_pin_cpu()

    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(DeltaFormatter())
    log = logging.getLogger("storage_tpu")
    log.addHandler(handler)
    log.setLevel(logging.INFO)

    from bench import build_case, run

    # Warm pass compiles; the timed pass below is the bench posture.
    r = run(S)
    print(f"warm-pass wall {r['wall']:.3f}s", flush=True)

    from storage_tpu import three_factor_seasonal_value

    storage, fwd_curve, ir_curve, settle = build_case()
    DeltaFormatter.t_prev = time.perf_counter()
    log.info("=== timed pass start ===")
    t0 = time.perf_counter()
    res = three_factor_seasonal_value(
        cmdty_storage=storage, val_date="2021-04-25", inventory=1500.0,
        fwd_curve=fwd_curve, interest_rates=ir_curve, settlement_rule=settle,
        num_sims=S, seed=14, spot_mean_reversion=91.0, spot_vol=0.85,
        long_term_vol=0.30, seasonal_vol=0.19,
        basis_funcs="1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 "
                    "+ s**2 + s * x_st",
        discount_deltas=True, return_sim_panels=False,
    )
    log.info("=== returned ===")
    print(f"total {time.perf_counter() - t0:.3f}s npv={res.npv:,.2f}", flush=True)


if __name__ == "__main__":
    main()

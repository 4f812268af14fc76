"""f32-vs-f64 accuracy study on identical paths (VERDICT round-1 weak #4).

The engines default to float32 with conditioning safeguards (target centring,
column standardisation, high-precision dots); the reference is float64
throughout.  This study quantifies what the f32 default costs: factor paths
are drawn ONCE in float64 and fed to both precisions (the f32 leg sees the
same paths rounded to f32), so every reported difference is
rounding/conditioning, not Monte-Carlo noise.

Two legs, two processes:

* ``ref``  — CPU backend, ``jax_enable_x64``: float64 engine (XLA path —
  float64 on TPU is emulated and impractically slow, and f64 is f64 on any
  backend).  Simulates the paths, runs the engine, saves paths + results.
* ``tpu``  — TPU backend: float32 engine on its production path (fused
  Pallas kernels), same paths, prints the comparison table.

Run:  python benchmarks/precision_study.py ref [num_sims]
      python benchmarks/precision_study.py tpu
Results are recorded in docs/valuation_math.md ("Numerical precision").
"""
import os
import sys

MODE = sys.argv[1] if len(sys.argv) > 1 else "ref"
NUM_SIMS = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
WORKDIR = os.environ.get("PRECISION_STUDY_DIR", "/tmp/precision_study")

import jax

if MODE == "ref":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # The study isolates f32-vs-f64 ROUNDING: the f64 leg must use the same
    # 1/128-quantized interpolation weights as the TPU kernel, or the table
    # conflates precision with the quantization difference (which is bounded
    # separately by tests/test_lsmc.py::TestWeightQuantization).
    os.environ["STORAGE_TPU_QUANTIZE_WEIGHTS"] = "1"

import jax.numpy as jnp
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from storage_tpu import CmdtyStorage
from storage_tpu.compile import build_valuation_context
from storage_tpu.engines.lsmc import run_lsmc
from storage_tpu.models.multi_factor import (
    build_sim_coefficients,
    create_3_factor_season_params,
)
from storage_tpu.models.simulation import simulate_factor_paths
from storage_tpu.ops.regression import basis_spec
from storage_tpu.utils.basis import (
    THREE_FACTOR_SEASONAL_ALIASES,
    parse_basis_functions,
)


def bench_config(num_sims):
    """The headline bench case (bench.py): ratcheted, settlement lags, rates."""
    import bench

    storage, fwd_curve, ir_curve, settlement_rule = bench.build_case()
    return dict(
        name=f"bench: ratcheted 3f seasonal, {num_sims:,} x 342",
        storage=storage, val_date="2021-04-25", inventory=1500.0,
        fwd=fwd_curve, rates=ir_curve, settlement=settlement_rule,
        mr=91.0, spot_vol=0.85, lt_vol=0.30, sw_vol=0.19,
        basis="1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st",
        discount_deltas=True,
    )


def constant_rate_config(num_sims):
    idx = pd.period_range("2021-04-01", "2022-04-01", freq="D")
    storage = CmdtyStorage(
        "D", "2021-04-01", "2022-04-01",
        injection_cost=0.01, withdrawal_cost=0.025,
        min_inventory=0.0, max_inventory=1500.0,
        max_injection_rate=25.5, max_withdrawal_rate=30.9,
    )
    fwd = pd.Series(
        25.0 + 8.0 * np.sin(2 * np.pi * (np.arange(len(idx)) - 300) / 365.0), index=idx
    )
    return dict(
        name=f"constant-rate 3f seasonal, {num_sims:,} x 365",
        storage=storage, val_date="2021-03-15", inventory=300.0,
        fwd=fwd, rates=None, settlement=None,
        mr=17.0, spot_vol=1.1, lt_vol=0.2, sw_vol=0.4,
        basis="1 + x_st + x_st**2 + x_lt + x_lt**2 + x_sw + x_sw**2 + s + s**2",
        discount_deltas=False,
    )


def build(cfg):
    ctx = build_valuation_context(
        cfg["storage"], cfg["val_date"], cfg["inventory"], cfg["fwd"],
        cfg["rates"], cfg["settlement"],
    )
    factors, corrs = create_3_factor_season_params(
        "D", cfg["mr"], cfg["spot_vol"], cfg["lt_vol"], cfg["sw_vol"],
        ctx.val_period, ctx.periods[-1],
    )
    first_sim = 1 if ctx.val_date_is_first_step else 0
    coeffs = build_sim_coefficients(
        factors, corrs, ctx.val_period, cfg["fwd"], list(ctx.periods[first_sim:])
    )
    spec = basis_spec(
        parse_basis_functions(cfg["basis"], THREE_FACTOR_SEASONAL_ALIASES), 3
    )
    return ctx, coeffs, spec


def result_dict(arrays):
    return dict(
        npv=np.float64(arrays.npv),
        backward_npv=np.float64(arrays.backward_npv),
        deltas=np.asarray(arrays.deltas, np.float64),
        inventory=np.asarray(arrays.profile_means[:, 0], np.float64),
        inj_trigger=np.asarray(arrays.trigger_inject_prices, np.float64),
        has_inj=np.asarray(arrays.trigger_has_inject),
    )


def run_ref():
    os.makedirs(WORKDIR, exist_ok=True)
    assert jax.default_backend() == "cpu" and jnp.zeros(()).dtype != jnp.float32
    for i, cfg in enumerate(
        (constant_rate_config(NUM_SIMS), bench_config(NUM_SIMS))
    ):
        ctx, coeffs, spec = build(cfg)
        reg = simulate_factor_paths(coeffs, NUM_SIMS, seed=11, dtype=jnp.float64)
        val = simulate_factor_paths(coeffs, NUM_SIMS, seed=12, dtype=jnp.float64)
        arrays = run_lsmc(
            ctx, reg, val, np.float64(coeffs.vols), np.float64(coeffs.log_fwd_drift),
            spec, discount_deltas=cfg["discount_deltas"], dtype=jnp.float64,
            collect_panels=False,
        )
        out = result_dict(arrays)
        np.savez_compressed(
            os.path.join(WORKDIR, f"case{i}.npz"),
            name=cfg["name"], num_sims=NUM_SIMS,
            reg32=np.asarray(reg, np.float32), val32=np.asarray(val, np.float32),
            **{f"f64_{k}": v for k, v in out.items()},
        )
        print(f"ref[{i}] {cfg['name']}: npv={out['npv']:,.2f} saved", flush=True)


def run_tpu():
    assert jax.default_backend() != "cpu", "run the tpu leg on the TPU chip"
    print(
        "| config | NPV (f64) | NPV rel diff | bwd NPV rel | max delta diff "
        "(% of max delta) | mean delta diff | max E[inventory] diff "
        "(% of cap) | max inject-trigger rel |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for i, make_cfg in enumerate((constant_rate_config, bench_config)):
        path = os.path.join(WORKDIR, f"case{i}.npz")
        data = np.load(path, allow_pickle=False)
        num_sims = int(data["num_sims"])
        cfg = make_cfg(num_sims)
        ctx, coeffs, spec = build(cfg)
        arrays = run_lsmc(
            ctx, jnp.asarray(data["reg32"]), jnp.asarray(data["val32"]),
            np.float32(coeffs.vols), np.float32(coeffs.log_fwd_drift),
            spec, discount_deltas=cfg["discount_deltas"], dtype=jnp.float32,
            collect_panels=False,
        )
        f32 = result_dict(arrays)
        f64 = {k[4:]: data[k] for k in data.files if k.startswith("f64_")}

        cap = float(np.max(ctx.space_hi_np)) if hasattr(ctx, "space_hi_np") else (
            float(np.max(np.asarray(f64["inventory"]))) or 1.0
        )
        max_rate = float(np.abs(f64["deltas"]).max())
        d_delta = np.abs(f32["deltas"] - f64["deltas"])
        d_inv = np.abs(f32["inventory"] - f64["inventory"])
        mask = f32["has_inj"] & f64["has_inj"]
        d_trig = np.abs(f32["inj_trigger"][mask] - f64["inj_trigger"][mask])
        trig_scale = np.abs(f64["inj_trigger"][mask]).max() if mask.any() else 1.0
        print(
            f"| {cfg['name']} | {float(f64['npv']):,.2f} | "
            f"{abs(f32['npv'] - f64['npv']) / abs(f64['npv']):.2e} | "
            f"{abs(f32['backward_npv'] - f64['backward_npv']) / abs(f64['backward_npv']):.2e} | "
            f"{100.0 * d_delta.max() / max_rate:.3f}% | "
            f"{100.0 * d_delta.mean() / max_rate:.4f}% | "
            f"{100.0 * d_inv.max() / cap:.3f}% | "
            f"{(d_trig.max() / trig_scale if mask.any() else float('nan')):.2e} |",
            flush=True,
        )


if __name__ == "__main__":
    print(f"mode={MODE} backend={jax.default_backend()} sims={NUM_SIMS:,}",
          file=sys.stderr, flush=True)
    run_ref() if MODE == "ref" else run_tpu()

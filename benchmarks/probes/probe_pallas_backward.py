"""TPU: fused-backward kernel vs XLA backward — NPV parity + phase timing."""
import time
import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from storage_tpu import CmdtyStorage
from storage_tpu.compile import build_valuation_context
from storage_tpu.engines import lsmc as L
from storage_tpu.models.multi_factor import (
    build_sim_coefficients, create_3_factor_season_params,
)
from storage_tpu.models.simulation import simulate_factor_paths
from storage_tpu.ops.regression import basis_spec
from storage_tpu.utils.basis import parse_basis_functions, THREE_FACTOR_SEASONAL_ALIASES

S = 1_000_000
idx = pd.period_range("2021-04-01", "2022-04-01", freq="D")
storage = CmdtyStorage(
    "D", "2021-04-01", "2022-04-01",
    injection_cost=0.01, withdrawal_cost=0.025,
    min_inventory=0.0, max_inventory=1500.0,
    max_injection_rate=25.5, max_withdrawal_rate=30.9,
)
fwd = pd.Series(25.0 + 8.0 * np.sin(2 * np.pi * (np.arange(len(idx)) - 300) / 365.0), index=idx)
ctx = build_valuation_context(storage, "2021-03-15", 300.0, fwd, None, None)
factors3, corrs3 = create_3_factor_season_params(
    "D", 17.0, 1.1, 0.2, 0.4, ctx.val_period, idx[-1])
first_sim = 1 if ctx.val_date_is_first_step else 0
coeffs_sim = build_sim_coefficients(
    factors3, corrs3, ctx.val_period, fwd, list(ctx.periods[first_sim:]))
spec = basis_spec(
    parse_basis_functions("1 + x_st + x_st**2 + x_lt + x_lt**2 + x_sw + x_sw**2 + s + s**2",
                          THREE_FACTOR_SEASONAL_ALIASES), 3)
dev = L.device_inputs(ctx, jnp.float32)
sim_vols = jnp.asarray(coeffs_sim.vols, jnp.float32)
sim_drift = jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float32)
statics = dict(spec=spec, interp_kind=ctx.interp_kind,
               num_grid_points=ctx.num_grid_points, extra_decisions=0,
               val_first=ctx.val_date_is_first_step,
               terminal_fn=storage.terminal_npv_fn)

def run(block, tag):
    pallas = None if block is None else (block, False)
    reg = simulate_factor_paths(coeffs_sim, S, seed=11)  # fresh (donated)
    np.asarray(reg.ravel()[0])
    t0 = time.time()
    out = L._backward_program_jit(reg, sim_vols, sim_drift, dev,
                                  pallas=pallas, **statics)
    npv = float(np.asarray(out[0]))
    t_cold = time.time() - t0
    reg = simulate_factor_paths(coeffs_sim, S, seed=11)
    np.asarray(reg.ravel()[0])
    t0 = time.time()
    out = L._backward_program_jit(reg, sim_vols, sim_drift, dev,
                                  pallas=pallas, **statics)
    npv2 = float(np.asarray(out[0]))
    coeffs = np.asarray(out[2])
    t_warm = time.time() - t0
    print(f"{tag}: backward_npv={npv2:,.1f} cold={t_cold:.1f}s warm={t_warm:.2f}s", flush=True)
    return npv2, coeffs

from storage_tpu.ops.pallas_backward import pick_backward_block
npv_x, cf_x = run(None, "xla    ")
npv_p, cf_p = run(pick_backward_block(S, ctx.num_grid_points), "pallas ")
run(1024, "pall1k ")
run(512, "pall512")
rel = abs(npv_p - npv_x) / abs(npv_x)
print(f"backward_npv rel diff: {rel:.2e}")
scale = np.abs(cf_x).max()
print(f"coeff q99.5 rel diff: {np.quantile(np.abs(cf_p-cf_x)/scale, 0.995):.2e}")
assert rel < 5e-4
print("BACKWARD PARITY OK")

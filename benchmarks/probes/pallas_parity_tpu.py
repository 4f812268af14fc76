"""Small-scenario pallas-vs-XLA parity, compiled on the current backend."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
print("backend:", jax.default_backend(), flush=True)

from tests.test_pallas_forward import run_pallas_forward, run_xla_forward
import tests.test_pallas_forward as tpf
import jax.numpy as jnp
import pandas as pd
from storage_tpu import CmdtyStorage
from storage_tpu.compile import build_valuation_context
from storage_tpu.engines.lsmc import _backward_program_jit, device_inputs
from storage_tpu.models.multi_factor import build_sim_coefficients
from storage_tpu.models.simulation import simulate_factor_paths
from storage_tpu.ops.regression import basis_spec
from storage_tpu.utils.basis import parse_basis_functions

storage = CmdtyStorage(
    "D", "2021-02-01", "2021-02-21",
    injection_cost=0.3, withdrawal_cost=0.4,
    min_inventory=0.0, max_inventory=500.0,
    max_injection_rate=50.0, max_withdrawal_rate=60.0,
    cmdty_consumed_inject=0.01, inventory_loss=0.001, inventory_cost=0.02,
    terminal_storage_npv=lambda p, i: 0.9 * p * i,
)
idx = pd.period_range("2021-01-15", "2021-02-21", freq="D")
fwd = pd.Series(20.0 + 3.0 * np.sin(np.arange(len(idx)) / 3.0), index=idx)
rates = pd.Series(0.05, index=pd.period_range("2021-01-15", "2021-06-01", freq="D"))
ctx = build_valuation_context(storage, "2021-01-15", 200.0, fwd, rates, None, num_grid_points=24)
coeffs_sim = build_sim_coefficients([(4.0, pd.Series(0.6, index=idx))], np.eye(1),
                                    ctx.val_period, fwd, list(ctx.periods))
spec = basis_spec(parse_basis_functions("1 + x0 + x0**2"), 1)
dev = device_inputs(ctx, jnp.float32)
sim_vols = jnp.asarray(coeffs_sim.vols, jnp.float32)
sim_drift = jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float32)
reg = simulate_factor_paths(coeffs_sim, 256, seed=5)
val = simulate_factor_paths(coeffs_sim, 256, seed=6)
statics = dict(spec=spec, interp_kind=ctx.interp_kind, num_grid_points=ctx.num_grid_points,
               extra_decisions=0, val_first=False, terminal_fn=storage.terminal_npv_fn)
_, _, cf, mus, sds, vbars = _backward_program_jit(reg, sim_vols, sim_drift, dev, **statics)
scenario = (ctx, dev, spec, sim_vols, sim_drift, val, cf, mus, sds, vbars)

means, deltas, inv_xla, pv_xla = run_xla_forward(scenario)
print("xla pv mean:", pv_xla.mean(), flush=True)

# compiled pallas (interpret=False) via monkeypatching the helper
import storage_tpu.ops.pallas_forward as pf
from storage_tpu.ops.pallas_forward import pack_scalars, pallas_forward_sim
n = ctx.n_steps
m = val.shape[0] - 1
tables = jnp.concatenate([cf, vbars[:, None, :]], axis=1)
scalars = pack_scalars(dev.space_lo[1:n+1], dev.space_hi[1:n+1], dev.loss,
                       dev.inject_cost, dev.withdraw_cost, dev.cons_inject,
                       dev.cons_withdraw, dev.inv_cost_rate, dev.df_settle,
                       dev.df_start, sim_drift[:m], sim_vols[:m])
sums, xsums, inv_pl, pv_pl = pallas_forward_sim(
    val[:m], dev.inventory, tables, mus, sds, dev.pillars, scalars,
    spec=spec, interp_kind=ctx.interp_kind, num_grid=ctx.num_grid_points,
    block_sims=128, interpret=False,
)
inv_pl, pv_pl, sums = np.asarray(inv_pl), np.asarray(pv_pl), np.asarray(sums)
print("pallas pv mean:", pv_pl.mean(), flush=True)
print("max |pv diff|:", np.abs(pv_pl - pv_xla).max(), flush=True)
print("max |inv diff|:", np.abs(inv_pl - inv_xla).max(), flush=True)
S = 256
print("means diff:", np.abs(sums[:, :6]/S - means).max(axis=0), flush=True)

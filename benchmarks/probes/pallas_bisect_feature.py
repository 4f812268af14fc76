"""Bisect which config feature breaks the compiled pallas kernel on TPU."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

print("backend:", jax.default_backend(), flush=True)

from storage_tpu import CmdtyStorage, RatchetInterp
from storage_tpu.compile import build_valuation_context
from storage_tpu.engines.lsmc import _backward_program_jit, device_inputs, forward_scan
from storage_tpu.models.multi_factor import build_sim_coefficients
from storage_tpu.models.simulation import simulate_factor_paths
from storage_tpu.ops.pallas_forward import pack_scalars, pallas_forward_sim
from storage_tpu.ops.regression import basis_spec
from storage_tpu.utils.basis import parse_basis_functions

S = 256


def run_case(name, *, end="2021-02-21", grid=24, basis="1 + x0 + x0**2",
             factors_spec=None, ratchets=False):
    if ratchets:
        storage = CmdtyStorage(
            "D", "2021-02-01", end, injection_cost=0.3, withdrawal_cost=0.4,
            ratchets=[("2021-02-01", [(0.0, -60.0, 50.0), (150.0, -70.0, 45.0),
                                      (350.0, -80.0, 40.0), (500.0, -85.0, 35.0)])],
            ratchet_interp=RatchetInterp.LINEAR,
            terminal_storage_npv=lambda p, i: 0.9 * p * i,
        )
    else:
        storage = CmdtyStorage(
            "D", "2021-02-01", end, injection_cost=0.3, withdrawal_cost=0.4,
            min_inventory=0.0, max_inventory=500.0,
            max_injection_rate=50.0, max_withdrawal_rate=60.0,
            terminal_storage_npv=lambda p, i: 0.9 * p * i,
        )
    idx = pd.period_range("2021-01-15", end, freq="D")
    fwd = pd.Series(20.0 + 3.0 * np.sin(np.arange(len(idx)) / 3.0), index=idx)
    rates = pd.Series(0.05, index=pd.period_range("2021-01-15", "2022-06-01", freq="D"))
    ctx = build_valuation_context(storage, "2021-01-15", 200.0, fwd, rates, None,
                                  num_grid_points=grid)
    if factors_spec is None:
        factors_spec = [(4.0, pd.Series(0.6, index=idx))]
    num_factors = len(factors_spec)
    corrs = np.eye(num_factors)
    coeffs_sim = build_sim_coefficients(factors_spec, corrs, ctx.val_period, fwd,
                                        list(ctx.periods))
    spec = basis_spec(parse_basis_functions(basis), num_factors)
    dev = device_inputs(ctx, jnp.float32)
    sim_vols = jnp.asarray(coeffs_sim.vols, jnp.float32)
    sim_drift = jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float32)
    reg = simulate_factor_paths(coeffs_sim, S, seed=5)
    val = simulate_factor_paths(coeffs_sim, S, seed=6)
    statics = dict(spec=spec, interp_kind=ctx.interp_kind,
                   num_grid_points=ctx.num_grid_points, extra_decisions=0,
                   val_first=False, terminal_fn=storage.terminal_npv_fn)
    _, _, cf, mus, sds, vbars = _backward_program_jit(reg, sim_vols, sim_drift, dev, **statics)
    n = ctx.n_steps
    m = val.shape[0] - 1
    carry = (jnp.full((S,), dev.inventory, jnp.float32), jnp.zeros((S,), jnp.float32))
    dfd = jnp.ones_like(dev.df_settle)
    carry, _outputs = forward_scan(
        carry, val[:m], sim_vols[:m], sim_drift[:m], cf, mus, sds, vbars,
        dev.space_lo[1:n+1], dev.space_hi[1:n+1], dev.pillars, dev.loss,
        dev.inject_cost, dev.withdraw_cost, dev.cons_inject, dev.cons_withdraw,
        dev.inv_cost_rate, dev.df_settle, dev.df_start, dev.fwd[:n], dfd,
        spec=spec, interp_kind=ctx.interp_kind, num_grid_points=ctx.num_grid_points,
        extra_decisions=0, collect_panels=False,
    )
    pv_xla = float(np.asarray(carry[1]).mean())
    tables = jnp.concatenate([cf, vbars[:, None, :]], axis=1)
    scalars = pack_scalars(dev.space_lo[1:n+1], dev.space_hi[1:n+1], dev.loss,
                           dev.inject_cost, dev.withdraw_cost, dev.cons_inject,
                           dev.cons_withdraw, dev.inv_cost_rate, dev.df_settle,
                           dev.df_start, sim_drift[:m], sim_vols[:m])
    _, _, _, pv_pl = pallas_forward_sim(
        val[:m], dev.inventory, tables, mus, sds, dev.pillars, scalars,
        spec=spec, interp_kind=ctx.interp_kind, num_grid=ctx.num_grid_points,
        block_sims=128,
    )
    pv_pl = float(np.asarray(pv_pl).mean())
    flag = "OK " if abs(pv_pl - pv_xla) < 0.005 * max(abs(pv_xla), 1.0) else "DIFF"
    print(f"{flag} {name}: xla={pv_xla:,.1f} pallas={pv_pl:,.1f}", flush=True)


run_case("baseline-small")
run_case("grid=100", grid=100)
run_case("long-horizon", end="2022-01-01")
run_case("ratchets-P4", ratchets=True)
idx_f = pd.period_range("2021-01-15", "2021-02-21", freq="D")
run_case(
    "3-factors-B10",
    factors_spec=[(4.0, pd.Series(0.6, index=idx_f)),
                  (0.0, pd.Series(0.25, index=idx_f)),
                  (0.0, pd.Series(0.15, index=idx_f))],
    basis="1 + x0 + x1 + x2 + s + x0**2 + x1**2 + x2**2 + s**2 + s*x0",
)

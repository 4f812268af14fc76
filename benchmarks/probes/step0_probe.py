"""Probe the current-period (step-0) backward value pieces on this backend."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from benchmarks.backend_diff_probe_lib import build_probe_inputs
from storage_tpu.engines.lsmc import (
    _backward_program_jit,
    _current_period_step,
    backward_scan,
    device_inputs,
)
from storage_tpu.engines.common import step_economics
from storage_tpu.ops.interp import fractional_index

ctx, spec, reg, val = build_probe_inputs(num_sims=20_000)
dev = device_inputs(ctx, jnp.float32)
n = ctx.n_steps
reg_spots = jnp.asarray(reg[0])
reg_factors = jnp.asarray(reg[1])

out = _backward_program_jit(
    reg_spots, reg_factors, dev,
    spec=spec, interp_kind=ctx.interp_kind, num_grid_points=ctx.num_grid_points,
    extra_decisions=0, val_first=True, terminal_fn=None,
)
backward_npv, cont_mean0, coeffs, mus, sds, vbars = out
print(f"backward_npv={float(backward_npv):,.2f}", flush=True)
print("cont_mean0[:6] =", np.asarray(cont_mean0)[:6], flush=True)

# Recompute step 0 eagerly from a fresh backward_scan
m = reg_spots.shape[0] - 1
v, *_ = backward_scan(
    jnp.zeros((reg_spots.shape[1], ctx.num_grid_points), jnp.float32),
    reg_spots[:m], reg_factors[:m],
    dev.grids[1 : 1 + m],
    dev.space_lo[2 : 2 + m],
    dev.space_hi[2 : 2 + m],
    dev.pillars[1 : 1 + m],
    dev.loss[1 : 1 + m],
    dev.inject_cost[1 : 1 + m],
    dev.withdraw_cost[1 : 1 + m],
    dev.cons_inject[1 : 1 + m],
    dev.cons_withdraw[1 : 1 + m],
    dev.inv_cost_rate[1 : 1 + m],
    dev.df_settle[1 : 1 + m],
    dev.df_start[1 : 1 + m],
    spec=spec, interp_kind=ctx.interp_kind,
    num_grid_points=ctx.num_grid_points, extra_decisions=0,
)
print(f"v stats mean={float(jnp.mean(v)):,.2f}", flush=True)

econ = step_economics(
    jnp.reshape(dev.inventory, (1,)),
    dev.pillars[0], ctx.interp_kind, dev.loss[0],
    dev.space_lo[1], dev.space_hi[1],
    dev.inject_cost[0], dev.withdraw_cost[0],
    dev.cons_inject[0], dev.cons_withdraw[0],
    dev.inv_cost_rate[0], dev.df_settle[0], dev.df_start[0], 0,
)
print("decisions:", np.asarray(econ.decisions), flush=True)
print("inv_after:", np.asarray(econ.inventory_after), flush=True)
print("space1:", float(dev.space_lo[1]), float(dev.space_hi[1]), flush=True)
j, w = fractional_index(econ.inventory_after, dev.space_lo[1], dev.space_hi[1], ctx.num_grid_points)
print("j:", np.asarray(j), "w:", np.asarray(w), flush=True)
cont_mean = jnp.mean(v, axis=0)
fitted = jnp.take(cont_mean, j) * (1.0 - w) + jnp.take(cont_mean, j + 1) * w
immediate = econ.immediate_npv(dev.fwd[0])
print("cont fitted:", np.asarray(fitted), flush=True)
print("immediate:", np.asarray(immediate), flush=True)
v0, cm = _current_period_step(v, dev, ctx.interp_kind, ctx.num_grid_points, 0, jnp.float32)
print(f"recomputed v0 mean={float(jnp.mean(v0)):,.2f}", flush=True)

"""Pallas-vs-XLA parity on the full 3-factor README config at modest S."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from benchmarks.backend_diff_probe_lib import build_probe_inputs
from bench import build_case
from storage_tpu.engines.lsmc import _backward_program_jit, device_inputs, forward_scan
from storage_tpu.models.multi_factor import build_sim_coefficients, create_3_factor_season_params
from storage_tpu.ops.pallas_forward import pack_scalars, pallas_forward_sim

S = 2048
ctx, spec, reg, val = build_probe_inputs(num_sims=S)
dev = device_inputs(ctx, jnp.float32)
storage, fwd_curve, ir_curve, settle = build_case()
factors_spec, corrs = create_3_factor_season_params(
    "D", 91.0, 0.85, 0.30, 0.19, ctx.val_period, storage.end
)
coeffs_sim = build_sim_coefficients(
    factors_spec, corrs, ctx.val_period, fwd_curve, list(ctx.periods[1:])
)
sim_vols = jnp.asarray(coeffs_sim.vols, jnp.float32)
sim_drift = jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float32)
reg_f = jnp.asarray(reg[1])
val_f = jnp.asarray(val[1])
n = ctx.n_steps
statics = dict(
    spec=spec, interp_kind=ctx.interp_kind, num_grid_points=ctx.num_grid_points,
    extra_decisions=0, val_first=True, terminal_fn=None,
)
_, _, cf, mus, sds, vbars = _backward_program_jit(reg_f, sim_vols, sim_drift, dev, **statics)

m = val_f.shape[0] - 1
carry = (jnp.full((S,), dev.inventory, jnp.float32), jnp.zeros((S,), jnp.float32))
dfd = jnp.ones_like(dev.df_settle)
carry, outputs = forward_scan(
    carry, val_f[:m], sim_vols[:m], sim_drift[:m], cf, mus, sds, vbars,
    dev.space_lo[2 : n + 1], dev.space_hi[2 : n + 1], dev.pillars[1:n],
    dev.loss[1:n], dev.inject_cost[1:n], dev.withdraw_cost[1:n],
    dev.cons_inject[1:n], dev.cons_withdraw[1:n], dev.inv_cost_rate[1:n],
    dev.df_settle[1:n], dev.df_start[1:n], dev.fwd[1:n], dfd[1:n],
    spec=spec, interp_kind=ctx.interp_kind, num_grid_points=ctx.num_grid_points,
    extra_decisions=0, collect_panels=False,
)
means_xla = np.asarray(outputs[0])
pv_xla = np.asarray(carry[1])
inv_xla = np.asarray(carry[0])
print("xla pv mean:", pv_xla.mean(), flush=True)

tables = jnp.concatenate([cf, vbars[:, None, :]], axis=1)
scalars = pack_scalars(
    dev.space_lo[2 : n + 1], dev.space_hi[2 : n + 1], dev.loss[1:n],
    dev.inject_cost[1:n], dev.withdraw_cost[1:n], dev.cons_inject[1:n],
    dev.cons_withdraw[1:n], dev.inv_cost_rate[1:n], dev.df_settle[1:n],
    dev.df_start[1:n], sim_drift[:m], sim_vols[:m],
)
sums, xsums, inv_pl, pv_pl = pallas_forward_sim(
    val_f[:m], dev.inventory, tables, mus, sds, dev.pillars[1:n], scalars,
    spec=spec, interp_kind=ctx.interp_kind, num_grid=ctx.num_grid_points,
    block_sims=512, interpret=False,
)
pv_pl = np.asarray(pv_pl)
inv_pl = np.asarray(inv_pl)
sums = np.asarray(sums)
print("pallas pv mean:", pv_pl.mean(), flush=True)
print("max |pv diff|:", np.abs(pv_pl - pv_xla).max(),
      "frac sims differing:", (np.abs(pv_pl - pv_xla) > 1.0).mean(), flush=True)
print("per-step mean diffs (max):", np.abs(sums[:, :6] / S - means_xla).max(axis=0), flush=True)
# locate first diverging step
step_inv_diff = np.abs(sums[:, 0] / S - means_xla[:, 0])
print("first step with inv-mean diff > 1:", int(np.argmax(step_inv_diff > 1.0)),
      "of", m, flush=True)

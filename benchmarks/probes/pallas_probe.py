"""Compile + time the fused Pallas forward kernel on the TPU at scale."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from benchmarks.backend_diff_probe_lib import build_probe_inputs
from storage_tpu.engines.lsmc import _backward_program_jit, device_inputs, forward_scan
from storage_tpu.ops.pallas_forward import pack_scalars, pallas_forward_sim

S = 512 * 976  # ~500k, multiple of block size
ctx, spec, reg, val = build_probe_inputs(num_sims=S)
dev = device_inputs(ctx, jnp.float32)
import pandas as pd
from storage_tpu.models.multi_factor import build_sim_coefficients, create_3_factor_season_params
from bench import build_case

storage, fwd_curve, ir_curve, settle = build_case()
factors_spec, corrs = create_3_factor_season_params("D", 91.0, 0.85, 0.30, 0.19, ctx.val_period, storage.end)
coeffs_sim = build_sim_coefficients(factors_spec, corrs, ctx.val_period, fwd_curve, list(ctx.periods[1:]))
sim_vols = jnp.asarray(coeffs_sim.vols, jnp.float32)
sim_drift = jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float32)

reg_f = jnp.asarray(reg[1])
val_f = jnp.asarray(val[1])
n = ctx.n_steps
statics = dict(
    spec=spec, interp_kind=ctx.interp_kind, num_grid_points=ctx.num_grid_points,
    extra_decisions=0, val_first=True, terminal_fn=None,
)
t0 = time.time()
_, _, cf, mus, sds, vbars = _backward_program_jit(reg_f, sim_vols, sim_drift, dev, **statics)
np.asarray(cf[0, 0, 0])
print(f"backward: {time.time()-t0:.2f}s", flush=True)

m = val_f.shape[0] - 1
tables = jnp.concatenate([cf, vbars[:, None, :]], axis=1)
scalars = pack_scalars(
    dev.space_lo[2 : n + 1], dev.space_hi[2 : n + 1], dev.loss[1:n],
    dev.inject_cost[1:n], dev.withdraw_cost[1:n], dev.cons_inject[1:n],
    dev.cons_withdraw[1:n], dev.inv_cost_rate[1:n], dev.df_settle[1:n],
    dev.df_start[1:n], sim_drift[:m], sim_vols[:m],
)


def run_pallas(block):
    return pallas_forward_sim(
        val_f[:m], dev.inventory, tables, mus, sds, dev.pillars[1:n], scalars,
        spec=spec, interp_kind=ctx.interp_kind, num_grid=ctx.num_grid_points,
        block_sims=block,
    )


for block in (512, 1024):
    try:
        t0 = time.time()
        sums, xsums, inv_f, pv_f = run_pallas(block)
        np.asarray(pv_f[0])
        compile_s = time.time() - t0
        t0 = time.time()
        sums, xsums, inv_f, pv_f = run_pallas(block)
        np.asarray(pv_f[0]); np.asarray(sums[0, 0])
        run_s = time.time() - t0
        print(f"pallas block={block}: compile+run {compile_s:.2f}s, run {run_s:.3f}s, "
              f"npv_contrib={float(pv_f.mean()):,.1f}", flush=True)
    except Exception as exc:
        print(f"pallas block={block} FAILED: {type(exc).__name__}: {str(exc)[:300]}", flush=True)

# Reference XLA forward for the same inputs.
carry = (jnp.full((S,), dev.inventory, jnp.float32), jnp.zeros((S,), jnp.float32))
dfd = jnp.ones_like(dev.df_settle)
t0 = time.time()
carry, outputs = forward_scan(
    carry, val_f[:m], sim_vols[:m], sim_drift[:m], cf, mus, sds, vbars,
    dev.space_lo[2 : n + 1], dev.space_hi[2 : n + 1], dev.pillars[1:n],
    dev.loss[1:n], dev.inject_cost[1:n], dev.withdraw_cost[1:n],
    dev.cons_inject[1:n], dev.cons_withdraw[1:n], dev.inv_cost_rate[1:n],
    dev.df_settle[1:n], dev.df_start[1:n], dev.fwd[1:n], dfd[1:n],
    spec=spec, interp_kind=ctx.interp_kind, num_grid_points=ctx.num_grid_points,
    extra_decisions=0, collect_panels=False,
)
np.asarray(carry[1][0])
print(f"xla forward compile+run: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
carry2 = (jnp.full((S,), dev.inventory, jnp.float32), jnp.zeros((S,), jnp.float32))
carry2, outputs2 = forward_scan(
    carry2, val_f[:m], sim_vols[:m], sim_drift[:m], cf, mus, sds, vbars,
    dev.space_lo[2 : n + 1], dev.space_hi[2 : n + 1], dev.pillars[1:n],
    dev.loss[1:n], dev.inject_cost[1:n], dev.withdraw_cost[1:n],
    dev.cons_inject[1:n], dev.cons_withdraw[1:n], dev.inv_cost_rate[1:n],
    dev.df_settle[1:n], dev.df_start[1:n], dev.fwd[1:n], dfd[1:n],
    spec=spec, interp_kind=ctx.interp_kind, num_grid_points=ctx.num_grid_points,
    extra_decisions=0, collect_panels=False,
)
np.asarray(carry2[1][0])
print(f"xla forward run: {time.time()-t0:.3f}s, pv mean {float(carry2[1].mean()):,.1f}", flush=True)

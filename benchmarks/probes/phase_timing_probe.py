"""Time the LSMC phases separately at large path counts on the TPU."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from bench import build_case
from storage_tpu.compile import build_valuation_context
from storage_tpu.engines.lsmc import backward_scan, device_inputs, forward_scan
from storage_tpu.models.multi_factor import build_sim_coefficients, create_3_factor_season_params
from storage_tpu.models.simulation import simulate_factor_paths
from storage_tpu.ops.regression import basis_spec
from storage_tpu.utils.basis import THREE_FACTOR_SEASONAL_ALIASES, parse_basis_functions

S = 500_000
storage, fwd_curve, ir_curve, settle = build_case()
ctx = build_valuation_context(storage, "2021-04-25", 1500.0, fwd_curve, ir_curve, settle, 100)
factors_spec, corrs = create_3_factor_season_params("D", 91.0, 0.85, 0.30, 0.19, ctx.val_period, storage.end)
sim_periods = list(ctx.periods[1:])
coeffs_sim = build_sim_coefficients(factors_spec, corrs, ctx.val_period, fwd_curve, sim_periods)
spec = basis_spec(
    parse_basis_functions(
        "1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st",
        THREE_FACTOR_SEASONAL_ALIASES,
    ),
    num_factors=3,
)
dev = device_inputs(ctx, jnp.float32)
sim_vols = jnp.asarray(coeffs_sim.vols, jnp.float32)
sim_drift = jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float32)


def materialize(out):
    leaves = jax.tree.leaves(out)
    # Pull one scalar derived from every leaf: the axon backend's
    # block_until_ready does not actually synchronise.
    for leaf in leaves:
        if leaf.size:
            np.asarray(jnp.ravel(leaf)[0])


def timeit(label, fn, n=2):
    out = fn()
    materialize(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
        materialize(out)
    print(f"{label}: {(time.perf_counter()-t0)/n:.3f}s", flush=True)
    return out


factors = timeit("simulate 341x3x500k", lambda: simulate_factor_paths(coeffs_sim, S, 7))

G = 100
L = 85  # one overflow-safe chunk
v0 = jnp.zeros((S, G), jnp.float32)
a, b = 0, L
lo_k, hi_k = 1 + a, 1 + b
bw = lambda: backward_scan(
    v0, factors[a:b], sim_vols[a:b], sim_drift[a:b],
    dev.grids[lo_k:hi_k], dev.space_lo[lo_k + 1:hi_k + 1], dev.space_hi[lo_k + 1:hi_k + 1],
    dev.pillars[lo_k:hi_k], dev.loss[lo_k:hi_k], dev.inject_cost[lo_k:hi_k],
    dev.withdraw_cost[lo_k:hi_k], dev.cons_inject[lo_k:hi_k], dev.cons_withdraw[lo_k:hi_k],
    dev.inv_cost_rate[lo_k:hi_k], dev.df_settle[lo_k:hi_k], dev.df_start[lo_k:hi_k],
    spec=spec, interp_kind=ctx.interp_kind, num_grid_points=G, extra_decisions=0,
)
_, cfs, mus, sds, vbars = timeit(f"backward_scan {L} steps x {S}", bw)

dfd = dev.df_settle
carry = (jnp.full((S,), dev.inventory, jnp.float32), jnp.zeros((S,), jnp.float32))
fw = lambda: forward_scan(
    carry, factors[a:b], sim_vols[a:b], sim_drift[a:b], cfs, mus, sds, vbars,
    dev.space_lo[lo_k + 1:hi_k + 1], dev.space_hi[lo_k + 1:hi_k + 1],
    dev.pillars[lo_k:hi_k], dev.loss[lo_k:hi_k], dev.inject_cost[lo_k:hi_k],
    dev.withdraw_cost[lo_k:hi_k], dev.cons_inject[lo_k:hi_k], dev.cons_withdraw[lo_k:hi_k],
    dev.inv_cost_rate[lo_k:hi_k], dev.df_settle[lo_k:hi_k], dev.df_start[lo_k:hi_k],
    dev.fwd[lo_k:hi_k], dfd[lo_k:hi_k],
    spec=spec, interp_kind=ctx.interp_kind, num_grid_points=G,
    extra_decisions=0, collect_panels=False,
)
timeit(f"forward_scan {L} steps x {S}", fw)

"""Bisect backward-scan corruption on the TPU backend: scan k steps from the
end and report value-function stats vs a NumPy float64 reference of the same
computation."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from benchmarks.backend_diff_probe_lib import build_probe_inputs  # noqa: E402

(ctx, spec, reg, val) = build_probe_inputs(num_sims=100_000)

from storage_tpu.engines.lsmc import backward_scan, device_inputs  # noqa: E402

dev = device_inputs(ctx, jnp.float32)
n = ctx.n_steps
first = 1
m = reg[0].shape[0] - 1  # decision steps simulated

reg_spots = jnp.asarray(reg[0])
reg_factors = jnp.asarray(reg[1])
v_end = jnp.zeros((reg[0].shape[1], ctx.num_grid_points), jnp.float32)

for back_steps in (5, 40, 150, m):
    a = m - back_steps  # scan rows [a, m)
    lo_k = first + a
    hi_k = first + m
    v, *_ = backward_scan(
        v_end,
        reg_spots[a:m],
        reg_factors[a:m],
        dev.grids[lo_k:hi_k],
        dev.space_lo[lo_k + 1 : hi_k + 1],
        dev.space_hi[lo_k + 1 : hi_k + 1],
        dev.pillars[lo_k:hi_k],
        dev.loss[lo_k:hi_k],
        dev.inject_cost[lo_k:hi_k],
        dev.withdraw_cost[lo_k:hi_k],
        dev.cons_inject[lo_k:hi_k],
        dev.cons_withdraw[lo_k:hi_k],
        dev.inv_cost_rate[lo_k:hi_k],
        dev.df_settle[lo_k:hi_k],
        dev.df_start[lo_k:hi_k],
        spec=spec,
        interp_kind=ctx.interp_kind,
        num_grid_points=ctx.num_grid_points,
        extra_decisions=0,
    )
    v = np.asarray(v)
    print(
        f"back_steps={back_steps:4d} mean(V)={v.mean():14,.2f} "
        f"min={v.min():14,.2f} max={v.max():14,.2f} "
        f"col0_mean={v[:,0].mean():14,.2f} colG_mean={v[:,-1].mean():14,.2f}",
        flush=True,
    )

"""Check V at step 1 at 100k sims using chunked sub-scans eagerly."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from benchmarks.backend_diff_probe_lib import build_probe_inputs
from storage_tpu.engines.lsmc import (
    _overflow_safe_spans,
    backward_scan,
    device_inputs,
)

ctx, spec, reg, val = build_probe_inputs(num_sims=100_000)
dev = device_inputs(ctx, jnp.float32)
reg_spots = jnp.asarray(reg[0])
reg_factors = jnp.asarray(reg[1])
S = reg_spots.shape[1]
G = ctx.num_grid_points
m = reg_spots.shape[0] - 1
first = 1

v = jnp.zeros((S, G), jnp.float32)
spans = list(reversed(_overflow_safe_spans(m, S, G)))
print("spans:", spans, flush=True)
for a, b in spans:
    lo_k, hi_k = first + a, first + b
    v, *_ = backward_scan(
        v,
        reg_spots[a:b],
        reg_factors[a:b],
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
        spec=spec, interp_kind=ctx.interp_kind,
        num_grid_points=G, extra_decisions=0,
    )
    vn = np.asarray(v)
    print(
        f"after span ({a},{b}): mean={vn.mean():,.1f} col0={vn[:,0].mean():,.1f} "
        f"zeros_frac={(vn==0).mean():.4f}",
        flush=True,
    )

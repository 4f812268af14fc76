"""Call the same known-good backward_scan chunk repeatedly: cumulative wrap
vs data-specific failure."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from benchmarks.backend_diff_probe_lib import build_probe_inputs
from storage_tpu.engines.lsmc import backward_scan, device_inputs

ctx, spec, reg, val = build_probe_inputs(num_sims=100_000)
dev = device_inputs(ctx, jnp.float32)
reg_spots = jnp.asarray(reg[0])
reg_factors = jnp.asarray(reg[1])
S = reg_spots.shape[1]
G = ctx.num_grid_points
first = 1


def run_span(v, a, b):
    lo_k, hi_k = first + a, first + b
    v, *_ = backward_scan(
        v,
        reg_spots[a:b], reg_factors[a:b],
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
    return v


v0 = jnp.zeros((S, G), jnp.float32)
for i in range(5):
    v = run_span(v0, 255, 340)  # known-good tail chunk, fresh v0 each time
    vn = np.asarray(v)
    print(f"repeat {i}: mean={vn.mean():,.1f} zeros={(vn==0).mean():.4f}", flush=True)

# Then the early chunk alone from a synthetic healthy carry:
v_healthy = jnp.asarray(
    (np.random.default_rng(0).standard_normal((S, G)) * 1000 + 90000).astype(np.float32)
)
v = run_span(v_healthy, 0, 85)
vn = np.asarray(v)
print(f"early chunk (0,85) from synthetic carry: mean={vn.mean():,.1f} zeros={(vn==0).mean():.4f}",
      flush=True)

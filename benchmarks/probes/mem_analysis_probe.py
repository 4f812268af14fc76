"""AOT memory analysis of the three big XLA programs at headline shapes.

Lowers (no execution) the simulation kernel, the backward program and the
forward (Pallas) program at the bench scenario's shapes and prints XLA's
memory accounting — diagnosis tool for the whole-horizon materialised peak
(ROUND4_NOTES session 6, remaining thread).  Run: python mem_analysis_probe.py
[num_sims].
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from _scenario import maybe_pin_cpu  # noqa: E402

maybe_pin_cpu()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_REPO = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, _REPO)

from bench import build_case  # noqa: E402
from storage_tpu.compile import build_valuation_context  # noqa: E402
from storage_tpu.engines import lsmc as L  # noqa: E402
from storage_tpu.models.multi_factor import (  # noqa: E402
    build_sim_coefficients, create_3_factor_season_params,
)
from storage_tpu.models import simulation as sim  # noqa: E402
from storage_tpu.ops.regression import basis_spec  # noqa: E402
from storage_tpu.utils.basis import (  # noqa: E402
    THREE_FACTOR_SEASONAL_ALIASES, parse_basis_functions,
)

BASIS = "1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st"
S = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def report(name, compiled):
    ma = compiled.memory_analysis()
    gb = 1 / (1 << 30)
    print(
        f"{name}: args={ma.argument_size_in_bytes*gb:.3f} GB "
        f"out={ma.output_size_in_bytes*gb:.3f} GB "
        f"temp={ma.temp_size_in_bytes*gb:.3f} GB "
        f"alias={ma.alias_size_in_bytes*gb:.3f} GB "
        f"peak(args+out+temp-alias)="
        f"{(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes - ma.alias_size_in_bytes)*gb:.3f} GB",
        flush=True,
    )


storage, fwd_curve, ir_curve, settle = build_case()
ctx = build_valuation_context(storage, "2021-04-25", 1500.0, fwd_curve, ir_curve, settle, 100)
f3, c3 = create_3_factor_season_params("D", 91.0, 0.85, 0.30, 0.19, ctx.val_period, storage.end)
coeffs_sim = build_sim_coefficients(f3, c3, ctx.val_period, fwd_curve, list(ctx.periods[1:]))
spec = basis_spec(parse_basis_functions(BASIS, THREE_FACTOR_SEASONAL_ALIASES), num_factors=3)
statics = dict(
    spec=spec, interp_kind=ctx.interp_kind, num_grid_points=ctx.num_grid_points,
    extra_decisions=0, val_first=ctx.val_date_is_first_step,
    terminal_fn=storage.terminal_npv_fn,
)
G = ctx.num_grid_points
dev = L.device_inputs(ctx, jnp.float32)
n_rows = len(coeffs_sim.decay)  # simulated periods
F = 3
print(f"shapes: rows={n_rows} F={F} S={S} G={G} B={spec.num_basis}", flush=True)

fs = jax.ShapeDtypeStruct((n_rows, F, S), jnp.float32)
key = jax.random.PRNGKey(11)
decay = jnp.asarray(coeffs_sim.decay, jnp.float32)
chol = jnp.asarray(coeffs_sim.chol, jnp.float32)
vols = jnp.asarray(coeffs_sim.vols, jnp.float32)
drift = jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float32)

# 1. simulation kernel
lowered = sim._simulate_factor_kernel.lower(key, decay, chol, num_sims=S, antithetic=False)
report("simulate", lowered.compile())

# 2. backward program
bpal = L._pallas_backward_eligible(None, jnp.float32, S, G)
print(f"bpal={bpal} sub_tiles_env={os.environ.get('STORAGE_TPU_BWD_SUBTILES')}", flush=True)
lowered = L._backward_program_jit.lower(
    fs, vols, drift, dev, pallas=bpal, mesh=None,
    quantize_weights=L._xla_quantize_weights(), **statics
)
report("backward", lowered.compile())

# 3. forward program (Pallas route, collect_panels=False)
m = n_rows - 1
cont_mean0 = jax.ShapeDtypeStruct((G,), jnp.float32)
coeffs_s = jax.ShapeDtypeStruct((m, spec.num_basis, G), jnp.float32)
mus_s = jax.ShapeDtypeStruct((m, spec.num_basis), jnp.float32)
sds_s = jax.ShapeDtypeStruct((m, spec.num_basis), jnp.float32)
vbars_s = jax.ShapeDtypeStruct((m, G), jnp.float32)
fpal = L._pallas_forward_eligible(ctx, 0, None, False, S, jnp.float32)
print(f"fpal={fpal}", flush=True)
fwd_jit = jax.jit(
    L._forward_program_pallas if fpal is not None else L._forward_program,
    static_argnames=(
        "spec", "interp_kind", "num_grid_points", "extra_decisions", "val_first",
        "terminal_fn", "discount_deltas",
    ) + (("block_sims", "interpret", "mesh") if fpal is not None else ("collect_panels",)),
    donate_argnums=(0,),
)
extra = (
    dict(block_sims=fpal[0], interpret=fpal[1], mesh=None)
    if fpal is not None else dict(collect_panels=False)
)
lowered = fwd_jit.lower(
    fs, vols, drift, cont_mean0, coeffs_s, mus_s, sds_s, vbars_s, dev,
    jax.ShapeDtypeStruct((), jnp.float32), discount_deltas=True, **statics, **extra
)
report("forward", lowered.compile())

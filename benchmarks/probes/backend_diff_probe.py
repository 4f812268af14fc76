"""Feed bit-identical paths to the LSMC engine on the current backend.

Isolates engine numerics from simulation transcendental differences.
Run once with the TPU backend and once with JAX_PLATFORMS=cpu.
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from bench import build_case
from storage_tpu.compile import build_valuation_context
from storage_tpu.engines.lsmc import run_lsmc
from storage_tpu.models.multi_factor import build_sim_coefficients, create_3_factor_season_params
from storage_tpu.ops.regression import basis_spec
from storage_tpu.utils.basis import THREE_FACTOR_SEASONAL_ALIASES, parse_basis_functions

storage, fwd_curve, ir_curve, settle = build_case()
ctx = build_valuation_context(storage, "2021-04-25", 1500.0, fwd_curve, ir_curve, settle, 100)
factors, corrs = create_3_factor_season_params(
    "D", 91.0, 0.85, 0.30, 0.19, ctx.val_period, storage.end
)
first = 1 if ctx.val_date_is_first_step else 0
sim_periods = list(ctx.periods[first:])
coeffs = build_sim_coefficients(factors, corrs, ctx.val_period, fwd_curve, sim_periods)

S = 100_000
rng = np.random.default_rng(1234)


def numpy_paths(seed):
    rng = np.random.default_rng(seed)
    n, F = coeffs.decay.shape
    z = rng.standard_normal((n, F, S)).astype(np.float32).astype(np.float64)
    y = np.zeros((F, S))
    factors_out = np.empty((n, F, S), dtype=np.float32)
    spots_out = np.empty((n, S), dtype=np.float32)
    for k in range(n):
        y = coeffs.decay[k][:, None] * y + coeffs.chol[k] @ z[k]
        factors_out[k] = y.astype(np.float32)
        log_spot = coeffs.vols[k] @ y + coeffs.log_fwd_drift[k]
        spots_out[k] = np.exp(log_spot).astype(np.float32)
    return spots_out, factors_out


reg = numpy_paths(1)
val = numpy_paths(2)
spec = basis_spec(
    parse_basis_functions(
        "1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st",
        THREE_FACTOR_SEASONAL_ALIASES,
    ),
    num_factors=3,
)
from storage_tpu.models.multi_factor import build_sim_coefficients as _b  # noqa
arrays = run_lsmc(
    ctx,
    jnp.asarray(reg[1]),
    jnp.asarray(val[1]),
    jnp.asarray(coeffs.vols, jnp.float32),
    jnp.asarray(coeffs.log_fwd_drift, jnp.float32),
    spec,
    discount_deltas=True,
    collect_panels=False,
)
print(f"npv={float(arrays.npv):,.3f} backward_npv={float(arrays.backward_npv):,.3f}", flush=True)

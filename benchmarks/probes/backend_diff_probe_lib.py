"""Shared inputs for backend-difference probes."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import build_case
from storage_tpu.compile import build_valuation_context
from storage_tpu.models.multi_factor import (
    build_sim_coefficients,
    create_3_factor_season_params,
)
from storage_tpu.ops.regression import basis_spec
from storage_tpu.utils.basis import THREE_FACTOR_SEASONAL_ALIASES, parse_basis_functions


def build_probe_inputs(num_sims=100_000):
    storage, fwd_curve, ir_curve, settle = build_case()
    ctx = build_valuation_context(
        storage, "2021-04-25", 1500.0, fwd_curve, ir_curve, settle, 100
    )
    factors, corrs = create_3_factor_season_params(
        "D", 91.0, 0.85, 0.30, 0.19, ctx.val_period, storage.end
    )
    first = 1 if ctx.val_date_is_first_step else 0
    sim_periods = list(ctx.periods[first:])
    coeffs = build_sim_coefficients(factors, corrs, ctx.val_period, fwd_curve, sim_periods)

    def numpy_paths(seed):
        rng = np.random.default_rng(seed)
        n, F = coeffs.decay.shape
        z = rng.standard_normal((n, F, num_sims)).astype(np.float32).astype(np.float64)
        y = np.zeros((F, num_sims))
        factors_out = np.empty((n, F, num_sims), dtype=np.float32)
        spots_out = np.empty((n, num_sims), dtype=np.float32)
        for k in range(n):
            y = coeffs.decay[k][:, None] * y + coeffs.chol[k] @ z[k]
            factors_out[k] = y.astype(np.float32)
            log_spot = coeffs.vols[k] @ y + coeffs.log_fwd_drift[k]
            spots_out[k] = np.exp(log_spot).astype(np.float32)
        return spots_out, factors_out

    spec = basis_spec(
        parse_basis_functions(
            "1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st",
            THREE_FACTOR_SEASONAL_ALIASES,
        ),
        num_factors=3,
    )
    return ctx, spec, numpy_paths(1), numpy_paths(2)

"""Shared bench-config scenario setup for the backward-phase probes.

One canonical builder so the timing probes (fold_timing_probe,
block_width_probe) cannot drift apart on basis set / seed / grid count —
any change to the headline scenario happens here once.  Import pattern
(probes run as scripts, the probes dir is not a package):

    sys.path.insert(0, os.path.dirname(__file__))
    from _scenario import bench_backward_setup, maybe_pin_cpu
"""
import os
import sys

_REPO = os.path.join(os.path.dirname(__file__), "..", "..")
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

BASIS = "1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st"


def maybe_pin_cpu() -> None:
    """Honour PROBE_CPU=1 before any backend touch.

    The JAX_PLATFORMS env var is silently ignored under the axon plugin (and
    axon init HANGS during tunnel outages) — the config update before first
    backend touch is the only reliable CPU pin.
    """
    if os.environ.get("PROBE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")


def bench_backward_setup(num_sims: int):
    """Headline-bench scenario (bench.py's case) staged for the backward scan.

    Returns ``(statics, dev, reg, vols, drift, num_grid, n_steps)`` —
    everything ``engines.lsmc._backward_program_jit`` needs besides the
    ``pallas=(block, interpret)`` routing choice under probe control.
    """
    import jax.numpy as jnp

    from bench import build_case
    from storage_tpu.compile import build_valuation_context
    from storage_tpu.engines import lsmc as L
    from storage_tpu.models.multi_factor import (
        build_sim_coefficients,
        create_3_factor_season_params,
    )
    from storage_tpu.models.simulation import simulate_factor_paths
    from storage_tpu.ops.regression import basis_spec
    from storage_tpu.utils.basis import (
        THREE_FACTOR_SEASONAL_ALIASES,
        parse_basis_functions,
    )

    storage, fwd_curve, ir_curve, settle = build_case()
    ctx = build_valuation_context(
        storage, "2021-04-25", 1500.0, fwd_curve, ir_curve, settle, 100
    )
    f3, c3 = create_3_factor_season_params(
        "D", 91.0, 0.85, 0.30, 0.19, ctx.val_period, storage.end
    )
    coeffs_sim = build_sim_coefficients(
        f3, c3, ctx.val_period, fwd_curve, list(ctx.periods[1:])
    )
    spec = basis_spec(
        parse_basis_functions(BASIS, THREE_FACTOR_SEASONAL_ALIASES),
        num_factors=3,
    )
    statics = dict(
        spec=spec, interp_kind=ctx.interp_kind,
        num_grid_points=ctx.num_grid_points, extra_decisions=0,
        val_first=ctx.val_date_is_first_step, terminal_fn=storage.terminal_npv_fn,
    )
    dev = L.device_inputs(ctx, jnp.float32)
    reg = simulate_factor_paths(coeffs_sim, num_sims, seed=11)
    vols = jnp.asarray(coeffs_sim.vols, jnp.float32)
    drift = jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float32)
    return statics, dev, reg, vols, drift, ctx.num_grid_points, len(ctx.periods) - 1
